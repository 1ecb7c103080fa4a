#!/usr/bin/env python
"""Measure the BASELINE.md round-1 table: exact vs builtin-approx vs our
HLL/LC distinct counts, Spark and DuckDB, at a given scale factor."""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def timed(fn):
    t0 = time.time()
    out = fn()
    return round(time.time() - t0, 3), out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    import duckdb

    from pyspark.sql import functions as F

    from hive_udf_spark.functions import approx_distinct, sketch_merge_agg
    from hive_udf_spark.functions.lc import lc_cardinality
    from hive_udf_spark.session import get_spark
    from hive_udf_spark.sources import load_table

    spark = get_spark("baseline")
    spark.range(1000).select(F.sum("id")).collect()  # warm

    li = load_table(spark, sf_dir, "lineitem")
    ev = load_table(spark, sf_dir, "events")

    res: dict[str, dict] = {}

    # --- distinct l_orderkey over lineitem (global) ---
    r: dict = {}
    r["spark_exact"] = timed(lambda: li.select(F.count_distinct("l_orderkey")).collect()[0][0])
    r["spark_builtin_approx"] = timed(
        lambda: li.select(F.approx_count_distinct("l_orderkey")).collect()[0][0]
    )
    r["our_hll_b16"] = timed(
        lambda: li.agg(approx_distinct("l_orderkey").alias("s")).select("s.cardinality").collect()[0][0]
    )
    r["our_lc_1mb"] = timed(
        lambda: li.agg(lc_cardinality("l_orderkey", 1_000_000).alias("c")).collect()[0][0]
    )
    con = duckdb.connect()
    r["duckdb_exact"] = timed(
        lambda: con.sql(
            f"SELECT count(DISTINCT l_orderkey) FROM '{sf_dir}/lineitem.parquet'"
        ).fetchone()[0]
    )
    res["lineitem_l_orderkey"] = r

    # --- distinct user_id per event_type over events (grouped) ---
    r = {}
    r["spark_exact"] = timed(
        lambda: sorted(
            ev.groupBy("event_type").agg(F.count_distinct("user_id").alias("d")).collect()
        )[0]["d"]
    )
    r["spark_builtin_approx"] = timed(
        lambda: sorted(
            ev.groupBy("event_type").agg(F.approx_count_distinct("user_id").alias("d")).collect()
        )[0]["d"]
    )
    r["our_hll_b16"] = timed(
        lambda: sorted(
            ev.groupBy("event_type")
            .agg(approx_distinct("user_id").alias("s"))
            .select("event_type", F.col("s.cardinality").alias("d"))
            .collect()
        )[0]["d"]
    )
    r["our_lc_1mb"] = timed(
        lambda: sorted(
            ev.groupBy("event_type").agg(lc_cardinality("user_id", 1_000_000).alias("d")).collect()
        )[0]["d"]
    )
    r["duckdb_exact"] = timed(
        lambda: con.sql(
            f"SELECT min(d) FROM (SELECT event_type, count(DISTINCT user_id) AS d "
            f"FROM '{sf_dir}/events.parquet' GROUP BY event_type)"
        ).fetchone()[0]
    )
    res["events_user_id_by_type"] = r

    # --- sketch rollup: daily sketches -> monthly union ---
    r = {}

    def rollup():
        daily = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
            approx_distinct("user_id").alias("s")
        )
        return daily.agg(sketch_merge_agg("s").alias("m")).select("m.cardinality").collect()[0][0]

    r["our_hll_rollup"] = timed(rollup)
    res["sketch_rollup_daily_to_month"] = r

    print(json.dumps({"sf_dir": sf_dir, "results": res}, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
