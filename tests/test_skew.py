"""salted_join equivalence with plain joins + salt distribution."""

from __future__ import annotations

from pyspark.sql import functions as F

from hive_udf_spark.operators.skew import salted_join
from hive_udf_spark.sources import load_table


def _norm(df, cols):
    return sorted(map(tuple, df.select(*cols).collect()))


def test_salted_inner_join_matches_plain(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    plain = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "l_orderkey", "l_linenumber", "o_custkey"
    )
    # join key must be same-named for salted_join; rename first
    salted = salted_join(
        li, orders.withColumnRenamed("o_orderkey", "l_orderkey"),
        on="l_orderkey", salt_factor=4, big_unique_col="l_linenumber",
    ).select("l_orderkey", "l_linenumber", "o_custkey")
    assert _norm(plain, plain.columns) == _norm(salted, salted.columns)


def test_salted_left_join_matches_plain(spark):
    big = spark.createDataFrame(
        [(1, i) for i in range(500)] + [(2, 500), (3, 501)], "k int, rid int"
    )
    small = spark.createDataFrame([(1, "hot"), (2, "cold")], "k int, v string")
    plain = big.join(small, "k", "left")
    salted = salted_join(big, small, on="k", salt_factor=8, big_unique_col="rid", how="left")
    assert _norm(plain, ["k", "rid", "v"]) == _norm(salted, ["k", "rid", "v"])


def test_salt_spreads_hot_key(spark):
    # one key carrying every row: salts must hit all buckets
    big = spark.createDataFrame([(7, i) for i in range(1000)], "k int, rid int")
    salted = big.withColumn("__salt", F.pmod(F.xxhash64("rid"), F.lit(8)).cast("int"))
    n_buckets = salted.select("__salt").distinct().count()
    assert n_buckets == 8


def test_skew_report_null_keys_not_folded(spark):
    """NULL keys (the classic skew culprit) must rank as their own key,
    not fold into '' and merge with genuine empty-string keys."""
    from pyspark.sql import functions as F

    from hive_udf_spark.operators.skew import skew_report

    rows = [(None,)] * 50 + [("",)] * 20 + [("a",)] * 5
    df = spark.createDataFrame(rows, "k string")
    got = skew_report(df, ["k"], top_k=3).collect()
    by_rank = {r.rank: r for r in got}
    assert by_rank[1].key == "∅" and by_rank[1].cnt == 50
    assert by_rank[2].key == "" and by_rank[2].cnt == 20
    assert by_rank[1].n_keys == 3 and by_rank[1].max_count == 50


def test_skew_report_multicol_null_vs_empty(spark):
    """('a', NULL) and ('a', '') are distinct keys with distinct counts."""
    from hive_udf_spark.operators.skew import skew_report

    rows = [("a", None)] * 7 + [("a", "")] * 3
    df = spark.createDataFrame(rows, "k1 string, k2 string")
    got = skew_report(df, ["k1", "k2"], top_k=2).collect()
    assert {(r.key, r.cnt) for r in got} == {("a|∅", 7), ("a|", 3)}


def test_ks_drift_matches_brute_force(spark):
    import numpy as np
    from hive_udf_spark.operators.profile import ks_drift

    rng = np.random.default_rng(3)
    rows = []
    for g, (lo, hi, n) in {"a": (0, 20, 200), "b": (5, 40, 120), "c": (0, 3, 30)}.items():
        for v in rng.integers(lo, hi, n):
            rows.append((g, int(v)))
    df = spark.createDataFrame(rows, "source string, val long")
    got = {r.source: (r.n_grp, r.ks_ppm, r.ks_at_value)
           for r in ks_drift(df, "source", "val").collect()}
    allv = sorted({v for _, v in rows})
    n_all = len(rows)
    for g in ("a", "b", "c"):
        grp = [v for s, v in rows if s == g]
        n_g = len(grp)
        best, best_v = -1, None
        for v in allv:
            cg = sum(1 for x in grp if x <= v)
            ca = sum(1 for _, x in rows if x <= v)
            d = abs(cg * n_all - ca * n_g)
            if d > best:
                best, best_v = d, v
        want_ppm = (1_000_000 * best) // (n_g * n_all)
        assert got[g] == (n_g, want_ppm, best_v), g


def test_ks_drift_identical_group_is_zero(spark):
    from hive_udf_spark.operators.profile import ks_drift

    rows = [("x", v) for v in range(50)] + [("y", v) for v in range(50)]
    df = spark.createDataFrame(rows, "source string, val long")
    out = {r.source: r.ks_ppm for r in ks_drift(df, "source", "val").collect()}
    assert out == {"x": 0, "y": 0}


# ---------------------------------------------------------------------------
# exact_quantiles (r8) — distributed type-7 quantiles
# ---------------------------------------------------------------------------


def test_exact_quantiles_matches_builtin(spark):
    from hive_udf_spark.operators.profile import exact_quantiles
    import pyspark.sql.functions as F

    vals = [1.0, 1.0, 2.0, 4.0, 7.0, 7.0, 7.0, 9.0, 100.0]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    ps = [0.0, 0.01, 0.25, 0.5, 0.9, 0.99, 1.0]
    got = {
        r.p: r.quantile
        for r in exact_quantiles(df, "x", ps, num_shards=3).collect()
    }
    ref = df.agg(
        F.expr(f"percentile(x, array({', '.join(map(str, ps))}))").alias("q")
    ).collect()[0].q
    assert got == dict(zip(ps, ref))


def test_exact_quantiles_single_value_column(spark):
    from hive_udf_spark.operators.profile import exact_quantiles

    df = spark.createDataFrame([(5.0,)] * 4, "x double")
    got = {r.p: r.quantile for r in exact_quantiles(df, "x", [0.0, 0.5, 1.0]).collect()}
    assert got == {0.0: 5.0, 0.5: 5.0, 1.0: 5.0}


def test_exact_quantiles_random_multisets_vs_numpy(spark):
    import numpy as np
    from hive_udf_spark.operators.profile import exact_quantiles

    ps = [0.01, 0.25, 0.5, 0.75, 0.99]
    rng = np.random.RandomState(42)
    for trial in range(4):
        # duplicate-heavy: values drawn from a small grid
        vals = rng.choice([0.5, 1.25, 3.0, 3.0, 7.5, 9.0, 42.0],
                          size=rng.randint(5, 200)).tolist()
        df = spark.createDataFrame([(float(v),) for v in vals], "x double")
        got = {
            r.p: r.quantile
            for r in exact_quantiles(df, "x", ps, num_shards=4).collect()
        }
        ref = np.percentile(np.array(vals), [p * 100 for p in ps],
                            method="linear")
        for p, expect in zip(ps, ref):
            assert abs(got[p] - float(expect)) < 1e-12, (trial, p, got[p], expect)
