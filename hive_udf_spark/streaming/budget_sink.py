"""Streaming token-budget admission: per-source budgets enforced as
arriving state, the streaming face of ``chunking.token_budget_cap``.

The batch operator admits in HASH-priority order — it can see the whole
corpus and pick an unbiased sample.  A stream cannot reorder what has
not arrived, so the streaming contract is ARRIVAL-ORDER greedy: each
micro-batch's documents are considered in deterministic in-batch order
(ascending id), each source's running total continues from the
accumulated state, and a document is admitted iff its inclusive running
total stays within the budget.  Because weights are non-negative the
running total is monotone, so the admitted set is a prefix of arrival
order per source — once a source's budget is exhausted it stays
exhausted, and admission decisions never retract (append-only, the
property that lets downstream consumers treat admitted rows as final).

With a deterministic batch order the final admitted table equals the
batch-mode window "cum over (source ORDER BY batch, id) ≤ budget" —
what the registry oracle computes in SQL.  The difference from the
batch operator's hash order is the honest cost of streaming: arrival
order is biased toward early arrivals, and that bias is part of the
contract, not an accident.

State and exactly-once: one parquet sub-table (``admitted/``) plus the
batch high-water mark, committed through the same whole-directory
symlink swap as the dedup sink — a foreachBatch retry skips the whole
batch (admission re-runs would double-count weights, unlike idempotent
sketch unions, so the hwm check is load-bearing here).

Scale: per batch, one partitioned window over the batch's rows and one
broadcast join against the per-source totals relation (|sources| rows).
The admitted table is append-only; totals derive from it with one
aggregation — no per-doc driver state anywhere.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hive_udf_spark.sources.sinks import swap_dir
from hive_udf_spark.streaming.dedup_sink import _hwm_skip, _resolve

ADMITTED_SCHEMA = (
    "doc_id long, source string, n_chars long, batch_id long, cum_weight long"
)


def token_budget_admission_sink(
    docs: DataFrame,
    state_path: str,
    checkpoint_dir: str,
    budget: int,
    part_col: str = "source",
    id_col: str = "doc_id",
    weight_col: str = "n_chars",
):
    """Streaming query maintaining the admitted table under the
    arrival-order greedy contract above.  Returns the started
    StreamingQuery; read results with
    ``spark.read.parquet(f"{state_path}/admitted")``."""
    if budget < 0:
        raise ValueError("budget must be non-negative")

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        cur = _resolve(state_path)
        admitted = None
        hwm = -1
        if cur is not None:
            meta = os.path.join(cur, "meta.json")
            if os.path.exists(meta):
                hwm = json.load(open(meta)).get("last_batch", -1)
            adm_dir = os.path.join(cur, "admitted")
            if os.path.exists(adm_dir):
                admitted = spark.read.parquet(adm_dir)
        if _hwm_skip(hwm, batch_id, state_path):
            return
        b = batch_df.select(
            F.col(id_col).alias("doc_id"),
            F.col(part_col).alias("source"),
            F.col(weight_col).cast("long").alias("n_chars"),
        )
        if admitted is not None:
            base = admitted.groupBy("source").agg(
                F.sum("n_chars").alias("__base")
            )
        else:
            base = spark.createDataFrame([], "source string, __base long")
        win = (
            Window.partitionBy("source")
            .orderBy("doc_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        new_rows = (
            b.withColumn("__in_batch", F.sum("n_chars").over(win))
            .join(F.broadcast(base), "source", "left")
            .withColumn(
                "cum_weight",
                F.coalesce("__base", F.lit(0)) + F.col("__in_batch"),
            )
            .where(F.col("cum_weight") <= budget)
            .select(
                "doc_id",
                "source",
                "n_chars",
                F.lit(int(batch_id)).cast("long").alias("batch_id"),
                "cum_weight",
            )
        )
        out = (
            admitted.unionByName(new_rows) if admitted is not None else new_rows
        )
        new_dir = f"{state_path}.v-{uuid.uuid4().hex[:8]}"
        out.write.parquet(os.path.join(new_dir, "admitted"))
        with open(os.path.join(new_dir, "meta.json"), "w") as f:
            json.dump({"last_batch": int(batch_id)}, f)
        swap_dir(state_path, new_dir)

    return (
        docs.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
