"""Stream-stream joins: event-time bounded self-joins over the event
stream.

The canonical funnel query — "did a follow-up event of type B happen
within T of event A for the same user" — as a Structured Streaming
stream-stream INNER join. Both sides carry watermarks and the join
condition bounds the follow-up's event time to [src_ts, src_ts + T), so
Spark can expire join state: buffered rows older than the watermark
minus the bound are dropped, keeping state proportional to the time
bound, not the stream length. Without the time bound a stream-stream
join would buffer forever — the constraint IS the scalability contract.

On a bounded replay (file source + processAllAvailable) the result set
equals the batch join exactly, which is what the registry oracle checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def followup_join(
    events: DataFrame,
    src_type: str,
    dst_type: str,
    within: str = "1 hour",
    watermark: str = "1 hour",
) -> DataFrame:
    """Pairs (src event, follow-up event) for the same user where the
    follow-up of ``dst_type`` lands in [src.ts, src.ts + within).

    Works on a streaming DataFrame (stream-stream inner join, append
    mode) and on a batch DataFrame identically — stream/batch
    equivalence is the correctness claim.
    """
    src = (
        events.filter(F.col("event_type") == src_type)
        .withWatermark("ts", watermark)
        .select(
            F.col("event_id").alias("src_event"),
            F.col("user_id"),
            F.col("ts").alias("src_ts"),
        )
    )
    dst = (
        events.filter(F.col("event_type") == dst_type)
        .withWatermark("ts", watermark)
        .select(
            F.col("event_id").alias("dst_event"),
            F.col("user_id").alias("__uid_b"),
            F.col("ts").alias("dst_ts"),
        )
    )
    cond = (
        (F.col("user_id") == F.col("__uid_b"))
        & (F.col("dst_ts") >= F.col("src_ts"))
        & (F.col("dst_ts") < F.col("src_ts") + F.expr(f"INTERVAL {within}"))
    )
    return src.join(dst, cond, "inner").select(
        "src_event", "dst_event", "user_id", "src_ts", "dst_ts"
    )
