"""Streaming deduplication: exact-once event delivery from an at-least-once
stream.

``dropDuplicatesWithinWatermark`` keeps per-key state only for the
watermark horizon — bounded state on an unbounded stream, the property
that makes streaming dedup viable in production (plain ``dropDuplicates``
on a stream grows state forever). Duplicates must arrive within the
watermark delay of first sight — the at-least-once-delivery contract of
every real event bus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["duplicate_stream", "dedup_stream"]


def duplicate_stream(events: DataFrame, copies: int = 2) -> DataFrame:
    """Simulate at-least-once delivery: every event appears ``copies``
    times (same event_id, same payload)."""
    return events.withColumn(
        "__copy", F.explode(F.sequence(F.lit(1), F.lit(copies)))
    ).drop("__copy")


def dedup_stream(events: DataFrame, key: str = "event_id", watermark_delay: str = "1 hour") -> DataFrame:
    """Exactly-one-row-per-key over a streaming DataFrame, with state
    bounded by the event-time watermark."""
    return events.withWatermark("ts", watermark_delay).dropDuplicatesWithinWatermark([key])
