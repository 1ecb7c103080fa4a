"""Custom stateful streaming: a Linear-Counting sketch as explicit state.

Demonstrates arbitrary sketch state under ``applyInPandasWithState`` —
the reference's LC estimator (UDAFCardinalityEstimator.java:358-359)
maintained incrementally across micro-batches per key:

    state = LC bitmap bytes (versioned SGLC format, functions/lc.py)
    per batch: OR-in the new values' buckets, emit the running estimate.

Spark's own windowed ``approx_count_distinct`` (streaming/windows.py)
is the built-in path; this operator exists for semantics the built-ins
can't express (custom sketch families, cross-window state, exportable
state bytes). State is constant-size per key — the property that makes
sketch state viable for unbounded streams.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "event_type string, est_distinct_users bigint, batches_seen int"
STATE_SCHEMA = "sketch binary, batches int"


def running_distinct_users(events: DataFrame, size_bytes: int = 65536) -> DataFrame:
    """Per event_type, a running approximate distinct-user count whose
    state survives across micro-batches (update output mode)."""
    from hive_udf_spark.functions.lc import LCSketch

    def update(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            raw, batches = state.get
            sk = LCSketch.from_bytes(bytes(raw))
        else:
            sk, batches = LCSketch(size_bytes), 0
        for pdf in pdfs:
            vals = pdf["user_id"].to_numpy(dtype=np.int64)
            # same bucket function as the batch path: pmod(xxhash64) is
            # JVM-only, so the Python path uses a stable numpy hash
            buckets = (vals * np.int64(-7046029254386353131)) % np.int64(sk.m)
            sk.set_buckets(np.abs(buckets))
        batches += 1
        state.update((sk.to_bytes(), batches))
        yield pd.DataFrame(
            {
                "event_type": [key[0]],
                "est_distinct_users": [sk.estimate()],
                "batches_seen": [batches],
            }
        )

    return events.groupBy("event_type").applyInPandasWithState(
        update, OUTPUT_SCHEMA, STATE_SCHEMA, "update", GroupStateTimeout.NoTimeout
    )
