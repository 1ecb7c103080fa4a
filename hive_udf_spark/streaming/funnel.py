"""Streaming funnel: per-user ordered-chain state across micro-batches.

The batch funnel (operators/temporal.py funnel_steps) as EXACT streaming
state via ``applyInPandasWithState``: each user's state holds the
timestamps of their funnel-step events seen so far, and every batch
re-derives the earliest chain (the same greedy ≡ nested-min semantics as
batch). Keeping per-step timestamp lists — not just the current chain —
is what makes the result arrival-order independent: a late-arriving
earlier ``view`` can lower step 1 and revive a ``click`` that was
previously unreachable, which a chain-only state would have discarded.
State is O(user's funnel-step events) — the sessionization contract
(per-key history fits a task), bounded in practice by funnel step
counts per user, and drops to zero for users who never emit step types.

Because the final state equals the batch computation exactly, the
registry query is oracle-checked by the SAME nested-min SQL as the
batch funnel — stream ≡ batch, hash-exact (stronger than the LC-state
verdict pattern)."""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def streaming_funnel(
    events: DataFrame,
    steps: list[str],
    within_hours: int | None = None,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Update-mode stream of per-user funnel rows
    (user, step_i_ts ..., completed, batches_seen); the row with the
    highest batches_seen per user is the final state and equals the
    batch ``funnel_steps`` output exactly."""
    k = len(steps)
    if k < 1:
        raise ValueError("steps must be non-empty")
    # the user column keeps its source type (string/bigint device or
    # session ids all work) — hardcoding bigint would break string keys
    user_type = events.schema[user_col].dataType.simpleString()
    out_schema = (
        f"{user_col} {user_type}, "
        + ", ".join(f"step_{i + 1}_ts timestamp" for i in range(k))
        + ", completed boolean, batches_seen int"
    )
    state_schema = (
        ", ".join(f"s{i + 1} array<bigint>" for i in range(k)) + ", batches int"
    )

    def update(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            st = state.get
            lists = [list(st[i]) for i in range(k)]
            batches = st[k]
        else:
            lists, batches = [[] for _ in range(k)], 0
        for pdf in pdfs:
            micros = pdf[ts_col].astype("datetime64[us]").astype("int64")
            for i, s in enumerate(steps):
                lists[i].extend(micros[pdf[type_col] == s].tolist())
        lists = [sorted(l) for l in lists]
        batches += 1
        state.update(tuple(lists) + (batches,))
        # earliest chain: step i = min ts strictly after step i-1
        chain: list[int | None] = []
        prev = None
        for i in range(k):
            nxt = None
            for t in lists[i]:
                if prev is None or t > prev:
                    nxt = t
                    break
            chain.append(nxt)
            if nxt is None:
                chain.extend([None] * (k - i - 1))
                break
            prev = nxt
        completed = chain[k - 1] is not None
        if completed and within_hours is not None:
            # floor-seconds, matching the batch funnel's ts.cast("long")
            # (a us-exact comparison disagrees with it when fractional
            # parts straddle the boundary — the hopping-window lesson)
            completed = (
                chain[k - 1] // 1_000_000 - chain[0] // 1_000_000
                <= within_hours * 3600
            )
        row = {user_col: [key[0]]}
        for i in range(k):
            row[f"step_{i + 1}_ts"] = [
                pd.Timestamp(chain[i], unit="us") if chain[i] is not None else pd.NaT
            ]
        row["completed"] = [completed]
        row["batches_seen"] = [batches]
        yield pd.DataFrame(row)

    filtered = events.filter(
        F.col(type_col).isin(list(steps)) & F.col(ts_col).isNotNull()
    )
    return filtered.groupBy(user_col).applyInPandasWithState(
        update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )
