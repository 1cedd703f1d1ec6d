"""Custom stateful streaming operators via ``applyInPandasWithState`` plus
streaming deduplication — the 'arbitrary stateful processing' tier the
built-in windowed aggregations can't express.

Scale notes: state lives in the state store, partitioned by the grouping
key across ``spark.sql.shuffle.partitions`` tasks; each micro-batch touches
only the groups present in that batch. Use timeouts (or watermark-scoped
``dropDuplicatesWithinWatermark``) to bound state — unbounded keyspaces
with NoTimeout state grow forever.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def running_user_totals_stream(events: DataFrame) -> DataFrame:
    """Per-user lifetime running totals, maintained as explicit state across
    micro-batches (count + sum survive restarts via the checkpoint).

    The pandas-with-state form: each key's batch rows arrive as Arrow
    DataFrame chunks; state is a typed tuple. Emits one updated row per user
    per micro-batch (update semantics).
    """

    out_schema = "user_id bigint, n_events bigint, total_value double"
    state_schema = "n bigint, total double"

    def fn(key, pdfs, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].fillna(0.0).sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            fn, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
        )
    )


def dedup_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming exact dedup on event_id, with state bounded by the
    watermark: an id is remembered only until the watermark passes it, so the
    dedup state can't grow unboundedly (the streaming twin of the batch
    exact-dedup operator)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )
