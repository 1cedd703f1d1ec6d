"""Custom stateful streaming operators via ``applyInPandasWithState`` plus
streaming deduplication — the 'arbitrary stateful processing' tier the
built-in windowed aggregations can't express.

Scale notes: state lives in the state store, partitioned by the grouping
key across ``spark.sql.shuffle.partitions`` tasks; each micro-batch touches
only the groups present in that batch. Use timeouts (or watermark-scoped
``dropDuplicatesWithinWatermark``) to bound state — unbounded keyspaces
with NoTimeout state grow forever.

API choice: Spark 4's ``transformWithStateInPandas`` (typed value/list/map
state, timers, TTL) is the successor API and the natural home for these
operators, but its driver-side runner needs ``google.protobuf``, which
this environment does not provide (probed: STREAMING_PYTHON_RUNNER
initialization fails on the protobuf import). ``applyInPandasWithState``
expresses the same per-key state machines without that dependency, so the
operators below use it; porting to transformWithState is a mechanical
handle/valueState rename when the dependency is available.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def _ddl(events: DataFrame, col: str) -> str:
    """``col type`` DDL fragment with the type taken from the INPUT schema —
    the stateful operators below parameterize their key/tiebreak/attr column
    names, so their output types must follow the input instead of hardcoding
    bigint/string (ADVICE r5: a string user_id key failed Arrow conversion
    under the old hardcoded signature)."""
    return f"{col} {events.schema[col].dataType.simpleString()}"


def running_user_totals_stream(events: DataFrame) -> DataFrame:
    """Per-user lifetime running totals, maintained as explicit state across
    micro-batches (count + sum survive restarts via the checkpoint).

    The pandas-with-state form: each key's batch rows arrive as Arrow
    DataFrame chunks; state is a typed tuple. Emits one updated row per user
    per micro-batch (update semantics).
    """

    out_schema = f"{_ddl(events, 'user_id')}, n_events bigint, total_value double"
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


def ewma_stream(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    value_col: str = "value",
    alpha: float = 0.3,
) -> DataFrame:
    """Streaming EWMA per key — the ``transformWithState``-shaped twin of
    ``operators.timeseries.ewma`` (VERDICT r4 next-step 7).

    State per key is the numerator/denominator pair of the adjust-style
    weighted mean (``swx = x + (1-α)·swx``, ``sw = 1 + (1-α)·sw``) — two
    doubles however long the series, emitted as ``swx/sw`` per row. This is
    the UNtruncated recursion; the batch operator truncates at 50 steps for
    SQL-oracle portability, so the two agree to within (1-α)^50 · range
    (≈2e-8 of range at the defaults) — asserted in the parity test.

    Ordering contract: rows are sorted by (ts, tiebreak) WITHIN each
    micro-batch; ACROSS batches per-key in-order arrival is assumed (the
    file-drop replay shape). A stream with cross-batch disorder needs a
    watermark-buffered reorder upstream — the trade every recursive
    stateful op makes, unlike the commutative windowed aggs.
    """
    out_schema = (
        f"{_ddl(events, key_col)}, {_ddl(events, tiebreak_col)}, ewma double"
    )
    state_schema = "swx double, sw double"
    decay = 1.0 - alpha

    def fn(key, pdfs, state: GroupState):
        swx, sw = state.get if state.exists else (0.0, 0.0)
        frames = [pdf for pdf in pdfs if len(pdf)]
        out = []
        if frames:
            batch = pd.concat(frames, ignore_index=True).sort_values(
                [ts_col, tiebreak_col]
            )
            for tb, x in zip(batch[tiebreak_col], batch[value_col]):
                swx = float(x) + decay * swx
                sw = 1.0 + decay * sw
                out.append((key[0], tb, swx / sw))
        state.update((swx, sw))
        yield pd.DataFrame(out, columns=[key_col, tiebreak_col, "ewma"])

    return (
        events.select(key_col, ts_col, tiebreak_col, value_col)
        # the _events_timed contract: a row with no event time cannot be
        # ordered into the recursion (and null sorts engine-dependently)
        .filter(F.col(ts_col).isNotNull() & F.col(value_col).isNotNull())
        .groupBy(key_col)
        .applyInPandasWithState(
            fn, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
        )
    )


def scd2_stream(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    attr_cols: "tuple[str, ...]" = ("event_type",),
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Streaming Type-2 SCD history — the stateful twin of
    ``operators.relational.scd2_history``.

    State per key is (valid_from, current attribute tuple as JSON). Each
    micro-batch is processed in (ts, tiebreak) order; an attribute change
    EMITS the closed interval (valid_to = change ts, is_current never —
    closed rows only) and rolls the state. The open interval lives in
    state until the next change; the batch operator materializes it as the
    ``is_current`` row, so parity tests compare the CLOSED intervals.
    Same cross-batch in-order contract as ``ewma_stream``.

    Output types follow the INPUT schema for key and attr columns (ADVICE
    r5). Attr values cross micro-batches through JSON state, so attr
    columns must be JSON-representable primitives (string / integral /
    float / boolean) — anything else raises up front rather than silently
    stringifying.
    """
    import json

    _JSON_OK = {
        "string", "tinyint", "smallint", "int", "bigint", "float", "double",
        "boolean",
    }
    for c in attr_cols:
        t = events.schema[c].dataType.simpleString()
        if t not in _JSON_OK:
            raise ValueError(
                f"scd2_stream attr column {c!r} has type {t}; attrs live in "
                f"JSON state and must be one of {sorted(_JSON_OK)}"
            )
    attr_sql = ", ".join(_ddl(events, c) for c in attr_cols)
    out_schema = (
        f"{_ddl(events, key_col)}, {attr_sql}, "
        "valid_from timestamp, valid_to timestamp"
    )
    state_schema = "valid_from_us bigint, attrs string"

    def _py(v):
        if pd.isna(v):
            return None
        return v.item() if hasattr(v, "item") else v  # numpy scalar -> python

    def fn(key, pdfs, state: GroupState):
        if state.exists:
            vf_us, attrs_json = state.get
            cur = json.loads(attrs_json)
        else:
            vf_us, cur = None, None
        frames = [pdf for pdf in pdfs if len(pdf)]
        out = []
        if frames:
            batch = pd.concat(frames, ignore_index=True).sort_values(
                [ts_col, tiebreak_col]
            )
            for _, row in batch.iterrows():
                attrs = [_py(row[c]) for c in attr_cols]
                if cur is None:
                    cur, vf_us = attrs, row[ts_col].value // 1000
                elif attrs != cur:
                    out.append(
                        (key[0], *cur,
                         pd.Timestamp(vf_us, unit="us"),
                         pd.Timestamp(row[ts_col].value // 1000, unit="us"))
                    )
                    cur, vf_us = attrs, row[ts_col].value // 1000
        if cur is not None:
            state.update((vf_us, json.dumps(cur)))
        yield pd.DataFrame(
            out, columns=[key_col, *attr_cols, "valid_from", "valid_to"]
        )

    return (
        events.select(key_col, ts_col, tiebreak_col, *attr_cols)
        .filter(F.col(ts_col).isNotNull())  # _events_timed contract
        .groupBy(key_col)
        .applyInPandasWithState(
            fn, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
        )
    )
