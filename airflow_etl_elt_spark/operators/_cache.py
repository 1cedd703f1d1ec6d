"""Bounded persist rotation for operator intermediates.

Some operators MUST persist an intermediate:

- self-join inputs whose upstream is an expensive UDF (minhash/simhash
  signatures) — without a materialized cache both join sides run the UDF in
  full (Catalyst inlines it; measured 2x the UDF cost);
- range-repartitioned frames whose partition boundaries feed a driver-side
  offset computation (surrogate_key) — the persist pins ONE InMemoryRelation
  whose RDD lineage is fixed, so even cache eviction recomputes the SAME
  sampled boundaries; two independent materializations would not (the range
  partitioner's sampling is seeded by RDD id).

They cannot unpersist before returning: the caller's terminal action is what
consumes the cache. Unpersisting eagerly would silently recompute. Instead
each call site rotates: persisting call N unpersists call N-``keep``'s frame
under the same tag, bounding live cache to ``keep`` intermediates per
operator however many times the bench/driver loops (ADVICE r1: caches
accumulated across the 83-query run with 'already cached' warnings).

``keep`` defaults to 1. Operators whose RETURNED frame still depends on the
pinned cache (surrogate_key's offsets were computed from it; a recompute
under a different materialization could renumber rows) pass ``keep=2`` so a
second call before the first result is consumed does not evict the frame the
first result's correctness hangs on (ADVICE r5). The constraint is then "at
most ``keep`` results of that operator live at once" — documented at the
call sites; interleaving more concurrent unconsumed results than ``keep``
re-opens the lineage-pinning hazard this module exists to close.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_LIVE: dict[str, list[DataFrame]] = {}


def rotate_persist(
    tag: str, df: DataFrame, materialize: bool = True, keep: int = 1
) -> DataFrame:
    """Persist ``df`` (optionally materializing it with a count) after
    unpersisting all but the newest ``keep - 1`` frames previously
    registered under ``tag``."""
    live = _LIVE.setdefault(tag, [])
    df = df.persist()
    if materialize:
        no_aqe_count(df)
    live.append(df)
    while len(live) > keep:
        prev = live.pop(0)
        try:
            prev.unpersist()
        except Exception:
            pass  # session may be gone; nothing to free
    return df


def no_aqe_count(df: DataFrame) -> int:
    """Run ``df.count()`` with adaptive execution OFF — for driver-side
    bookkeeping actions (cache materialization, convergence probes) whose
    plans are fixed: AQE submits each internal shuffle map stage as its
    OWN job before the result job, paying one scheduling round-trip per
    stage for re-optimization the action can't use (OPTIMIZATION r13 —
    measured: dedup_minhash's sig materialization 2 jobs -> 1,
    grouped_stats' box-prefilter action 4 -> 1). The conf is restored
    before returning, so the QUERY plans consumers build stay adaptive."""
    conf = df.sparkSession.conf
    prev = conf.get("spark.sql.adaptive.enabled", "true")
    try:
        conf.set("spark.sql.adaptive.enabled", "false")
        return df.count()
    finally:
        conf.set("spark.sql.adaptive.enabled", prev)


def no_aqe_first(df: DataFrame):
    """``df.first()`` with adaptive execution off — see ``no_aqe_count``."""
    conf = df.sparkSession.conf
    prev = conf.get("spark.sql.adaptive.enabled", "true")
    try:
        conf.set("spark.sql.adaptive.enabled", "false")
        return df.first()
    finally:
        conf.set("spark.sql.adaptive.enabled", prev)


