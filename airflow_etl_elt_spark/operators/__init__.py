"""Relational / dataflow operators, each a thin function over DataFrames.

Modules map to SURVEY.md §2 sections plus the north-star extensions:
relational (projections/filters/keys), aggregates (grouped stats, TPC-H-style
rollups), joins, windows (ranking/running), timeseries (event-time windows),
dedup, similarity, text, multimodal.
"""
