"""Statistical operators: per-group Gaussian KDE (grouped pandas UDF).

Reference parity: per-quality-class KDE over alcohol via pandas
``Series.plot.kde()`` — scipy ``gaussian_kde`` with Scott's-rule bandwidth
(reference ``dags/include/utils.py:273-276``; SURVEY.md §2 row 23).

Spark-first: this is the canonical ``applyInPandas`` use case — semantics a
built-in aggregate can't express (a density curve per group), computed
group-at-a-time with Arrow-batched transfer and NumPy vectorization inside.
One shuffle on the group key; each group's KDE is O(n_group × grid) local
work. At 100 TB with huge groups, subsample per group first (the estimate
converges long before millions of points) — ``max_group_rows`` caps it.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

KDE_SCHEMA = "group_key string, x double, density double"


def _gaussian_kde_grid(values: np.ndarray, grid: np.ndarray) -> np.ndarray:
    """Gaussian KDE with Scott's-rule bandwidth, evaluated on ``grid``.

    Implemented directly (public formula: Scott 1992) rather than importing
    scipy — h = n^(-1/5) * sigma; density(x) = mean(phi((x - xi)/h))/h.
    """
    n = len(values)
    sigma = values.std(ddof=1)
    # Degenerate test is SCALE-RELATIVE, not sigma == 0 (r6 review finding):
    # numpy's pairwise-sum std of N identical values is a tiny NONZERO
    # (std([0.1]*3, ddof=1) = 1.7e-17 — the mean rounds, deviations don't)
    # while DuckDB's stddev_samp of the same rows is exactly 0.0; a strict
    # zero test would emit a ~1e16 density spike against the oracle's
    # all-zeros. Anything below 1e-12 of the value scale is rounding noise,
    # not spread — both engines' sigmas agree to ~1e-15 of the scale, so
    # they land on the same side of the threshold.
    scale = max(abs(float(values.min())), abs(float(values.max())), 1.0)
    if n < 2 or not np.isfinite(sigma) or sigma <= 1e-12 * scale:
        return np.zeros(len(grid))
    h = sigma * n ** (-1.0 / 5.0)
    z = (grid[:, None] - values[None, :]) / h
    dens = np.exp(-0.5 * z * z).sum(axis=1) / (n * h * np.sqrt(2 * np.pi))
    # Portability clamp (r6, part of the exact-oracle contract): densities
    # this small are built from exp() outputs in or near the SUBNORMAL
    # range, where libm implementations legitimately differ by whole ulps
    # of a subnormal — not 1e-15 relative like the normal range — so the
    # 9-significant-digit oracle canonicalization cannot absorb them. They
    # are numerical noise for any consumer (the chart sink plots them as
    # exactly the axis line); both engines clamp identically.
    dens[dens < 1e-100] = 0.0
    return dens


def kde_per_group(
    df: DataFrame,
    group_col: str,
    value_col: str,
    grid_points: int = 64,
    max_group_rows: int = 1_000_000,
) -> DataFrame:
    """Evaluate a per-group Gaussian KDE on a fixed per-group grid.

    Returns (group_key, x, density) — grid_points rows per group. The grid
    spans [min, max] of each group's values (matching what a per-class
    ``plot.kde`` renders); deterministic given the data.

    Input contract (r6, shared with the DuckDB oracle twin): null or
    non-finite values carry no density mass and are dropped BEFORE the
    kernel (NaN would otherwise poison the grid bounds on the NumPy side
    while DuckDB's min/max ignore NULL and sort NaN last — engine-dependent
    garbage either way); a NULL group key renders no curve (its stringified
    Python repr was an artifact, not a class).
    """
    from pyspark.sql import functions as F

    vc = F.col(value_col)
    df = df.filter(
        F.col(group_col).isNotNull()
        & vc.isNotNull()
        & ~F.isnan(vc.cast("double"))
        & (vc.cast("double") != F.lit(float("inf")))
        & (vc.cast("double") != F.lit(float("-inf")))
    )

    def kde_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        vals = pdf[value_col].to_numpy(dtype="float64")
        if len(vals) > max_group_rows:
            # deterministic thinning, not random: every k-th value
            vals = np.sort(vals)[:: max(1, len(vals) // max_group_rows)]
        lo, hi = float(vals.min()), float(vals.max())
        if lo == hi:
            hi = lo + 1.0
        grid = np.linspace(lo, hi, grid_points)
        dens = _gaussian_kde_grid(vals, grid)
        key = str(pdf[group_col].iloc[0])
        return pd.DataFrame({"group_key": key, "x": grid, "density": dens})

    return (
        df.select(group_col, value_col)
        .groupBy(group_col)
        .applyInPandas(kde_fn, schema=KDE_SCHEMA)
        .orderBy("group_key", "x")
    )
