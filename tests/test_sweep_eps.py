"""The sweep harness's float-epsilon mode (SCALING r7 addendum 6, VERDICT r7
next-step 3): it must accept float-sum associativity drift — the 2e-9
relative difference tpch_q10 showed at the 100x replica — while still
FAILING on any genuine logic divergence. These tests pin the compare
function directly (no Spark session needed)."""

from __future__ import annotations

import datetime as dt
import importlib.util
import os
import sys

_SPEC = importlib.util.spec_from_file_location(
    "sweep_oracle",
    os.path.join(os.path.dirname(__file__), "..", "scripts", "sweep_oracle.py"),
)
sweep_oracle = importlib.util.module_from_spec(_SPEC)
sys.modules.setdefault("sweep_oracle", sweep_oracle)
_SPEC.loader.exec_module(sweep_oracle)

float_eps_match = sweep_oracle.float_eps_match
EPS_PER_ADDEND = sweep_oracle.EPS_PER_ADDEND
EPS_REL_CEILING = sweep_oracle.EPS_REL_CEILING


def test_eps_budget_is_hard_capped():
    """ADVICE r8 (medium): the n_addends = max-view-rows / output-rows
    heuristic wildly overestimates for small-output keys (the 100x spot
    sweep derived eps_rel=3e-6 for tpch_q10 — above the module's own
    '>=1e-6 relative = logic bug' floor). The derived budget must cap at
    EPS_REL_CEILING, which stays orders of magnitude above any observed
    associativity drift (max measured 4.4e-16 relative) and below the
    logic-bug floor."""
    assert EPS_REL_CEILING <= 1e-8
    assert EPS_REL_CEILING >= 1e-10
    n_addends = 60_000_000 / 20  # the 100x q10 shape that overshot
    derived = min(EPS_PER_ADDEND * n_addends, EPS_REL_CEILING)
    assert derived == EPS_REL_CEILING
    # a ~1e-7-relative divergence (wrong filter dropping a few rows from a
    # large aggregate) must now FAIL even for small-output keys
    a = _q10_like()
    b = [row[:-1] + (row[-1] * (1 + 3e-7),) for row in a]
    ok, _, reason = float_eps_match(a, b, derived)
    assert not ok and "rel=" in reason


def _q10_like(revenue_shift=0.0):
    """Rows shaped like tpch_q10's output: int group key, string dim cols,
    one big float aggregate."""
    return [
        (i, f"cust#{i}", dt.date(1994, 1, 1), 52480608.7 + i * 1000.0 + revenue_shift)
        for i in range(50)
    ]


def test_accepts_associativity_drift():
    """The observed 100x miss: 52480608.7 vs 52480608.8 (~2e-9 relative) on
    a sum of ~3750 doubles per group. eps_rel = 1e-12 * 3750 covers it."""
    a = _q10_like()
    b = _q10_like(revenue_shift=0.1)  # the literal observed drift
    eps_rel = EPS_PER_ADDEND * 3750
    ok, max_rel, reason = float_eps_match(a, b, eps_rel)
    assert ok, reason
    assert max_rel < eps_rel


def test_rejects_injected_logic_divergence():
    """A genuine bug (wrong filter / join) moves an aggregate by >= ~0.1%:
    the epsilon must NOT mask it, even at a 100x-sized addend budget."""
    a = _q10_like()
    b = [
        row[:-1] + (row[-1] * 1.001,) for row in a  # 1e-3 relative shift
    ]
    eps_rel = EPS_PER_ADDEND * 3750  # same budget that accepted the drift
    ok, _, reason = float_eps_match(a, b, eps_rel)
    assert not ok and "rel=" in reason


def test_rejects_divergence_even_at_absurd_addend_count():
    """Even a 1e9-addend budget (eps_rel = 1e-3) must not hide a dropped
    row or a non-float mismatch."""
    a = _q10_like()
    eps_rel = EPS_PER_ADDEND * 1_000_000_000
    # row-count divergence
    ok, _, _ = float_eps_match(a, a[:-1], eps_rel)
    assert not ok
    # non-float (group key) divergence: epsilon never applies to non-floats
    b = [(i + 1,) + row[1:] for i, row in enumerate(a)]
    ok, _, _ = float_eps_match(a, b, eps_rel)
    assert not ok


def test_rejects_nan_vs_value():
    a = [(1, float("nan"))]
    b = [(1, 0.0)]
    ok, _, _ = float_eps_match(a, b, 1e-3)
    assert not ok
    # both-NaN is equal (matches _canon's exact-mode semantics)
    ok, _, _ = float_eps_match(a, [(1, float("nan"))], 0.0)
    assert ok


def test_pairs_rows_by_group_key_not_input_order():
    """Order-insensitive like the exact pass: shuffled rows with in-budget
    float drift still pair correctly on the non-float columns."""
    a = _q10_like()
    b = list(reversed(_q10_like(revenue_shift=0.05)))
    ok, _, reason = float_eps_match(a, b, EPS_PER_ADDEND * 3750)
    assert ok, reason
