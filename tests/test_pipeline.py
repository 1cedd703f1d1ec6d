"""Workflow-runner semantics: retries, branching, fan-out, markers, locks —
the reference's orchestration contract (SURVEY.md §2.6) without Airflow."""

from __future__ import annotations

import datetime as dt

import pytest

from airflow_etl_elt_spark.plans.pipeline import Pipeline, fan_out
from airflow_etl_elt_spark.sources.sinks import markers_ready, write_commit_marker


def test_steps_run_in_order_and_share_context():
    p = Pipeline(name="t")
    p.add("a", lambda pl, ctx: 1).add("b", lambda pl, ctx: ctx["a"] + 1)
    res = p.run()
    assert res["a"].value == 1 and res["b"].value == 2
    assert all(r.status == "success" for r in res.values())


def test_retry_then_success():
    calls = {"n": 0}

    def flaky(pl, ctx):
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("transient")
        return "ok"

    p = Pipeline(name="t")
    p.add("flaky", flaky, retries=3, retry_delay_s=0)
    res = p.run()
    assert res["flaky"].status == "success"
    assert res["flaky"].attempts == 3


def test_retry_exhaustion_fails_and_skips_rest():
    p = Pipeline(name="t")
    p.add("bad", lambda pl, ctx: 1 / 0, retries=1, retry_delay_s=0)
    p.add("after", lambda pl, ctx: "never")
    res = p.run()
    assert res["bad"].status == "failed" and res["bad"].attempts == 2
    assert res["after"].status == "skipped"


@pytest.mark.parametrize(
    "weekday,count,expect_ml",
    [(3, 500, True), (6, 500, False), (3, 10, False)],
)
def test_branch_weekday_and_threshold(weekday, count, expect_ml):
    """The reference branch rule (etl_elt_wine.py:297-315): ML only on
    weekday <= 5 AND count >= threshold; report always runs."""
    now = lambda: dt.datetime(2026, 8, 10 + weekday - 1)  # Mon=10th
    p = Pipeline(name="t", params={"threshold": 200}, now=now)

    def branch(pl, ctx):
        chosen = {"report"}
        if pl.now().isoweekday() <= 5 and count >= pl.params["threshold"]:
            chosen.add("ml")
        return chosen

    p.add("branch", branch, branch=True)
    p.add("ml", lambda pl, ctx: "trained")
    p.add("report", lambda pl, ctx: "reported")
    res = p.run()
    assert (res["ml"].status == "success") is expect_ml
    assert res["report"].status == "success"


def test_dataset_trigger_and_gate(tmp_path):
    md = str(tmp_path / "markers")
    p = Pipeline(name="down")
    p.add("a", lambda pl, ctx: 1)
    # neither marker → whole run skipped
    res = p.run(wait_for=("duckdb_dataset", "postgresql_dataset"), marker_dir=md)
    assert res["a"].status == "skipped"
    write_commit_marker(md, "duckdb_dataset")
    res = p.run(wait_for=("duckdb_dataset", "postgresql_dataset"), marker_dir=md)
    assert res["a"].status == "skipped"  # AND semantics: one is not enough
    write_commit_marker(md, "postgresql_dataset")
    assert markers_ready(md, ("duckdb_dataset", "postgresql_dataset"))
    res = p.run(wait_for=("duckdb_dataset", "postgresql_dataset"), marker_dir=md)
    assert res["a"].status == "success"


def test_single_run_lock(tmp_path):
    p = Pipeline(name="locked", lock_dir=str(tmp_path))
    import os

    # simulate a concurrent active run
    with open(tmp_path / "locked.lock", "w") as f:
        f.write("123")
    with pytest.raises(FileExistsError):
        p.run()
    os.unlink(tmp_path / "locked.lock")
    p.add("a", lambda pl, ctx: 1)
    assert p.run()["a"].status == "success"
    assert not (tmp_path / "locked.lock").exists()  # released


def test_fan_out_orders_results():
    assert fan_out([1, 2, 3], lambda x: x * 2) == [2, 4, 6]
    assert fan_out([1, 2, 3], lambda x: x * 2, max_parallel=3) == [2, 4, 6]
