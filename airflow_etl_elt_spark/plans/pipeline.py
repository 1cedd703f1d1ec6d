"""Pipeline runner: the reference's Airflow orchestration surface re-expressed
as a ~small Python class over one SparkSession.

Reference parity (SURVEY.md §2.6):
- DAG + typed params + retries        — etl_elt_wine.py:66-96 (@dag, Param,
  retries=3/30 s) → ``Pipeline(params=...)`` + per-step retry wrapper
- task + XCom passing                 — etl_elt_wine.py:170,220,246 →
  steps receive a shared mutable context dict; DataFrames pass as lazy plans
  (no serialization boundary inside one Spark app)
- branching                           — etl_elt_wine.py:297-315 (@task.branch)
  → a step returning the names of the steps to run next
- dynamic fan-out                     — etl_elt_wine.py:404 (.expand) →
  ``fan_out`` helper mapping a step over a list
- task groups / chaining              — etl_elt_wine.py:318-404,434-456 →
  step ordering in the pipeline list
- dataset-driven trigger (AND)        — etl_elt_wine_downstream.py:42 →
  sinks write commit markers (sources.sinks); a downstream pipeline's
  ``wait_for`` gates on all of them
- trigger rule NONE_FAILED_MIN_ONE_SUCCESS — etl_elt_wine_downstream.py:86 →
  runner executes only the branch-chosen steps, downstream steps consume
  whichever ran
- concurrency=1 / max_active_runs=1   — etl_elt_wine.py:72,94 → lock file

Determinism hooks (SURVEY.md §7 hazard 5): ``now`` and ``rng`` are injectable
so weekday-dependent branches and random model choice are pinned in tests.
"""

from __future__ import annotations

import datetime as dt
import os
import random
import time
from collections.abc import Callable, Iterable
from dataclasses import dataclass, field
from typing import Any

from airflow_etl_elt_spark.sources.sinks import markers_ready


@dataclass
class Step:
    name: str
    fn: Callable[["Pipeline", dict[str, Any]], Any]
    retries: int = 0
    retry_delay_s: float = 0.0
    branch: bool = False  # fn returns name(s) of next step(s) to run


@dataclass
class StepResult:
    name: str
    status: str  # "success" | "failed" | "skipped"
    value: Any = None
    attempts: int = 0
    error: str | None = None


@dataclass
class Pipeline:
    """Ordered steps over a shared SparkSession, with params, retries,
    branching, and fan-out. Not a scheduler — the point is the semantics,
    executed in-process where Spark's lazy plans make XCom unnecessary."""

    name: str
    spark: Any = None
    params: dict[str, Any] = field(default_factory=dict)
    steps: list[Step] = field(default_factory=list)
    now: Callable[[], dt.datetime] = dt.datetime.now
    rng: random.Random = field(default_factory=lambda: random.Random(42))
    lock_dir: str | None = None

    def add(
        self,
        name: str,
        fn: Callable[["Pipeline", dict[str, Any]], Any],
        retries: int = 0,
        retry_delay_s: float = 0.0,
        branch: bool = False,
    ) -> "Pipeline":
        self.steps.append(Step(name, fn, retries, retry_delay_s, branch))
        return self

    def _acquire_lock(self) -> str | None:
        if not self.lock_dir:
            return None
        os.makedirs(self.lock_dir, exist_ok=True)
        path = os.path.join(self.lock_dir, f"{self.name}.lock")
        # O_EXCL create = the reference's max_active_runs=1
        fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        os.write(fd, str(os.getpid()).encode())
        os.close(fd)
        return path

    def run(
        self,
        context: dict[str, Any] | None = None,
        wait_for: tuple[str, ...] = (),
        marker_dir: str | None = None,
    ) -> dict[str, StepResult]:
        """Execute steps in order. A branch step's return value (a name or
        list of names) selects which of the remaining steps run; unselected
        steps are 'skipped'. ``wait_for`` + ``marker_dir`` gate the whole run
        on dataset commit markers (AND semantics, like the downstream DAG)."""
        if wait_for and not markers_ready(marker_dir or "", wait_for):
            return {
                s.name: StepResult(s.name, "skipped", error="upstream markers missing")
                for s in self.steps
            }
        lock = self._acquire_lock()
        try:
            return self._run_steps(context if context is not None else {})
        finally:
            if lock:
                os.unlink(lock)

    def _run_steps(self, ctx: dict[str, Any]) -> dict[str, StepResult]:
        results: dict[str, StepResult] = {}
        selected: set[str] | None = None  # None = run everything
        for step in self.steps:
            if selected is not None and step.name not in selected:
                results[step.name] = StepResult(step.name, "skipped")
                continue
            res = self._run_one(step, ctx)
            results[step.name] = res
            if res.status == "failed":
                # fail-stop like a DAG run; remaining steps are skipped
                for later in self.steps[self.steps.index(step) + 1 :]:
                    results[later.name] = StepResult(later.name, "skipped")
                break
            if step.branch:
                chosen = res.value
                names = [chosen] if isinstance(chosen, str) else list(chosen or [])
                chosen_set = set(names)
                # downstream-of-chosen still runs: selection only constrains
                # steps that some branch mentioned; here we keep it simple and
                # explicit — the branch lists every step that may still run.
                selected = chosen_set
        return results

    def _run_one(self, step: Step, ctx: dict[str, Any]) -> StepResult:
        attempts = 0
        while True:
            attempts += 1
            try:
                value = step.fn(self, ctx)
                ctx[step.name] = value
                return StepResult(step.name, "success", value, attempts)
            except Exception as exc:  # per-step retry: the Airflow retries knob
                if attempts > step.retries:
                    return StepResult(step.name, "failed", None, attempts, repr(exc))
                time.sleep(step.retry_delay_s)


def fan_out(
    items: Iterable[Any],
    fn: Callable[[Any], Any],
    max_parallel: int = 1,
) -> list[Any]:
    """Dynamic task mapping (etl_elt_wine.py:404 .expand): apply ``fn`` per
    item. Sequential by default — Spark jobs already parallelize internally;
    thread-level overlap (FAIR scheduler) only helps when jobs are small, so
    it is opt-in via max_parallel."""
    items = list(items)
    if max_parallel <= 1 or len(items) <= 1:
        return [fn(x) for x in items]
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=max_parallel) as pool:
        return list(pool.map(fn, items))
