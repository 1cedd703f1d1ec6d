#!/usr/bin/env python
"""Validate-and-install guard for the scale-bench record (VERDICT r11 #1a).

The r11 failure this exists to make impossible: the closing chain ran
``python bench.py | tail -1 > BENCH_SF10.json`` — the shell redirect
TRUNCATED the official artifact at launch (20:10), the end-of-round
snapshot was committed while the bench was still running (20:45), and the
round shipped a 0-byte BENCH_SF10.json plus a stale detail file while the
delivery table claimed a refreshed record. Sweeps already had a
refuses-partial assembler; bench artifacts now get the same property:
the official file is written ONLY after the raw output validates, via an
atomic rename, so no observable state can ever be a truncated record.

Modes:

  install RAW NAME EXPECTED_SF
      RAW = file capturing bench.py stdout (any amount of noise above the
      final JSON line). Parses the LAST line as JSON and requires:
      metric == headline_queries_total, a positive value, a non-empty
      queries map with zero errors, sf == EXPECTED_SF, a positive
      duckdb_total, and a same-run BENCH_DETAIL.json (mtime >= RAW's
      creation is not checkable portably, so it checks the detail's sf
      field instead). Then atomically installs BENCH_<NAME>.json and
      BENCH_<NAME>_DETAIL.json. Exits nonzero writing NOTHING otherwise.

  verify
      Re-validates every committed BENCH_SF*.json the same way and fails
      if any bench/sweep/scale-build process is still alive (VERDICT r11
      #1b: a leftover 33 GB bench JVM from the truncated SF10 run was
      co-tenant with the driver's own r11 harness and contaminated it).
      Run as the last gate before the end-of-round snapshot.

Usage:
    SPARK_GRAFT_SF_DIR=/tmp/sf1x100 python bench.py > /tmp/bench_sf10.raw 2>...
    python scripts/assemble_bench_artifact.py install /tmp/bench_sf10.raw SF10 1x100
    ...
    python scripts/assemble_bench_artifact.py verify
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: the canonical scale points (memory: BENCH_SF1=/tmp/sf1x10, ...).
EXPECTED = {"SF1": "1x10", "SF3": "1x30", "SF10": "1x100"}


def _validate_line(line: str, expected_sf: str, source: str) -> dict:
    try:
        rec = json.loads(line)
    except Exception as exc:
        sys.exit(f"REFUSE: {source}: last line is not JSON ({exc})")
    problems = []
    if rec.get("metric") != "headline_queries_total":
        problems.append(f"metric={rec.get('metric')!r}")
    if not (isinstance(rec.get("value"), (int, float)) and rec["value"] > 0):
        problems.append(f"value={rec.get('value')!r}")
    if str(rec.get("sf")) != expected_sf:
        problems.append(f"sf={rec.get('sf')!r} != expected {expected_sf!r}")
    if not rec.get("queries"):
        problems.append("queries map empty/missing")
    if rec.get("errors"):
        problems.append(f"errors present: {sorted(rec['errors'])}")
    if not (rec.get("duckdb_total") or 0) > 0:
        problems.append(f"duckdb_total={rec.get('duckdb_total')!r}")
    if problems:
        sys.exit(f"REFUSE: {source}: " + "; ".join(problems))
    return rec


def install(raw_path: str, name: str, expected_sf: str) -> None:
    if name in EXPECTED and EXPECTED[name] != expected_sf:
        sys.exit(
            f"REFUSE: {name} is pinned to sf {EXPECTED[name]!r} "
            f"(got {expected_sf!r}) — wrong replica dir?"
        )
    try:
        with open(raw_path) as fh:
            lines = [ln.strip() for ln in fh if ln.strip()]
    except OSError as exc:
        sys.exit(f"REFUSE: cannot read raw output {raw_path}: {exc}")
    if not lines:
        sys.exit(f"REFUSE: raw output {raw_path} is empty — bench died at launch?")
    rec = _validate_line(lines[-1], expected_sf, raw_path)

    detail_src = os.path.join(REPO, "BENCH_DETAIL.json")
    try:
        detail = json.load(open(detail_src))
    except Exception as exc:
        sys.exit(f"REFUSE: BENCH_DETAIL.json unreadable ({exc})")
    if str(detail.get("sf")) != expected_sf:
        sys.exit(
            f"REFUSE: BENCH_DETAIL.json sf={detail.get('sf')!r} is not this "
            f"run's ({expected_sf!r}) — stale detail from an earlier bench"
        )

    # atomic install: a crash mid-write can never leave a truncated official
    # artifact; the temp lives in the repo dir so rename stays same-fs
    dst = os.path.join(REPO, f"BENCH_{name}.json")
    with open(dst + ".tmp", "w") as fh:
        fh.write(lines[-1] + "\n")
    os.replace(dst + ".tmp", dst)
    detail_dst = os.path.join(REPO, f"BENCH_{name}_DETAIL.json")
    shutil.copyfile(detail_src, detail_dst + ".tmp")
    os.replace(detail_dst + ".tmp", detail_dst)
    print(
        f"installed BENCH_{name}.json (sf={expected_sf}, total={rec['value']}s, "
        f"ratio={rec.get('ratio_vs_duckdb')}) + detail"
    )


def verify() -> None:
    failures = []
    for name, expected_sf in EXPECTED.items():
        path = os.path.join(REPO, f"BENCH_{name}.json")
        if not os.path.exists(path):
            failures.append(f"{path}: missing")
            continue
        if os.path.getsize(path) == 0:
            failures.append(f"{path}: EMPTY (the r11 failure mode)")
            continue
        line = open(path).read().strip()
        try:
            rec = _validate_line(line, expected_sf, path)
        except SystemExit as exc:
            failures.append(str(exc))
            continue
        detail_path = os.path.join(REPO, f"BENCH_{name}_DETAIL.json")
        try:
            detail = json.load(open(detail_path))
            if str(detail.get("sf")) != expected_sf:
                failures.append(f"{detail_path}: sf={detail.get('sf')!r} stale")
            elif detail.get("value") != rec.get("value"):
                failures.append(
                    f"{detail_path}: value={detail.get('value')} differs from "
                    f"line's {rec.get('value')} — detail is from another run"
                )
        except Exception as exc:
            failures.append(f"{detail_path}: unreadable ({exc})")
    # straggler check (r11 #1b): nothing bench/sweep/build-shaped may
    # outlive the chain — a leftover JVM contaminates whatever runs next
    out = subprocess.run(
        ["pgrep", "-af", "bench\\.py|sweep_oracle|build_scale_dataset|build_capped"],
        capture_output=True,
        text=True,
    ).stdout
    me = str(os.getpid())
    stragglers = [
        ln
        for ln in out.splitlines()
        if ln.split()[0] != me and "pgrep" not in ln and "assemble_bench" not in ln
    ]
    if stragglers:
        failures.append("straggler processes alive:\n  " + "\n  ".join(stragglers))
    if failures:
        print("BENCH RECORD INVALID — do not commit the snapshot:", file=sys.stderr)
        for f in failures:
            print(f"  {f}", file=sys.stderr)
        sys.exit(1)
    print("bench record valid: all scale points non-empty, parsed, sf-matched; no stragglers")


def main() -> None:
    if len(sys.argv) >= 2 and sys.argv[1] == "verify":
        verify()
    elif len(sys.argv) == 5 and sys.argv[1] == "install":
        install(sys.argv[2], sys.argv[3], sys.argv[4])
    else:
        sys.exit(__doc__)


if __name__ == "__main__":
    main()
