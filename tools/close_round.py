#!/usr/bin/env python
"""Mechanical round-close check (VERDICT r13 task #2 — the committed
artifact chain must describe the shipped tree; this slipped in r12 AND
r13).

Run as the LAST step of every round, after the final functional commit
and after committing the sweep/bench artifacts::

    python tools/close_round.py

Asserts, in order:

1. the worktree is clean except driver-owned artifacts
   (PROGRESS.jsonl — the driver appends to it continuously);
2. a SWEEP_r{N}.json exists for the CURRENT round (N = latest driver
   CORRECTNESS/BENCH round + 1), is committed, records
   ``total == len(all_queries())`` and ``bad == {}`` and stamps the
   real round number;
3. the sweep artifact's commit is AT or AFTER the last functional
   commit (no functional commit may land after the committed sweep —
   the exact r12/r13 slip);
4. bench.py's last committed BENCH artifact parses (sanity only — the
   driver re-runs bench itself).

Exit 0 = close is clean; any failure prints the actionable gap and
exits 1.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DRIVER_OWNED = {"PROGRESS.jsonl"}


def sh(*args: str) -> str:
    return subprocess.run(
        args, cwd=REPO, capture_output=True, text=True, check=True
    ).stdout


def fail(msg: str) -> None:
    print(f"CLOSE-CHECK FAIL: {msg}")
    sys.exit(1)


def main() -> None:
    from tools.sweep_correctness import _infer_round

    rnd = _infer_round()
    print(f"closing round {rnd}")

    # 1. clean worktree except driver-owned files
    dirty = [
        ln[3:]
        for ln in sh("git", "status", "--porcelain").splitlines()
        if ln[3:] not in DRIVER_OWNED
    ]
    if dirty:
        fail(f"uncommitted paths (commit or drop them first): {dirty}")

    # 2. current-round sweep artifact: committed, complete, green
    sweep_name = f"SWEEP_r{rnd}.json"
    sweep_path = os.path.join(REPO, sweep_name)
    if not os.path.exists(sweep_path):
        fail(
            f"{sweep_name} missing — run: SWEEP_OUT={sweep_name} "
            "python tools/sweep_correctness.py && git add/commit it"
        )
    with open(sweep_path) as f:
        sweep = json.load(f)
    from basis_devkit_spark.queries import all_queries

    n = len(all_queries())
    if sweep.get("total") != n:
        fail(
            f"{sweep_name} total={sweep.get('total')} but registry has "
            f"{n} queries — re-run the sweep at the final tree"
        )
    if sweep.get("bad"):
        fail(f"{sweep_name} has failures: {list(sweep['bad'])}")
    if sweep.get("round") != rnd:
        fail(
            f"{sweep_name} stamps round={sweep.get('round')}, expected "
            f"{rnd} (re-run with current tools/sweep_correctness.py)"
        )

    # 3. no functional commit after the sweep artifact's commit
    sweep_commit = sh(
        "git", "log", "-1", "--format=%H", "--", sweep_name
    ).strip()
    if not sweep_commit:
        fail(f"{sweep_name} exists but was never committed")
    later = [
        ln
        for ln in sh(
            "git",
            "log",
            f"{sweep_commit}..HEAD",
            "--name-only",
            "--format=%H",
        ).splitlines()
        if ln
        and not ln.strip().startswith(tuple("0123456789abcdef" * 0))
        and (
            ln.startswith("basis_devkit_spark/")
            or ln.startswith("tests/")
            or ln in ("bench.py", "__spark_entry__.py")
        )
    ]
    if later:
        fail(
            "functional files committed AFTER the sweep artifact "
            f"(re-run + recommit the sweep): {sorted(set(later))}"
        )

    # 4. last committed bench artifact parses
    benches = sorted(
        p for p in os.listdir(REPO) if p.startswith("BENCH_r")
    )
    if benches:
        with open(os.path.join(REPO, benches[-1])) as f:
            json.load(f)

    print(
        f"CLOSE-CHECK OK: round {rnd}, sweep {sweep['total']}/{n} green, "
        f"clean tree, sweep commit {sweep_commit[:8]} is final"
    )


if __name__ == "__main__":
    main()
