#!/usr/bin/env python
"""Artifact-freshness check (VERDICT r07 item 4).

The self-parity artifacts (CORRECTNESS_SELF*.json) and the 100x bench
artifact (BENCH_SF10.json) each record the git HEAD they were generated
at.  This script fails when any commit touching the package
(oco3_data_transformer_spark/) postdates an artifact's recorded HEAD —
the r7 failure mode: CORRECTNESS_SELF{,_SF1}.json were regenerated four
commits before a plan-changing revert, so they silently described a
superseded plan.

Run at end-of-round after regenerating artifacts, and from the verify
skill.  Exit 0 = every artifact current; exit 1 lists the stale ones.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ARTIFACTS = [
    "CORRECTNESS_SELF.json",
    "CORRECTNESS_SELF_SF1.json",
    "CORRECTNESS_SELF_SF10.json",
    "BENCH_SF10.json",
]


def _code_commits_since(head: str) -> list[str]:
    r = subprocess.run(
        ["git", "log", "--oneline", f"{head}..HEAD", "--",
         "oco3_data_transformer_spark/"],
        cwd=ROOT, capture_output=True, text=True,
    )
    if r.returncode != 0:
        return [f"(git log failed: {r.stderr.strip()})"]
    return [ln for ln in r.stdout.strip().splitlines() if ln]


def main() -> int:
    stale: dict[str, list[str]] = {}
    for name in ARTIFACTS:
        path = os.path.join(ROOT, name)
        if not os.path.exists(path):
            continue
        with open(path) as fh:
            head = json.load(fh).get("head")
        if not head:
            stale[name] = ["(no recorded HEAD — predates provenance stamping)"]
            continue
        commits = _code_commits_since(head)
        if commits:
            stale[name] = commits
    if stale:
        for name, commits in stale.items():
            print(f"STALE {name}:")
            for c in commits[:10]:
                print(f"    {c}")
        print(f"\n{len(stale)} stale artifact(s) — regenerate at HEAD "
              "(oracle_check --out / scripts/bench_100x.py)")
        return 1
    print("all artifacts current")
    return 0


if __name__ == "__main__":
    sys.exit(main())
