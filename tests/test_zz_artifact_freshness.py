"""Shipped artifact-freshness gate (VERDICT r09 item 1 — the same item
was r8 verdict #8; two rounds running the self-parity artifacts went
stale at HEAD because regeneration was a chore, not a gate).

This test makes the round's final `pytest tests/` — which the round
driver and the judge both run — FAIL while any self-parity/bench
artifact's recorded git HEAD predates a commit touching the package.
It skips only when an artifact is absent (fresh clone) or when git
history is unavailable.  Named test_zz_* so it runs last under ``-x``:
mid-round development keeps the rest of the suite usable, and the red
tail is the mechanical reminder to regenerate before the round closes:

    python -m oco3_data_transformer_spark.oracle_check /root/testdata/sf0.01
    python -m oco3_data_transformer_spark.oracle_check .bench_data/sf1 \
        --out CORRECTNESS_SELF_SF1.json
    python -m oco3_data_transformer_spark.oracle_check .bench_data/sf10 \
        --only @scale100 --out CORRECTNESS_SELF_SF10.json
    python scripts/bench_100x.py
"""

from __future__ import annotations

import json
import os
import subprocess

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ARTIFACTS = [
    "CORRECTNESS_SELF.json",
    "CORRECTNESS_SELF_SF1.json",
    "CORRECTNESS_SELF_SF10.json",
    "BENCH_SF10.json",
]


@pytest.mark.parametrize("name", ARTIFACTS)
def test_artifact_is_current_at_head(name):
    path = os.path.join(ROOT, name)
    if not os.path.exists(path):
        pytest.skip(f"{name} absent — nothing to be stale")
    with open(path) as fh:
        head = json.load(fh).get("head")
    assert head, f"{name} records no generation HEAD (predates stamping)"
    r = subprocess.run(
        ["git", "log", "--oneline", f"{head}..HEAD", "--",
         "oco3_data_transformer_spark/"],
        cwd=ROOT, capture_output=True, text=True,
    )
    if r.returncode != 0:
        pytest.skip(f"git history unavailable: {r.stderr.strip()[:120]}")
    commits = [ln for ln in r.stdout.strip().splitlines() if ln]
    assert not commits, (
        f"{name} was generated at {head}, which predates "
        f"{len(commits)} package commit(s):\n  " + "\n  ".join(commits[:8])
        + "\nregenerate it at HEAD (commands in this file's docstring)"
    )
