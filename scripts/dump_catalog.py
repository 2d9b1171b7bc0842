"""Regenerate CATALOG.md: the full driver-catalog listing — query id, what
it covers (from each query's doc string), and whether it is hash-checked
against a DuckDB oracle or rows-only.

    python scripts/dump_catalog.py
"""

from __future__ import annotations

import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)


def main() -> int:
    from oco3_data_transformer_spark.catalog import REGISTRY

    n_oracle = sum(1 for q in REGISTRY.values() if q.sql is not None)
    lines = [
        "# CATALOG — driver query inventory",
        "",
        f"{len(REGISTRY)} queries; {n_oracle} hash-checked against DuckDB oracle SQL, "
        f"{len(REGISTRY) - n_oracle} rows-only (non-SQL-expressible kernels, unit-golden-tested).",
        "Regenerate with `python scripts/dump_catalog.py`.",
        "",
        "| query | check | covers |",
        "|---|---|---|",
    ]
    for name, qd in REGISTRY.items():
        check = "oracle" if qd.sql is not None else "rows-only"
        doc = " ".join((qd.doc or "").split())
        lines.append(f"| {name} | {check} | {doc} |")
    out = os.path.join(REPO_ROOT, "CATALOG.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote CATALOG.md ({len(REGISTRY)} queries, {n_oracle} oracled)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
