"""Regenerate every generated doc artifact in one step — the
round-end chain runs THIS before the snapshot commit (VERDICT r15
item 3: PLANS.md/QUERIES.md shipped stale two rounds running because
regeneration was a manual step).

    python tools/refresh_docs.py

Runs, in order:

1. ``tools/gen_queries_md.py``  → QUERIES.md   (registry catalog)
2. ``tools/plan_audit.py``      → PLANS.md     (executed-plan audit)
3. a COVERAGE.md freshness lint — COVERAGE.md is hand-written
   traceability prose, so it cannot be generated; the lint reports
   registered query names it never mentions so drift is at least
   VISIBLE at round end.

Each generator runs in a SUBPROCESS so its SparkSession lifecycle
stays self-contained. Exits nonzero if any generator fails.
"""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def main() -> int:
    for script in ("gen_queries_md.py", "plan_audit.py"):
        print(f"== {script}", flush=True)
        r = subprocess.run(
            [sys.executable, str(REPO / "tools" / script)], cwd=REPO
        )
        if r.returncode != 0:
            print(f"{script} FAILED rc={r.returncode}")
            return r.returncode

    sys.path.insert(0, str(REPO))
    from crypto_etl_airflow_spark.plans.registry import all_specs

    coverage = (REPO / "COVERAGE.md").read_text()
    missing = sorted(n for n in all_specs() if n not in coverage)
    print(
        f"== COVERAGE.md lint: {len(all_specs()) - len(missing)}/"
        f"{len(all_specs())} registered queries mentioned"
    )
    if missing:
        print("   not mentioned (hand-update COVERAGE.md if these are"
              " new operators):")
        for n in missing:
            print(f"   - {n}")
    print("refresh_docs: OK")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
