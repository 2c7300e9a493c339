"""Regenerate QUERIES.md — the declared-surface catalog.

    python tools/gen_queries_md.py
"""

from __future__ import annotations

import sys
from collections import defaultdict
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from crypto_etl_airflow_spark.plans.registry import all_specs  # noqa: E402

HEADER = """# QUERIES — the declared surface

Auto-generated from the query registry (`tools/gen_queries_md.py`);
one row per `__spark_entry__.queries()` entry. "oracle" = the driver
hash-compares the result against DuckDB SQL at sf0.01; "rows" = the
query executes and row counts are recorded (approximate/stubbed
operators — their accuracy is asserted against exact baselines in
tests instead).
"""


def main() -> None:
    specs = all_specs()
    by_tag: dict[str, list] = defaultdict(list)
    for s in specs.values():
        by_tag[s.tags[0] if s.tags else "misc"].append(s)

    lines = [HEADER]
    lines.append(f"{len(specs)} queries total, "
                 f"{sum(1 for s in specs.values() if s.oracle)} oracle-checked.\n")
    for tag in sorted(by_tag):
        lines.append(f"\n## {tag}\n")
        lines.append("| query | check | bench | summary |")
        lines.append("|---|---|---|---|")
        for s in sorted(by_tag[tag], key=lambda x: x.name):
            doc = " ".join((s.doc or "").split())
            if len(doc) > 140:
                doc = doc[:137] + "..."
            lines.append(
                f"| `{s.name}` | {'oracle' if s.oracle else 'rows'} "
                f"| {'✓' if s.bench else ''} | {doc} |"
            )
    (REPO / "QUERIES.md").write_text("\n".join(lines) + "\n")
    print(f"wrote QUERIES.md: {len(specs)} queries")


if __name__ == "__main__":
    main()
