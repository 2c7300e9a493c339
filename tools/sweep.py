"""Full-surface correctness sweep — the local mirror of the driver.

Runs EVERY registered query against its DuckDB oracle at sf0.01 (or
$SPARK_GRAFT_SWEEP_SF_DIR), comparing row count, column names, and
values with columns sorted BY NAME — exactly the driver's
order-insensitive hash semantics. Run from any directory:

    python tools/sweep.py

Exits nonzero on any mismatch; prints one line per query.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

_REPO_ROOT = str(Path(__file__).resolve().parent.parent)
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)


def main() -> int:
    sf_dir = os.environ.get(
        "SPARK_GRAFT_SWEEP_SF_DIR", "/root/testdata/sf0.01"
    )
    import duckdb
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    sys.path.insert(0, _REPO_ROOT)
    import __spark_entry__ as entry_mod

    qs, osql = entry_mod.queries(), entry_mod.oracle_sql()
    if len(sys.argv) > 1:  # sweep only the named queries (fast iteration)
        only = set(sys.argv[1:])
        unknown = only - set(qs)
        if unknown:
            print(f"unknown queries: {sorted(unknown)}")
            return 1
        qs = {n: f for n, f in qs.items() if n in only}
    con = duckdb.connect()
    from crypto_etl_airflow_spark.sources.tables import TABLES

    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    from crypto_etl_airflow_spark.operators.dedup import release_reuse_caches

    # Queries INTENTIONALLY registered without an oracle (semantics a
    # DuckDB query cannot recompute). Anything else missing an oracle
    # is a regression — an oracle silently lost to a refactor would
    # otherwise downgrade to the weak rows-only check unnoticed.
    rows_only_ok: set[str] = set()  # every registered query carries an oracle

    fails: list[str] = []
    for name, fn in qs.items():
        try:
            sdf = fn(spark, sf_dir)
            cols = sorted(sdf.columns)
            srows = sorted(
                tuple(str(r[c]) for c in cols) for r in sdf.collect()
            )
            if name not in osql:  # rows-only query (driver's weak check)
                expected = name in rows_only_ok
                print(
                    name,
                    "ROWS-ONLY" if expected else "ROWS-ONLY-UNEXPECTED",
                    len(srows),
                    flush=True,
                )
                if not expected:
                    fails.append(name)
                release_reuse_caches()
                continue
            cur = con.execute(osql[name])
            dcols = [d[0] for d in cur.description]
            order = sorted(range(len(dcols)), key=lambda i: dcols[i])
            drows = sorted(
                tuple(str(r[i]) for i in order) for r in cur.fetchall()
            )
            ok = srows == drows and sorted(dcols) == cols
            print(name, "OK" if ok else "MISMATCH", len(srows), flush=True)
            if not ok:
                fails.append(name)
        except Exception as ex:  # noqa: BLE001 — report and continue
            print(name, "ERROR", str(ex)[:200], flush=True)
            fails.append(name)
        release_reuse_caches()  # dedup reuse persists are per-query

    print(f"SWEEP DONE: {len(qs) - len(fails)}/{len(qs)} green; failures: {fails}")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
