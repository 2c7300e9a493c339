"""Idempotent catalog DDL for the parquet warehouse.

Re-expresses the reference's create-table task (reference
dags/crypto-etl-pipeline-psql.py:154-165): every pipeline start runs
``CREATE TABLE IF NOT EXISTS`` so the SQL read surface exists before
the first load and re-runs are no-ops. Spark form: EXTERNAL tables —
``CREATE TABLE IF NOT EXISTS <db>.<name> USING parquet LOCATION ...``
— registered in the session catalog. With the default in-memory
catalog the registration lives for the session (exactly like the
reference's DDL task, which re-runs on every DAG run); pointing
``spark.sql.catalogImplementation`` at a shared Hive metastore makes
the same call durable across sessions and clusters with zero code
change.

Unlike temp views, catalog tables survive ``spark.catalog.
clearCache``/view drops, are visible to every downstream ``spark.sql``
or ``spark.table`` call, and carry the location so Catalyst plans
native parquet scans with pushdown/pruning against them.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from .tables import TABLES

DEFAULT_DATABASE = "warehouse"


def _q(ident: str) -> str:
    """Backtick-quote a catalog identifier."""
    return "`" + ident.replace("`", "``") + "`"


def ensure_database(spark: SparkSession, db: str = DEFAULT_DATABASE) -> None:
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {_q(db)}")


def ensure_table(
    spark: SparkSession,
    name: str,
    location: str,
    db: str = DEFAULT_DATABASE,
) -> bool:
    """Register the parquet directory at ``location`` as external
    table ``db.name`` if absent (schema inferred from the files).
    Returns True when this call created the entry, False when it
    already existed — the reference DDL task's exact semantics."""
    ensure_database(spark, db)
    qualified = f"{_q(db)}.{_q(name)}"
    existed = spark.catalog.tableExists(f"{db}.{name}")
    spark.sql(
        f"CREATE TABLE IF NOT EXISTS {qualified} USING parquet "
        f"LOCATION '{location}'"
    )
    return not existed


def ensure_warehouse(
    spark: SparkSession,
    sf_dir: str,
    names: tuple[str, ...] = TABLES,
    db: str = DEFAULT_DATABASE,
) -> dict[str, bool]:
    """Idempotently register every warehouse table under ``db``;
    returns {name: created_this_call}. Safe to run at every pipeline
    start — re-runs are catalog no-ops, matching the reference's
    hourly CREATE TABLE IF NOT EXISTS task."""
    return {
        name: ensure_table(spark, name, f"{sf_dir}/{name}.parquet", db)
        for name in names
    }
