"""Catalog DDL: idempotent CREATE TABLE IF NOT EXISTS over the
parquet warehouse (reference dags/crypto-etl-pipeline-psql.py:154-165
parity)."""

from crypto_etl_airflow_spark.sources.catalog import (
    ensure_table,
    ensure_warehouse,
)

SF_DIR = "/root/testdata/sf0.001"


def test_ensure_warehouse_registers_and_is_idempotent(spark):
    first = ensure_warehouse(spark, SF_DIR, names=("region", "nation"), db="wh_t1")
    assert first == {"region": True, "nation": True}
    # the catalog table is a real SQL surface: qualified reads work
    assert spark.table("wh_t1.region").count() == 5
    assert spark.sql("SELECT count(*) AS n FROM wh_t1.nation").first().n == 25
    # re-run: no-op, nothing re-created, still readable
    again = ensure_warehouse(spark, SF_DIR, names=("region", "nation"), db="wh_t1")
    assert again == {"region": False, "nation": False}
    assert spark.table("wh_t1.region").count() == 5


def test_ensure_table_reports_creation_once(spark):
    assert ensure_table(spark, "orders", f"{SF_DIR}/orders.parquet", db="wh_t2")
    assert not ensure_table(spark, "orders", f"{SF_DIR}/orders.parquet", db="wh_t2")
    assert spark.catalog.tableExists("wh_t2.orders")
