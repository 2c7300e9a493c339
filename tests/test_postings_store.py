"""Persisted BM25 postings store (operators/postings_store.py):
idempotent ingest, indexed == batch equality, retry-orphan collapse,
empty-doc membership, term-filter pushdown, tokenizer regime guard."""

import glob
import shutil

import pytest
from pyspark.sql import functions as F

from crypto_etl_airflow_spark.operators import postings_store as ps

DOCS = [
    (1, "spark streams merge window join stream data"),
    (2, "window functions rank rows over a window"),
    (3, "join join join merge"),
    (4, "unrelated prose about glaciers"),
    (5, ""),  # tokenless doc: membership row, never scored
]
TERMS = ("join", "merge", "window", "stream")


def _docs(spark, rows=DOCS):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _batch_bm25(spark, docs, k=10):
    """The certified batch dataflow, as the reference."""
    from crypto_etl_airflow_spark.plans.retrieval import _bm25_agg

    return (
        _bm25_agg(spark, docs)
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(k)
    )


def test_write_is_idempotent_and_empty_docs_are_members(spark, tmp_path):
    path = str(tmp_path / "idx")
    docs = _docs(spark)
    assert ps.write_postings_store(docs, path) == len(DOCS)
    assert ps.write_postings_store(docs, path) == 0  # retry-safe
    lengths = {r.doc_id: r.dl for r in ps.read_doc_lengths(spark, path).collect()}
    assert lengths[5] == 0  # registered, dl=0
    assert lengths[3] == 4


def test_indexed_equals_batch_operator(spark, tmp_path):
    path = str(tmp_path / "idx")
    docs = _docs(spark)
    ps.write_postings_store(docs.filter(F.col("doc_id") % 2 == 0), path)
    ps.write_postings_store(docs.filter(F.col("doc_id") % 2 == 1), path)
    got = [tuple(r) for r in ps.bm25_topk_indexed(spark, path, TERMS, k=10).collect()]
    want = [tuple(r) for r in _batch_bm25(spark, docs).collect()]
    assert got == want and got


def test_orphan_postings_and_retry_copies_are_harmless(spark, tmp_path):
    """Simulate the crash window: duplicate every postings file (as if
    a crashed append were retried) — query answers must not change,
    and tf must not double."""
    path = str(tmp_path / "idx")
    docs = _docs(spark)
    ps.write_postings_store(docs, path)
    before = [tuple(r) for r in ps.bm25_topk_indexed(spark, path, TERMS).collect()]
    for f in glob.glob(f"{path}/postings/part-*.parquet"):
        shutil.copy(f, f.replace("part-", "copy-"))
    after = [tuple(r) for r in ps.bm25_topk_indexed(spark, path, TERMS).collect()]
    assert after == before


def test_term_filter_reaches_parquet_scan(spark, tmp_path):
    path = str(tmp_path / "idx")
    ps.write_postings_store(_docs(spark), path)
    df = ps.bm25_topk_indexed(spark, path, TERMS)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "In(term" in plan


def test_tokenizer_regime_guard(spark, tmp_path):
    path = str(tmp_path / "idx")
    ps.write_postings_store(_docs(spark), path)
    import json

    sc = f"{path}/{ps._SIDECAR}"
    with open(sc, "w") as f:
        json.dump({"tokenizer": "bpe", "version": 1}, f)
    with pytest.raises(ValueError, match="refusing"):
        ps.write_postings_store(_docs(spark), path)


def test_empty_first_write_creates_queryable_store(spark, tmp_path):
    path = str(tmp_path / "idx")
    empty = _docs(spark).filter(F.col("doc_id") < 0)
    assert ps.write_postings_store(empty, path) == 0
    assert ps.bm25_topk_indexed(spark, path, TERMS).count() == 0
