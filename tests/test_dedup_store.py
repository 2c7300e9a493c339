"""Incremental MinHash signature store (operators/dedup_store.py):
roundtrip + idempotent accretion, and equivalence of the incremental
batch join with the full-corpus recompute restricted to
batch-involving pairs."""

import pytest

from crypto_etl_airflow_spark.operators import dedup_store
from crypto_etl_airflow_spark.operators.dedup import minhash_lsh_pairs

DOCS = [
    # family A: three near-identical long docs
    (1, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2, "the quick brown fox jumps over the lazy dog near the river bank tonight"),
    (3, "the quick brown fox jumps over the lazy dog near the river bank"),
    # unrelated docs
    (4, "completely different content about oceanic thermal circulation patterns"),
    (5, "yet another unrelated document describing alpine glacier dynamics"),
    # family B: identical pair split across store/batch
    (6, "training data pipelines deduplicate documents before tokenization runs"),
    (8, "training data pipelines deduplicate documents before tokenization runs"),
]


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_store_write_is_idempotent_per_id(spark, tmp_path):
    path = str(tmp_path / "sigs")
    docs = _df(spark, DOCS)
    n1 = dedup_store.write_minhash_store(docs, path)
    assert n1 == len(DOCS)
    # re-registering the same docs appends nothing (retry-safe)
    assert dedup_store.write_minhash_store(docs, path) == 0
    store = dedup_store.read_minhash_store(spark, path)
    assert store.count() == len(DOCS)
    assert {c for c in store.columns if c.startswith("mh_")} == {
        f"mh_{i}" for i in range(32)
    }


def test_incremental_exact_matches_full_recompute(spark, tmp_path):
    """Incremental(batch vs store, verify=exact) == full-corpus
    minhash_lsh_pairs restricted to pairs involving the batch."""
    path = str(tmp_path / "sigs")
    docs = _df(spark, DOCS)
    batch_ids = {2, 8}
    store_docs = docs.filter(~docs.doc_id.isin(*batch_ids))
    batch = docs.filter(docs.doc_id.isin(*batch_ids))
    dedup_store.write_minhash_store(store_docs, path)
    store = dedup_store.read_minhash_store(spark, path)

    got = {
        (r.id_a, r.id_b, r.score)  # exact verify shares the estimate
        for r in dedup_store.incremental_minhash_pairs(  # path's 'score'
            batch, store, threshold=0.5, verify="exact", corpus_text=docs
        ).collect()
    }
    full = {
        (r.id_a, r.id_b, r.jaccard)
        for r in minhash_lsh_pairs(
            docs, "doc_id", "text", threshold=0.5
        ).collect()
    }
    want = {p for p in full if p[0] in batch_ids or p[1] in batch_ids}
    assert got == want
    assert got, "fixture must produce at least one batch-involving pair"
    # and no store×store pair leaks through
    assert all(p[0] in batch_ids or p[1] in batch_ids for p in got)


def test_incremental_estimate_scores_identical_and_disjoint(spark, tmp_path):
    path = str(tmp_path / "sigs")
    docs = _df(spark, DOCS)
    store_docs = docs.filter(docs.doc_id != 8)
    batch = docs.filter(docs.doc_id == 8)  # exact copy of doc 6
    dedup_store.write_minhash_store(store_docs, path)
    store = dedup_store.read_minhash_store(spark, path)
    got = {
        (r.id_a, r.id_b): r.score
        for r in dedup_store.incremental_minhash_pairs(
            batch, store, threshold=0.5, verify="estimate"
        ).collect()
    }
    assert got[(6, 8)] == 1.0  # identical doc: all 32 permutations agree
    # disjoint-content docs never reach the threshold
    assert all(a == 6 or b == 6 for (a, b) in got)


def test_incremental_validates_arguments(spark, tmp_path):
    docs = _df(spark, DOCS[:2])
    with pytest.raises(ValueError, match="estimate.*exact|exact.*estimate"):
        dedup_store.incremental_minhash_pairs(
            docs, docs, verify="bogus"
        )
    with pytest.raises(ValueError, match="corpus_text"):
        dedup_store.incremental_minhash_pairs(
            docs, docs, verify="exact"
        )


def test_store_refuses_mixed_hash_families(spark, tmp_path):
    import pytest

    from crypto_etl_airflow_spark.operators import dedup_store

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "epsilon zeta eta theta")],
        "doc_id long, text string",
    )
    path = str(tmp_path / "sigs")
    dedup_store.write_minhash_store(docs, path, portable=True)
    with pytest.raises(ValueError, match="refusing to append"):
        dedup_store.write_minhash_store(docs, path, portable=False)
    # same params append stays idempotent and silent
    dedup_store.write_minhash_store(docs, path, portable=True)


def test_exact_verify_uses_score_column(spark, tmp_path):
    from pyspark.sql import functions as F

    from crypto_etl_airflow_spark.operators import dedup_store

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog again"),
            (2, "the quick brown fox jumps over the lazy dog again"),
        ],
        "doc_id long, text string",
    )
    path = str(tmp_path / "sigs")
    dedup_store.write_minhash_store(docs.filter(F.col("doc_id") == 1), path)
    store = dedup_store.read_minhash_store(spark, path)
    out = dedup_store.incremental_minhash_pairs(
        docs.filter(F.col("doc_id") == 2), store,
        threshold=0.8, verify="exact", corpus_text=docs,
    )
    assert out.columns == ["id_a", "id_b", "score"]  # same contract as estimate
    assert out.first().score == 1.0
