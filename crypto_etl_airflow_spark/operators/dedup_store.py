"""Incremental dedup against a PERSISTED MinHash signature store.

The batch-recompute dedup family (operators/dedup.py) signatures the
whole corpus every run — right for a one-shot sweep, wrong for the
steady state of a training-data pipeline at 100 TB: an hourly ingest
of 10 GB against a 100 TB corpus must not re-shingle 100 TB. The
standard production shape (the same pattern the reference's
idempotent upsert applies to keys, lifted to *near*-duplicate
identity) is:

1. signature the corpus ONCE into a store: ``(doc_id, mh_0..mh_k-1)``
   parquet — ~256 bytes/doc, ~10⁻⁴ of corpus bytes;
2. per ingest batch: signature the BATCH only, band both sides, and
   join the batch's band keys against the store's — the batch side
   is small, so the join broadcasts it against the store scan; no
   store×store pairs are ever generated;
3. verify candidates by SIGNATURE AGREEMENT (the estimate path — the
   store needs no text at all) or by exact Jaccard against the
   corpus text (the audit path);
4. append the batch's signatures to the store (idempotent per id via
   the same anti-join discipline as ``upsert_append``).

The signature-agreement estimator is unbiased for true Jaccard
(P[min-hash collision] = J for each permutation), with granularity
1/num_hashes; its threshold therefore reads as "at least
``ceil(threshold·k)`` of k permutations agree".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .dedup import (
    _reuse,
    band_bucket_rows,
    minhash_signatures,
    verify_pairs_exact_jaccard,
)


def write_minhash_store(
    docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 32,
    portable: bool = False,
) -> int:
    """Signature ``docs`` and APPEND the signatures to the parquet
    store at ``path``, idempotently per id (ids already present are
    skipped — the ``upsert_append`` anti-join discipline, so ingest
    retries and overlapping batches cannot double-register a doc).
    Creates the store if absent. Returns rows appended."""
    from .upsert import upsert_append

    params = {"n": n, "num_hashes": num_hashes, "portable": portable}
    _validate_store_params(path, params)
    sigs = minhash_signatures(docs, id_col, text_col, n, num_hashes, portable)
    written = upsert_append(
        docs.sparkSession, sigs, path, keys=[id_col], allow_empty=True
    )
    _record_store_params(path, params)
    return written


def _sidecar(path: str) -> str:
    import os

    # underscore-prefixed so Spark's parquet reader ignores it
    return os.path.join(path, "_minhash_store_params.json")


def _validate_store_params(path: str, params: dict) -> None:
    """Refuse to mix hash families in one store: signatures built with
    a different (n, num_hashes, portable) are schema-compatible with
    an existing store but NEVER agree with it, so an append would
    silently turn agreement scores into noise."""
    import json
    import os

    if os.path.exists(_sidecar(path)):
        with open(_sidecar(path)) as f:
            existing = json.load(f)
        if existing != params:
            raise ValueError(
                f"minhash store {path} was built with {existing}; "
                f"refusing to append signatures built with {params}"
            )


def _record_store_params(path: str, params: dict) -> None:
    # written AFTER the first append (the store dir must not exist
    # before upsert_append creates it — an empty dir with only the
    # sidecar would read as an existing-but-parquet-less table)
    import json
    import os

    if os.path.isdir(path) and not os.path.exists(_sidecar(path)):
        with open(_sidecar(path), "w") as f:
            json.dump(params, f)


def read_minhash_store(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def incremental_minhash_pairs(
    new_docs: DataFrame,
    store: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
    num_hashes: int = 32,
    bands: int = 8,
    portable: bool = False,
    verify: str = "estimate",
    corpus_text: DataFrame | None = None,
) -> DataFrame:
    """Near-dup pairs INVOLVING the new batch: batch×store and
    batch×batch — never store×store (that work was paid when the
    store was built). Returns ``(id_a, id_b, score)`` with
    ``id_a < id_b``; ``score`` is the signature-agreement Jaccard
    estimate (``verify="estimate"``, store-only, no text) or exact
    Jaccard (``verify="exact"``, requires ``corpus_text`` covering
    both sides' documents). Ids must be disjoint between batch and
    store (enforce upstream; ``write_minhash_store`` is idempotent
    per id).

    Scale shape: the batch's band keys are the SMALL side of the one
    join (AQE broadcasts them); the store scan reads only its
    signature columns. Candidate volume ∝ bucket collisions with the
    batch — independent of |store|² and of corpus text size.
    """
    if verify not in ("estimate", "exact"):
        raise ValueError(f"verify must be 'estimate' or 'exact': {verify!r}")
    if verify == "exact" and corpus_text is None:
        raise ValueError("verify='exact' requires corpus_text")

    new_sigs = _reuse(
        minhash_signatures(new_docs, id_col, text_col, n, num_hashes, portable)
    )
    # persisted: the union feeds the band rows AND both sides of the
    # agreement scoring — without reuse the signature store parquet
    # would be scanned three times per ingest batch
    all_sigs = _reuse(store.select(*new_sigs.columns).unionByName(new_sigs))

    all_buckets = band_bucket_rows(all_sigs, id_col, num_hashes, bands, portable)
    new_buckets = band_bucket_rows(new_sigs, id_col, num_hashes, bands, portable)
    key_names = [c for c in new_buckets.columns if c.startswith("k_")]
    left = all_buckets.withColumnRenamed(id_col, "__ida")
    right = new_buckets.withColumnRenamed(id_col, "__idb")
    cands = (
        left.join(right, ["band", *key_names])
        .filter(F.col("__ida") != F.col("__idb"))
        .select(
            F.least("__ida", "__idb").alias("id_a"),
            F.greatest("__ida", "__idb").alias("id_b"),
        )
        .distinct()
    )

    if verify == "exact":
        return verify_pairs_exact_jaccard(
            corpus_text, cands, id_col, text_col, n, threshold
        ).withColumnRenamed("jaccard", "score")  # one contract, both paths

    sig_cols = [f"mh_{i}" for i in range(num_hashes)]
    sa = all_sigs.select(
        F.col(id_col).alias("id_a"),
        *[F.col(c).alias(f"a_{c}") for c in sig_cols],
    )
    sb = all_sigs.select(
        F.col(id_col).alias("id_b"),
        *[F.col(c).alias(f"b_{c}") for c in sig_cols],
    )
    agree = sum(
        F.when(F.col(f"a_{c}") == F.col(f"b_{c}"), 1).otherwise(0)
        for c in sig_cols
    )
    est = agree.cast("double") / F.lit(num_hashes)
    return (
        cands.join(sa, "id_a")
        .join(sb, "id_b")
        .select("id_a", "id_b", F.round(est, 6).alias("score"))
        .filter(F.col("score") >= threshold)
    )
