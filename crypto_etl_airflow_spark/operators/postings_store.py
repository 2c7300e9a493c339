"""Persisted BM25 postings store — retrieval's steady-state form.

The batch BM25 query (plans/retrieval.py::similarity_bm25_topk)
re-tokenizes the whole corpus per query — right for a one-shot sweep,
wrong for a search/curation workload at 100 TB: the postings table
``(doc_id, term, tf)`` and the document-length table ``(doc_id, dl)``
are the things you compute ONCE per ingest and query many times
(every search engine's inverted-index split; the store analogue of
operators/dedup_store.py for lexical retrieval).

Layout: ``{path}/postings`` + ``{path}/lengths`` parquet, plus a
tokenizer sidecar (a store tokenized one way must not be extended
under another — same regime guard as the signature stores).

Ingest discipline (two tables, one commit point): ``lengths`` is the
membership record and is written LAST — the idempotence anti-join
keys on it, so a retried batch appends nothing. The crash window
(postings appended, lengths not yet) leaves orphan postings rows;
they are invisible at query time because scoring joins postings to
``lengths`` on doc_id (needed anyway for the length normalizer), and
the retry's re-appended rows are EXACT copies of the orphans, which
the query path collapses with one ``dropDuplicates`` AFTER the
query-term filter (a few rows, not a corpus-wide shuffle).

Query shape at 100 TB: the query-term predicate is a scan filter on
the postings parquet (``term IN (...)`` reaches PushedFilters — only
matching row groups read, no tokenization at query time); per-term
document frequencies and the (N, avgdl) scalar broadcast; the only
doc-keyed join carries matching postings; the top-k is
TakeOrderedAndProject."""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .dedup import _reuse
from .dedup_store import _ensure_store_exists
from .upsert import _lineage_barrier

_PARAMS = {"tokenizer": "ws_lower", "version": 1}
_SIDECAR = "_postings_store_params.json"


def _tokens(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    # the ws_lower tokenizer: identical to the batch BM25 and the
    # DuckDB oracle's string_split_regex(lower(text), '\s+')
    return docs.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("term"),
    ).filter(F.col("term") != "")


def _check_sidecar(path: str) -> None:
    sc = os.path.join(path, _SIDECAR)
    if os.path.exists(sc):
        with open(sc) as f:
            existing = json.load(f)
        if existing != _PARAMS:
            raise ValueError(
                f"postings store {path} was built with {existing}; "
                f"refusing to extend with {_PARAMS}"
            )


def write_postings_store(
    docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> int:
    """Tokenize and register a batch, idempotently per doc id (the
    anti-join keys on the ``lengths`` membership record — see module
    docstring for the two-table commit discipline). Documents with no
    tokens still get a ``dl = 0`` membership row, so they are never
    re-processed. Returns documents registered."""
    spark = docs.sparkSession
    _check_sidecar(path)
    os.makedirs(path, exist_ok=True)
    lengths_path = f"{path}/lengths"
    if os.path.isdir(lengths_path):
        existing = read_doc_lengths(spark, path).select(id_col)
        fresh = docs.join(existing, id_col, "left_anti")
    else:
        fresh = docs
    fresh = _lineage_barrier(spark, fresh, None)
    n = fresh.count()
    if n:
        tok = _reuse(_tokens(fresh, id_col, text_col))
        postings = tok.groupBy(id_col, "term").agg(
            F.count("*").cast("long").alias("tf")
        )
        postings.write.mode("append").parquet(f"{path}/postings")
        lengths = (
            fresh.select(id_col)
            .join(
                tok.groupBy(id_col).agg(F.count("*").cast("long").alias("dl")),
                id_col,
                "left",
            )
            .select(id_col, F.coalesce("dl", F.lit(0)).cast("long").alias("dl"))
        )
        lengths.write.mode("append").parquet(lengths_path)  # the commit
    _ensure_store_exists(
        docs.select(F.col(id_col), F.lit("").alias("term"), F.lit(0).cast("long").alias("tf")),
        f"{path}/postings",
    )
    _ensure_store_exists(
        docs.select(F.col(id_col), F.lit(0).cast("long").alias("dl")),
        lengths_path,
    )
    with open(os.path.join(path, _SIDECAR), "w") as f:
        json.dump(_PARAMS, f)
    return n


def read_postings_store(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(f"{path}/postings")


def read_doc_lengths(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(f"{path}/lengths")


def bm25_topk_indexed(
    spark: SparkSession,
    path: str,
    terms: tuple[str, ...],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
) -> DataFrame:
    """Okapi BM25 top-k against the persisted store — no tokenization
    at query time; same output contract as the batch query:
    ``(doc_id, bm25, n_hit_terms)`` ordered by (bm25 DESC, doc_id).
    See the module docstring for the plan shape."""
    qtf = (
        read_postings_store(spark, path)
        .filter(F.col("term").isin(*terms))
        # collapse exact-copy rows from an interrupted-retry append;
        # runs on the filtered slice only
        .dropDuplicates([id_col, "term"])
    )
    dl = read_doc_lengths(spark, path).filter(F.col("dl") > 0)
    stats = dl.agg(F.avg("dl").alias("avgdl"), F.count("*").alias("n"))
    dfreq = qtf.groupBy("term").agg(
        F.count_distinct(id_col).alias("dfq")
    )
    scored = (
        qtf.join(F.broadcast(dfreq), "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
        .select(
            id_col,
            (
                F.log(
                    (F.col("n") - F.col("dfq") + F.lit(0.5))
                    / (F.col("dfq") + F.lit(0.5))
                    + F.lit(1.0)
                )
                * (F.col("tf") * F.lit(k1 + 1))
                / (
                    F.col("tf")
                    + F.lit(k1)
                    * (F.lit(1 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
                )
            ).alias("sc"),
        )
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.round(F.sum("sc"), 6).alias("bm25"),
            F.count("*").cast("int").alias("n_hit_terms"),
        )
        .orderBy(F.desc("bm25"), F.asc(id_col))
        .limit(k)
    )
