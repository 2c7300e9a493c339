"""Document fingerprinting via winnowing (rolling k-gram hashes).

The standard local-fingerprinting scheme for copy/plagiarism
detection (Schleimer, Wilkerson, Aiken — "Winnowing: Local Algorithms
for Document Fingerprinting", SIGMOD 2003; the MOSS technique):

1. normalize text (lower-case, collapse whitespace);
2. hash every character k-gram (positions 1..n−k+1);
3. slide a window of w consecutive gram hashes; select the MINIMUM
   hash of each window;
4. the document's fingerprint set is the distinct selected hashes.

Guarantee: any substring match of length ≥ w+k−1 between two
documents produces at least one shared fingerprint, while only
~2/(w+1) of all gram hashes are kept — a detection-preserving
sub-sample (the property exact shingle overlap has, at a fraction of
the index size). Complements the dedup family: n-gram Jaccard and
MinHash measure WHOLE-document similarity; winnowing finds documents
that share a COPIED PASSAGE even when globally dissimilar.

Spark realization: explode gram positions to rows (one md5 per gram,
computed once), then ONE per-document window pass (`min over
(partitionBy doc ORDER BY pos ROWS CURRENT..w−1 FOLLOWING)`) selects
the winnowed minima — the shuffle is keyed on the document id, window
state is O(w). An earlier all-array form (per-window
``array_min(slice(hashes, j, w))``) was abandoned: Catalyst's project
collapse inlines the hash-array expression into EVERY window term,
re-hashing the whole document per window (O(n²) md5 and a codegen
blowup). The hash is the md5-portable 32-bit family
(operators/dedup.py::portable_hash32) so a DuckDB oracle recomputes
every fingerprint value-for-value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .dedup import _reuse, portable_hash32


def winnow_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    w: int = 4,
) -> DataFrame:
    """One row per (document, distinct winnowed fingerprint):
    ``(id_col, fp)``. Documents shorter than k+w−1 normalized chars
    contribute no rows."""
    s = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    base = (
        df.select(F.col(id_col), s.alias("s"))
        .withColumn("n_g", F.length("s") - F.lit(k) + 1)
        .filter(F.col("n_g") >= w)  # need at least one full window
    )
    grams = base.select(
        F.col(id_col),
        F.col("n_g"),
        F.explode(F.sequence(F.lit(1), F.col("n_g"))).alias("i"),
        F.col("s"),
    ).select(
        F.col(id_col),
        F.col("n_g"),
        F.col("i"),
        portable_hash32(F.substr(F.col("s"), F.col("i"), F.lit(k))).alias("h"),
    )
    win = W.partitionBy(id_col).orderBy("i").rowsBetween(0, w - 1)
    return (
        grams.withColumn("fp", F.min("h").over(win))
        .filter(F.col("i") <= F.col("n_g") - F.lit(w) + 1)
        .select(F.col(id_col), "fp")
        .distinct()
    )


def winnow_profile(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    w: int = 4,
) -> DataFrame:
    """Per-document fingerprint profile — ``(id_col, n_fps, min_fp,
    max_fp, sum_fp)``. A bounded (one row per doc) summary that still
    pins every selected hash value through the sum/min/max, which is
    what makes it a tight oracle-certification surface for the whole
    winnowing pipeline."""
    fps = winnow_fingerprints(df, id_col, text_col, k, w)
    return fps.groupBy(id_col).agg(
        F.count("*").alias("n_fps"),
        F.min("fp").alias("min_fp"),
        F.max("fp").alias("max_fp"),
        F.sum("fp").alias("sum_fp"),
    )


def winnow_shared_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    w: int = 4,
    min_shared: int = 10,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Document pairs sharing ≥ ``min_shared`` winnowed fingerprints:
    ``(id_a, id_b, n_shared)`` with id_a < id_b — the copied-passage
    detector (two documents that share any run of w+k−1 characters
    share a fingerprint; a sustained copied passage shares many).

    Scale posture mirrors ngram_jaccard_pairs: the fingerprint set is
    persisted once for its consumers, ``max_doc_freq`` drops
    boilerplate fingerprints present in more than that many documents
    (broadcast anti-join — the hot set is ≤ |corpus|/max_doc_freq by
    construction) BEFORE the self-join, and the join shuffles 8-byte
    hash keys, never text."""
    fps = _reuse(winnow_fingerprints(df, id_col, text_col, k, w))
    if max_doc_freq is not None:
        hot = (
            fps.groupBy("fp")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") > max_doc_freq)
            .select("fp")
        )
        fps = fps.join(F.broadcast(hot), "fp", "left_anti")
    a = fps.select(F.col(id_col).alias("id_a"), "fp")
    b = fps.select(F.col(id_col).alias("id_b"), "fp")
    return (
        a.join(b, "fp")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def fuzzy_pairs_levenshtein(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_dist: int = 5,
    k: int = 8,
    w: int = 4,
    max_doc_freq: int | None = 50,
) -> DataFrame:
    """Typo-level near-identical pairs: ``(id_a, id_b,
    edit_distance)`` for all pairs with Levenshtein distance ≤
    ``max_dist`` on normalized text — the dedup modality for
    character-level edits (OCR noise, version typos) that set-based
    similarity (Jaccard/MinHash) under-weights and embedding cosine
    can't localize.

    Scale posture — candidate-driven, never n²: blocking requires a
    SHARED WINNOWED FINGERPRINT (two docs within edit distance d and
    length ≥ (d+1)(w+k−1) must share an unedited run of w+k−1 chars,
    hence a fingerprint — pigeonhole over the ≤ d edit points) plus
    ``|len(a) − len(b)| ≤ max_dist`` (necessary for distance ≤ d).
    Only surviving candidates pay the O(len·len) Levenshtein verify,
    computed on ≤ blocked pairs. ``max_doc_freq`` drops boilerplate
    fingerprints before the self-join exactly as in
    :func:`winnow_shared_pairs`."""
    s = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    base = df.select(F.col(id_col), s.alias("s"))
    fps = _reuse(winnow_fingerprints(df, id_col, text_col, k, w))
    if max_doc_freq is not None:
        hot = (
            fps.groupBy("fp")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") > max_doc_freq)
            .select("fp")
        )
        fps = fps.join(F.broadcast(hot), "fp", "left_anti")
    a = fps.select(F.col(id_col).alias("id_a"), "fp")
    b = fps.select(F.col(id_col).alias("id_b"), "fp")
    cands = (
        a.join(b, "fp")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    sa = base.select(F.col(id_col).alias("id_a"), F.col("s").alias("sa"))
    sb = base.select(F.col(id_col).alias("id_b"), F.col("s").alias("sb"))
    return (
        cands.join(sa, "id_a")
        .join(sb, "id_b")
        .filter(
            F.abs(F.length("sa") - F.length("sb")) <= F.lit(max_dist)
        )
        .select(
            "id_a",
            "id_b",
            F.levenshtein("sa", "sb").alias("edit_distance"),
        )
        .filter(F.col("edit_distance") <= max_dist)
    )
