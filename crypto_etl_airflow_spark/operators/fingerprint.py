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


def _normalized(text_col: str):
    return F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))


def passjoin_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_dist: int = 5,
) -> DataFrame:
    """EXACT edit-distance pairs ``(id_a, id_b, edit_distance ≤
    max_dist)`` via segment-pigeonhole blocking (the Pass-Join scheme
    of Li/Deng/Wang/Feng, VLDB 2012) — no minimum document length,
    unlike the winnowing block of :func:`fuzzy_pairs_levenshtein`.

    Pigeonhole: partition the LONGER string of a pair into
    ``max_dist+1`` contiguous segments; ≤ max_dist edits cannot touch
    them all, so the shorter string contains some segment VERBATIM,
    within ±max_dist of its source position. Blocking joins each
    doc's segments against every candidate-position substring of the
    (shorter) probe docs; only collisions pay the Levenshtein verify.
    The position window here is the loose ±max_dist bound — a
    superset of Pass-Join's multi-match-aware selection, so recall is
    exact and the cost is a small constant factor of candidates.

    Degenerate lengths: a doc shorter than ``max_dist+1`` chars has
    no ``max_dist+1`` nonempty segments, but any pair whose LONGER
    side is that short is within ``max_dist`` automatically
    (substitute + delete), so the tiny subset is paired directly.

    Scale posture: the probe side explodes to O(d² · min(len, 2d+1))
    substring rows per doc — designed for SHORT documents (the
    below-guarantee fallback of :func:`fuzzy_pairs_levenshtein`),
    where that factor multiplies tiny strings. Join keys are 8-byte
    xxhash64 of segments (a collision only adds a candidate, which
    the verify discards); the verify join ships each short string
    once."""
    d = max_dist
    base = df.select(
        F.col(id_col).alias("pid"), _normalized(text_col).alias("ps")
    ).withColumn("pl", F.length("ps"))

    # tiny × tiny: longer side < d+1 segments → pigeonhole void, but
    # dist ≤ max(len) ≤ d holds unconditionally
    tiny = base.filter(F.col("pl") <= d)
    tiny_pairs = (
        tiny.alias("a")
        .crossJoin(tiny.alias("b"))
        .filter(F.col("a.pid") < F.col("b.pid"))
        .select(
            F.col("a.pid").alias("id_a"),
            F.col("b.pid").alias("id_b"),
            F.levenshtein("a.ps", "b.ps").alias("edit_distance"),
        )
        .filter(F.col("edit_distance") <= d)
    )

    nseg = d + 1
    seg_len = F.col("q") + F.when(F.col("i") < F.col("r"), 1).otherwise(0)
    seg_start = F.col("i") * F.col("q") + F.least(F.col("i"), F.col("r")) + 1

    targets = (
        base.filter(F.col("pl") >= nseg)
        .select(
            F.col("pid").alias("id_b"),
            F.col("ps").alias("sb"),
            F.col("pl").alias("lb"),
        )
        .withColumn("i", F.explode(F.sequence(F.lit(0), F.lit(d))))
        .withColumn("q", F.expr(f"lb DIV {nseg}"))
        .withColumn("r", F.col("lb") % nseg)
        .select(
            "id_b",
            "lb",
            "i",
            F.xxhash64(F.substr(F.col("sb"), seg_start, seg_len)).alias("h"),
        )
    )

    probes = (
        base.select(
            F.col("pid").alias("id_a"),
            F.col("ps").alias("sa"),
            F.col("pl").alias("la"),
        )
        # the target is the longer side: lengths la..la+d
        .withColumn(
            "lt", F.explode(F.sequence(F.col("la"), F.col("la") + F.lit(d)))
        )
        .filter(F.col("lt") >= nseg)
        .withColumn("i", F.explode(F.sequence(F.lit(0), F.lit(d))))
        .withColumn("q", F.expr(f"lt DIV {nseg}"))
        .withColumn("r", F.col("lt") % nseg)
        .withColumn("sl", seg_len)
        .withColumn("sp", seg_start)
        .withColumn("jmin", F.greatest(F.lit(1), F.col("sp") - F.lit(d)))
        .withColumn(
            "jmax",
            F.least(F.col("la") - F.col("sl") + 1, F.col("sp") + F.lit(d)),
        )
        .filter(F.col("jmax") >= F.col("jmin"))
        .withColumn("j", F.explode(F.sequence(F.col("jmin"), F.col("jmax"))))
        .select(
            "id_a",
            "la",
            F.col("lt"),
            "i",
            F.xxhash64(
                F.substr(F.col("sa"), F.col("j"), F.col("sl"))
            ).alias("h"),
        )
    )

    cand = (
        probes.join(targets, (probes.lt == targets.lb)
                    & (probes.i == targets.i) & (probes.h == targets.h))
        .filter(
            (F.col("lb") > F.col("la"))
            | ((F.col("lb") == F.col("la")) & (F.col("id_b") != F.col("id_a")))
        )
        .select(
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
        )
        .distinct()
    )

    sa = base.select(F.col("pid").alias("id_a"), F.col("ps").alias("va"))
    sb = base.select(F.col("pid").alias("id_b"), F.col("ps").alias("vb"))
    verified = (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.levenshtein("va", "vb").alias("edit_distance"),
        )
        .filter(F.col("edit_distance") <= d)
    )
    return verified.unionByName(tiny_pairs)


def fuzzy_pairs_levenshtein(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_dist: int = 5,
    k: int = 8,
    w: int = 4,
    max_doc_freq: int | None = 50,
    short_fallback: bool = False,
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
    :func:`winnow_shared_pairs`.

    RECALL PRECONDITION (ADVICE r6): the fingerprint block only
    GUARANTEES pairs whose shorter side has ≥ (max_dist+1)(w+k−1)
    normalized chars (66 at the defaults); docs under w+k−1 chars
    (11) emit no fingerprints at all and can never be candidates.
    ``short_fallback=True`` closes the gap exactly: docs below the
    guarantee length (+max_dist slack, so boundary-straddling pairs
    are covered) additionally run :func:`passjoin_pairs` — exact
    segment-pigeonhole blocking with no length precondition — and
    the two pair sets are unioned (first-wins dedup on the pair
    key; both paths compute the identical distance)."""
    s = _normalized(text_col)
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
    pairs = (
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
    if not short_fallback:
        return pairs
    guarantee_len = (max_dist + 1) * (w + k - 1)
    shorts = df.filter(
        F.length(_normalized(text_col)) < guarantee_len + max_dist
    )
    short_pairs = passjoin_pairs(shorts, id_col, text_col, max_dist)
    return pairs.unionByName(short_pairs).dropDuplicates(["id_a", "id_b"])
