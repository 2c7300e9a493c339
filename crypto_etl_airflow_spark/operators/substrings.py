"""Exact-substring (repeated token-window) deduplication.

The operator family of "Deduplicating Training Data Makes Language
Models Better" (Lee et al., ACL 2022): find spans that are repeated
VERBATIM across documents and, optionally, remove every occurrence
except one global keeper. Unlike shingle-Jaccard / MinHash
(document-level similarity), this targets long exact repeats — license
headers, quoted passages, mirrored articles — that inflate memorization
even when the host documents are otherwise unique.

Lee et al. build a corpus-wide suffix array; a suffix array is a
sequential construction that does not map to a shared-nothing cluster.
The distributed re-expression here hashes windows of ``w`` CONSECUTIVE
TOKENS at every token position. Token boundaries are content-defined
anchors: a passage repeated in two documents tokenizes identically
wherever it sits, so its windows hash identically — no stride-grid
alignment problem (a fixed CHARACTER-stride grid would only match two
copies whose offsets agree mod stride; that design was tried and
rejected — see tests/test_substrings.py's unaligned-copy case).
Detection is complete for any cross-document repeat of ≥ w tokens.

Scale shape (the 100 TB posture):

- one posexplode to (doc, idx, token) — linear;
- char offsets and the w-token window hash come from per-document
  window functions (prefix-sum + a w-row sliding frame), partitioned
  by document — bounded by tokens-per-document, never corpus size;
- repeated windows found by ONE groupBy on the 64-bit window hash,
  map-side partial aggregation (the same shuffle shape as the shingle
  pass in operators/dedup.py);
- the repeated-hash set joins back to the window table (AQE picks
  broadcast when it is small — no unconditional broadcast: on crawl
  corpora the repeated set can be large), then each document's
  surviving token indices merge into maximal spans with an island
  window — again per-document.

Nothing is all-pairs and nothing collects to the driver.
Reference scope note: the reference pipeline (dags/
crypto-etl-pipeline-psql.py) has no dedup stage at all; this module is
part of the mandated LLM-curation surface extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import _reuse


def _window_table(
    df: DataFrame, id_col: str, text_col: str, w: int
) -> DataFrame:
    """(id, idx, pos, wend, h): one row per w-token window.

    ``idx``   0-based token index of the window's first token,
    ``pos``   1-based char offset of that token in the text,
    ``wend``  1-based char offset of the window's LAST char,
    ``h``     64-bit-equivalent hash (first 16 hex chars of md5 of the
              space-joined window — portable to the DuckDB oracle;
              collisions only create false candidate spans).

    Tokenization splits on the LITERAL single space so that
    ``text == ' '.join(tokens)`` exactly and char offsets are exact:
    offset(token_i) = sum(len(t)+1 for t in tokens[:i]) + 1.
    """
    toks = df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), " ", -1)).alias("idx", "tok"),
    )
    ws = Window.partitionBy(id_col).orderBy("idx")
    prefix = ws.rowsBetween(Window.unboundedPreceding, -1)
    frame = ws.rowsBetween(0, w - 1)
    offs = toks.select(
        id_col,
        "idx",
        (
            F.coalesce(F.sum(F.length("tok") + 1).over(prefix), F.lit(0))
            + F.lit(1)
        ).alias("pos"),
        F.collect_list("tok").over(frame).alias("gram"),
        F.last(
            F.coalesce(F.sum(F.length("tok") + 1).over(prefix), F.lit(0))
            + F.length("tok")
        ).over(frame).alias("wend"),
    )
    return offs.filter(F.size("gram") == w).select(
        id_col,
        F.col("idx").cast("bigint").alias("idx"),
        F.col("pos").cast("bigint").alias("pos"),
        F.col("wend").cast("bigint").alias("wend"),
        F.substring(F.md5(F.array_join("gram", " ")), 1, 16).alias("h"),
    )


def _merge_islands(cand: DataFrame, id_col: str, w: int) -> DataFrame:
    """Merge a document's candidate windows into maximal spans: a span
    continues while the next window starts within w tokens of the
    previous one (windows overlap or touch in token space). Emits
    1-based inclusive CHAR offsets (span_start, span_end)."""
    ws = Window.partitionBy(id_col).orderBy("idx")
    flagged = cand.select(
        id_col,
        "idx",
        "pos",
        "wend",
        F.when(F.col("idx") - F.lag("idx").over(ws) <= F.lit(w), F.lit(0))
        .otherwise(F.lit(1))
        .alias("f"),
    )
    grouped = flagged.withColumn(
        "g", F.sum("f").over(ws.rowsBetween(Window.unboundedPreceding, 0))
    )
    return grouped.groupBy(id_col, "g").agg(
        F.min("pos").alias("span_start"),
        F.max("wend").alias("span_end"),
        F.count("*").alias("n_windows"),
    )


def repeated_window_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    w: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """Maximal character spans covered by w-token windows that occur in
    ≥ ``min_docs`` distinct documents.

    Returns ``(id_col, span_start, span_end, span_len, n_windows)``
    with 1-based inclusive char offsets into the input text. Complete
    for any cross-document verbatim repeat of ≥ w tokens; repeats
    shorter than w tokens are below the detection threshold by design
    (Lee et al. §4.1 use 50 BPE tokens; w=8 whitespace tokens keeps
    the fixture corpus exercising multi-span documents).
    """
    # ONE persisted window table feeds both the repeated-hash count
    # and the candidate join — without it the scan + posexplode + the
    # per-doc window sort run twice (the same single-scan refactor
    # that cut the MinHash family's bench time 44% in round 7). At
    # 100 TB the persist spills to disk per-executor; recomputation
    # would cost a second full explode + sort of the token stream.
    win = _reuse(_window_table(df, id_col, text_col, w))
    rep = (
        win.groupBy("h")
        .agg(F.count_distinct(id_col).alias("nd"))
        .filter(F.col("nd") >= min_docs)
        .select("h")
    )
    cand = win.join(rep, "h").select(id_col, "idx", "pos", "wend").distinct()
    spans = _merge_islands(cand, id_col, w)
    return spans.select(
        id_col,
        "span_start",
        "span_end",
        (F.col("span_end") - F.col("span_start") + 1).alias("span_len"),
        "n_windows",
    )


def remove_repeated_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    w: int = 8,
) -> DataFrame:
    """Keep-first exact-substring dedup: for every window hash repeated
    across ≥2 distinct documents, the globally first occurrence
    (lowest ``(id, idx)``) survives; every other occurrence becomes a
    removal window. Removal windows merge into spans per document and
    the spans are excised from the text (token-boundary cuts — the
    separator seam a byte-range cut leaves is the same seam Lee et
    al.'s span removal leaves).

    Returns ``(id_col, clean_text, n_spans, removed_chars)`` — one row
    per input document; documents with no repeats (or NULL text) pass
    through with ``n_spans = 0``.

    The keeper is chosen per HASH, so two documents sharing a long
    passage keep exactly one copy between them (the lower id's) —
    Lee et al.'s semantics, not C4's drop-all-copies.
    """
    # same single-scan persist as repeated_window_spans: win feeds the
    # repeated-hash count AND the occurrence ranking
    win = _reuse(_window_table(df, id_col, text_col, w))
    rep = (
        win.groupBy("h")
        .agg(F.count_distinct(id_col).alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("h")
    )
    hits = win.join(rep, "h")
    # rank occurrences of each repeated hash; rank 1 is the keeper
    occ = Window.partitionBy("h").orderBy(id_col, "idx")
    removal = (
        hits.withColumn("rn", F.row_number().over(occ))
        .filter(F.col("rn") > 1)
        .select(id_col, "idx", "pos", "wend")
        .distinct()
    )
    spans = _merge_islands(removal, id_col, w).select(
        id_col, "span_start", "span_end"
    )

    # reconstruct: each span contributes the kept segment BEFORE it
    # (from the previous span's end + 1), plus one per-doc tail after
    # the last span
    ws = Window.partitionBy(id_col).orderBy("span_start")
    seg = spans.withColumn(
        "seg_start",
        F.coalesce(F.lag("span_end").over(ws), F.lit(0)) + F.lit(1),
    )
    with_text = seg.join(df.select(id_col, text_col), id_col)
    pieces = with_text.select(
        id_col,
        "span_start",
        "span_end",
        F.substring(
            F.col(text_col),
            F.col("seg_start").cast("int"),
            (F.col("span_start") - F.col("seg_start")).cast("int"),
        ).alias("piece"),
        (F.col("span_end") - F.col("span_start") + 1).alias("cut"),
    )
    rebuilt = pieces.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("span_start", "piece"))),
                lambda x: x["piece"],
            ),
            "",
        ).alias("head"),
        F.max("span_end").alias("last_end"),
        F.count("*").alias("n_spans"),
        F.sum("cut").alias("removed_chars"),
    )
    joined = df.select(id_col, text_col).join(rebuilt, id_col, "left")
    tail = F.substring(
        F.col(text_col),
        (F.col("last_end") + 1).cast("int"),
        F.greatest(
            F.length(text_col) - F.col("last_end"), F.lit(0)
        ).cast("int"),
    )
    return joined.select(
        id_col,
        F.when(F.col("n_spans").isNull(), F.col(text_col))
        .otherwise(F.concat(F.col("head"), tail))
        .alias("clean_text"),
        F.coalesce(F.col("n_spans"), F.lit(0)).cast("int").alias("n_spans"),
        F.coalesce(F.col("removed_chars"), F.lit(0))
        .cast("bigint")
        .alias("removed_chars"),
    )
