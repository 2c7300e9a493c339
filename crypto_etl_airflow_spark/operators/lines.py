"""Cross-document line-level deduplication (RefinedWeb-style).

Removes every line that occurs (normalized) in more than
``max_doc_freq`` distinct documents — boilerplate like "subscribe to
our newsletter" or "all rights reserved" that survives document-level
dedup because each HOST document is unique — then reconstructs each
document from its surviving lines in original order.

Scale shape (the 100 TB posture):

- one explode to (doc, pos, line) — linear, no shuffle;
- line frequencies via groupBy on the line's xxhash64 (the shuffle
  moves 8-byte longs, not line strings), map-side partial counts;
- the hot-line set is filtered BEFORE any join with the corpus: only
  lines in > max_doc_freq documents survive, and boilerplate is
  zipfian, so the set is small enough to broadcast in practice
  (``broadcast_hot=False`` falls back to a shuffled anti-join on the
  8-byte hash when a pathological corpus makes it large);
- reconstruction is one groupBy(doc) whose partition size is bounded
  by lines-per-document, not corpus size — no skew exposure beyond
  the largest single document.

Nothing here is all-pairs and nothing collects to the driver.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def line_dedup_global(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_doc_freq: int = 10,
    sep: str = "\n",
    broadcast_hot: bool = True,
) -> DataFrame:
    """Drop lines present in more than ``max_doc_freq`` distinct
    documents; return one row per input document:

    ``(id_col, clean_text, n_lines, n_removed)``

    ``clean_text`` is the surviving lines re-joined with ``sep`` in
    their original order ('' when every line was boilerplate).
    Line identity is ``trim(lower(line))``, compared via xxhash64 (a
    64-bit collision merges two lines; negligible below ~10⁸ distinct
    lines per corpus — same argument as the shingle hashing in
    operators/dedup.py).
    """
    # F.split takes a REGEX; sep is a literal separator (it is also
    # re-joined literally below), so escape it — an unescaped '|' or
    # '.' would split between every character
    sep_pattern = re.escape(sep)
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), sep_pattern)).alias(
            "pos", "line"
        ),
    ).withColumn("lh", F.xxhash64(F.trim(F.lower(F.col("line")))))

    hot = (
        lines.groupBy("lh")
        .agg(F.count_distinct(id_col).alias("n_docs"))
        .filter(F.col("n_docs") > max_doc_freq)
        .select("lh")
    )
    if broadcast_hot:
        hot = F.broadcast(hot)
    kept = lines.join(hot, "lh", "left_anti")

    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda x: x["line"],
            ),
            sep,
        ).alias("clean_text"),
        F.count("*").alias("n_kept"),
    )

    base = df.select(
        F.col(id_col),
        F.size(F.split(F.col(text_col), sep_pattern)).alias("n_lines"),
    )
    return base.join(rebuilt, id_col, "left").select(
        id_col,
        F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        "n_lines",
        (F.col("n_lines") - F.coalesce("n_kept", F.lit(0)))
        .cast("int")
        .alias("n_removed"),
    )


def line_dedup_intradoc(
    df: DataFrame,
    id_col: str,
    text_col: str,
    sep: str = "\n",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Remove repeated lines WITHIN each document, keeping the first
    occurrence in order (Dolma/RefinedWeb intra-document repetition
    removal — the complement of :func:`line_dedup_global`: no corpus
    state, so a line repeated inside one page goes, while a line
    shared across pages is the global operator's job).

    Returns ``(id_col, clean_text, n_lines, n_removed, *keep_cols)``;
    line identity is ``trim(lower(line))``. ``keep_cols`` pass
    through untouched (the operator is a projection, so carrying
    them costs nothing — no join-back needed downstream).

    Scale shape: pure array expressions in ONE projection — no
    explode, no shuffle, no UDF; at 100 TB this runs at parquet-scan
    speed inside WholeStageCodegen. The first-occurrence test is
    ``array_position`` per line (O(L²) in lines-per-document), the
    right trade for natural documents (tens to hundreds of lines);
    a pathological million-line document would want the global
    operator's explode + hash path with the frequency scoped per doc.
    """
    sep_pattern = re.escape(sep)
    lines = F.split(F.col(text_col), sep_pattern)
    norm = F.transform(lines, lambda x: F.trim(F.lower(x)))
    # keep line i (0-based) iff the FIRST occurrence of its normalized
    # form is at i (array_position is 1-based)
    kept = F.filter(
        lines,
        lambda x, i: F.array_position(norm, F.trim(F.lower(x))) == i + 1,
    )
    return df.select(
        F.col(id_col),
        F.array_join(kept, sep).alias("clean_text"),
        F.size(lines).alias("n_lines"),
        (F.size(lines) - F.size(kept)).cast("int").alias("n_removed"),
        *[F.col(c) for c in keep_cols],
    )
