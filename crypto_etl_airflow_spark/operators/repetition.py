"""Gopher-style intra-document repetition signals.

Rae et al. 2021 ("Scaling Language Models: ... Gopher", Table A1)
filter web documents on how internally repetitive they are: the
fraction of duplicate lines, the characters covered by those lines,
the characters covered by the single most frequent 2-/3-gram, and the
characters covered by duplicated 5-grams. Dolma and RefinedWeb ship
the same suite. The existing ``text_gopher_filter`` has only the
cheapest of these (``dup_bigram_frac``); this operator computes the
character-coverage family, which is what the published thresholds are
actually stated over.

Definitions (documented because overlap handling varies across
implementations — ours is the count×length form):

- ``dup_line_frac``          = 1 − distinct(lines)/lines (normalized
  ``trim(lower(·))`` identity).
- ``dup_line_char_frac``     = characters of non-first line
  occurrences / total line characters.
- ``top_{2,3}gram_char_frac``= occurrences(most frequent n-gram) ×
  chars(n-gram) / chars(text). Ties on the count break to the larger
  character coverage (a deterministic struct-max in both engines).
- ``dup_5gram_char_frac``    = Σ over n-grams seen ≥ 2× of count ×
  chars / chars(text). Overlapping occurrences are double-counted
  (the value can exceed 1), matching the cheap form most pipelines
  threshold against; span-union de-overlap is what
  ``operators/substrings.py`` does when you need exact coverage.

Scale shape (100 TB posture): line signals are pure array expressions
in ONE projection — no shuffle, codegen-resident. N-gram signals are
ONE posexplode-free explode of a per-doc gram array (rows ×
grams-per-doc, linear) into a ``groupBy(doc, n, gram)`` count with
map-side combine, then a per-doc conditional aggregation — two
shuffles total, the first keyed by (doc, n, gram) so hot documents
spread across partitions, the second keyed by doc. Nothing all-pairs,
nothing collected.

The reference DAG (crypto-etl-airflow: dags/crypto_etl_dag.py) has no
text surface; this belongs to the mandated LLM-curation extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens

TOP_NS = (2, 3)  # top-ngram char coverage
DUP_NS = (5,)  # duplicated-ngram char coverage


def _grams(toks: F.Column, n: int) -> F.Column:
    """Array of (n, gram) structs: gram i = toks[i..i+n-1] space-joined
    (i 1-based; empty array when the document has fewer than n
    tokens)."""
    # NB: F.sequence(1, stop) with stop < 1 generates a DESCENDING
    # [1, 0] (negative default step), not an empty array — guard the
    # fewer-than-n-tokens case explicitly
    idx = F.when(
        F.size(toks) >= n, F.sequence(F.lit(1), F.size(toks) - (n - 1))
    ).otherwise(F.array().cast("array<int>"))
    return F.transform(
        idx,
        lambda i: F.struct(
            F.lit(n).alias("n"),
            F.concat_ws(
                " ", *[F.element_at(toks, i + j) for j in range(n)]
            ).alias("gram"),
        ),
    )


def repetition_signals(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Per-document repetition signal vector:

    ``(id_col, n_lines, dup_line_frac, dup_line_char_frac,
    top_2gram_char_frac, top_3gram_char_frac, dup_5gram_char_frac)``

    all fractions rounded to 6 — see the module docstring for the
    exact definitions and the scale shape.
    """
    text = F.col(text_col)
    lines = F.split(text, "\n")
    norm = F.transform(lines, lambda x: F.trim(F.lower(x)))
    n_lines = F.size(lines)
    total_line_chars = F.aggregate(
        lines, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
    )
    # chars of FIRST occurrences (per normalized identity, in order)
    first_chars = F.aggregate(
        F.sequence(F.lit(1), n_lines),
        F.lit(0).cast("long"),
        lambda acc, i: acc
        + F.when(
            F.array_position(norm, F.element_at(norm, i)) == i,
            F.length(F.element_at(lines, i)),
        ).otherwise(F.lit(0)),
    )
    line_sig = df.select(
        F.col(id_col),
        F.length(text).alias("n_chars"),
        n_lines.alias("n_lines"),
        F.round(
            F.lit(1) - F.size(F.array_distinct(norm)) / n_lines, 6
        ).alias("dup_line_frac"),
        F.when(total_line_chars > 0,
               F.round((total_line_chars - first_chars)
                       / total_line_chars, 6))
        .otherwise(F.lit(0.0))
        .alias("dup_line_char_frac"),
    )

    toks = tokens(text)
    grams = df.select(
        F.col(id_col),
        F.explode(
            F.concat(*[_grams(toks, n) for n in (*TOP_NS, *DUP_NS)])
        ).alias("g"),
    ).select(id_col, F.col("g.n").alias("n"), F.col("g.gram").alias("gram"))
    counts = grams.groupBy(id_col, "n", "gram").agg(
        F.count("*").alias("cnt")
    )
    chars = (F.col("cnt") * F.length("gram")).cast("long")
    # struct-max = (count, then char coverage) — deterministic across
    # engines; extract the winner's coverage
    st = F.struct(F.col("cnt").alias("c"), chars.alias("ch"))
    ng = counts.groupBy(id_col).agg(
        *[
            F.max(F.when(F.col("n") == n, st))
            .getField("ch")
            .alias(f"top{n}_chars")
            for n in TOP_NS
        ],
        *[
            F.sum(
                F.when((F.col("n") == n) & (F.col("cnt") >= 2), chars)
                .otherwise(F.lit(0))
            ).alias(f"dup{n}_chars")
            for n in DUP_NS
        ],
    )

    def frac(col: str) -> F.Column:
        # n_chars = 0 (empty document) would divide by zero under
        # ANSI mode — hypothesis-found edge, guarded in the oracle too
        return F.when(
            F.col("n_chars") > 0,
            F.round(
                F.coalesce(F.col(col), F.lit(0)) / F.col("n_chars"), 6
            ),
        ).otherwise(F.lit(0.0))

    return line_sig.join(ng, id_col, "left").select(
        id_col,
        "n_lines",
        "dup_line_frac",
        "dup_line_char_frac",
        frac("top2_chars").alias("top_2gram_char_frac"),
        frac("top3_chars").alias("top_3gram_char_frac"),
        frac("dup5_chars").alias("dup_5gram_char_frac"),
    )
