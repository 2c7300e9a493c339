"""Training-corpus curation surface: PII scrubbing, cross-document
line-level dedup, and a Gopher-style composite quality filter — the
standard cleaning stages a pretraining pipeline runs between raw
ingest and tokenization (RefinedWeb line dedup; Gopher quality rules).

The fixture documents are single-line and PII-free, so each query
synthesizes its structure IN-PLAN with deterministic column
expressions (the same technique dedup_exact_fingerprint uses for its
duplicate injection): the Spark builder and the DuckDB oracle build
byte-identical augmented corpora from the same ``documents`` table,
then both apply the operator — so the redacted/cleaned TEXT itself is
hash-compared value-for-value, not just counts.

Everything here is column expressions + at most one line-frequency
shuffle (the line dedup); no UDFs, no collect. PII regexes are
restricted to the Java-regex ∩ RE2 dialect so both engines evaluate
the identical pattern strings (functions/pii.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.blocklists import (
    bad_word_count,
    blocked_domain_count,
    url_domains,
)
from ..functions.pii import PII_PATTERNS, PII_TOKENS, pii_counts, redact_pii
from ..functions.text import STOPWORDS, mean_token_length, quality_score, tokens
from ..operators import dedup as dedup_ops
from ..operators.lines import line_dedup_global, line_dedup_intradoc
from ..operators.repetition import repetition_signals
from ..sources.tables import load_table
from .extensions import _STOPS as _EXT_STOPS
from .extensions import _TOKS as _EXT_TOKS
from .registry import register

# ---------------------------------------------------------------------------
# deterministic PII injection (Spark + DuckDB forms must stay in sync)
# ---------------------------------------------------------------------------


def _augment_pii(docs: DataFrame) -> DataFrame:
    """Append one synthetic PII item to docs by doc_id % 7 arm:
    0 → email, 1 → phone, 2 → SSN, 3 → IPv4, else unchanged."""
    did = F.col("doc_id")

    def s(col: F.Column) -> F.Column:
        return col.cast("string")

    text = (
        F.when(
            did % 7 == 0,
            F.concat(
                F.col("text"), F.lit(" contact user"), s(did),
                F.lit("@example.com now"),
            ),
        )
        .when(
            did % 7 == 1,
            F.concat(
                F.col("text"), F.lit(" call 555-"),
                F.lpad(s(did % 1000), 3, "0"), F.lit("-"),
                F.lpad(s(did % 10000), 4, "0"),
            ),
        )
        .when(
            did % 7 == 2,
            F.concat(
                F.col("text"), F.lit(" ssn is "),
                F.lpad(s(did % 1000), 3, "0"), F.lit("-"),
                F.lpad(s(did % 100), 2, "0"), F.lit("-"),
                F.lpad(s(did % 10000), 4, "0"),
            ),
        )
        .when(
            did % 7 == 3,
            F.concat(
                F.col("text"), F.lit(" from 10."),
                s(did % 256), F.lit("."),
                s((did * 3) % 256), F.lit("."),
                s((did * 7) % 256),
            ),
        )
        .otherwise(F.col("text"))
    )
    return docs.select("doc_id", "lang", text.alias("text"))


_AUG_PII_SQL = """
    SELECT doc_id, lang,
           CASE WHEN doc_id % 7 = 0 THEN text || ' contact user'
                     || CAST(doc_id AS VARCHAR) || '@example.com now'
                WHEN doc_id % 7 = 1 THEN text || ' call 555-'
                     || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-'
                     || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                WHEN doc_id % 7 = 2 THEN text || ' ssn is '
                     || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-'
                     || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') || '-'
                     || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                WHEN doc_id % 7 = 3 THEN text || ' from 10.'
                     || CAST(doc_id % 256 AS VARCHAR) || '.'
                     || CAST(doc_id * 3 % 256 AS VARCHAR) || '.'
                     || CAST(doc_id * 7 % 256 AS VARCHAR)
                ELSE text END AS text
    FROM documents
"""

# the redaction chain in DuckDB, innermost-first in PII_PATTERNS order
# (tokens come from the same PII_TOKENS constant the engine applies,
# so adding/renaming a category updates both sides together)
_REDACT_SQL = "text"
for _cat, _pat in PII_PATTERNS.items():
    _REDACT_SQL = (
        f"regexp_replace({_REDACT_SQL}, '{_pat}', '{PII_TOKENS[_cat]}', 'g')"
    )

_COUNT_SQL = {
    cat: f"CAST(len(regexp_extract_all(text, '{pat}')) AS BIGINT)"
    for cat, pat in PII_PATTERNS.items()
}


@register(
    "text_pii_redact",
    oracle=f"""
    WITH aug AS ({_AUG_PII_SQL})
    SELECT doc_id,
           {_COUNT_SQL['email']} AS n_emails,
           {_COUNT_SQL['phone']} AS n_phones,
           {_COUNT_SQL['ssn']} AS n_ssns,
           {_COUNT_SQL['ipv4']} AS n_ipv4,
           {_REDACT_SQL} AS redacted
    FROM aug
    """,
    tags=("text", "pii", "curation", "extension"),
)
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub per document: per-category match counts plus the
    fully redacted text (``<EMAIL>``/``<PHONE>``/``<SSN>``/``<IP>``
    tokens). Pure regexp column expressions — whole-stage codegen,
    zero shuffles, scan-speed at 100 TB. The oracle hash-compares the
    REDACTED TEXT byte-for-byte, not just the counts."""
    aug = _augment_pii(load_table(spark, sf_dir, "documents"))
    t = F.col("text")
    c = pii_counts(t)
    return aug.select(
        "doc_id",
        c["email"].alias("n_emails"),
        c["phone"].alias("n_phones"),
        c["ssn"].alias("n_ssns"),
        c["ipv4"].alias("n_ipv4"),
        redact_pii(t).alias("redacted"),
    )


@register(
    "text_pii_prevalence",
    oracle=f"""
    WITH aug AS ({_AUG_PII_SQL}),
    per_doc AS (
        SELECT lang,
               {_COUNT_SQL['email']} AS e, {_COUNT_SQL['phone']} AS p,
               {_COUNT_SQL['ssn']} AS s, {_COUNT_SQL['ipv4']} AS i
        FROM aug
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN e + p + s + i > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS docs_with_pii,
           CAST(sum(e) AS BIGINT) AS n_emails,
           CAST(sum(p) AS BIGINT) AS n_phones,
           CAST(sum(s) AS BIGINT) AS n_ssns,
           CAST(sum(i) AS BIGINT) AS n_ipv4
    FROM per_doc GROUP BY lang
    """,
    tags=("text", "pii", "curation", "extension"),
)
def text_pii_prevalence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level PII audit: per-language document counts, documents
    containing any PII, and per-category totals — the reporting stage
    that decides whether a source needs filtering rather than
    redaction. One grouped aggregation (map-side partial sums)."""
    aug = _augment_pii(load_table(spark, sf_dir, "documents"))
    c = pii_counts(F.col("text"))
    any_pii = (c["email"] + c["phone"] + c["ssn"] + c["ipv4"]) > 0
    per_doc = aug.select(
        "lang",
        c["email"].alias("e"), c["phone"].alias("p"),
        c["ssn"].alias("s"), c["ipv4"].alias("i"),
        any_pii.cast("int").alias("has"),
    )
    return per_doc.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("has").cast("long").alias("docs_with_pii"),
        F.sum("e").cast("long").alias("n_emails"),
        F.sum("p").cast("long").alias("n_phones"),
        F.sum("s").cast("long").alias("n_ssns"),
        F.sum("i").cast("long").alias("n_ipv4"),
    )


# ---------------------------------------------------------------------------
# cross-document line dedup (RefinedWeb-style)
# ---------------------------------------------------------------------------


def _augment_lines(docs: DataFrame) -> DataFrame:
    """Turn the single-line fixture docs into multi-line documents with
    injected boilerplate: doc_id%3==0 gains a newsletter line,
    %4==0 a rights line (mixed case — exercises normalization),
    %5==0 a UNIQUE ref-code line that must survive the dedup."""
    did = F.col("doc_id")
    text = F.concat_ws(
        "\n",
        F.col("text"),
        F.when(did % 3 == 0, F.lit("subscribe to our newsletter")),
        F.when(did % 4 == 0, F.lit("All Rights Reserved")),
        F.when(did % 5 == 0, F.concat(F.lit("ref code "), did.cast("string"))),
    )
    return docs.select("doc_id", text.alias("text"))


_AUG_LINES_SQL = """
    SELECT doc_id,
           concat_ws(chr(10), text,
               CASE WHEN doc_id % 3 = 0 THEN 'subscribe to our newsletter' END,
               CASE WHEN doc_id % 4 = 0 THEN 'All Rights Reserved' END,
               CASE WHEN doc_id % 5 = 0
                    THEN 'ref code ' || CAST(doc_id AS VARCHAR) END) AS text
    FROM documents
"""


@register(
    "dedup_lines_global",
    oracle=f"""
    WITH aug AS ({_AUG_LINES_SQL}),
    lines AS (
        SELECT doc_id,
               unnest(range(1, len(string_split(text, chr(10))) + 1)) AS pos,
               unnest(string_split(text, chr(10))) AS line
        FROM aug
    ),
    freq AS (
        SELECT trim(lower(line)) AS norm, count(DISTINCT doc_id) AS n_docs
        FROM lines GROUP BY 1
    ),
    kept AS (
        SELECT l.doc_id, l.pos, l.line
        FROM lines l JOIN freq f ON trim(lower(l.line)) = f.norm
        WHERE f.n_docs <= 10
    ),
    rebuilt AS (
        SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS clean_text,
               count(*) AS n_kept
        FROM kept GROUP BY doc_id
    )
    SELECT a.doc_id,
           coalesce(r.clean_text, '') AS clean_text,
           len(string_split(a.text, chr(10))) AS n_lines,
           CAST(len(string_split(a.text, chr(10))) - coalesce(r.n_kept, 0)
                AS INT) AS n_removed
    FROM aug a LEFT JOIN rebuilt r ON a.doc_id = r.doc_id
    """,
    tags=("dedup", "lines", "curation", "extension"),
)
def dedup_lines_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line-level dedup ACROSS documents (RefinedWeb-style): lines
    present in > 10 distinct documents (normalized trim+lower) are
    boilerplate and are removed; each document is reconstructed from
    its surviving lines in original order. The injected newsletter /
    rights lines vanish; the unique per-doc ref-code lines survive —
    and the oracle hash-compares every reconstructed document string
    (operators/lines.py for the 100 TB shuffle shape)."""
    aug = _augment_lines(load_table(spark, sf_dir, "documents"))
    return line_dedup_global(aug, "doc_id", "text", max_doc_freq=10)


# ---------------------------------------------------------------------------
# intra-document line dedup + repetition signals
# ---------------------------------------------------------------------------

def _augment_intradoc(docs: DataFrame) -> DataFrame:
    """Plant INTRA-document repetition: doc_id%3==0 gains a line plus
    its normalized duplicate (case/whitespace variant — exercises the
    trim+lower identity), %4==0 repeats its own body line verbatim,
    %5==0 gains a unique ref line that must survive."""
    did = F.col("doc_id")
    text = F.concat_ws(
        "\n",
        F.col("text"),
        F.when(did % 3 == 0, F.lit("Click here to subscribe")),
        F.when(did % 3 == 0, F.lit("  click HERE to subscribe ")),
        F.when(did % 4 == 0, F.col("text")),
        F.when(did % 5 == 0, F.concat(F.lit("ref "), did.cast("string"))),
    )
    return docs.select(
        "doc_id",
        text.alias("text"),
        *[c for c in docs.columns if c not in ("doc_id", "text")],
    )


_AUG_INTRADOC_SQL = """
    SELECT doc_id,
           concat_ws(chr(10), text,
               CASE WHEN doc_id % 3 = 0 THEN 'Click here to subscribe' END,
               CASE WHEN doc_id % 3 = 0 THEN '  click HERE to subscribe ' END,
               CASE WHEN doc_id % 4 = 0 THEN text END,
               CASE WHEN doc_id % 5 = 0
                    THEN 'ref ' || CAST(doc_id AS VARCHAR) END) AS text
    FROM documents
"""

# the shared first-occurrence filter (list_position is the FIRST index
# of the normalized form; DuckDB indexed lambdas are 1-based)
_KEEP_FIRST = (
    "list_filter(lines, (x, i) -> "
    "list_position(norm, trim(lower(x))) = i)"
)


@register(
    "dedup_lines_intradoc",
    oracle=f"""
    WITH aug AS ({_AUG_INTRADOC_SQL}),
    feat AS (
        SELECT doc_id,
               string_split(text, chr(10)) AS lines,
               list_transform(string_split(text, chr(10)),
                              x -> trim(lower(x))) AS norm
        FROM aug
    )
    SELECT doc_id,
           array_to_string({_KEEP_FIRST}, chr(10)) AS clean_text,
           len(lines) AS n_lines,
           CAST(len(lines) - len({_KEEP_FIRST}) AS INT) AS n_removed
    FROM feat
    """,
    tags=("dedup", "lines", "curation", "extension"),
)
def dedup_lines_intradoc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document line dedup (Dolma/RefinedWeb repetition removal):
    WITHIN each document, repeated lines (trim+lower identity) keep
    only their first occurrence; the document is reconstructed in
    order. The planted case-variant and verbatim-body duplicates
    vanish; unique ref lines survive — every reconstructed string is
    hash-compared. Unlike ``dedup_lines_global`` there is no corpus
    state: the whole operator is ONE shuffle-free array projection
    (operators/lines.py::line_dedup_intradoc for the 100 TB shape)."""
    aug = _augment_intradoc(load_table(spark, sf_dir, "documents"))
    return line_dedup_intradoc(aug, "doc_id", "text")


@register(
    "text_repetition_signals",
    oracle=f"""
    WITH aug AS ({_AUG_INTRADOC_SQL}),
    feat AS (
        SELECT doc_id, length(text) AS n_chars,
               string_split(text, chr(10)) AS lines,
               list_transform(string_split(text, chr(10)),
                              x -> trim(lower(x))) AS norm,
               string_split_regex(lower(text), '\\s+') AS toks
        FROM aug
    ),
    line_sig AS (
        SELECT doc_id, n_chars,
               len(lines) AS n_lines,
               round(1 - len(list_distinct(norm)) / len(lines), 6)
                   AS dup_line_frac,
               coalesce(list_sum(list_transform(lines, x -> length(x))), 0)
                   AS total_lc,
               coalesce(list_sum(list_transform(
                   range(1, len(lines) + 1),
                   i -> CASE WHEN list_position(norm, norm[i]) = i
                             THEN length(lines[i]) ELSE 0 END)), 0)
                   AS first_lc
        FROM feat
    ),
    grams AS (
        SELECT doc_id, n, gram FROM (
            SELECT doc_id, 2 AS n,
                   unnest(list_transform(
                       range(1, greatest(len(toks) - 1, 0) + 1),
                       i -> array_to_string(toks[i:i+1], ' '))) AS gram
            FROM feat
            UNION ALL
            SELECT doc_id, 3 AS n,
                   unnest(list_transform(
                       range(1, greatest(len(toks) - 2, 0) + 1),
                       i -> array_to_string(toks[i:i+2], ' '))) AS gram
            FROM feat
            UNION ALL
            SELECT doc_id, 5 AS n,
                   unnest(list_transform(
                       range(1, greatest(len(toks) - 4, 0) + 1),
                       i -> array_to_string(toks[i:i+4], ' '))) AS gram
            FROM feat
        )
    ),
    counts AS (
        SELECT doc_id, n, gram, count(*) AS cnt
        FROM grams GROUP BY 1, 2, 3
    ),
    ng AS (
        SELECT doc_id,
               (max(CASE WHEN n = 2
                         THEN {{'c': cnt, 'ch': cnt * length(gram)}} END)).ch
                   AS top2_chars,
               (max(CASE WHEN n = 3
                         THEN {{'c': cnt, 'ch': cnt * length(gram)}} END)).ch
                   AS top3_chars,
               sum(CASE WHEN n = 5 AND cnt >= 2
                        THEN cnt * length(gram) ELSE 0 END) AS dup5_chars
        FROM counts GROUP BY doc_id
    )
    SELECT l.doc_id, l.n_lines, l.dup_line_frac,
           CASE WHEN l.total_lc > 0
                THEN round((l.total_lc - l.first_lc) / l.total_lc, 6)
                ELSE 0.0 END AS dup_line_char_frac,
           CASE WHEN l.n_chars > 0
                THEN round(coalesce(g.top2_chars, 0) / l.n_chars, 6)
                ELSE 0.0 END AS top_2gram_char_frac,
           CASE WHEN l.n_chars > 0
                THEN round(coalesce(g.top3_chars, 0) / l.n_chars, 6)
                ELSE 0.0 END AS top_3gram_char_frac,
           CASE WHEN l.n_chars > 0
                THEN round(coalesce(g.dup5_chars, 0) / l.n_chars, 6)
                ELSE 0.0 END AS dup_5gram_char_frac
    FROM line_sig l LEFT JOIN ng g ON l.doc_id = g.doc_id
    """,
    tags=("text", "quality", "curation", "extension"),
)
def text_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher Table-A1 repetition signal vector per document —
    duplicate-line fraction and char coverage, most-frequent-2/3-gram
    char coverage, duplicated-5-gram char coverage (definitions and
    the count×length overlap convention in operators/repetition.py).
    Line signals are a shuffle-free array projection; n-gram signals
    are one explode + (doc, n, gram) count with map-side combine +
    one per-doc conditional aggregation."""
    aug = _augment_intradoc(load_table(spark, sf_dir, "documents"))
    return repetition_signals(aug, "doc_id", "text")


# ---------------------------------------------------------------------------
# composed curation pipeline (operators chained end-to-end)
# ---------------------------------------------------------------------------


@register(
    "curation_pipeline_summary",
    oracle=f"""
    WITH aug AS (
        SELECT doc_id,
               concat_ws(chr(10), text,
                   CASE WHEN doc_id % 3 = 0
                        THEN 'Click here to subscribe' END,
                   CASE WHEN doc_id % 3 = 0
                        THEN '  click HERE to subscribe ' END,
                   CASE WHEN doc_id % 4 = 0 THEN text END,
                   CASE WHEN doc_id % 5 = 0
                        THEN 'ref ' || CAST(doc_id AS VARCHAR) END) AS text,
               lang
        FROM documents
    ),
    corpus AS (
        SELECT * FROM aug
        UNION ALL
        SELECT doc_id + 1000000, text, lang FROM aug WHERE doc_id % 10 = 0
    ),
    feat AS (
        SELECT doc_id, lang,
               string_split(text, chr(10)) AS lines,
               list_transform(string_split(text, chr(10)),
                              x -> trim(lower(x))) AS norm
        FROM corpus
    ),
    clean AS (
        SELECT doc_id, lang,
               array_to_string({_KEEP_FIRST}, chr(10)) AS clean_text
        FROM feat
    ),
    fp AS (
        SELECT doc_id, lang, clean_text,
               md5(trim(regexp_replace(lower(clean_text), '\\s+', ' ',
                                       'g'))) AS f
        FROM clean
    ),
    flags AS (
        SELECT doc_id, lang, clean_text,
               doc_id != min(doc_id) OVER (PARTITION BY f) AS is_duplicate
        FROM fp
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN NOT is_duplicate THEN 1 ELSE 0 END)
                AS BIGINT) AS n_docs_kept,
           CAST(sum(CASE WHEN NOT is_duplicate
                    THEN len(string_split_regex(lower(clean_text), '\\s+'))
                    ELSE 0 END) AS BIGINT) AS n_tokens_kept
    FROM flags GROUP BY lang ORDER BY lang
    """,
    tags=("dedup", "curation", "pipeline", "extension"),
)
def curation_pipeline_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three certified operators CHAINED end-to-end — the proof the
    curation surface composes as a pipeline, not just as isolated
    queries: intra-document line dedup (projection, carries ``lang``
    through via ``keep_cols``) → exact-duplicate detection over the
    CLEANED text (the intradoc stage makes the planted byte-identical
    copies converge to the same fingerprint) → per-language corpus
    summary (docs in, canonical docs kept, whitespace tokens kept).
    One window shuffle + one doc-keyed join + one final aggregation
    beyond the scan; the oracle recomputes the whole chain."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang"
    )
    aug = _augment_intradoc(docs)
    dups = aug.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text", "lang"
    )
    corpus = aug.unionByName(dups)
    clean = line_dedup_intradoc(
        corpus, "doc_id", "text", keep_cols=("lang",)
    )
    flags = dedup_ops.exact_duplicates(clean, "doc_id", "clean_text").select(
        "doc_id", "is_duplicate"
    )
    joined = clean.join(flags, "doc_id")
    toks = F.size(tokens(F.col("clean_text")))
    kept = ~F.col("is_duplicate")
    return (
        joined.groupBy("lang")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(F.when(kept, 1).otherwise(0))
            .cast("long")
            .alias("n_docs_kept"),
            F.sum(F.when(kept, toks).otherwise(0))
            .cast("long")
            .alias("n_tokens_kept"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# lexical blocklist filters (C4/RefinedWeb URL + bad-word screening)
# ---------------------------------------------------------------------------

def _augment_blocklist(docs: DataFrame) -> DataFrame:
    """Plant outbound URLs and blocklisted tokens: %3==0 links a
    blocked spam domain (mixed case — extraction must lower-case),
    %4==0 links a clean domain, %5==0 mentions a blocklisted word."""
    did = F.col("doc_id")
    text = F.concat_ws(
        " ",
        F.col("text"),
        F.when(did % 3 == 0, F.lit("see https://Spam.Example.com/offer now")),
        F.when(did % 4 == 0, F.lit("docs at https://docs.example.org/guide")),
        F.when(did % 5 == 0, F.lit("buy CRAPCOIN today")),
    )
    return docs.select("doc_id", text.alias("text"))


_AUG_BLOCKLIST_SQL = """
    SELECT doc_id,
           concat_ws(' ', text,
               CASE WHEN doc_id % 3 = 0
                    THEN 'see https://Spam.Example.com/offer now' END,
               CASE WHEN doc_id % 4 = 0
                    THEN 'docs at https://docs.example.org/guide' END,
               CASE WHEN doc_id % 5 = 0 THEN 'buy CRAPCOIN today' END) AS text
    FROM documents
"""


@register(
    "text_blocklist_filter",
    oracle=f"""
    WITH aug AS ({_AUG_BLOCKLIST_SQL}),
    feat AS (
        SELECT doc_id,
               list_transform(
                   regexp_extract_all(text,
                       'https?://([A-Za-z0-9.-]+)', 1),
                   d -> lower(d)) AS domains,
               string_split_regex(lower(text), '\\s+') AS toks
        FROM aug
    )
    SELECT doc_id,
           len(domains) AS n_urls,
           coalesce(array_to_string(domains, ','), '') AS domains_csv,
           CAST(len(list_filter(domains,
               d -> list_contains(['spam.example.com',
                                   'tracker.example.net'], d))) AS INT)
               AS n_blocked_domains,
           CAST(len(list_filter(toks,
               t -> list_contains(['crapcoin', 'scamtoken'], t))) AS INT)
               AS n_bad_words,
           len(list_filter(domains,
               d -> list_contains(['spam.example.com',
                                   'tracker.example.net'], d))) = 0
           AND len(list_filter(toks,
               t -> list_contains(['crapcoin', 'scamtoken'], t))) = 0
               AS keep
    FROM feat
    """,
    tags=("text", "quality", "curation", "extension"),
)
def text_blocklist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4/RefinedWeb lexical blocklist screening: extract every
    outbound link host (lower-cased, in appearance order), count hits
    against a domain blocklist and blocklisted tokens against the
    word list, and emit the conjunctive ``keep``. One shuffle-free
    regex projection — blocklist membership compiles into the plan
    (functions/blocklists.py documents the broadcast-anti-join form
    for production-size lists)."""
    aug = _augment_blocklist(load_table(spark, sf_dir, "documents"))
    domains = url_domains(F.col("text"))
    return aug.select(
        "doc_id",
        F.size(domains).alias("n_urls"),
        F.array_join(domains, ",").alias("domains_csv"),
        blocked_domain_count(F.col("text"))
        .cast("int")
        .alias("n_blocked_domains"),
        bad_word_count(F.col("text")).cast("int").alias("n_bad_words"),
        (
            (blocked_domain_count(F.col("text")) == 0)
            & (bad_word_count(F.col("text")) == 0)
        ).alias("keep"),
    )


# ---------------------------------------------------------------------------
# Gopher-style composite quality filter
# ---------------------------------------------------------------------------

_TOKS = "string_split_regex(lower(text), '\\s+')"
_STOPS = "['" + "','".join(STOPWORDS) + "']"


# ---------------------------------------------------------------------------
# token-budget sampling
# ---------------------------------------------------------------------------


# shared by every admission-ordered query (token budgets, mixture,
# shards, packing): the deterministic pseudo-random global order.
# ONE definition — the distributed prefix-sum twin certifies that
# every consumer produces identical cumulative sums, which only
# holds while they all order by this exact expression.
def _admission_hash() -> F.Column:
    return F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
    ).cast("long")


# shared by the shingle-level audit oracles below: distinct word
# 3-grams per document, the SQL mirror of operators/dedup.py::
# word_shingles(n=3, distinct=True) (extensions.py keeps a separate
# mirror operating on its duplicate-injected corpus CTE)
def _shingle3_sql(table: str) -> str:
    return f"""
        SELECT DISTINCT doc_id,
               unnest(list_transform(
                   range(1, len(string_split_regex(lower(text), '\\s+')) - 1),
                   i -> string_split_regex(lower(text), '\\s+')[i] || ' ' ||
                        string_split_regex(lower(text), '\\s+')[i + 1] || ' ' ||
                        string_split_regex(lower(text), '\\s+')[i + 2]
               )) AS shingle
        FROM {table}
    """


# shared by sample_token_budget and its distributed twin: both must
# produce the IDENTICAL per-document cumulative sums
_TOKEN_BUDGET_ORACLE = f"""
    WITH t AS (
        SELECT doc_id, lang, len({_TOKS}) AS n_tokens,
               CAST(CONCAT('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                    AS BIGINT) AS h
        FROM documents
    )
    SELECT doc_id, lang, n_tokens,
           CAST(sum(n_tokens) OVER w AS BIGINT) AS cum_tokens,
           sum(n_tokens) OVER w - n_tokens < 2000 AS kept
    FROM t
    WINDOW w AS (PARTITION BY lang ORDER BY h, doc_id ROWS UNBOUNDED PRECEDING)
    """


@register(
    "sample_token_budget",
    oracle=_TOKEN_BUDGET_ORACLE,
    tags=("sampling", "curation", "extension"),
)
def sample_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget sampling: admit documents per language, in
    deterministic hash order, until each language's 2000-token budget
    is exhausted — the 'mix N billion tokens per source' knob of a
    pretraining data recipe, with no RNG state (the md5 order is
    reproducible on any engine, any partitioning). One window cumsum
    per language; a doc is kept iff the budget wasn't exhausted
    before it started, so the sample slightly overshoots rather than
    splitting a document."""
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    h = _admission_hash()
    t = docs.select(
        "doc_id", "lang",
        F.size(tokens(F.col("text"))).alias("n_tokens"),
        h.alias("h"),
    )
    w = (
        W.partitionBy("lang")
        .orderBy("h", "doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    return t.select(
        "doc_id", "lang", "n_tokens",
        cum.alias("cum_tokens"),
        ((cum - F.col("n_tokens")) < 2000).alias("kept"),
    )


# target mixture: tokens admitted per language before the gate closes
# (the "data recipe" weights, scaled to a 10k-token total here)
_MIX_WEIGHTS = {"en": 4000, "de": 1500, "es": 1500, "fr": 1500, "zh": 1500}
_MIX_SQL = (
    "CASE lang "
    + " ".join(f"WHEN '{k}' THEN {v}" for k, v in _MIX_WEIGHTS.items())
    + " ELSE 0 END"
)


@register(
    "sample_mixture_weights",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, lang, len({_TOKS}) AS n_tokens,
               CAST(CONCAT('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                    AS BIGINT) AS h
        FROM documents
    ),
    c AS (
        SELECT doc_id, lang, n_tokens,
               CAST(sum(n_tokens) OVER w AS BIGINT) AS cum,
               {_MIX_SQL} AS budget
        FROM t
        WINDOW w AS (PARTITION BY lang ORDER BY h, doc_id
                     ROWS UNBOUNDED PRECEDING)
    )
    SELECT lang,
           CAST(max(budget) AS BIGINT) AS budget,
           CAST(count(*) FILTER (WHERE cum - n_tokens < budget) AS BIGINT)
               AS kept_docs,
           CAST(coalesce(sum(n_tokens) FILTER (WHERE cum - n_tokens < budget), 0)
                AS BIGINT) AS kept_tokens
    FROM c GROUP BY lang
    """,
    tags=("sampling", "curation", "extension"),
)
def sample_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted data-mixture sampling: each language admits documents
    (deterministic md5 order) until ITS OWN token budget — the recipe
    weight — is exhausted; the per-language summary reports the
    realized mixture. This is the 'N billion tokens of source X'
    composition step of a pretraining recipe, built on the same
    cumsum-admission machinery as ``sample_token_budget`` (whose
    distributed prefix-sum twin is the certified 100 TB form)."""
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    h = _admission_hash()
    budget = F.lit(0)
    for k, v in _MIX_WEIGHTS.items():
        budget = F.when(F.col("lang") == k, v).otherwise(budget)
    t = docs.select(
        "doc_id", "lang",
        F.size(tokens(F.col("text"))).alias("n_tokens"),
        h.alias("h"),
    )
    w = (
        W.partitionBy("lang")
        .orderBy("h", "doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    c = t.select(
        "lang", "n_tokens",
        F.sum("n_tokens").over(w).alias("cum"),
        budget.alias("budget"),
    )
    kept = F.col("cum") - F.col("n_tokens") < F.col("budget")
    return c.groupBy("lang").agg(
        F.max("budget").cast("long").alias("budget"),
        F.sum(kept.cast("int")).cast("long").alias("kept_docs"),
        F.coalesce(
            F.sum(F.when(kept, F.col("n_tokens"))), F.lit(0)
        ).cast("long").alias("kept_tokens"),
    )


@register(
    "sample_token_budget_distributed",
    oracle=_TOKEN_BUDGET_ORACLE,
    tags=("sampling", "curation", "extension", "scale"),
)
def sample_token_budget_distributed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SCALE form of ``sample_token_budget`` — same output, no
    per-language mega-partition: a per-language window puts ALL of a
    language's documents in one window partition (the 100 TB
    failure mode), so here the global cumulative sum is a classic
    two-phase distributed prefix sum instead:

    1. bucket documents by the TOP BITS of the order hash
       (order-aligned: bucket order == hash order);
    2. per-(lang, bucket) token totals — a tiny table — get
       prefix-summed with a window over ≤256 rows per language and
       broadcast back as bucket offsets;
    3. each bucket computes its LOCAL cumsum (window partition =
       one bucket, bounded) and adds its offset.

    Certified against the IDENTICAL oracle as the single-window
    form: both must produce the same per-document cumulative sums —
    the equivalence of the distributed decomposition is
    value-checked, not asserted."""
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    h = _admission_hash()
    t = docs.select(
        "doc_id", "lang",
        F.size(tokens(F.col("text"))).alias("n_tokens"),
        h.alias("h"),
    ).withColumn("b", F.shiftright("h", 24))  # h < 2^32 → 256 buckets

    per_bucket = t.groupBy("lang", "b").agg(
        F.sum("n_tokens").alias("bucket_tokens")
    )
    wb = (
        W.partitionBy("lang")
        .orderBy("b")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    offsets = per_bucket.select(
        "lang", "b",
        F.coalesce(F.sum("bucket_tokens").over(wb), F.lit(0)).alias("offset"),
    )
    wl = (
        W.partitionBy("lang", "b")
        .orderBy("h", "doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    local_cum = F.sum("n_tokens").over(wl)
    joined = t.join(F.broadcast(offsets), ["lang", "b"])
    cum = F.col("offset") + local_cum
    return joined.select(
        "doc_id", "lang", "n_tokens",
        cum.alias("cum_tokens"),
        ((cum - F.col("n_tokens")) < 2000).alias("kept"),
    )


@register(
    "sequence_packing_manifest",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, len({_TOKS}) AS n_tokens,
               CAST(CONCAT('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                    AS BIGINT) AS h
        FROM documents
    ),
    c AS (
        SELECT doc_id, n_tokens,
               CAST(sum(n_tokens) OVER (ORDER BY h, doc_id
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        FROM t
    )
    SELECT doc_id, n_tokens,
           CAST((cum - n_tokens) // 512 AS BIGINT) AS bin_start,
           CAST((cum - 1) // 512 AS BIGINT) AS bin_end,
           CAST((cum - 1) // 512 - (cum - n_tokens) // 512 AS BIGINT)
               AS n_boundary_crossings,
           CAST((cum - n_tokens) % 512 AS BIGINT) AS offset_in_bin
    FROM c
    """,
    tags=("sampling", "layout", "chunking", "curation", "extension"),
)
def sequence_packing_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: concatenate all documents in a deterministic
    md5 pseudo-random order and cut the token stream into 512-token
    training sequences — the standard pretraining layout (documents
    straddle context boundaries; nothing is padded or dropped). Each
    document reports its first/last bin, how many boundaries cross
    it, and its offset within its first bin — everything a packed
    writer needs, from ONE global cumulative sum (the distributed
    prefix-sum form of which is certified by
    ``sample_token_budget_distributed``)."""
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    h = _admission_hash()
    t = docs.select(
        "doc_id",
        F.size(tokens(F.col("text"))).alias("n_tokens"),
        h.alias("h"),
    )
    w = W.orderBy("h", "doc_id").rowsBetween(W.unboundedPreceding, W.currentRow)
    cum = F.sum("n_tokens").over(w)
    c = t.select("doc_id", "n_tokens", cum.alias("cum"))
    start = F.floor((F.col("cum") - F.col("n_tokens")) / 512)
    end = F.floor((F.col("cum") - 1) / 512)
    return c.select(
        "doc_id",
        "n_tokens",
        start.alias("bin_start"),
        end.alias("bin_end"),
        (end - start).alias("n_boundary_crossings"),
        ((F.col("cum") - F.col("n_tokens")) % 512).alias("offset_in_bin"),
    )


# ---------------------------------------------------------------------------
# deterministic shuffle-and-shard (training-data layout)
# ---------------------------------------------------------------------------


@register(
    "training_shards_manifest",
    oracle=f"""
    WITH h AS (
        SELECT doc_id, len({_TOKS}) AS n_tokens,
               CAST(CONCAT('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                    AS BIGINT) AS h
        FROM documents
    ),
    ranked AS (
        SELECT *, row_number() OVER (ORDER BY h, doc_id) AS rn FROM h
    )
    SELECT CAST((rn - 1) // 100 AS BIGINT) AS shard_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
           CAST(min(doc_id) AS BIGINT) AS min_doc,
           CAST(max(doc_id) AS BIGINT) AS max_doc
    FROM ranked GROUP BY 1
    """,
    tags=("sampling", "layout", "curation", "extension"),
)
def training_shards_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle + fixed-size sharding: documents
    sort by md5(doc_id) (a reproducible pseudo-random order — no RNG
    state, same shards on any engine/partitioning) and pack into
    100-doc shards; the manifest reports per-shard doc/token counts —
    the final write-layout step before training. The exact-size form
    needs a global rank (a range-partitioned sort at scale); when
    approximate shard sizes suffice, ``pmod(hash, n_shards)`` gives
    the shuffle-free scan-shaped alternative."""
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    h = _admission_hash()
    t = docs.select(
        "doc_id", F.size(tokens(F.col("text"))).alias("n_tokens"), h.alias("h")
    )
    rn = F.row_number().over(W.orderBy("h", "doc_id"))
    sharded = t.select(
        "doc_id", "n_tokens", F.floor((rn - 1) / 100).alias("shard_id")
    )
    return sharded.groupBy("shard_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
    )


@register(
    "export_jsonl_roundtrip",
    oracle="""
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(length(text)) AS BIGINT) AS n_chars,
           CAST(sum(CAST(CONCAT('0x',
                substr(md5(CONCAT(CAST(doc_id AS VARCHAR), ':', text)), 1, 8))
                AS BIGINT)) AS BIGINT) AS content_checksum
    FROM documents GROUP BY lang
    """,
    tags=("layout", "curation", "sources", "extension"),
)
def export_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-pin of the JSONL DELIVERY path (VERDICT r8 item 7 —
    sources/files.py::write_jsonl_shards + read_jsonl_quarantined):
    the corpus is exported as bounded JSON-lines shards into a
    tempdir, read back with the explicit-schema quarantine reader,
    and summarized per language with an order-insensitive content
    checksum (sum of per-doc md5 prefixes over ``doc_id:text``).
    Matching the oracle — which computes the same stats straight off
    the parquet table — proves the JSON encode → shard → decode
    roundtrip is LOSSLESS for every document, the same way
    ``training_shards_manifest`` pins the parquet layout. The shard
    bound (max_records_per_file=50) forces a multi-file delivery so
    the check covers shard splitting, not just one file."""
    import tempfile

    from pyspark.sql import types as T

    from ..sources.files import read_jsonl_quarantined, write_jsonl_shards

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang"
    )
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
        ]
    )
    checksum = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col("doc_id").cast("string"), F.lit(":"), F.col("text")
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    with tempfile.TemporaryDirectory(prefix="jsonl_delivery_") as tmp:
        path = f"{tmp}/shards"
        write_jsonl_shards(
            docs, path, max_records_per_file=50, order_by=["doc_id"]
        )
        back, quarantine = read_jsonl_quarantined(spark, path, schema)
        out = back.groupBy("lang").agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(F.length("text")).cast("long").alias("n_chars"),
            F.sum(checksum).cast("long").alias("content_checksum"),
        )
        rows = out.collect()
        n_bad = quarantine.count()
    if n_bad:
        raise ValueError(f"jsonl roundtrip quarantined {n_bad} rows")
    return spark.createDataFrame(rows, out.schema)


@register(
    "text_novelty_score",
    oracle=f"""
    WITH sh AS ({_shingle3_sql('documents')}),
    freq AS (
        SELECT shingle, count(*) AS df FROM sh GROUP BY shingle
    )
    SELECT s.doc_id,
           CAST(count(*) AS BIGINT) AS n_shingles,
           CAST(count(*) FILTER (WHERE f.df = 1) AS BIGINT) AS n_unique,
           round(count(*) FILTER (WHERE f.df = 1) / count(*), 6) AS novelty
    FROM sh s JOIN freq f ON f.shingle = s.shingle
    GROUP BY s.doc_id
    """,
    tags=("text", "dedup", "curation", "extension"),
)
def text_novelty_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Novelty per document: the fraction of its distinct word
    3-grams found in NO other document — the inverse of the
    boilerplate signal (near-1 = original content; low = the doc is
    assembled from corpus-common phrasing). One shingle explode, one
    doc-frequency count, one join back — all linear, shuffles keyed
    on the shingle string (the same shape the dedup family uses with
    hashed keys; here the join-back needs the shingle anyway). The
    shingle table persists: both the frequency count and the
    join-back read it, and without the persist the explode+distinct
    subtree — the dominant cost — would run twice."""
    from ..operators.dedup import _reuse, word_shingles

    docs = load_table(spark, sf_dir, "documents")
    sh = _reuse(word_shingles(docs, "doc_id", "text", n=3, distinct=True))
    freq = sh.groupBy("shingle").agg(F.count("*").alias("df"))
    return (
        sh.join(freq, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum((F.col("df") == 1).cast("int")).cast("long").alias("n_unique"),
            F.round(
                F.sum((F.col("df") == 1).cast("int")) / F.count("*"), 6
            ).alias("novelty"),
        )
    )


@register(
    "dedup_cross_source_matrix",
    oracle=f"""
    WITH corpus AS (
        SELECT doc_id, text, source FROM documents
        UNION ALL
        SELECT doc_id + 1000000, text, 'copycat' FROM documents
        WHERE doc_id % 10 = 0
    ),
    sh AS ({_shingle3_sql('corpus')}),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    common AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    pairs AS (
        SELECT id_a, id_b
        FROM common
        JOIN sizes na ON na.doc_id = id_a
        JOIN sizes nb ON nb.doc_id = id_b
        WHERE c / (na.n + nb.n - c) >= 0.8
    )
    SELECT least(da.source, db.source) AS source_a,
           greatest(da.source, db.source) AS source_b,
           CAST(count(*) AS BIGINT) AS n_pairs
    FROM pairs
    JOIN corpus da ON da.doc_id = pairs.id_a
    JOIN corpus db ON db.doc_id = pairs.id_b
    GROUP BY 1, 2
    """,
    tags=("dedup", "curation", "extension"),
)
def dedup_cross_source_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WHERE the duplication comes from: exact-Jaccard near-dup pairs
    (3-gram sets, ≥ 0.8) rolled up by unordered source pair — the
    audit that tells a curation team whether duplication is
    intra-source boilerplate or cross-source scraping overlap. The
    short fixture docs produce some native ≥0.8 pairs across sources;
    every 10th document is ADDITIONALLY re-injected under a synthetic
    'copycat' source (the dedup_exact_fingerprint injection with a
    source twist) so the matrix provably attributes exact copies to
    their (srcN, copycat) cells alongside the native pairs. Pair
    generation is the certified ngram pipeline; the rollup adds two
    dimension joins keyed on doc_id."""
    from ..operators.dedup import ngram_jaccard_pairs

    base = load_table(spark, sf_dir, "documents")
    corpus = base.select("doc_id", "text", "source").unionByName(
        base.filter(F.col("doc_id") % 10 == 0).select(
            (F.col("doc_id") + 1000000).alias("doc_id"),
            "text",
            F.lit("copycat").alias("source"),
        )
    )
    pairs = ngram_jaccard_pairs(corpus, "doc_id", "text", n=3, threshold=0.8)
    src = corpus.select("doc_id", "source")
    sa = src.select(F.col("doc_id").alias("id_a"), F.col("source").alias("sa"))
    sb = src.select(F.col("doc_id").alias("id_b"), F.col("source").alias("sb"))
    return (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            F.least("sa", "sb").alias("source_a"),
            F.greatest("sa", "sb").alias("source_b"),
        )
        .groupBy("source_a", "source_b")
        .agg(F.count("*").alias("n_pairs"))
    )


def _z_sql(col: str) -> str:
    """DuckDB expression for the Morton bit-spread — generated from
    the SAME shift/mask constants the engine uses
    (operators/layout.py::_SPREAD_STEPS), so the two engines compute
    identical z-values by construction."""
    from ..operators.layout import _SPREAD_STEPS, INPUT_MASK

    x = f"(CAST({col} AS BIGINT) & {INPUT_MASK})"
    for shift, mask in _SPREAD_STEPS:
        x = f"(({x} | ({x} << {shift})) & {mask})"
    return x


@register(
    "layout_zorder_values",
    oracle=f"""
    SELECT o_orderkey, o_custkey,
           ({_z_sql('o_orderkey')} | ({_z_sql('o_custkey')} << 1)) AS z
    FROM orders
    """,
    tags=("layout", "curation", "extension"),
)
def layout_zorder_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton (Z-curve) interleave of (o_orderkey, o_custkey) — the
    clustering key behind ``write_zordered`` (operators/layout.py):
    sorting on it keeps every parquet file inside a small rectangle
    of both key ranges, so min/max stats prune row groups for
    predicates on EITHER column. Pure int64 shift/mask arithmetic,
    oracle-identical by construction (shared constants)."""
    from ..operators.layout import z_value

    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        "o_custkey",
        z_value(F.col("o_orderkey"), F.col("o_custkey")).alias("z"),
    )


# ---------------------------------------------------------------------------
# BPE merge-rule learning (tokenizer fitting)
# ---------------------------------------------------------------------------


def _bpe_learn_ctes(n_merges: int = 4) -> list[str]:
    """The shared learning-loop CTE chain (vocab → s0, then per round
    pair counts p_r → winner b_r → merged s_{r+1}) — DuckDB mirror of
    operators/bpe.py::_learn_rules: deterministic top-1, merge applied
    via a list_reduce fold with the identical leftmost non-overlapping
    semantics."""
    ctes = ["""
    vocab AS (
        SELECT word, CAST(count(*) AS BIGINT) AS freq FROM (
            SELECT unnest(string_split_regex(lower(text), '\\s+')) AS word
            FROM documents
        ) WHERE word != '' GROUP BY word
    )""", """
    s0 AS (SELECT word, freq, string_split(word, '') AS syms FROM vocab)"""]
    for r in range(n_merges):
        ctes.append(f"""
    p{r} AS (
        SELECT s.syms[i] AS l, s.syms[i + 1] AS r,
               CAST(sum(s.freq) AS BIGINT) AS pair_count
        FROM s{r} s, unnest(range(1, len(s.syms))) AS u(i)
        GROUP BY 1, 2
    )""")
        ctes.append(f"""
    b{r} AS (
        SELECT {r} AS merge_rank, l, r, pair_count FROM p{r}
        ORDER BY pair_count DESC, l, r LIMIT 1
    )""")
        if r < n_merges - 1:
            ctes.append(f"""
    s{r + 1} AS (
        SELECT s.word, s.freq,
               list_reduce(list_transform(s.syms, x -> [x]),
                   (acc, e) -> CASE WHEN acc[-1] = b.l AND e[1] = b.r
                                    THEN list_append(acc[1:-2], b.l || b.r)
                                    ELSE list_append(acc, e[1]) END) AS syms
        FROM s{r} s, b{r} b
    )""")
    return ctes


def _bpe_oracle(n_merges: int = 4) -> str:
    union = "\n    UNION ALL ".join(
        f"SELECT merge_rank, l AS left_sym, r AS right_sym, pair_count FROM b{r}"
        for r in range(n_merges)
    )
    return "WITH " + ",".join(_bpe_learn_ctes(n_merges)) + "\n    " + union


def _bpe_tokenize_oracle(n_merges: int = 4) -> str:
    """Re-learn the rules (shared CTEs), then apply each in order to
    every document's words and count."""
    ctes = list(_bpe_learn_ctes(n_merges))
    ctes.append("""
    t0 AS (
        SELECT doc_id, word, string_split(word, '') AS syms FROM (
            SELECT doc_id,
                   unnest(string_split_regex(lower(text), '\\s+')) AS word
            FROM documents
        ) WHERE word != ''
    )""")
    for r in range(n_merges):
        # LEFT JOIN ON TRUE: an EMPTY rule (pairs exhausted before
        # n_merges rounds) must leave documents untouched — a plain
        # cross join would annihilate every row (engine mirror:
        # operators/bpe.py::_apply_rule)
        ctes.append(f"""
    t{r + 1} AS (
        SELECT t.doc_id, t.word,
               CASE WHEN b.l IS NULL THEN t.syms
                    ELSE list_reduce(list_transform(t.syms, x -> [x]),
                        (acc, e) -> CASE WHEN acc[-1] = b.l AND e[1] = b.r
                                         THEN list_append(acc[1:-2], b.l || b.r)
                                         ELSE list_append(acc, e[1]) END)
               END AS syms
        FROM t{r} t LEFT JOIN b{r} b ON TRUE
    )""")
    return (
        "WITH " + ",".join(ctes) + f"""
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(length(word)) AS BIGINT) AS n_chars,
           CAST(sum(len(syms)) AS BIGINT) AS n_bpe_tokens,
           round(sum(length(word)) / sum(len(syms)), 6) AS compression
    FROM t{n_merges} GROUP BY doc_id"""
    )


@register(
    "text_bpe_token_counts",
    oracle=_bpe_tokenize_oracle(),
    tags=("text", "vocab", "tokenizer", "curation", "extension"),
)
def text_bpe_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize every document with the corpus-learned BPE rules and
    report per-doc word/char/BPE-token counts plus chars-per-token
    compression — the token-budget estimate a training recipe needs,
    computed by the engine's own learned tokenizer. The oracle
    re-learns the rules AND re-tokenizes every document in SQL."""
    from ..operators.bpe import bpe_token_counts

    docs = load_table(spark, sf_dir, "documents")
    return bpe_token_counts(docs, "doc_id", "text", n_merges=4)


@register(
    "vocab_bpe_merge_rules",
    oracle=_bpe_oracle(),
    tags=("text", "vocab", "tokenizer", "curation", "extension"),
)
def vocab_bpe_merge_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First 4 BPE merge rules learned from the corpus — tokenizer
    fitting as dataflow (operators/bpe.py): pair counts aggregate the
    word VOCABULARY (corpus-size-independent after the first pass),
    each round's winner broadcasts back as a 1-row rule, merges apply
    via an array fold with exact leftmost BPE semantics. The oracle
    re-learns all 4 rounds in SQL (list_reduce fold), so the learned
    rules AND their counts hash-match."""
    from ..operators.bpe import bpe_merge_rules

    docs = load_table(spark, sf_dir, "documents")
    return bpe_merge_rules(docs, "text", n_merges=4)


@register(
    "text_bpe_token_counts_scaled",
    oracle=_bpe_tokenize_oracle(),
    tags=("text", "vocab", "tokenizer", "curation", "extension"),
)
def text_bpe_token_counts_scaled(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The SCALE-path BPE application: learn the rules with the
    certified dataflow learner, COLLECT them (tokenizer metadata —
    kilobytes), and tokenize every document in one Arrow-batched
    ``mapInPandas`` stage with constant plan depth
    (operators/bpe.py::apply_bpe_rules). The dataflow twin
    (``text_bpe_token_counts``) chains one broadcast join per rule —
    right at n_merges=4, impossible at a production vocabulary's 30k
    merges. Same oracle as the twin, so the driver certifies the
    Python tokenizer's output value-for-value against DuckDB's
    list_reduce fold."""
    from ..operators.bpe import apply_bpe_rules, bpe_merge_rules

    docs = load_table(spark, sf_dir, "documents")
    rules = (
        bpe_merge_rules(docs, "text", n_merges=4)
        .orderBy("merge_rank")
        .collect()
    )
    return apply_bpe_rules(docs, rules, "doc_id", "text")


# ---------------------------------------------------------------------------
# corpus bigram language-model score (CCNet-style quality signal)
# ---------------------------------------------------------------------------


@register(
    "text_bigram_logprob",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, {_TOKS} AS t FROM documents
    ),
    big AS (
        SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
        FROM toks, unnest(range(1, len(t))) AS u(i)
        WHERE len(t) >= 2
    ),
    cb AS (SELECT w1, w2, count(*) AS c_bi FROM big GROUP BY 1, 2),
    cc AS (SELECT w1, count(*) AS c_ctx FROM big GROUP BY 1),
    v AS (SELECT count(DISTINCT w1) AS v FROM big)
    SELECT b.doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           round(avg(ln((cb.c_bi + 0.5) / (cc.c_ctx + 0.5 * v.v))), 6)
               AS avg_logprob
    FROM big b
    JOIN cb ON cb.w1 = b.w1 AND cb.w2 = b.w2
    JOIN cc ON cc.w1 = b.w1
    CROSS JOIN v
    GROUP BY b.doc_id
    """,
    tags=("text", "quality", "curation", "extension"),
)
def text_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus bigram language-model score per document (the CCNet
    idea with the corpus as its own LM): P(w2|w1) from corpus bigram /
    context counts with add-0.5 smoothing over the context vocabulary,
    scored as the mean log-probability of each document's bigrams.
    Low scores = text unlike the corpus (spam, wrong language,
    boilerplate). Shapes: one bigram explode, two grouped counts
    (map-side partial), one join back keyed on the bigram — every
    aggregation linear, no Python."""
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    idx = F.when(
        F.size(toks) >= 2, F.sequence(F.lit(1), F.size(toks) - 1)
    ).otherwise(F.array().cast("array<int>"))
    pairs = F.transform(
        idx,
        lambda i: F.struct(
            F.element_at(toks, i).alias("w1"),
            F.element_at(toks, i + 1).alias("w2"),
        ),
    )
    big = docs.select("doc_id", F.explode(pairs).alias("b")).select(
        "doc_id", "b.w1", "b.w2"
    )
    cb = big.groupBy("w1", "w2").agg(F.count("*").alias("c_bi"))
    cc = big.groupBy("w1").agg(F.count("*").alias("c_ctx"))
    v = big.select(F.count_distinct("w1").alias("v"))
    lp = F.log((F.col("c_bi") + 0.5) / (F.col("c_ctx") + 0.5 * F.col("v")))
    return (
        big.join(cb, ["w1", "w2"])
        .join(cc, "w1")
        .crossJoin(F.broadcast(v))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(F.avg(lp), 6).alias("avg_logprob"),
        )
    )


@register(
    "filter_quality_quantile",
    oracle=f"""
    WITH q AS (
        SELECT doc_id,
               length(text) AS n,
               round((length(text) - length(regexp_replace(text, '[^A-Za-z0-9\\s]', '', 'g')))
                     / length(text), 6) AS p_ratio,
               round(len(list_filter({_TOKS}, x -> list_contains({_STOPS}, x)))
                     / len({_TOKS}), 6) AS s_ratio,
               round(list_aggregate(list_transform({_TOKS}, x -> length(x)), 'sum')
                     / len({_TOKS}), 6) AS mtl
        FROM documents
    ),
    scored AS (
        SELECT doc_id,
               round(((CASE WHEN n >= 100 AND n <= 20000 THEN 1.0
                            WHEN n >= 30 THEN 0.5 ELSE 0.0 END)
                      + (CASE WHEN p_ratio <= 0.1 THEN 1.0 ELSE 0.0 END)
                      + (CASE WHEN s_ratio >= 0.05 THEN 1.0 ELSE 0.0 END)
                      + (CASE WHEN mtl >= 2.5 AND mtl <= 12 THEN 1.0 ELSE 0.0 END)
                     ) / 4.0, 6) AS quality
        FROM q
    )
    SELECT doc_id, quality,
           round(percent_rank() OVER (ORDER BY quality), 6) AS quality_pct,
           percent_rank() OVER (ORDER BY quality) >= 0.5 AS kept
    FROM scored
    """,
    tags=("text", "quality", "sampling", "curation", "extension"),
)
def filter_quality_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile-based quality gate: keep the top half of the corpus by
    composite quality score — 'filter by score percentile' is how
    pretraining recipes apply learned or heuristic quality signals
    without hand-picking a threshold. percent_rank is deterministic
    under ties (ties share a rank), so the cut is engine-reproducible.
    Note the single-partition window: a global rank IS a global sort —
    at 100 TB the same cut is taken with approx_percentile to find
    the threshold value, then a scan-shaped filter; both forms exist
    here (`agg_approx_percentiles` certifies the sketch)."""
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id", quality_score(F.col("text")).alias("quality")
    )
    w = W.orderBy("quality")
    pct = F.percent_rank().over(w)
    return scored.select(
        "doc_id",
        "quality",
        F.round(pct, 6).alias("quality_pct"),
        (pct >= 0.5).alias("kept"),
    )


# ---------------------------------------------------------------------------
# semantic dedup (SemDeDup-style)
# ---------------------------------------------------------------------------

# DuckDB mirror of the deterministic IVF clustering through nearest-
# centroid assignment (same CTE chain as _ivf_oracle in extensions.py);
# train_where restricts quantizer TRAINING (seeds + refinement) while
# assignment covers every vector — the frozen-quantizer store contract
def _semdedup_clusters_sql(train_where: str | None = None) -> str:
    train = f"WHERE {train_where}" if train_where else ""
    train_and = f"WHERE v.{train_where}" if train_where else ""
    return f"""
    v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    seeds AS (
        SELECT vec_id AS centroid_id, e AS c_vec
        FROM v {train} ORDER BY vec_id LIMIT 16
    ),
    assign0 AS (
        SELECT vec_id, centroid_id FROM (
            SELECT v.vec_id, s.centroid_id,
                   row_number() OVER (
                       PARTITION BY v.vec_id
                       ORDER BY list_dot_product(v.e, s.c_vec)
                                / sqrt(list_dot_product(s.c_vec, s.c_vec)) DESC,
                                s.centroid_id) AS rn
            FROM v, seeds s {train_and}
        ) WHERE rn = 1
    ),
    comp AS (
        SELECT a.centroid_id, j - 1 AS pos, round(avg(v.e[j]), 6) AS m
        FROM assign0 a
        JOIN v USING (vec_id), unnest(generate_series(1, len(v.e))) AS u(j)
        GROUP BY 1, 2
    ),
    cents AS (
        SELECT centroid_id, list(m ORDER BY pos) AS c_vec
        FROM comp GROUP BY centroid_id
    ),
    clusters AS (
        SELECT vec_id, centroid_id FROM (
            SELECT v.vec_id, c.centroid_id,
                   row_number() OVER (
                       PARTITION BY v.vec_id
                       ORDER BY list_dot_product(v.e, c.c_vec)
                                / sqrt(list_dot_product(c.c_vec, c.c_vec)) DESC,
                                c.centroid_id) AS rn
            FROM v, cents c
        ) WHERE rn = 1
    ),
    pairs AS (
        SELECT a.centroid_id, a.vec_id AS id_a, b.vec_id AS id_b,
               round(list_dot_product(va.e, vb.e)
                     / (sqrt(list_dot_product(va.e, va.e))
                        * sqrt(list_dot_product(vb.e, vb.e))), 6) AS cosine_sim
        FROM clusters a
        JOIN clusters b ON a.centroid_id = b.centroid_id AND a.vec_id < b.vec_id
        JOIN v va ON va.vec_id = a.vec_id
        JOIN v vb ON vb.vec_id = b.vec_id
    )
"""


_SEMDEDUP_CLUSTERS_SQL = _semdedup_clusters_sql()


@register(
    "embedding_semdedup_pairs",
    oracle=f"""
    WITH {_SEMDEDUP_CLUSTERS_SQL}
    SELECT centroid_id, id_a, id_b, cosine_sim
    FROM pairs WHERE cosine_sim >= 0.4
    """,
    tags=("similarity", "dedup", "curation", "extension"),
)
def embedding_semdedup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup candidate pairs: deterministic IVF clustering of the
    embedding space (16 clusters), then cosine ≥ 0.4 pairs WITHIN
    each cluster only — pair search bounded by cluster size, never n²
    (operators/semdedup.py; nlist is the 100 TB scale dial)."""
    from ..operators.semdedup import semdedup_pairs

    emb = load_table(spark, sf_dir, "embeddings")
    return semdedup_pairs(emb, "vec_id", "embedding", nlist=16, threshold=0.4)


@register(
    "embedding_semdedup_keep",
    oracle=f"""
    WITH {_SEMDEDUP_CLUSTERS_SQL}
    SELECT c.vec_id, c.centroid_id,
           c.vec_id IN (SELECT id_b FROM pairs WHERE cosine_sim >= 0.4)
               AS is_duplicate
    FROM clusters c
    """,
    tags=("similarity", "dedup", "curation", "extension"),
)
def embedding_semdedup_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup verdict per vector: duplicate iff it is the larger id
    of some within-cluster pair at cosine ≥ 0.4 (each similar group
    keeps its lowest id). The curation decision a training pipeline
    applies before tokenization."""
    from ..operators.semdedup import semdedup_keep

    emb = load_table(spark, sf_dir, "embeddings")
    return semdedup_keep(emb, "vec_id", "embedding", nlist=16, threshold=0.4)


@register(
    "quality_classifier_scores",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, unnest({_TOKS}) AS tok FROM documents
    ),
    w AS (
        SELECT doc_id,
               (((CAST(CONCAT('0x', substr(md5(tok), 1, 8)) AS BIGINT)
                  % 4096) * 2654435761) % 2049) / 1024.0 - 1.0 AS w
        FROM tok WHERE tok != ''
    ),
    m AS (
        SELECT doc_id, avg(w) AS margin,
               CAST(count(*) AS BIGINT) AS n_tokens
        FROM w GROUP BY doc_id
    )
    SELECT d.doc_id,
           round(1.0 / (1.0 + exp(-m.margin)), 6) AS score,
           coalesce(m.margin >= 0, FALSE) AS kept,
           coalesce(m.n_tokens, 0) AS n_tokens
    FROM documents d LEFT JOIN m USING (doc_id)
    """,
    tags=("text", "quality", "curation", "ml", "extension"),
)
def quality_classifier_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality filter (CCNet/DCLM-style linear classifier
    over hashed bag-of-words, operators/classify.py): tokenize →
    portable feature-hash → per-token weight → one grouped avg →
    sigmoid; kept = margin ≥ 0. Runs the deterministic placeholder
    weights (dyadic k/1024, so the avg is association-order-exact and
    the oracle compares bit-for-bit); the learned-weights broadcast
    path is the same dataflow, pinned equivalent in tests."""
    from ..operators.classify import classifier_scores

    docs = load_table(spark, sf_dir, "documents")
    return classifier_scores(docs)


@register(
    "quality_classifier_trained",
    oracle="""
    WITH tok AS (
        SELECT lang = 'en' AS pos,
               unnest(string_split_regex(lower(text), '\\s+')) AS tok
        FROM documents
    ),
    b AS (
        SELECT (CAST(CONCAT('0x', substr(md5(tok), 1, 8)) AS BIGINT)
                % 4096) AS bucket, pos
        FROM tok WHERE tok != ''
    ),
    counts AS (
        SELECT bucket,
               sum(CASE WHEN pos THEN 1 ELSE 0 END) AS n_pos,
               sum(CASE WHEN pos THEN 0 ELSE 1 END) AS n_neg
        FROM b GROUP BY bucket
    ),
    totals AS (
        SELECT sum(n_pos) AS tot_pos, sum(n_neg) AS tot_neg FROM counts
    ),
    w AS (
        SELECT bucket,
               ln((n_pos + 0.5) / (t.tot_pos + 0.5))
               - ln((n_neg + 0.5) / (t.tot_neg + 0.5)) AS weight
        FROM counts CROSS JOIN totals t
    ),
    dtok AS (
        SELECT doc_id,
               (CAST(CONCAT('0x', substr(md5(tok), 1, 8)) AS BIGINT)
                % 4096) AS bucket
        FROM (
            SELECT doc_id,
                   unnest(string_split_regex(lower(text), '\\s+')) AS tok
            FROM documents
        ) WHERE tok != ''
    ),
    m AS (
        SELECT d.doc_id, avg(coalesce(w.weight, 0.0)) AS margin,
               CAST(count(*) AS BIGINT) AS n_tokens
        FROM dtok d LEFT JOIN w USING (bucket) GROUP BY d.doc_id
    )
    SELECT doc.doc_id,
           round(1.0 / (1.0 + exp(-m.margin)), 6) AS score,
           coalesce(m.margin >= 0, FALSE) AS kept,
           coalesce(m.n_tokens, 0) AS n_tokens
    FROM documents doc LEFT JOIN m USING (doc_id)
    """,
    tags=("text", "quality", "curation", "ml", "extension"),
)
def quality_classifier_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The classifier's FULL fit→infer lifecycle in one certified
    path (the BPE fit+apply pattern, for the learned quality filter):
    weights are LEARNED from the corpus — smoothed naive-Bayes
    log-odds per hashed feature bucket, positive class = lang 'en'
    (DCLM's "positive = the curated slice", with the fixture's
    language label standing in for the curated flag) — then applied
    through the same broadcast-weights inference path as
    ``quality_classifier_scores``. Training is one aggregation pass;
    the learned table is kilobytes and broadcasts
    (operators/classify.py::train_bucket_weights)."""
    from ..operators.classify import classifier_scores, train_bucket_weights

    docs = load_table(spark, sf_dir, "documents")
    weights = train_bucket_weights(docs, F.col("lang") == "en")
    return classifier_scores(docs, weights=weights)


@register(
    "quality_classifier_eval",
    oracle="""
    WITH tok AS (
        SELECT lang = 'en' AS pos,
               unnest(string_split_regex(lower(text), '\\s+')) AS tok
        FROM documents WHERE doc_id % 3 != 0
    ),
    b AS (
        SELECT (CAST(CONCAT('0x', substr(md5(tok), 1, 8)) AS BIGINT)
                % 4096) AS bucket, pos
        FROM tok WHERE tok != ''
    ),
    counts AS (
        SELECT bucket,
               sum(CASE WHEN pos THEN 1 ELSE 0 END) AS n_pos,
               sum(CASE WHEN pos THEN 0 ELSE 1 END) AS n_neg
        FROM b GROUP BY bucket
    ),
    totals AS (
        SELECT sum(n_pos) AS tot_pos, sum(n_neg) AS tot_neg FROM counts
    ),
    w AS (
        SELECT bucket,
               ln((n_pos + 0.5) / (t.tot_pos + 0.5))
               - ln((n_neg + 0.5) / (t.tot_neg + 0.5)) AS weight
        FROM counts CROSS JOIN totals t
    ),
    dtok AS (
        SELECT doc_id,
               (CAST(CONCAT('0x', substr(md5(tok), 1, 8)) AS BIGINT)
                % 4096) AS bucket
        FROM (
            SELECT doc_id,
                   unnest(string_split_regex(lower(text), '\\s+')) AS tok
            FROM documents WHERE doc_id % 3 = 0
        ) WHERE tok != ''
    ),
    m AS (
        SELECT d.doc_id, avg(coalesce(w.weight, 0.0)) AS margin
        FROM dtok d LEFT JOIN w USING (bucket) GROUP BY d.doc_id
    ),
    verdicts AS (
        SELECT doc.doc_id,
               coalesce(m.margin >= 0, FALSE) AS kept,
               doc.lang = 'en' AS label
        FROM (SELECT doc_id, lang FROM documents WHERE doc_id % 3 = 0) doc
        LEFT JOIN m USING (doc_id)
    ),
    c AS (
        SELECT CAST(count(*) AS BIGINT) AS n_eval,
               CAST(sum(CASE WHEN kept AND label THEN 1 ELSE 0 END)
                    AS BIGINT) AS tp,
               CAST(sum(CASE WHEN kept AND NOT label THEN 1 ELSE 0 END)
                    AS BIGINT) AS fp,
               CAST(sum(CASE WHEN NOT kept AND label THEN 1 ELSE 0 END)
                    AS BIGINT) AS fn,
               CAST(sum(CASE WHEN NOT kept AND NOT label THEN 1 ELSE 0 END)
                    AS BIGINT) AS tn
        FROM verdicts
    )
    SELECT n_eval, tp, fp, fn, tn,
           round(CAST(tp AS DOUBLE) / nullif(tp + fp, 0), 6) AS precision,
           round(CAST(tp AS DOUBLE) / nullif(tp + fn, 0), 6) AS recall,
           round(CAST(tp + tn AS DOUBLE) / n_eval, 6) AS accuracy
    FROM c
    """,
    tags=("text", "quality", "curation", "ml", "extension"),
)
def quality_classifier_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hold-out evaluation of the TRAINED quality classifier (VERDICT
    r9 item 5 — the fit path graded on predictive quality, not only
    mechanical value parity): train naive-Bayes log-odds weights on
    the doc_id % 3 != 0 slice (positive = lang 'en'), score the held
    out doc_id % 3 = 0 slice through the same broadcast-weights
    inference, and aggregate the confusion matrix + derived
    precision / recall / accuracy into one row. The whole train →
    infer → evaluate pipeline is one dataflow — two corpus passes
    (one per slice), weights and confusion both map-side-combined
    aggregations.

    Measured at sf0.01 (train 333 docs / holdout 167, 'en' base rate
    0.449): accuracy 0.563, precision 0.513, recall 0.533 — barely
    above the 0.551 majority baseline, because the fixture's text is
    random words whose unigram distribution carries almost no
    language signal (ROUND9.md's weak-signal caveat, now a measured
    number instead of a caveat). The shape, not the ceiling, is the
    deliverable: a real deployment swaps the label column and the
    tokenizer, never the dataflow."""
    from ..operators.classify import classifier_scores, train_bucket_weights

    docs = load_table(spark, sf_dir, "documents")
    train = docs.filter(F.col("doc_id") % 3 != 0)
    holdout = docs.filter(F.col("doc_id") % 3 == 0)
    weights = train_bucket_weights(train, F.col("lang") == "en")
    scored = classifier_scores(holdout, weights=weights)
    labeled = scored.join(
        holdout.select("doc_id", (F.col("lang") == "en").alias("label")),
        "doc_id",
    )
    kept, label = F.col("kept"), F.col("label")
    c = labeled.agg(
        F.count("*").cast("long").alias("n_eval"),
        F.sum(F.when(kept & label, 1).otherwise(0)).cast("long").alias("tp"),
        F.sum(F.when(kept & ~label, 1).otherwise(0)).cast("long").alias("fp"),
        F.sum(F.when(~kept & label, 1).otherwise(0)).cast("long").alias("fn"),
        F.sum(F.when(~kept & ~label, 1).otherwise(0)).cast("long").alias("tn"),
    )
    return c.select(
        "n_eval", "tp", "fp", "fn", "tn",
        F.round(
            F.col("tp") / F.nullif(F.col("tp") + F.col("fp"), F.lit(0)), 6
        ).alias("precision"),
        F.round(
            F.col("tp") / F.nullif(F.col("tp") + F.col("fn"), F.lit(0)), 6
        ).alias("recall"),
        F.round((F.col("tp") + F.col("tn")) / F.col("n_eval"), 6).alias(
            "accuracy"
        ),
    )


# vocabulary-distinct planted labels for the eval that CAN fail
# (VERDICT r10/r11: the lang-label eval measures 0.563 vs a 0.551
# majority because the fixture shares one vocabulary across languages
# — a ceiling of the fixture, not a property of the classifier). Each
# class appends three marker tokens from ITS OWN four-token lexicon on
# top of the shared random-word noise, label independent of lang.
_PLANTED_CLS_SQL = """
    SELECT doc_id,
           doc_id % 2 = 0 AS label,
           text || CASE WHEN doc_id % 2 = 0
                THEN ' goodlex' || CAST(doc_id % 4 AS VARCHAR)
                     || ' goodlex' || CAST((doc_id + 1) % 4 AS VARCHAR)
                     || ' goodlex' || CAST((doc_id + 2) % 4 AS VARCHAR)
                ELSE ' spamlex' || CAST(doc_id % 4 AS VARCHAR)
                     || ' spamlex' || CAST((doc_id + 1) % 4 AS VARCHAR)
                     || ' spamlex' || CAST((doc_id + 2) % 4 AS VARCHAR)
                END AS text
    FROM documents
"""


def _augment_planted_cls(docs: DataFrame) -> DataFrame:
    did, t = F.col("doc_id"), F.col("text")

    def lex(base: str) -> F.Column:
        return F.concat(
            F.lit(f" {base}"), (did % 4).cast("string"),
            F.lit(f" {base}"), ((did + 1) % 4).cast("string"),
            F.lit(f" {base}"), ((did + 2) % 4).cast("string"),
        )

    return docs.select(
        "doc_id",
        (did % 2 == 0).alias("label"),
        F.concat(
            t, F.when(did % 2 == 0, lex("goodlex")).otherwise(lex("spamlex"))
        ).alias("text"),
    )


@register(
    "quality_classifier_eval_planted",
    oracle=f"""
    WITH planted AS ({_PLANTED_CLS_SQL}),
    tok AS (
        SELECT label AS pos,
               unnest(string_split_regex(lower(text), '\\s+')) AS tok
        FROM planted WHERE doc_id % 3 != 0
    ),
    b AS (
        SELECT (CAST(CONCAT('0x', substr(md5(tok), 1, 8)) AS BIGINT)
                % 4096) AS bucket, pos
        FROM tok WHERE tok != ''
    ),
    counts AS (
        SELECT bucket,
               sum(CASE WHEN pos THEN 1 ELSE 0 END) AS n_pos,
               sum(CASE WHEN pos THEN 0 ELSE 1 END) AS n_neg
        FROM b GROUP BY bucket
    ),
    totals AS (
        SELECT sum(n_pos) AS tot_pos, sum(n_neg) AS tot_neg FROM counts
    ),
    w AS (
        SELECT bucket,
               ln((n_pos + 0.5) / (t.tot_pos + 0.5))
               - ln((n_neg + 0.5) / (t.tot_neg + 0.5)) AS weight
        FROM counts CROSS JOIN totals t
    ),
    dtok AS (
        SELECT doc_id,
               (CAST(CONCAT('0x', substr(md5(tok), 1, 8)) AS BIGINT)
                % 4096) AS bucket
        FROM (
            SELECT doc_id,
                   unnest(string_split_regex(lower(text), '\\s+')) AS tok
            FROM planted WHERE doc_id % 3 = 0
        ) WHERE tok != ''
    ),
    m AS (
        SELECT d.doc_id, avg(coalesce(w.weight, 0.0)) AS margin
        FROM dtok d LEFT JOIN w USING (bucket) GROUP BY d.doc_id
    ),
    verdicts AS (
        SELECT doc.doc_id,
               coalesce(m.margin >= 0, FALSE) AS kept,
               doc.label AS label
        FROM (SELECT doc_id, label FROM planted WHERE doc_id % 3 = 0) doc
        LEFT JOIN m USING (doc_id)
    ),
    c AS (
        SELECT CAST(count(*) AS BIGINT) AS n_eval,
               CAST(sum(CASE WHEN kept AND label THEN 1 ELSE 0 END)
                    AS BIGINT) AS tp,
               CAST(sum(CASE WHEN kept AND NOT label THEN 1 ELSE 0 END)
                    AS BIGINT) AS fp,
               CAST(sum(CASE WHEN NOT kept AND label THEN 1 ELSE 0 END)
                    AS BIGINT) AS fn,
               CAST(sum(CASE WHEN NOT kept AND NOT label THEN 1 ELSE 0 END)
                    AS BIGINT) AS tn
        FROM verdicts
    )
    SELECT n_eval, tp, fp, fn, tn,
           round(CAST(tp AS DOUBLE) / nullif(tp + fp, 0), 6) AS precision,
           round(CAST(tp AS DOUBLE) / nullif(tp + fn, 0), 6) AS recall,
           round(CAST(tp + tn AS DOUBLE) / n_eval, 6) AS accuracy
    FROM c
    """,
    tags=("text", "quality", "curation", "ml", "extension"),
)
def quality_classifier_eval_planted(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Hold-out evaluation of the trained classifier on VOCABULARY-
    DISTINCT planted labels — the eval that can actually fail (VERDICT
    r10 item 5): each class carries three marker tokens from its own
    lexicon over the shared random-word noise, the label is
    independent of lang, and majority is ~0.5, so the measured
    accuracy is attributable to the learned weights alone. Same
    train (% 3 != 0) → infer (% 3 = 0) → confusion dataflow as
    ``quality_classifier_eval``. Measured at sf0.01: accuracy 1.0
    (167/167 holdout) — the fit path demonstrably learns a separable
    signal, while the lang-label twin documents the fixture's
    shared-vocabulary ceiling."""
    from ..operators.classify import classifier_scores, train_bucket_weights

    planted = _augment_planted_cls(load_table(spark, sf_dir, "documents"))
    train = planted.filter(F.col("doc_id") % 3 != 0)
    holdout = planted.filter(F.col("doc_id") % 3 == 0)
    weights = train_bucket_weights(train, F.col("label"))
    scored = classifier_scores(holdout, weights=weights)
    labeled = scored.join(holdout.select("doc_id", "label"), "doc_id")
    kept, label = F.col("kept"), F.col("label")
    c = labeled.agg(
        F.count("*").cast("long").alias("n_eval"),
        F.sum(F.when(kept & label, 1).otherwise(0)).cast("long").alias("tp"),
        F.sum(F.when(kept & ~label, 1).otherwise(0)).cast("long").alias("fp"),
        F.sum(F.when(~kept & label, 1).otherwise(0)).cast("long").alias("fn"),
        F.sum(F.when(~kept & ~label, 1).otherwise(0)).cast("long").alias("tn"),
    )
    return c.select(
        "n_eval", "tp", "fp", "fn", "tn",
        F.round(
            F.col("tp") / F.nullif(F.col("tp") + F.col("fp"), F.lit(0)), 6
        ).alias("precision"),
        F.round(
            F.col("tp") / F.nullif(F.col("tp") + F.col("fn"), F.lit(0)), 6
        ).alias("recall"),
        F.round((F.col("tp") + F.col("tn")) / F.col("n_eval"), 6).alias(
            "accuracy"
        ),
    )


@register(
    "text_unigram_perplexity",
    oracle="""
    WITH rtok AS (
        SELECT unnest(string_split_regex(lower(text), '\\s+')) AS tok
        FROM documents WHERE lang = 'en'
    ),
    cnt AS (
        SELECT tok, count(*) AS c FROM rtok WHERE tok != '' GROUP BY tok
    ),
    tot AS (SELECT sum(c) AS t, least(count(*), 4096) AS v FROM cnt),
    top AS (
        SELECT tok, c FROM (
            SELECT tok, c,
                   row_number() OVER (ORDER BY c DESC, tok) AS rn
            FROM cnt
        ) WHERE rn <= 4096
    ),
    vocab AS (
        SELECT tok,
               round(ln((c + 0.5) / (t.t + 0.5 * (t.v + 1))) * 1024) / 1024
                   AS lnp
        FROM top CROSS JOIN tot t
    ),
    topmass AS (SELECT sum(c) AS tc FROM top),
    oov AS (
        SELECT round(ln((t - tc + 0.5) / (t + 0.5 * (v + 1))) * 1024) / 1024
                   AS oov_lnp
        FROM tot CROSS JOIN topmass
    ),
    sc AS (
        SELECT d.doc_id,
               coalesce(v.lnp, o.oov_lnp) AS lnp,
               CASE WHEN v.lnp IS NULL THEN 1 ELSE 0 END AS oov
        FROM (
            SELECT doc_id,
                   unnest(string_split_regex(lower(text), '\\s+')) AS tok
            FROM documents
        ) d
        LEFT JOIN vocab v USING (tok) CROSS JOIN oov o
        WHERE d.tok != ''
    ),
    agg AS (
        SELECT doc_id, sum(lnp) AS s, sum(oov) AS n_oov,
               CAST(count(*) AS BIGINT) AS n_tokens
        FROM sc GROUP BY doc_id
    )
    SELECT d.doc_id,
           round(exp(-agg.s / agg.n_tokens), 6) AS ppl,
           round(CAST(agg.n_oov AS DOUBLE) / agg.n_tokens, 6) AS oov_ratio,
           coalesce(agg.n_tokens, 0) AS n_tokens
    FROM documents d LEFT JOIN agg USING (doc_id)
    """,
    tags=("text", "quality", "curation", "ml", "extension"),
)
def text_unigram_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM perplexity per document (operators/lm.py — the
    CCNet fluency signal in its exactly-recomputable unigram
    reduction): fit a smoothed top-4096-type unigram model on the
    lang 'en' reference slice, score EVERY document by
    exp(−mean ln p(tok)) plus its out-of-vocabulary ratio — the
    bucketing a pretraining pipeline uses to keep the fluent head.
    Honest fixture note: this corpus shares one small vocabulary
    across its languages, so cross-language ppl spread is tiny here;
    the operator's discrimination (frequent-token docs ≪ rare-token
    docs ≪ OOV babble) is pinned by tests/test_lm.py on planted
    documents, while this row certifies the values.
    ln-probabilities are dyadic-quantized, so the per-doc sums
    are association-order-exact and the oracle compares
    bit-for-bit."""
    from ..operators.lm import train_unigram_lm, unigram_logppl

    docs = load_table(spark, sf_dir, "documents")
    vocab, stats = train_unigram_lm(
        docs.filter(F.col("lang") == "en"), vocab_size=4096
    )
    return unigram_logppl(docs, vocab, stats)


# DuckDB mirror of the DSIR bucket/λ pipeline (operators/dsir.py):
# portable md5-32 feature buckets, smoothed dyadic-quantized log
# ratios (round(x*1024)/1024 — exact association-free sums in BOTH
# engines), per-doc Σλ. Target = the lang 'en' slice.
_DSIR_SQL = """
    rtok AS (
        SELECT doc_id,
               (CAST(CONCAT('0x', substr(md5(tok), 1, 8)) AS BIGINT)
                % 4096) AS bucket
        FROM (
            SELECT doc_id,
                   unnest(string_split_regex(lower(text), '\\s+')) AS tok
            FROM documents
        ) WHERE tok != ''
    ),
    ttok AS (
        SELECT (CAST(CONCAT('0x', substr(md5(tok), 1, 8)) AS BIGINT)
                % 4096) AS bucket
        FROM (
            SELECT unnest(string_split_regex(lower(text), '\\s+')) AS tok
            FROM documents WHERE lang = 'en'
        ) WHERE tok != ''
    ),
    rc AS (SELECT bucket, count(*) AS c_r FROM rtok GROUP BY bucket),
    tc AS (SELECT bucket, count(*) AS c_t FROM ttok GROUP BY bucket),
    tot AS (
        SELECT (SELECT sum(c_r) FROM rc) AS t_r,
               (SELECT sum(c_t) FROM tc) AS t_t
    ),
    lam AS (
        SELECT rc.bucket,
               round((ln((coalesce(tc.c_t, 0) + 0.5) / (t.t_t + 0.5 * 4096))
                      - ln((rc.c_r + 0.5) / (t.t_r + 0.5 * 4096)))
                     * 1024) / 1024 AS lam
        FROM rc LEFT JOIN tc USING (bucket) CROSS JOIN tot t
    ),
    lw AS (
        SELECT r.doc_id, sum(l.lam) AS lw,
               CAST(count(*) AS BIGINT) AS n_tokens
        FROM rtok r JOIN lam l USING (bucket) GROUP BY r.doc_id
    )
"""


@register(
    "dsir_log_weights",
    oracle=f"""
    WITH {_DSIR_SQL}
    SELECT d.doc_id, round(lw.lw, 6) AS log_weight,
           coalesce(lw.n_tokens, 0) AS n_tokens
    FROM documents d LEFT JOIN lw USING (doc_id)
    """,
    tags=("text", "quality", "curation", "ml", "extension"),
)
def dsir_log_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance log-weights (operators/dsir.py — Xie et al.
    2023, hashed-n-gram variant): every document weighted by how much
    its hashed-unigram distribution looks like the target domain
    (here the lang 'en' slice) relative to the raw corpus —
    Σ_tokens λ(bucket) with smoothed dyadic-quantized log-ratios, so
    the grouped sum is association-order-exact and the oracle
    compares bit-for-bit. Two bounded count passes + one broadcast-λ
    scoring pass; no model state."""
    from ..operators.dsir import dsir_log_weights as _lw

    docs = load_table(spark, sf_dir, "documents")
    return _lw(docs, docs.filter(F.col("lang") == "en"))


@register(
    "dsir_resample_topk",
    oracle=f"""
    WITH {_DSIR_SQL},
    keyed AS (
        SELECT doc_id, round(lw, 6) AS log_weight,
               round(round(lw, 6)
                     + round(-ln(-ln((CAST(CONCAT('0x',
                           substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))
                           AS BIGINT) + 1) / 281474976710657.0))
                             * 1024) / 1024, 6) AS sample_key
        FROM lw
    )
    SELECT doc_id, log_weight, sample_key, CAST(rank AS INT) AS rank FROM (
        SELECT *, row_number() OVER (ORDER BY sample_key DESC, doc_id)
                      AS rank
        FROM keyed
    ) WHERE rank <= 100
    """,
    tags=("text", "quality", "curation", "ml", "extension", "sampling"),
)
def dsir_resample_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR selection: sample 100 documents without replacement with
    probability ∝ exp(importance log-weight) via deterministic
    Gumbel-top-k (operators/dsir.py::dsir_resample_topk) — the noise
    derives from the portable 48-bit doc hash, so the drawn sample is
    reproducible and engine-recomputable; the top-k executes as
    TakeOrdered (per-partition heaps), never a global sort."""
    from ..operators.dsir import dsir_log_weights as _lw
    from ..operators.dsir import dsir_resample_topk as _topk

    docs = load_table(spark, sf_dir, "documents")
    weights = _lw(docs, docs.filter(F.col("lang") == "en"))
    return _topk(weights, k=100)


@register(
    "dedup_incremental_semantic",
    oracle=f"""
    WITH {_semdedup_clusters_sql("vec_id % 4 != 0")}
    SELECT centroid_id, id_a, id_b, cosine_sim
    FROM pairs
    WHERE cosine_sim >= 0.4 AND (id_a % 4 = 0 OR id_b % 4 = 0)
    """,
    tags=("similarity", "dedup", "curation", "extension", "incremental"),
)
def dedup_incremental_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup's steady-state form — the FIFTH incremental store
    identity (MinHash / fingerprint / SimHash / shingle store →
    embedding index): the quantizer trains once on the store slice
    (vec_id % 4 != 0) and persists as an IVF index
    (operators/ann_index.py); the ingest batch (vec_id % 4 = 0) is
    assigned with the FROZEN quantizer and searched within its
    clusters against the persisted lists — batch×store ∪ batch×batch,
    never store×store, so steady-state ingest cost is linear in the
    store instead of re-clustering the corpus per batch
    (operators/semdedup.py::incremental_semantic_pairs). The oracle
    recomputes the frozen-quantizer clustering in SQL and restricts
    the full pair set to batch-involving pairs."""
    import os
    import tempfile

    from ..operators import ann_index
    from ..operators.semdedup import incremental_semantic_pairs

    emb = load_table(spark, sf_dir, "embeddings")
    store_vecs = emb.filter(F.col("vec_id") % 4 != 0)
    batch = emb.filter(F.col("vec_id") % 4 == 0)
    with tempfile.TemporaryDirectory(prefix="ivf_semdedup_") as tmp:
        path = os.path.join(tmp, "index")
        ann_index.build_ivf_index(store_vecs, path, nlist=16)
        out = incremental_semantic_pairs(batch, path, threshold=0.4)
        rows = out.collect()
    return spark.createDataFrame(rows, out.schema)


@register(
    "text_gopher_filter",
    oracle=f"""
    WITH sig AS (
        SELECT doc_id,
               len({_TOKS}) AS n_words,
               round(list_aggregate(list_transform({_TOKS}, x -> length(x)), 'sum')
                     / len({_TOKS}), 6) AS mean_word_len,
               round(len(list_filter({_TOKS}, x -> regexp_matches(x, '[A-Za-z]')))
                     / len({_TOKS}), 6) AS frac_alpha_words,
               len(list_filter({_TOKS}, x -> list_contains({_STOPS}, x)))
                   AS n_stop_hits,
               CASE WHEN len({_TOKS}) < 2 THEN 0.0
                    ELSE round(1 - len(list_distinct(list_transform(
                             range(1, len({_TOKS})),
                             i -> {_TOKS}[i] || ' ' || {_TOKS}[i + 1])))
                         / (len({_TOKS}) - 1), 6) END AS dup_bigram_frac
        FROM documents
    )
    SELECT doc_id, n_words, mean_word_len, frac_alpha_words, n_stop_hits,
           dup_bigram_frac,
           n_words >= 20 AND n_words <= 100000 AS pass_words,
           mean_word_len >= 3 AND mean_word_len <= 10 AS pass_word_len,
           frac_alpha_words >= 0.8 AS pass_alpha,
           n_stop_hits >= 2 AS pass_stop,
           dup_bigram_frac <= 0.5 AS pass_repetition,
           n_words >= 20 AND n_words <= 100000
               AND mean_word_len >= 3 AND mean_word_len <= 10
               AND frac_alpha_words >= 0.8 AND n_stop_hits >= 2
               AND dup_bigram_frac <= 0.5 AS keep
    FROM sig
    """,
    tags=("text", "quality", "curation", "extension"),
)
def text_gopher_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style composite document filter: word count band, mean
    word length band, alphabetic-word fraction, stopword presence,
    and duplicate-bigram fraction — each as a boolean flag plus the
    conjunctive ``keep``. Every signal (including the bigram
    repetition, via array expressions) is computed in ONE projection
    with no shuffle and no UDF — at 100 TB this is a pure parquet
    scan."""
    docs = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    toks = tokens(t)
    n_words = F.size(toks)
    mean_wl = mean_token_length(t)
    frac_alpha = F.round(
        F.size(F.filter(toks, lambda x: x.rlike("[A-Za-z]"))) / n_words, 6
    )
    n_stop = F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS)))
    bigrams = F.transform(
        F.sequence(F.lit(1), n_words - 1),
        lambda i: F.concat_ws(
            " ", F.element_at(toks, i), F.element_at(toks, i + 1)
        ),
    )
    dup_frac = F.when(n_words < 2, F.lit(0.0)).otherwise(
        F.round(1 - F.size(F.array_distinct(bigrams)) / (n_words - 1), 6)
    )
    sig = docs.select(
        "doc_id",
        n_words.alias("n_words"),
        mean_wl.alias("mean_word_len"),
        frac_alpha.alias("frac_alpha_words"),
        n_stop.alias("n_stop_hits"),
        dup_frac.alias("dup_bigram_frac"),
    )
    pass_words = (F.col("n_words") >= 20) & (F.col("n_words") <= 100000)
    pass_wl = (F.col("mean_word_len") >= 3) & (F.col("mean_word_len") <= 10)
    pass_alpha = F.col("frac_alpha_words") >= 0.8
    pass_stop = F.col("n_stop_hits") >= 2
    pass_rep = F.col("dup_bigram_frac") <= 0.5
    return sig.select(
        "*",
        pass_words.alias("pass_words"),
        pass_wl.alias("pass_word_len"),
        pass_alpha.alias("pass_alpha"),
        pass_stop.alias("pass_stop"),
        pass_rep.alias("pass_repetition"),
        (pass_words & pass_wl & pass_alpha & pass_stop & pass_rep).alias("keep"),
    )


# ---------------------------------------------------------------------------
# curation-gate measures as a certified query (VERDICT r7 item 7)
# ---------------------------------------------------------------------------

# Fixed boilerplate page planted on doc_id % 10 == 1: an exact
# duplicate across ~10% of the corpus AND a low-quality document
# (punctuation-heavy, no stopwords, short) — so the duplicate and
# low-quality percentages are certified on nonzero values. Planted
# AFTER the PII arms so the duplicate copies stay byte-identical.
_DUP_PAGE = "BUY NOW!!! $$$ CLICK HERE limited offer!!!"

# Threshold inputs stay UNROUNDED (ADVICE r8): Spark's quality_score
# compares the raw ratios, so rounding here could flip a CASE branch
# for a value within 5e-7 of a boundary and certify red as a flake.
# Only the final composite quality is rounded, identically to Spark.
_QUALITY_SQL = f"""
    length(text) AS n,
    (length(text) - length(regexp_replace(text, '[^A-Za-z0-9\\s]', '', 'g')))
          / length(text) AS p_ratio,
    len(list_filter({_EXT_TOKS}, x -> list_contains({_EXT_STOPS}, x)))
          / len({_EXT_TOKS}) AS s_ratio,
    list_aggregate(list_transform({_EXT_TOKS}, x -> length(x)), 'sum')
          / len({_EXT_TOKS}) AS mtl
"""


@register(
    "quality_curation_metrics",
    oracle=f"""
    WITH pii_aug AS ({_AUG_PII_SQL}),
    aug AS (
        SELECT doc_id,
               CASE WHEN doc_id % 10 = 1 THEN '{_DUP_PAGE}'
                    ELSE text END AS text
        FROM pii_aug
    ),
    per AS (
        SELECT doc_id, text,
               md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp,
               CASE WHEN {_COUNT_SQL['email']} + {_COUNT_SQL['phone']}
                         + {_COUNT_SQL['ssn']} + {_COUNT_SQL['ipv4']} > 0
                    THEN 1 ELSE 0 END AS has_pii,
               {_QUALITY_SQL}
        FROM aug
    ),
    q AS (
        SELECT doc_id, text, fp, has_pii,
               round(((CASE WHEN n >= 100 AND n <= 20000 THEN 1.0
                            WHEN n >= 30 THEN 0.5 ELSE 0.0 END)
                      + (CASE WHEN p_ratio <= 0.1 THEN 1.0 ELSE 0.0 END)
                      + (CASE WHEN s_ratio >= 0.05 THEN 1.0 ELSE 0.0 END)
                      + (CASE WHEN mtl >= 2.5 AND mtl <= 12 THEN 1.0
                              ELSE 0.0 END)
                     ) / 4.0, 6) AS quality
        FROM per
    )
    SELECT CAST(count(text) AS BIGINT) AS n_docs,
           round((count(fp) - count(DISTINCT fp)) * 100.0 / count(fp), 6)
               AS dup_pct,
           round(sum(has_pii) * 100.0 / count(text), 6) AS pii_pct,
           round(sum(CASE WHEN quality < 0.5 THEN 1 ELSE 0 END) * 100.0
                 / count(text), 6) AS low_quality_pct
    FROM q
    """,
    tags=("quality", "curation", "extension"),
)
def quality_curation_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The three corpus-health percentages the curation GATES consume
    (quality/checks.py: duplicate_percent, pii_percent,
    low_quality_percent), emitted as a one-row query so the measures
    feeding the gate thresholds are oracle-certified, not just
    unit-tested. Same measure expressions as the gates: duplicate =
    non-null rows whose normalized-text md5 fingerprint collides;
    PII = rows with any detectable PII category; low-quality = rows
    scoring < 0.5 on the composite heuristic. One aggregation job over
    a single scan — the exact shape run_scan compiles the gates into.
    Corpus: documents + the PII arms (_augment_pii) + a fixed
    boilerplate page on doc_id % 10 == 1, so all three percentages
    certify on nonzero values."""
    from ..functions.text import fingerprint

    did = F.col("doc_id")
    aug = _augment_pii(load_table(spark, sf_dir, "documents")).select(
        "doc_id",
        F.when(did % 10 == 1, F.lit(_DUP_PAGE))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    t = F.col("text")
    fp = fingerprint(t)
    c = pii_counts(t)
    any_pii = (c["email"] + c["phone"] + c["ssn"] + c["ipv4"]) > 0
    low = quality_score(t) < 0.5
    return aug.agg(
        F.count(t).cast("long").alias("n_docs"),
        F.round(
            (F.count(fp) - F.count_distinct(fp)) * 100.0 / F.count(fp), 6
        ).alias("dup_pct"),
        F.round(F.sum(any_pii.cast("int")) * 100.0 / F.count(t), 6).alias(
            "pii_pct"
        ),
        F.round(F.sum(low.cast("int")) * 100.0 / F.count(t), 6).alias(
            "low_quality_pct"
        ),
    )
