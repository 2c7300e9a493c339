"""Text-analysis operators for LLM training-data pipelines.

Language-ID (marker-word heuristic), quality scoring, token counting
(whitespace + BPE-ish regex), and document fingerprinting over a
string column — the text half of the north-star extension surface
(BASELINE.json ``north_star``; SURVEY.md §7.5).

Everything is built-in Column expressions (split / filter /
regexp_count / md5): JVM-side, whole-stage-codegen'd, zero Python in
the hot path — at 100 TB these run at parquet-scan speed. The only
shuffle any of these needs is whatever the caller aggregates by.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# small marker-word sets per language; membership COUNT (not distinct)
# over whitespace tokens is the language score
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "is", "of", "to", "a", "in", "that"),
    "de": ("der", "die", "und", "ist", "das", "nicht", "ein"),
    "es": ("el", "la", "de", "que", "los", "una", "por"),
    "fr": ("le", "la", "et", "les", "des", "une", "dans"),
}
CJK_PATTERN = r"[\x{4e00}-\x{9fff}]"

# BPE-ish token estimate: alnum runs OR single non-alnum-non-space chars
BPE_ISH_PATTERN = r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"

STOPWORDS = LANG_MARKERS["en"]


def tokens(text: Column) -> Column:
    """Whitespace tokens of the lower-cased text."""
    return F.split(F.lower(text), r"\s+")


def whitespace_token_count(text: Column) -> Column:
    return F.size(tokens(text))


def bpe_ish_token_count(text: Column) -> Column:
    """Regex token-count estimate (closer to a BPE tokenizer's count
    than whitespace splitting: punctuation tokenizes separately)."""
    return F.regexp_count(text, F.lit(BPE_ISH_PATTERN))


def punct_ratio(text: Column) -> Column:
    """Fraction of non-alphanumeric, non-space characters."""
    stripped = F.regexp_replace(text, r"[^A-Za-z0-9\s]", "")
    return F.round(
        (F.length(text) - F.length(stripped)) / F.length(text), 6
    )


def stopword_ratio(text: Column) -> Column:
    """Fraction of tokens that are (English) stopwords — a standard
    quality signal: natural prose has some; keyword spam has none."""
    toks = tokens(text)
    hits = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    return F.round(hits / F.size(toks), 6)


def mean_token_length(text: Column) -> Column:
    toks = tokens(text)
    total = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    )
    return F.round(total / F.size(toks), 6)


def _membership(markers: tuple[str, ...]):
    # a default-arg lambda would have arity 2 and PySpark would treat
    # it as an (element, index) lambda — close over markers instead
    return lambda t: t.isin(*markers)


def language_scores(text: Column) -> dict[str, Column]:
    """Marker-hit counts per language + CJK character count."""
    toks = tokens(text)
    scores = {
        lang: F.size(F.filter(toks, _membership(markers)))
        for lang, markers in LANG_MARKERS.items()
    }
    scores["zh"] = F.regexp_count(text, F.lit(CJK_PATTERN))
    return scores


def language_id(text: Column) -> Column:
    """Pick the language with the highest marker score; CJK presence
    dominates; deterministic tie order en > de > es > fr; 'unknown'
    when no marker hits at all."""
    s = language_scores(text)
    return (
        F.when(s["zh"] > 0, "zh")
        .when(
            (s["en"] >= s["de"]) & (s["en"] >= s["es"]) & (s["en"] >= s["fr"])
            & (s["en"] > 0),
            "en",
        )
        .when((s["de"] >= s["es"]) & (s["de"] >= s["fr"]) & (s["de"] > 0), "de")
        .when((s["es"] >= s["fr"]) & (s["es"] > 0), "es")
        .when(s["fr"] > 0, "fr")
        .otherwise("unknown")
    )


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality score: length in a sane band, low
    punctuation, some stopwords, sane mean word length. Weights are
    simple and documented rather than learned — the operator shape
    (pure column expression, one pass) is the point."""
    n = F.length(text)
    len_ok = F.when((n >= 100) & (n <= 20000), 1.0).when(n >= 30, 0.5).otherwise(0.0)
    punct_ok = F.when(punct_ratio(text) <= 0.1, 1.0).otherwise(0.0)
    stop_ok = F.when(stopword_ratio(text) >= 0.05, 1.0).otherwise(0.0)
    mtl = mean_token_length(text)
    wordlen_ok = F.when((mtl >= 2.5) & (mtl <= 12), 1.0).otherwise(0.0)
    return F.round((len_ok + punct_ok + stop_ok + wordlen_ok) / 4.0, 6)


def fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: md5 of the
    whitespace-normalized, lower-cased text. Exact-dedup key."""
    normalized = F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))
    return F.md5(normalized)


# Latin diacritic fold (CCNet-style pre-dedup normalization): an
# EXPLICIT 1:1 mapping shared with the DuckDB oracles (built from the
# same constants), NOT a library NFD pass — unicodedata/ICU versions
# disagree at the margins, an explicit table cannot. Groups are
# concatenated separately so the FROM/TO alignment is reviewable;
# tests assert equal lengths.
ACCENT_FROM = (
    "àáâãäå" "èéêë" "ìíîï" "òóôõö" "ùúûü" "ç" "ñ" "ýÿ"
    "ÀÁÂÃÄÅ" "ÈÉÊË" "ÌÍÎÏ" "ÒÓÔÕÖ" "ÙÚÛÜ" "Ç" "Ñ" "Ý"
)
ACCENT_TO = (
    "aaaaaa" "eeee" "iiii" "ooooo" "uuuu" "c" "n" "yy"
    "AAAAAA" "EEEE" "IIII" "OOOOO" "UUUU" "C" "N" "Y"
)
# 1:N expansions translate() can't express
ACCENT_EXPANSIONS = (("ß", "ss"), ("æ", "ae"), ("œ", "oe"),
                     ("Æ", "AE"), ("Œ", "OE"))


def strip_accents_latin(text: Column) -> Column:
    """Fold Latin diacritics to their base letters (à→a, Ç→C, ß→ss,
    œ→oe …) — the normalization step CCNet-style pipelines run before
    fingerprinting/shingling so 'café' and 'cafe' deduplicate. Pure
    ``translate`` + a few fixed ``replace``s: codegen-resident, zero
    shuffle, and byte-reproducible in any engine that shares the
    mapping table (the DuckDB oracle builds its SQL from these same
    constants). Scope is the explicit table only — non-Latin scripts
    pass through untouched by design."""
    out = F.translate(text, ACCENT_FROM, ACCENT_TO)
    for src, dst in ACCENT_EXPANSIONS:
        out = F.replace(out, F.lit(src), F.lit(dst))
    return out
