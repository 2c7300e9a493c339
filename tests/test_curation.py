"""Curation surface: PII redaction, cross-document line dedup, and
the Gopher-style composite filter (plans/curation.py)."""

from pyspark.sql import functions as F

from crypto_etl_airflow_spark.functions.pii import (
    PII_PATTERNS,
    pii_counts,
    redact_pii,
)
from crypto_etl_airflow_spark.operators.lines import line_dedup_global


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---------------------------------------------------------------------------
# PII
# ---------------------------------------------------------------------------


def test_pii_counts_and_redaction(spark):
    df = _df(spark, [
        (1, "write to alice.smith+tag@mail.example.org today"),
        (2, "call 555-123-4567 or 555-987-6543"),
        (3, "ssn 123-45-6789 on file"),
        (4, "server at 192.168.10.250 responded"),
        (5, "nothing sensitive here at all"),
    ])
    c = pii_counts(F.col("text"))
    rows = {r.doc_id: r for r in df.select(
        "doc_id", c["email"].alias("e"), c["phone"].alias("p"),
        c["ssn"].alias("s"), c["ipv4"].alias("i"),
        redact_pii(F.col("text")).alias("red"),
    ).collect()}
    assert (rows[1].e, rows[1].p, rows[1].s, rows[1].i) == (1, 0, 0, 0)
    assert rows[2].p == 2 and rows[3].s == 1 and rows[4].i == 1
    assert rows[5].red == "nothing sensitive here at all"
    assert rows[1].red == "write to <EMAIL> today"
    assert rows[2].red == "call <PHONE> or <PHONE>"
    assert rows[3].red == "ssn <SSN> on file"
    assert rows[4].red == "server at <IP> responded"


def test_pii_redacted_text_has_no_remaining_matches(spark):
    """Redaction is complete: no category pattern matches its own
    output (the categories are mutually disjoint via \\b anchors)."""
    df = _df(spark, [
        (1, "a@b.co 111-222-3333 123-45-6789 10.0.0.1 b@c.org"),
    ])
    red = df.select(redact_pii(F.col("text")).alias("r"))
    for pat in PII_PATTERNS.values():
        assert red.filter(F.regexp_count("r", F.lit(pat)) > 0).count() == 0


def test_pii_mid_number_boundaries_do_not_match(spark):
    """Digit runs embedded in longer numbers are not PII: the \\b
    anchors refuse mid-number matches."""
    df = _df(spark, [(1, "serial 9555-123-45678 code 1234-45-67890")])
    c = pii_counts(F.col("text"))
    r = df.select(c["phone"].alias("p"), c["ssn"].alias("s")).first()
    assert (r.p, r.s) == (0, 0)


# ---------------------------------------------------------------------------
# line dedup
# ---------------------------------------------------------------------------


def test_line_dedup_removes_boilerplate_keeps_unique(spark):
    rows = [
        (i, f"unique body {i}\nSubscribe NOW\nfooter {i}") for i in range(8)
    ] + [(100, "no boilerplate at all")]
    out = {r.doc_id: r for r in line_dedup_global(
        _df(spark, rows), "doc_id", "text", max_doc_freq=3
    ).collect()}
    # 'Subscribe NOW' appears in 8 docs > 3 → removed everywhere;
    # unique body/footer lines survive in original order
    for i in range(8):
        assert out[i].clean_text == f"unique body {i}\nfooter {i}"
        assert out[i].n_lines == 3 and out[i].n_removed == 1
    assert out[100].clean_text == "no boilerplate at all"
    assert out[100].n_removed == 0


def test_line_dedup_normalizes_case_and_space(spark):
    rows = [(i, f"body {i}\n  ALL rights RESERVED  ") for i in range(5)]
    out = line_dedup_global(_df(spark, rows), "doc_id", "text", max_doc_freq=2)
    assert all(r.clean_text == f"body {r.doc_id}" for r in out.collect())


def test_line_dedup_fully_boilerplate_doc_yields_empty(spark):
    rows = [(i, "same line") for i in range(6)]
    out = line_dedup_global(_df(spark, rows), "doc_id", "text", max_doc_freq=2)
    assert all(
        r.clean_text == "" and r.n_removed == 1 for r in out.collect()
    )
    assert out.count() == 6  # documents are never dropped, only emptied


def test_line_dedup_threshold_is_distinct_docs_not_occurrences(spark):
    # one doc repeats a line 5 times — still only ONE distinct doc,
    # so the line survives a max_doc_freq=2 threshold
    df = _df(spark, [(1, "\n".join(["echo"] * 5))])
    r = line_dedup_global(df, "doc_id", "text", max_doc_freq=2).first()
    assert r.clean_text == "\n".join(["echo"] * 5) and r.n_removed == 0


# ---------------------------------------------------------------------------
# gopher filter (via the registered query at fixture scale)
# ---------------------------------------------------------------------------


def test_gopher_filter_flags(spark):
    from crypto_etl_airflow_spark.plans.registry import get

    from .conftest import SF_ORACLE

    out = get("text_gopher_filter").builder(spark, SF_ORACLE)
    rows = out.collect()
    assert len(rows) == 500
    by_keep = {}
    for r in rows:
        # keep is exactly the conjunction of the five flags
        assert r.keep == (
            r.pass_words and r.pass_word_len and r.pass_alpha
            and r.pass_stop and r.pass_repetition
        )
        by_keep.setdefault(r.keep, 0)
        by_keep[r.keep] += 1
    # the fixture corpus produces a genuine mix (zh docs fail alpha)
    assert by_keep.get(True, 0) > 0 and by_keep.get(False, 0) > 0


# ---------------------------------------------------------------------------
# token-budget sampling (via the registered query at fixture scale)
# ---------------------------------------------------------------------------


def test_token_budget_sampling_invariants(spark):
    from crypto_etl_airflow_spark.plans.registry import get

    from .conftest import SF_ORACLE

    rows = get("sample_token_budget").builder(spark, SF_ORACLE).collect()
    assert len(rows) == 500
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r)
    for lang, rs in by_lang.items():
        kept = [r for r in rs if r.kept]
        dropped = [r for r in rs if not r.kept]
        # every kept doc STARTED under budget; every dropped doc didn't
        assert all(r.cum_tokens - r.n_tokens < 2000 for r in kept)
        assert all(r.cum_tokens - r.n_tokens >= 2000 for r in dropped)
        # budget actually bites (fixture langs all exceed 2000 tokens)
        total = sum(r.n_tokens for r in rs)
        if total > 2100:
            assert dropped, f"{lang}: budget should be exhausted"
        # overshoot is bounded by one document
        if kept:
            max_cum = max(r.cum_tokens for r in kept)
            assert max_cum - max(r.n_tokens for r in kept) < 2000


def test_line_dedup_literal_metachar_separator(spark):
    # regression: sep is a LITERAL separator — '|' must not be
    # interpreted as regex alternation (which would split between
    # every character)
    rows = [(i, f"keep {i}|SPAM AD|tail {i}") for i in range(5)]
    out = {
        r.doc_id: r
        for r in line_dedup_global(
            _df(spark, rows), "doc_id", "text", max_doc_freq=2, sep="|"
        ).collect()
    }
    for i in range(5):
        assert out[i].clean_text == f"keep {i}|tail {i}"
        assert out[i].n_lines == 3 and out[i].n_removed == 1


def test_sequence_packing_invariants(spark):
    from crypto_etl_airflow_spark.plans.registry import get

    from .conftest import SF_ORACLE

    rows = get("sequence_packing_manifest").builder(spark, SF_ORACLE).collect()
    assert len(rows) == 500
    total_tokens = sum(r.n_tokens for r in rows)
    # bins cover the stream with no gaps: every bin index from 0 to
    # the last bin_end is touched by at least one document
    touched = set()
    for r in rows:
        assert 0 <= r.bin_start <= r.bin_end
        assert r.n_boundary_crossings == r.bin_end - r.bin_start
        assert 0 <= r.offset_in_bin < 512
        touched.update(range(r.bin_start, r.bin_end + 1))
    last_bin = (total_tokens - 1) // 512
    assert touched == set(range(last_bin + 1))


# ---------------------------------------------------------------------------
# intra-document line dedup + repetition signals (round 8)
# ---------------------------------------------------------------------------


def test_intradoc_dedup_keeps_first_occurrence_in_order(spark):
    from crypto_etl_airflow_spark.operators.lines import line_dedup_intradoc

    rows = [(1, "a\nb\nA \nc\nb"), (2, "x\ny")]
    out = {
        r.doc_id: r
        for r in line_dedup_intradoc(_df(spark, rows), "doc_id", "text").collect()
    }
    # "A " normalizes to "a" (dup of line 1), second "b" is a verbatim dup
    assert out[1].clean_text == "a\nb\nc"
    assert out[1].n_lines == 5 and out[1].n_removed == 2
    assert out[2].clean_text == "x\ny"
    assert out[2].n_lines == 2 and out[2].n_removed == 0


def test_intradoc_dedup_is_per_document_not_global(spark):
    """The same line in two documents survives in BOTH — no corpus
    state (that's dedup_lines_global's job)."""
    from crypto_etl_airflow_spark.operators.lines import line_dedup_intradoc

    rows = [(1, "shared\nu1"), (2, "shared\nu2")]
    out = {
        r.doc_id: r.clean_text
        for r in line_dedup_intradoc(_df(spark, rows), "doc_id", "text").collect()
    }
    assert out == {1: "shared\nu1", 2: "shared\nu2"}


def test_repetition_signals_hand_computed(spark):
    from crypto_etl_airflow_spark.operators.repetition import repetition_signals

    rows = [(1, "a b a b a\nx"), (2, "Foo\nfoo \nbar")]
    out = {
        r.doc_id: r
        for r in repetition_signals(_df(spark, rows), "doc_id", "text").collect()
    }
    r1 = out[1]  # tokens a b a b a x (newline is whitespace)
    assert r1.n_lines == 2
    assert r1.dup_line_frac == 0.0 and r1.dup_line_char_frac == 0.0
    # bigrams: "a b"x2 "b a"x2 "a x"x1 -> top (2, 2*3=6); chars=11
    assert r1.top_2gram_char_frac == round(6 / 11, 6)
    # trigrams: "a b a"x2 -> 2*5=10
    assert r1.top_3gram_char_frac == round(10 / 11, 6)
    # 5-grams: both occur once -> no duplicated coverage
    assert r1.dup_5gram_char_frac == 0.0

    r2 = out[2]  # lines Foo / "foo " / bar ; norm foo, foo, bar
    assert r2.n_lines == 3
    assert r2.dup_line_frac == round(1 - 2 / 3, 6)
    # line chars 3+4+3=10, first occurrences Foo(3)+bar(3)=6
    assert r2.dup_line_char_frac == round(4 / 10, 6)
    # bigrams "foo foo" / "foo bar" both x1 -> tie, coverage 7; chars=12
    assert r2.top_2gram_char_frac == round(7 / 12, 6)
    assert r2.top_3gram_char_frac == round(11 / 12, 6)
    assert r2.dup_5gram_char_frac == 0.0


def test_blocklist_url_and_badword_semantics(spark):
    from crypto_etl_airflow_spark.functions.blocklists import (
        bad_word_count,
        blocked_domain_count,
        url_domains,
    )

    rows = [
        (1, "go https://Spam.Example.com/x and https://ok.org/y"),
        (2, "crapcoin is a scam but crapcoins plural must NOT match"),
        (3, "no links, no profanity"),
    ]
    out = {
        r.doc_id: r
        for r in _df(spark, rows)
        .select(
            "doc_id",
            url_domains(F.col("text")).alias("domains"),
            blocked_domain_count(F.col("text")).alias("nb"),
            bad_word_count(F.col("text")).alias("nw"),
        )
        .collect()
    }
    # extraction lower-cases and keeps appearance order
    assert out[1].domains == ["spam.example.com", "ok.org"]
    assert out[1].nb == 1 and out[1].nw == 0
    # exact-token match only — the Scunthorpe guard
    assert out[2].nw == 1 and out[2].nb == 0
    assert out[3].domains == [] and out[3].nb == 0 and out[3].nw == 0


def test_strip_accents_latin_known_values(spark):
    """Byte-exact folds for the explicit mapping table, pass-through
    for non-Latin scripts, and FROM/TO alignment."""
    from crypto_etl_airflow_spark.functions.text import (
        ACCENT_FROM,
        ACCENT_TO,
        strip_accents_latin,
    )
    from pyspark.sql import functions as F

    assert len(ACCENT_FROM) == len(ACCENT_TO)
    assert len(set(ACCENT_FROM)) == len(ACCENT_FROM)  # no dup keys
    cases = [
        ("café crème brûlée", "cafe creme brulee"),
        ("ÀÉÎÕÜ çÇ ñÑ ýÿÝ", "AEIOU cC nN yyY"),
        ("Straße cœur Æther", "Strasse coeur AEther"),
        ("plain ascii 123", "plain ascii 123"),
        ("中文不变 русский", "中文不变 русский"),  # out of scope: untouched
    ]
    df = spark.createDataFrame(cases, "s string, want string").select(
        strip_accents_latin(F.col("s")).alias("got"), "want"
    )
    for r in df.collect():
        assert r.got == r.want, (r.got, r.want)
