"""Exact-substring dedup (operators/substrings.py) + BM25 retrieval."""

import math

from pyspark.sql import functions as F

from crypto_etl_airflow_spark.operators.substrings import (
    remove_repeated_spans,
    repeated_window_spans,
)
from crypto_etl_airflow_spark.plans.retrieval import similarity_bm25_topk

from .conftest import SF_SMOKE

# 12 tokens — w=8 windows fully inside start at token idx 0..4
BOILER = "the quick brown fox jumps over the lazy dog again and again"
# a second shared block, disjoint tokens, 12 tokens
BOILER2 = "please review all the terms of service before you continue using it"
FILL_A = "alpha beta gamma delta epsilon zeta eta theta iota kappa unique one"
FILL_B = "lambda mu nu xi omicron pi rho sigma tau upsilon distinct other two"
FILL_C = "zero uno duo tres quattro cinque sei sette otto nove dieci extra"

W = 8


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_spans_cover_planted_boilerplate_exactly(spark):
    # BOILER is 12 tokens >= w=8, so windows fully inside it exist in
    # every copy regardless of character offset — token boundaries are
    # content-defined anchors, so there is no alignment condition.
    df = _docs(
        spark,
        [
            (1, BOILER + " " + FILL_A),
            (2, FILL_B + " " + BOILER),
            (3, FILL_C + " tail words here"),
        ],
    )
    spans = repeated_window_spans(df, w=W).collect()
    by_doc = {r.doc_id: r for r in spans}
    assert set(by_doc) == {1, 2}
    # token windows give EXACT span bounds: the merged island covers
    # precisely the repeated block's characters
    s1 = by_doc[1]
    assert (s1.span_start, s1.span_end) == (1, len(BOILER))
    assert s1.span_len == len(BOILER)
    assert s1.n_windows == 12 - W + 1  # idx 0..4
    # doc 2's copy starts at char len(FILL_B)+2 — unaligned with doc
    # 1's offset (1), still found and covered exactly
    s2 = by_doc[2]
    off = len(FILL_B) + 2
    assert (s2.span_start, s2.span_end) == (off, off + len(BOILER) - 1)
    assert s2.n_windows == 12 - W + 1


def test_spans_two_islands_per_doc(spark):
    # two shared blocks separated by > w unique tokens -> two spans
    d1 = BOILER + " " + FILL_A + " " + BOILER2
    d2 = BOILER + " " + FILL_B + " " + BOILER2
    df = _docs(spark, [(1, d1), (2, d2)])
    spans = repeated_window_spans(df, w=W).collect()
    got = {
        (r.doc_id, r.span_start, r.span_end, r.n_windows) for r in spans
    }
    b2_off_1 = len(BOILER) + 1 + len(FILL_A) + 2
    b2_off_2 = len(BOILER) + 1 + len(FILL_B) + 2
    assert got == {
        (1, 1, len(BOILER), 5),
        (1, b2_off_1, b2_off_1 + len(BOILER2) - 1, 5),
        (2, 1, len(BOILER), 5),
        (2, b2_off_2, b2_off_2 + len(BOILER2) - 1, 5),
    }


def test_spans_ignore_unique_and_short_docs(spark):
    df = _docs(
        spark,
        [
            (1, FILL_A),
            (2, FILL_B),
            (3, "only three tokens"),  # < w tokens: no windows at all
            (4, None),  # null text: dropped, not crashed
        ],
    )
    assert repeated_window_spans(df, w=W).count() == 0


def test_removal_keeps_exactly_one_copy(spark):
    shared = BOILER
    df = _docs(
        spark,
        [
            (1, shared + " " + FILL_A),
            (2, FILL_B + " " + shared),
            (3, FILL_C + " tail words here"),
        ],
    )
    out = {r.doc_id: r for r in remove_repeated_spans(df, w=W).collect()}
    assert len(out) == 3
    # keeper = lowest (doc_id, idx): doc 1 keeps its text verbatim
    assert out[1].clean_text == shared + " " + FILL_A
    assert out[1].n_spans == 0
    # doc 2 loses exactly the copy (token windows cut on its precise
    # char bounds; the separating space before it remains — the seam)
    assert out[2].n_spans == 1
    assert out[2].clean_text == FILL_B + " "
    assert out[2].removed_chars == len(shared)
    # untouched doc passes through
    assert out[3].clean_text == FILL_C + " tail words here"
    assert out[3].n_spans == 0 and out[3].removed_chars == 0


def test_removal_null_and_short_pass_through(spark):
    df = _docs(spark, [(1, None), (2, "tiny")])
    out = {r.doc_id: r for r in remove_repeated_spans(df, w=W).collect()}
    assert out[1].clean_text is None and out[1].n_spans == 0
    assert out[2].clean_text == "tiny" and out[2].removed_chars == 0


def test_removal_span_to_end_of_text(spark):
    # repeated block at the very END: tail substring past len(text)
    # must yield '' cleanly, not an error or garbage
    df = _docs(
        spark,
        [(1, FILL_A + " " + BOILER), (2, FILL_B + " " + BOILER)],
    )
    out = {r.doc_id: r for r in remove_repeated_spans(df, w=W).collect()}
    assert out[1].n_spans == 0  # keeper
    assert out[2].n_spans == 1
    assert out[2].clean_text == FILL_B + " "
    assert out[2].removed_chars == len(BOILER)


def test_removal_mid_document_span(spark):
    # repeated block in the MIDDLE: head piece + tail both non-empty
    d2 = FILL_B + " " + BOILER + " " + FILL_C
    df = _docs(spark, [(1, BOILER + " " + FILL_A), (2, d2)])
    out = {r.doc_id: r for r in remove_repeated_spans(df, w=W).collect()}
    assert out[2].n_spans == 1
    assert out[2].clean_text == FILL_B + "  " + FILL_C  # double-space seam
    assert out[2].removed_chars == len(BOILER)


def test_bm25_ranking_sanity(spark):
    """Score ordering matches a direct Python BM25 on the fixture."""
    df = similarity_bm25_topk(spark, SF_SMOKE)
    rows = df.collect()
    assert len(rows) == 20
    scores = [r.bm25 for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(1 <= r.n_hit_terms <= 4 for r in rows)

    # python reference on the same corpus
    import re

    docs = {
        r.doc_id: re.split(r"\s+", r.text.lower())
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
        if r.text
    }
    docs = {d: [t for t in toks if t] for d, toks in docs.items()}
    docs = {d: toks for d, toks in docs.items() if toks}
    n = len(docs)
    avgdl = sum(len(t) for t in docs.values()) / n
    terms = ("join", "merge", "window", "stream")
    dfreq = {
        q: sum(1 for toks in docs.values() if q in toks) for q in terms
    }
    k1, b = 1.2, 0.75

    def score(toks):
        s = 0.0
        for q in terms:
            tf = toks.count(q)
            if not tf or not dfreq[q]:
                continue
            idf = math.log((n - dfreq[q] + 0.5) / (dfreq[q] + 0.5) + 1)
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(toks) / avgdl))
        return s

    expect = sorted(
        ((round(score(t), 6), -d) for d, t in docs.items() if score(t) > 0),
        reverse=True,
    )[:20]
    got = [(r.bm25, -r.doc_id) for r in rows]
    assert got == expect


def test_bm25_plan_broadcasts_and_no_python(spark):
    plan = similarity_bm25_topk(spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "TakeOrderedAndProject" in plan
    assert "PythonEval" not in plan and "BatchEvalPython" not in plan
    # the query-term filter must sit UNDER the tf aggregation: the wide
    # (doc, term) shuffle carries only matching postings, never the
    # full vocabulary (r8 perf fix — this pins it against regression)
    import re

    assert re.search(r"IN \(join,merge,window,stream\)", plan), plan[:2000]


def test_hybrid_rrf_fusion_semantics(spark):
    """RRF output: ranks are consistent with the two input rankings,
    docs found by only one ranking still fuse (NULL other-rank), and
    the score is exactly sum of 1/(60+rank) contributions."""
    from crypto_etl_airflow_spark.plans.retrieval import (
        RRF_K,
        similarity_hybrid_rrf_topk,
    )

    rows = similarity_hybrid_rrf_topk(spark, SF_SMOKE).collect()
    assert 0 < len(rows) <= 10
    scores = [r.rrf_score for r in rows]
    assert scores == sorted(scores, reverse=True)
    for r in rows:
        assert r.lex_rank is not None or r.dense_rank is not None
        expect = 0.0
        if r.lex_rank is not None:
            assert 1 <= r.lex_rank <= 50
            expect += 1.0 / (RRF_K + r.lex_rank)
        if r.dense_rank is not None:
            assert 1 <= r.dense_rank <= 50
            expect += 1.0 / (RRF_K + r.dense_rank)
        assert r.rrf_score == round(expect, 6)
