"""Exact-substring dedup (operators/substrings.py) + BM25 retrieval."""

import math

from pyspark.sql import functions as F

from crypto_etl_airflow_spark.operators.substrings import (
    remove_repeated_spans,
    repeated_window_spans,
)
from crypto_etl_airflow_spark.plans.retrieval import similarity_bm25_topk

from .conftest import SF_SMOKE

BOILER = "x" * 0 + "the quick brown fox jumps over the lazy dog again and again"  # 60 chars
FILL_A = "alpha beta gamma delta epsilon zeta eta theta iota kappa unique one"
FILL_B = "lambda mu nu xi omicron pi rho sigma tau upsilon distinct other two"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_spans_cover_planted_boilerplate(spark):
    # boilerplate is 60 >= k + stride - 1 = 39, so detection must be
    # complete wherever it sits
    df = _docs(
        spark,
        [
            (1, BOILER + " " + FILL_A),
            (2, FILL_B + " " + BOILER),
            (3, FILL_A + " " + FILL_B),
        ],
    )
    spans = repeated_window_spans(df, k=32, stride=8).collect()
    by_doc = {r.doc_id: r for r in spans}
    assert set(by_doc) == {1, 2}
    # doc 1: boilerplate at chars [1, 60] — the span must cover the
    # stride-aligned windows inside it (first window at pos 1)
    s1 = by_doc[1]
    assert s1.span_start == 1
    assert s1.span_end >= 32  # at least the first window
    assert s1.span_end <= 60 + 31  # never past boilerplate + window slop
    assert s1.span_len == s1.span_end - s1.span_start + 1
    # doc 2's copy starts at len(FILL_B)+2 — unaligned with doc 1's
    # grid, still found (windows hash by content, not position)
    s2 = by_doc[2]
    off = len(FILL_B) + 2
    assert s2.span_start >= off - 7  # within one stride of the copy
    assert s2.span_end >= s2.span_start + 31


def test_spans_ignore_unique_and_short_docs(spark):
    df = _docs(
        spark,
        [
            (1, FILL_A),
            (2, FILL_B),
            (3, "short"),  # < k: no windows at all
            (4, None),  # null text: dropped, not crashed
        ],
    )
    assert repeated_window_spans(df, k=32, stride=8).count() == 0


def test_removal_keeps_exactly_one_copy(spark):
    shared = BOILER
    df = _docs(
        spark,
        [
            (1, shared + " " + FILL_A),
            (2, FILL_B + " " + shared),
            (3, FILL_A + " tail words here"),
        ],
    )
    out = {r.doc_id: r for r in remove_repeated_spans(df, k=32, stride=8).collect()}
    assert len(out) == 3
    # keeper = lowest (doc_id, pos): doc 1 keeps its text verbatim
    assert out[1].clean_text == shared + " " + FILL_A
    assert out[1].n_spans == 0
    # doc 2 loses (at least the window-covered part of) the copy
    assert out[2].n_spans == 1
    assert len(out[2].clean_text) < len(FILL_B) + 1 + len(shared)
    assert out[2].clean_text.startswith(FILL_B)
    assert shared not in out[2].clean_text
    assert out[2].removed_chars == (
        len(FILL_B) + 1 + len(shared) - len(out[2].clean_text)
    )
    # untouched doc passes through
    assert out[3].clean_text == FILL_A + " tail words here"
    assert out[3].n_spans == 0 and out[3].removed_chars == 0


def test_removal_null_and_short_pass_through(spark):
    df = _docs(spark, [(1, None), (2, "tiny")])
    out = {r.doc_id: r for r in remove_repeated_spans(df, k=32, stride=8).collect()}
    assert out[1].clean_text is None and out[1].n_spans == 0
    assert out[2].clean_text == "tiny" and out[2].removed_chars == 0


def test_removal_span_to_end_of_text(spark):
    # repeated block at the very END: tail substring past len(text)
    # must yield '' cleanly, not an error or garbage
    df = _docs(
        spark,
        [(1, FILL_A + " " + BOILER), (2, FILL_B + " " + BOILER)],
    )
    out = {r.doc_id: r for r in remove_repeated_spans(df, k=32, stride=8).collect()}
    assert out[1].n_spans == 0  # keeper
    assert out[2].n_spans == 1
    assert out[2].clean_text.startswith(FILL_B)
    assert not out[2].clean_text.endswith(BOILER[-10:])


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
