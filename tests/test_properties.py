"""Hypothesis property tests for operator invariants that should
hold on ARBITRARY inputs, not just the fixtures: the winnowing
substring-match guarantee and the int8 quantization error bound.

Example counts are small — every example runs real Spark jobs — but
hypothesis's shrinking still turns any failure into a minimal
counterexample, which a fixed fixture test can't do.
"""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# word alphabet is disjoint from the passage alphabet so surrounding
# text can never accidentally extend or duplicate the planted run
_words = st.lists(
    st.text(alphabet="abcdefghij", min_size=1, max_size=6), max_size=20
)
# ≥ w+k−1 = 11 chars, no whitespace → survives normalization intact
_passage = st.text(alphabet="qrstuvwxyz", min_size=11, max_size=30)


@settings(**_SETTINGS)
@given(a=_words, b=_words, passage=_passage)
def test_winnow_guarantee_on_arbitrary_docs(spark, a, b, passage):
    """Any two docs sharing a character run of length ≥ w+k−1 share
    at least one winnowed fingerprint — the SIGMOD-2003 guarantee,
    with arbitrary surrounding text."""
    from crypto_etl_airflow_spark.operators.fingerprint import (
        winnow_fingerprints,
    )

    doc1 = (" ".join(a) + " " + passage).strip()
    doc2 = (passage + " " + " ".join(b)).strip()
    df = spark.createDataFrame(
        [(1, doc1), (2, doc2)], "doc_id long, text string"
    )
    fps: dict[int, set] = {1: set(), 2: set()}
    for r in winnow_fingerprints(df).collect():
        fps[r.doc_id].add(r.fp)
    assert fps[1] & fps[2], (doc1, doc2)


_vec = st.lists(
    st.floats(
        min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
    ),
    min_size=1,
    max_size=16,
)


@settings(**_SETTINGS)
@given(vecs=st.lists(_vec, min_size=1, max_size=4))
def test_quantization_bound_on_arbitrary_vectors(spark, vecs):
    """Every reconstructed component is within scale/2 (+1 ulp slack)
    of the original, for arbitrary finite vectors including constant
    and single-element ones."""
    from pyspark.sql import functions as F

    from crypto_etl_airflow_spark.operators.quantize import (
        dequantize,
        quantize_embeddings_int8,
    )

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    q = quantize_embeddings_int8(df)
    rows = (
        q.join(df, "vec_id")
        .select(
            "vec_id",
            "q_scale",
            F.arrays_zip(
                F.col("embedding"),
                dequantize("q_codes", "q_min", "q_scale"),
            ).alias("z"),
        )
        .collect()
    )
    for r in rows:
        bound = r.q_scale / 2 + 1e-9 * max(1.0, abs(r.q_scale))
        for pair in r.z:
            x, xhat = pair["embedding"], pair["1"]
            assert abs(x - xhat) <= bound, (r.vec_id, x, xhat, r.q_scale)


# ---------------------------------------------------------------------------
# Restored invariants (ADVICE r6): the round-6 rewrite dropped these
# five randomized-input properties; example-based coverage elsewhere
# lacks hypothesis's input diversity + shrinking.
# ---------------------------------------------------------------------------

import json

from hypothesis import given

from crypto_etl_airflow_spark.operators.dedup import ngram_jaccard_pairs
from crypto_etl_airflow_spark.operators.upsert import upsert_append
from crypto_etl_airflow_spark.quality.checks import min_value, run_scan
from crypto_etl_airflow_spark.sources.json_ingest import json_payload_to_df

_keys = st.integers(min_value=0, max_value=9)
_batches = st.lists(
    st.tuples(_keys, st.floats(0, 100, allow_nan=False)), min_size=1, max_size=20
)


@settings(max_examples=8, **{k: v for k, v in _SETTINGS.items() if k != "max_examples"})
@given(batch=_batches)
def test_upsert_twice_equals_once(spark, tmp_path_factory, batch):
    """∀ batch: upsert(batch); upsert(batch) leaves exactly one row
    per distinct key — the ON CONFLICT DO NOTHING contract."""
    path = str(tmp_path_factory.mktemp("prop_upsert") / "t")
    df = spark.createDataFrame(batch, ["k", "v"])
    upsert_append(spark, df, path, keys=["k"])
    upsert_append(spark, df, path, keys=["k"])
    table = spark.read.parquet(path)
    assert table.count() == len({k for k, _ in batch})
    assert table.select("k").distinct().count() == table.count()


_words = st.sampled_from(["alpha", "beta", "gamma", "delta", "eps"])
_docs = st.lists(
    st.lists(_words, min_size=0, max_size=8).map(" ".join),
    min_size=1,
    max_size=6,
)


def _py_jaccard_pairs(texts, n=2, threshold=0.5):
    def shingles(t):
        toks = t.lower().split()
        return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}

    out = set()
    ss = [shingles(t) for t in texts]
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            inter = len(ss[i] & ss[j])
            union = len(ss[i] | ss[j])
            if union and inter / union >= threshold:
                out.add((i, j, round(inter / union, 6)))
    return out


@settings(max_examples=8, **{k: v for k, v in _SETTINGS.items() if k != "max_examples"})
@given(texts=_docs)
def test_ngram_jaccard_matches_python_model(spark, texts):
    """The distributed shingle self-join computes exactly the pairwise
    Jaccard a direct python set computation yields."""
    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    got = {
        (r.id_a, r.id_b, r.jaccard)
        for r in ngram_jaccard_pairs(
            df, "doc_id", "text", n=2, threshold=0.5
        ).collect()
    }
    assert got == _py_jaccard_pairs(texts, n=2, threshold=0.5)


_payloads = st.dictionaries(
    st.sampled_from(["bitcoin", "ethereum", "tether", "solana", "doge"]),
    st.floats(0.0001, 1e6, allow_nan=False),
    min_size=1,
    max_size=5,
)


@settings(max_examples=8, **{k: v for k, v in _SETTINGS.items() if k != "max_examples"})
@given(payload=_payloads)
def test_json_ingest_roundtrip(spark, payload):
    """∀ payload {coin: price}: the explode/parse pipeline reproduces
    every (coin, price) pair exactly once."""
    body = json.dumps({k: {"usd": v} for k, v in payload.items()})
    df = json_payload_to_df(spark, body)
    got = {(r.crypto_id, r.price_usd) for r in df.collect()}
    assert got == set(payload.items())
    assert df.count() == len(payload)


_values = st.lists(st.floats(-10, 10, allow_nan=False), min_size=1, max_size=15)


@settings(max_examples=8, **{k: v for k, v in _SETTINGS.items() if k != "max_examples"})
@given(vals=_values)
def test_min_value_gate_matches_python_min(spark, vals):
    df = spark.createDataFrame([(v,) for v in vals], ["price"])
    result = run_scan(df, [min_value("price", fail_when_lt=0.0)])
    assert result.failed == (min(vals) < 0.0)


_split_keys = st.lists(st.integers(0, 10_000), min_size=1, max_size=30, unique=True)


@settings(max_examples=8, **{k: v for k, v in _SETTINGS.items() if k != "max_examples"})
@given(ids=_split_keys)
def test_hash_split_deterministic_and_exhaustive(spark, ids):
    """∀ key sets: split assignment is stable across calls, covers
    every row when fractions sum to 1, and keys always agree."""
    from crypto_etl_airflow_spark.operators.sampling import hash_split

    df = spark.createDataFrame([(i,) for i in ids], ["k"])
    f = {"train": 0.8, "val": 0.2}
    a = {r.k: r.split for r in hash_split(df, "k", f).collect()}
    b = {r.k: r.split for r in hash_split(df, "k", f).collect()}
    assert a == b
    assert set(a.values()) <= {"train", "val"}
    assert all(v is not None for v in a.values())


def test_stratified_sample_deterministic_and_per_stratum(spark):
    from pyspark.sql import functions as F

    from crypto_etl_airflow_spark.operators.sampling import stratified_sample

    df = spark.createDataFrame(
        [(i, "a" if i % 2 == 0 else "b") for i in range(2000)], ["k", "s"]
    )
    kept1 = stratified_sample(df, "k", "s", {"a": 0.2}, default=1.0)
    kept2 = stratified_sample(df.repartition(13), "k", "s", {"a": 0.2}, default=1.0)
    ids1 = sorted(r.k for r in kept1.collect())
    assert ids1 == sorted(r.k for r in kept2.collect())  # partition-stable
    by_s = {
        r.s: r.n for r in kept1.groupBy("s").agg(F.count("*").alias("n")).collect()
    }
    assert by_s["b"] == 1000  # default=1.0 keeps all
    assert 120 <= by_s["a"] <= 280  # ~20% of 1000


# --- curation properties (round 7) -----------------------------------------

_pii_filler = st.text(
    alphabet="abc XYZ.-@0123456789", min_size=0, max_size=40
)
_pii_items = st.lists(
    st.sampled_from([
        "user@example.com", "x.y+z@mail.org",
        "555-123-4567", "123-45-6789", "10.0.200.7",
    ]),
    min_size=0,
    max_size=4,
)


@settings(max_examples=8, **{k: v for k, v in _SETTINGS.items() if k != "max_examples"})
@given(filler=_pii_filler, items=_pii_items)
def test_pii_redaction_complete_on_arbitrary_text(spark, filler, items):
    """However PII items are interleaved with arbitrary filler, the
    redacted output matches NO category pattern — redaction is a
    fixed point of every detector."""
    from pyspark.sql import functions as F

    from crypto_etl_airflow_spark.functions.pii import (
        PII_PATTERNS,
        redact_pii,
    )

    text = (" " + filler + " ").join(items) if items else filler
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    red = df.select(redact_pii(F.col("text")).alias("r"))
    leftovers = red.select(
        *[
            F.regexp_count("r", F.lit(p)).alias(c)
            for c, p in PII_PATTERNS.items()
        ]
    ).first()
    assert all(v == 0 for v in leftovers.asDict().values()), (
        text,
        red.first().r,
    )


_line_docs = st.lists(
    st.lists(
        st.sampled_from(["hot line", "HOT  LINE", "alpha", "beta", "gamma"]),
        min_size=1,
        max_size=4,
    ),
    min_size=1,
    max_size=6,
)


@settings(max_examples=8, **{k: v for k, v in _SETTINGS.items() if k != "max_examples"})
@given(docs=_line_docs)
def test_line_dedup_matches_python_model(spark, docs):
    """line_dedup_global over arbitrary small corpora equals a pure
    Python model: normalize (trim+lower+space-collapse? no — just
    trim+lower), count distinct docs per line, drop lines above the
    threshold, rebuild in order."""
    from crypto_etl_airflow_spark.operators.lines import line_dedup_global

    max_doc_freq = 2
    rows = [(i, "\n".join(lines)) for i, lines in enumerate(docs)]

    def norm(line):
        return line.strip().lower()

    from collections import defaultdict

    docs_per_line = defaultdict(set)
    for i, lines in enumerate(docs):
        for ln in lines:
            docs_per_line[norm(ln)].add(i)
    expected = {}
    for i, lines in enumerate(docs):
        kept = [ln for ln in lines if len(docs_per_line[norm(ln)]) <= max_doc_freq]
        expected[i] = ("\n".join(kept), len(lines), len(lines) - len(kept))

    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.clean_text, r.n_lines, r.n_removed)
        for r in line_dedup_global(
            df, "doc_id", "text", max_doc_freq=max_doc_freq
        ).collect()
    }
    assert got == expected


_bpe_corpus = st.lists(
    st.lists(
        st.text(alphabet="abc", min_size=1, max_size=5),
        min_size=1,
        max_size=5,
    ),
    min_size=1,
    max_size=4,
)


@settings(max_examples=8, **{k: v for k, v in _SETTINGS.items() if k != "max_examples"})
@given(docs=_bpe_corpus)
def test_bpe_matches_python_reference(spark, docs):
    """bpe_merge_rules on arbitrary small corpora equals a pure-Python
    BPE trainer: same winning pair each round (count desc, then
    lexicographic) and same counts, with leftmost non-overlapping
    merge application."""
    from collections import Counter

    from crypto_etl_airflow_spark.operators.bpe import bpe_merge_rules

    # --- python reference ---------------------------------------------
    vocab = Counter()
    for words in docs:
        vocab.update(words)
    syms = {w: list(w) for w in vocab}
    expected = []
    for rank in range(3):
        pairs = Counter()
        for w, freq in vocab.items():
            s = syms[w]
            for i in range(len(s) - 1):
                pairs[(s[i], s[i + 1])] += freq
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (l, r), cnt = best
        expected.append((rank, l, r, cnt))
        for w in syms:
            s, out = syms[w], []
            i = 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == l and s[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[w] = out

    # --- engine -------------------------------------------------------
    rows = [(i, " ".join(words)) for i, words in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = [
        (r.merge_rank, r.left_sym, r.right_sym, r.pair_count)
        for r in bpe_merge_rules(df, n_merges=3).orderBy("merge_rank").collect()
    ]
    assert got == expected, (docs, got, expected)


# lines of letters+spaces only: F.trim trims ASCII spaces while
# Python's strip() also trims tabs/newlines — keeping the alphabet to
# letters and spaces makes the two models agree exactly
_line = st.text(alphabet="abAB ", max_size=8)
_docs_of_lines = st.lists(
    st.lists(_line, min_size=1, max_size=6), min_size=1, max_size=4
)


@settings(**_SETTINGS)
@given(docs=_docs_of_lines)
def test_intradoc_dedup_matches_python_model_and_is_idempotent(
    spark, docs
):
    from crypto_etl_airflow_spark.operators.lines import line_dedup_intradoc

    rows = [(i, "\n".join(lines)) for i, lines in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: r
        for r in line_dedup_intradoc(df, "doc_id", "text").collect()
    }

    def model(text):
        seen, kept = set(), []
        for ln in text.split("\n"):
            k = ln.strip(" ").lower()
            if k not in seen:
                seen.add(k)
                kept.append(ln)
        return "\n".join(kept)

    for i, lines in enumerate(docs):
        text = "\n".join(lines)
        assert out[i].clean_text == model(text)
        assert out[i].n_lines == len(lines)
        assert out[i].n_removed == len(lines) - len(
            model(text).split("\n")
        )

    # idempotence: a deduped document has nothing left to remove
    clean = spark.createDataFrame(
        [(i, out[i].clean_text) for i in out], "doc_id long, text string"
    )
    again = line_dedup_intradoc(clean, "doc_id", "text").collect()
    assert all(r.n_removed == 0 for r in again)
    assert {r.doc_id: r.clean_text for r in again} == {
        i: out[i].clean_text for i in out
    }


@settings(**_SETTINGS)
@given(docs=_docs_of_lines)
def test_repetition_signal_bounds(spark, docs):
    from crypto_etl_airflow_spark.operators.repetition import (
        repetition_signals,
    )

    rows = [(i, "\n".join(lines)) for i, lines in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for r in repetition_signals(df, "doc_id", "text").collect():
        assert 0.0 <= r.dup_line_frac <= 1.0
        assert 0.0 <= r.dup_line_char_frac <= 1.0
        # top-ngram coverage is bounded by total chars; the dup-5gram
        # form may exceed 1 only through overlap double-counting,
        # which w=5 grams over <=48-char docs cannot reach here
        assert r.top_2gram_char_frac >= 0.0
        assert r.top_3gram_char_frac >= 0.0
        assert r.dup_5gram_char_frac >= 0.0
