"""Property-based invariants (hypothesis) for the engine's core
contracts: upsert idempotency, dedup correctness vs a pure-Python
model, JSON ingest roundtrip, quality thresholds.

Each example pays a Spark roundtrip, so example counts are small and
deadlines disabled — the value is the input diversity (duplicate
keys, empty-ish batches, adversarial token patterns), not volume.
"""

import json

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from crypto_etl_airflow_spark.operators.dedup import ngram_jaccard_pairs
from crypto_etl_airflow_spark.operators.upsert import upsert_append
from crypto_etl_airflow_spark.quality.checks import min_value, run_scan
from crypto_etl_airflow_spark.sources.json_ingest import json_payload_to_df

SLOW = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

keys = st.integers(min_value=0, max_value=9)
batches = st.lists(st.tuples(keys, st.floats(0, 100, allow_nan=False)), min_size=1, max_size=20)


@given(batch=batches)
@SLOW
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


words = st.sampled_from(["alpha", "beta", "gamma", "delta", "eps"])
docs = st.lists(
    st.lists(words, min_size=0, max_size=8).map(" ".join),
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


@given(texts=docs)
@SLOW
def test_ngram_jaccard_matches_python_model(spark, texts):
    """The distributed shingle self-join computes exactly the pairwise
    Jaccard a direct python set computation yields."""
    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    got = {
        (r.id_a, r.id_b, r.jaccard)
        for r in ngram_jaccard_pairs(df, "doc_id", "text", n=2, threshold=0.5).collect()
    }
    assert got == _py_jaccard_pairs(texts, n=2, threshold=0.5)


payloads = st.dictionaries(
    st.sampled_from(["bitcoin", "ethereum", "tether", "solana", "doge"]),
    st.floats(0.0001, 1e6, allow_nan=False),
    min_size=1,
    max_size=5,
)


@given(payload=payloads)
@SLOW
def test_json_ingest_roundtrip(spark, payload):
    """∀ payload {coin: price}: the explode/parse pipeline reproduces
    every (coin, price) pair exactly once."""
    body = json.dumps({k: {"usd": v} for k, v in payload.items()})
    df = json_payload_to_df(spark, body)
    got = {(r.crypto_id, r.price_usd) for r in df.collect()}
    assert got == set(payload.items())
    assert df.count() == len(payload)


values = st.lists(st.floats(-10, 10, allow_nan=False), min_size=1, max_size=15)


@given(vals=values)
@SLOW
def test_min_value_gate_matches_python_min(spark, vals):
    df = spark.createDataFrame([(v,) for v in vals], ["price"])
    result = run_scan(df, [min_value("price", fail_when_lt=0.0)])
    assert result.failed == (min(vals) < 0.0)


split_keys = st.lists(st.integers(0, 10_000), min_size=1, max_size=30, unique=True)


@given(ids=split_keys)
@SLOW
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
    from crypto_etl_airflow_spark.operators.sampling import stratified_sample

    df = spark.createDataFrame(
        [(i, "a" if i % 2 == 0 else "b") for i in range(2000)], ["k", "s"]
    )
    kept1 = stratified_sample(df, "k", "s", {"a": 0.2}, default=1.0)
    kept2 = stratified_sample(df.repartition(13), "k", "s", {"a": 0.2}, default=1.0)
    ids1 = sorted(r.k for r in kept1.collect())
    assert ids1 == sorted(r.k for r in kept2.collect())  # partition-stable
    from pyspark.sql import functions as F

    by_s = {r.s: r.n for r in kept1.groupBy("s").agg(F.count("*").alias("n")).collect()}
    assert by_s["b"] == 1000                      # default=1.0 keeps all
    assert 120 <= by_s["a"] <= 280                # ~20% of 1000
