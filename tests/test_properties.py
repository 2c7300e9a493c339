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
