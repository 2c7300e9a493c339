"""Int8 embedding quantization: round-trip error bound, degenerate
inputs, and code-range invariants."""

from pyspark.sql import functions as F

from crypto_etl_airflow_spark.operators.quantize import (
    dequantize,
    quantize_embeddings_int8,
)
from crypto_etl_airflow_spark.sources.tables import load_table

from .conftest import SF_SMOKE


def test_roundtrip_error_bounded_by_half_step(spark):
    """Scalar quantization's defining bound: every reconstructed
    component is within scale/2 of the original."""
    emb = load_table(spark, SF_SMOKE, "embeddings")
    q = quantize_embeddings_int8(emb)
    joined = q.join(emb.select("vec_id", "embedding"), "vec_id").select(
        F.arrays_zip(
            F.col("embedding").cast("array<double>"),
            dequantize(F.col("q_codes"), F.col("q_min"), F.col("q_scale")),
        ).alias("z"),
        "q_scale",
    )
    bad = joined.select(
        F.exists(
            "z",
            lambda s: F.abs(s["0"] - s["1"]) > F.col("q_scale") / 2 + F.lit(1e-12),
        ).alias("viol")
    ).filter("viol")
    assert bad.count() == 0


def test_codes_in_range_and_extremes_hit(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    q = quantize_embeddings_int8(emb)
    stats = q.select(
        F.array_min("q_codes").alias("lo"), F.array_max("q_codes").alias("hi")
    ).agg(
        F.min("lo").alias("mn"), F.max("hi").alias("mx"),
        F.sum(F.when(F.col("lo") == -128, 1).otherwise(0)).alias("n_lo"),
        F.sum(F.when(F.col("hi") == 127, 1).otherwise(0)).alias("n_hi"),
    ).collect()[0]
    assert stats.mn >= -128 and stats.mx <= 127
    # per-vector min maps to code -128 and max to code 127 (levels
    # 0 and 255 shifted into the signed byte) by construction
    assert stats.n_lo > 0 and stats.n_hi > 0
    # storage honesty: the codes column is a true single-byte type
    assert dict(q.dtypes)["q_codes"] == "array<tinyint>"


def test_constant_vector_is_all_zero_codes_zero_error(spark):
    df = spark.createDataFrame(
        [(1, [2.5, 2.5, 2.5])], "vec_id long, embedding array<double>"
    )
    q = quantize_embeddings_int8(df).collect()[0]
    assert list(q.q_codes) == [-128, -128, -128]  # level 0, byte-shifted
    assert q.q_scale == 1.0
    rec = (
        quantize_embeddings_int8(df)
        .select(dequantize("q_codes", "q_min", "q_scale").alias("r"))
        .collect()[0]
        .r
    )
    assert list(rec) == [2.5, 2.5, 2.5]


def test_topk_on_dequantized_vectors_matches_exact(spark):
    """The point of int8 storage: ANN over dequantized vectors must
    agree with ANN over the originals. Top-5 cosine neighbor sets
    overlap >=80% on the fixture corpus (int8 range quantization
    perturbs 64-dim cosines far below typical neighbor gaps)."""
    from crypto_etl_airflow_spark.operators.similarity import (
        cosine_topk_bruteforce,
    )

    emb = load_table(spark, SF_SMOKE, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    deq = quantize_embeddings_int8(emb).select(
        "vec_id",
        dequantize("q_codes", "q_min", "q_scale").alias("embedding"),
    )
    k = 5
    probes = emb.filter(F.col("vec_id") < 20)
    probes_q = deq.filter(F.col("vec_id") < 20)
    exact = {
        (r.probe_id, r.neighbor_id)
        for r in cosine_topk_bruteforce(probes, emb, k=k).collect()
    }
    quant = {
        (r.probe_id, r.neighbor_id)
        for r in cosine_topk_bruteforce(probes_q, deq, k=k).collect()
    }
    assert exact and len(exact) == len(quant)
    overlap = len(exact & quant) / len(exact)
    assert overlap >= 0.8, f"dequantized top-{k} overlap {overlap:.2f}"
