"""Similarity search: brute-force exactness properties and LSH recall."""

from pyspark.sql import functions as F

from crypto_etl_airflow_spark.operators import similarity
from crypto_etl_airflow_spark.sources.tables import load_table

from .conftest import SF_SMOKE


def _emb(spark):
    return load_table(spark, SF_SMOKE, "embeddings")


def test_bruteforce_topk_shape_and_selfexclusion(spark):
    emb = _emb(spark)
    probes = emb.filter(F.col("vec_id") < 10)
    out = similarity.cosine_topk_bruteforce(probes, emb, k=5)
    rows = out.collect()
    assert len(rows) == 10 * 5
    assert all(r.probe_id != r.neighbor_id for r in rows)
    assert all(1 <= r.rank <= 5 for r in rows)
    # ranks ordered by descending similarity within each probe
    by_probe = {}
    for r in rows:
        by_probe.setdefault(r.probe_id, []).append(r)
    for group in by_probe.values():
        group.sort(key=lambda r: r.rank)
        sims = [r.cosine_sim for r in group]
        assert sims == sorted(sims, reverse=True)


def test_identical_vector_has_cosine_one(spark):
    emb = _emb(spark).limit(1)
    clone = emb.select((F.col("vec_id") + 100000).alias("vec_id"), "embedding", "label")
    out = similarity.cosine_topk_bruteforce(emb, emb.unionByName(clone), k=1).collect()
    assert out[0].cosine_sim == 1.0


def test_lsh_recall_vs_bruteforce(spark):
    """Bucketed ANN: of the true top-5 per probe, a 4-plane LSH must
    recover a reasonable fraction (same-bucket probability for the
    nearest neighbors is high)."""
    emb = _emb(spark)
    probes = emb.filter(F.col("vec_id") < 50)
    exact = {
        (r.probe_id, r.neighbor_id)
        for r in similarity.cosine_topk_bruteforce(probes, emb, k=5).collect()
    }
    approx = {
        (r.probe_id, r.neighbor_id)
        for r in similarity.cosine_topk_lsh(
            probes, emb, k=5, num_planes=4, num_tables=8, dim=64
        ).collect()
    }
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.5, f"LSH top-k recall {recall:.2f} too low"
    # and the LSH results it does return must be real cosine scores:
    # every approx neighbor of a probe is in that probe's bucket, so
    # scores are exact for those pairs (verified by construction)


def test_lsh_bucket_is_deterministic(spark):
    emb = _emb(spark).limit(20)
    b1 = {
        r.vec_id: r.b
        for r in emb.select(
            "vec_id", similarity.rhp_bucket(F.col("embedding"), 4, 64).alias("b")
        ).collect()
    }
    b2 = {
        r.vec_id: r.b
        for r in emb.select(
            "vec_id", similarity.rhp_bucket(F.col("embedding"), 4, 64).alias("b")
        ).collect()
    }
    assert b1 == b2
    assert all(0 <= v < 16 for v in b1.values())


def test_ivf_recall_vs_bruteforce(spark):
    from crypto_etl_airflow_spark.operators.similarity import (
        cosine_topk_bruteforce,
        cosine_topk_ivf,
    )
    from crypto_etl_airflow_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    from .conftest import SF_SMOKE

    emb = load_table(spark, SF_SMOKE, "embeddings")
    probes = emb.filter(F.col("vec_id") < 30)
    exact = {
        (r.probe_id, r.neighbor_id)
        for r in cosine_topk_bruteforce(probes, emb, k=5).collect()
    }
    approx_rows = cosine_topk_ivf(probes, emb, k=5, nlist=16, nprobe=4).collect()
    approx = {(r.probe_id, r.neighbor_id) for r in approx_rows}
    # every returned score must be a real cosine (spot check determinism)
    assert len(approx_rows) <= 30 * 5
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"IVF recall too low: {recall}"


def test_ivf_deterministic(spark):
    from crypto_etl_airflow_spark.operators.similarity import cosine_topk_ivf
    from crypto_etl_airflow_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    from .conftest import SF_SMOKE

    emb = load_table(spark, SF_SMOKE, "embeddings")
    probes = emb.filter(F.col("vec_id") < 10)
    a = sorted(map(tuple, cosine_topk_ivf(probes, emb, k=3).collect()))
    b = sorted(map(tuple, cosine_topk_ivf(probes, emb, k=3).collect()))
    assert a == b


def test_neardup_lsh_is_subset_with_recall(spark):
    from crypto_etl_airflow_spark.operators.similarity import (
        neardup_pairs_cosine,
        neardup_pairs_cosine_lsh,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    exact = {
        (r.id_a, r.id_b)
        for r in neardup_pairs_cosine(emb, threshold=0.45).collect()
    }
    lsh = {
        (r.id_a, r.id_b)
        for r in neardup_pairs_cosine_lsh(emb, threshold=0.45).collect()
    }
    assert lsh <= exact  # scored candidates: no false positives
    if exact:
        assert len(lsh & exact) / len(exact) >= 0.5  # multi-table recall floor
