"""SemDeDup-style semantic dedup (operators/semdedup.py): cluster
containment, pair symmetry/canonicalization, and the keep policy."""

import math

from crypto_etl_airflow_spark.operators.semdedup import (
    assign_clusters,
    semdedup_keep,
    semdedup_pairs,
)


def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _unit(angle):
    return [math.cos(angle), math.sin(angle), 0.0, 0.0]


def test_near_identical_vectors_pair_up(spark):
    # two tight groups far apart; nlist=2 puts each group in its own
    # cluster; within-group cosines ~1, across ~0
    rows = (
        [(i, _unit(0.02 * i)) for i in range(3)]  # group A near angle 0
        + [(10 + i, _unit(math.pi / 2 + 0.02 * i)) for i in range(3)]  # group B
    )
    pairs = semdedup_pairs(
        _emb(spark, rows), nlist=2, threshold=0.99
    ).collect()
    got = {(r.id_a, r.id_b) for r in pairs}
    assert got == {(0, 1), (0, 2), (1, 2), (10, 11), (10, 12), (11, 12)}
    assert all(r.cosine_sim >= 0.99 for r in pairs)


def test_pairs_never_cross_clusters(spark):
    rows = [(i, _unit(0.02 * i)) for i in range(3)] + [
        (10 + i, _unit(math.pi / 2 + 0.02 * i)) for i in range(3)
    ]
    df = _emb(spark, rows)
    assigned = {r.vec_id: r.centroid_id for r in assign_clusters(df, nlist=2).collect()}
    for r in semdedup_pairs(df, nlist=2, threshold=0.0).collect():
        assert assigned[r.id_a] == assigned[r.id_b]


def test_keep_policy_keeps_lowest_id(spark):
    rows = [(i, _unit(0.02 * i)) for i in range(3)] + [
        (10 + i, _unit(math.pi / 2 + 0.02 * i)) for i in range(3)
    ]
    verdicts = {
        r.vec_id: r.is_duplicate
        for r in semdedup_keep(_emb(spark, rows), nlist=2, threshold=0.99).collect()
    }
    assert verdicts == {
        0: False, 1: True, 2: True, 10: False, 11: True, 12: True
    }
    assert len(verdicts) == 6  # every vector gets a verdict


def test_dissimilar_corpus_all_kept(spark):
    # near-orthogonal vectors: no pairs at a high threshold
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0, 0.0]),
        (2, [0.0, 0.0, 1.0, 0.0]),
        (3, [0.0, 0.0, 0.0, 1.0]),
    ]
    df = _emb(spark, rows)
    assert semdedup_pairs(df, nlist=2, threshold=0.9).count() == 0
    kept = semdedup_keep(df, nlist=2, threshold=0.9)
    assert kept.filter("is_duplicate").count() == 0
