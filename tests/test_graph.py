"""Connected components: known graphs, chains, convergence."""

from crypto_etl_airflow_spark.operators.graph import connected_components


def _cc(spark, edges):
    df = spark.createDataFrame(edges, ["src", "dst"])
    return {
        r.id: r.component for r in connected_components(df).collect()
    }


def test_two_components(spark):
    got = _cc(spark, [(1, 2), (2, 3), (10, 11)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_long_chain_converges(spark):
    # a path graph needs O(diameter) rounds — stress the iteration cap
    edges = [(i, i + 1) for i in range(12)]
    got = _cc(spark, edges)
    assert set(got.values()) == {0}
    assert len(got) == 13


def test_self_loop_and_duplicate_edges(spark):
    got = _cc(spark, [(5, 5), (5, 6), (6, 5), (5, 6)])
    assert got == {5: 5, 6: 5}


def test_reliable_checkpoint_dir_same_result(spark, tmp_path):
    # the cluster-safe mode: lineage truncated via reliable
    # checkpoints under checkpoint_dir instead of executor-local blocks
    df = spark.createDataFrame([(1, 2), (2, 3), (10, 11)], ["src", "dst"])
    got = {
        r.id: r.component
        for r in connected_components(
            df, checkpoint_dir=str(tmp_path / "ckpt")
        ).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}
    assert any((tmp_path / "ckpt").iterdir())  # checkpoints actually written


def test_keep_best_per_cluster_picks_highest_score_lowest_id(spark):
    from crypto_etl_airflow_spark.operators.graph import keep_best_per_cluster

    comp = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)], ["id", "component"]
    )
    scores = spark.createDataFrame(
        [(1, 0.5), (2, 0.9), (3, 0.9), (10, 0.1), (11, 0.1)], ["id", "score"]
    )
    out = {r.component: r for r in keep_best_per_cluster(comp, scores).collect()}
    assert out[1].kept_id == 2 and out[1].best_score == 0.9  # tie -> lowest id
    assert out[1].n_members == 3
    assert out[10].kept_id == 10 and out[10].n_members == 2


# --- large-star / small-star variant ---------------------------------

def _ccs(spark, edges, stats=None):
    from crypto_etl_airflow_spark.operators.graph import connected_components_star

    df = spark.createDataFrame(edges, ["src", "dst"])
    return {
        r.id: r.component
        for r in connected_components_star(df, stats=stats).collect()
    }


def test_star_two_components(spark):
    got = _ccs(spark, [(1, 2), (2, 3), (10, 11)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_star_self_loop_and_duplicate_edges(spark):
    got = _ccs(spark, [(5, 5), (5, 6), (6, 5), (5, 6)])
    assert got == {5: 5, 6: 5}


def test_star_matches_label_propagation_on_random_graph(spark):
    import random

    rng = random.Random(42)
    edges = [(rng.randrange(60), rng.randrange(60)) for _ in range(70)]
    edges = [(a, b) for a, b in edges if a != b]
    assert _ccs(spark, edges) == _cc(spark, edges)


def test_star_logarithmic_rounds_on_path_graph(spark):
    # a 64-node path has diameter 63: min-label propagation needs
    # ~63 rounds; star contraction must finish in O(log d) — well
    # under 10 rounds
    edges = [(i, i + 1) for i in range(63)]
    stats = {}
    got = _ccs(spark, edges, stats=stats)
    assert set(got.values()) == {0} and len(got) == 64
    assert stats["rounds"] <= 10, stats


def test_star_reliable_checkpoint_dir_same_result(spark, tmp_path):
    from crypto_etl_airflow_spark.operators.graph import connected_components_star

    df = spark.createDataFrame([(1, 2), (2, 3), (10, 11)], ["src", "dst"])
    got = {
        r.id: r.component
        for r in connected_components_star(
            df, checkpoint_dir=str(tmp_path / "ckpt")
        ).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}
    assert any((tmp_path / "ckpt").iterdir())
