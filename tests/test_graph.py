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
