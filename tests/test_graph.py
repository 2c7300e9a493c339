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
