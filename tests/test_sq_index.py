"""Persisted IVF-SQ8 index (operators/sq_index.py): near-lossless
overlap with the flat index, int8 row schema, frozen idempotent add,
guards, targeted delete, partition-pruned plan."""

import glob

import pytest
from pyspark.sql import functions as F

from crypto_etl_airflow_spark.operators import ann_index, sq_index

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_near_lossless_vs_flat(spark, emb, tmp_path):
    """Same coarse quantizer, same lists, int8-rounded scoring: the
    SQ8 top-k must overlap the flat index's ≥ 95% — the
    near-lossless claim that separates this rung from PQ."""
    flat, sq = str(tmp_path / "flat"), str(tmp_path / "sq")
    ann_index.build_ivf_index(emb, flat, nlist=8)
    sq_index.build_ivfsq_index(emb, sq, nlist=8)
    probes = emb.filter(F.col("vec_id") < 20)
    a = {
        (r.probe_id, r.neighbor_id)
        for r in ann_index.query_ivf_index(probes, flat, k=5, nprobe=4).collect()
    }
    b = {
        (r.probe_id, r.neighbor_id)
        for r in sq_index.query_ivfsq_index(probes, sq, k=5, nprobe=4).collect()
    }
    assert len(a & b) / len(a) >= 0.95, len(a & b) / len(a)


def test_rows_are_int8_with_range_and_norm(spark, emb, tmp_path):
    path = str(tmp_path / "idx")
    sq_index.build_ivfsq_index(emb, path, nlist=8)
    lists = sq_index.read_ivfsq_lists(spark, path)
    d = dict(lists.dtypes)
    assert d["q_codes"] == "array<tinyint>"
    assert d["q_min"] == d["q_scale"] == d["v_nrm"] == "double"
    assert lists.count() == emb.count()
    assert len(glob.glob(f"{path}/lists/centroid_id=*")) >= 2


def test_add_idempotent_and_guards(spark, emb, tmp_path):
    path = str(tmp_path / "idx")
    train = emb.filter(F.col("vec_id") % 4 != 0)
    batch = emb.filter(F.col("vec_id") % 4 == 0)
    sq_index.build_ivfsq_index(train, path, nlist=8)
    assert sq_index.add_to_ivfsq_index(batch, path) == batch.count()
    assert sq_index.add_to_ivfsq_index(batch, path) == 0
    with pytest.raises(ValueError, match="refusing to mix"):
        sq_index.build_ivfsq_index(train, path, nlist=16)
    skinny = emb.select("vec_id", F.slice("embedding", 1, 32).alias("embedding"))
    with pytest.raises(ValueError, match="refusing to add"):
        sq_index.add_to_ivfsq_index(skinny, path)
    with pytest.raises(ValueError, match="refusing to query"):
        sq_index.query_ivfsq_index(skinny.limit(2), path)


def test_delete_targeted_and_idempotent(spark, emb, tmp_path):
    path = str(tmp_path / "idx")
    sq_index.build_ivfsq_index(emb, path, nlist=8)
    doomed = emb.filter(F.col("vec_id") % 100 == 0).select("vec_id")
    n = doomed.count()
    assert sq_index.delete_from_ivfsq_index(spark, path, doomed) == n
    assert sq_index.delete_from_ivfsq_index(spark, path, doomed) == 0
    remaining = {
        r.neighbor_id
        for r in sq_index.read_ivfsq_lists(spark, path)
        .select("neighbor_id")
        .collect()
    }
    assert not remaining & {r.vec_id for r in doomed.collect()}


def test_query_plan_prunes_partitions_no_cartesian(spark, emb, tmp_path):
    path = str(tmp_path / "idx")
    sq_index.build_ivfsq_index(emb, path, nlist=8)
    probes = emb.filter(F.col("vec_id") < 5)
    out = sq_index.query_ivfsq_index(probes, path, k=3, nprobe=2)
    plan = out._jdf.queryExecution().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]
    assert "CartesianProduct" not in plan


def test_probe_guard_falls_back_unhinted(spark, emb, tmp_path):
    """ADVICE r11: past the broadcast bound the probe-side hint drops
    (AQE plans a memory-safe join); results identical either way."""
    path = str(tmp_path / "sq")
    sq_index.build_ivfsq_index(emb, path, nlist=8)
    probes = emb.filter(F.col("vec_id") < 20)
    got = sorted(
        tuple(r)
        for r in sq_index.query_ivfsq_index(
            probes, path, k=3, nprobe=2, max_broadcast_probes=4
        ).collect()
    )
    want = sorted(
        tuple(r)
        for r in sq_index.query_ivfsq_index(
            probes, path, k=3, nprobe=2
        ).collect()
    )
    assert got == want and got


def test_compact_preserves_layout_and_results(spark, emb, tmp_path):
    """compact_ivfsq_lists (new in r12 — the SQ8 rung previously had
    no compaction, so per-add file accretion grew unboundedly): it
    must collapse to one file per inverted list WITHOUT flattening
    the partition layout or changing query answers."""
    from crypto_etl_airflow_spark.operators.compact import (
        parquet_file_count,
    )

    path = str(tmp_path / "sq")
    sq_index.build_ivfsq_index(
        emb.filter(F.col("vec_id") % 4 == 1), path, nlist=8
    )
    for r in (2, 3, 0):
        sq_index.add_to_ivfsq_index(
            emb.filter(F.col("vec_id") % 4 == r), path
        )
    probes = emb.filter(F.col("vec_id") < 10)
    before = sorted(
        tuple(r)
        for r in sq_index.query_ivfsq_index(
            probes, path, k=3, nprobe=2
        ).collect()
    )
    n_before = parquet_file_count(f"{path}/lists")
    n_after = sq_index.compact_ivfsq_lists(spark, path)
    assert n_after < n_before
    parts = glob.glob(f"{path}/lists/centroid_id=*")
    assert parts
    assert all(len(glob.glob(f"{p}/*.parquet")) == 1 for p in parts)
    after = sorted(
        tuple(r)
        for r in sq_index.query_ivfsq_index(
            probes, path, k=3, nprobe=2
        ).collect()
    )
    assert after == before


def test_rebalance_splits_hot_lists_invariantly(spark, emb, tmp_path):
    """rebalance_ivfsq_lists (r12): SQ8 rows are self-contained, so
    splitting moves them untouched — FULL-PROBE answers must be
    byte-identical before and after, and every vector stays in
    exactly one referenced list."""
    path = str(tmp_path / "sq")
    sq_index.build_ivfsq_index(emb, path, nlist=4)
    total = emb.count()
    probes = emb.filter(F.col("vec_id") < 15)
    before = sorted(
        tuple(r)
        for r in sq_index.query_ivfsq_index(
            probes, path, k=3, nprobe=4
        ).collect()
    )
    n_split = sq_index.rebalance_ivfsq_lists(
        spark, path, max_list_size=max(1, total // 6)
    )
    assert n_split >= 1
    nl = spark.read.parquet(f"{path}/centroids").count()
    assert nl == 4 + n_split
    lists = sq_index.read_ivfsq_lists(spark, path)
    assert lists.count() == total
    assert lists.select("neighbor_id").distinct().count() == total
    after = sorted(
        tuple(r)
        for r in sq_index.query_ivfsq_index(
            probes, path, k=3, nprobe=nl
        ).collect()
    )
    assert after == before
    assert sq_index.rebalance_ivfsq_lists(spark, path, 10**9) == 0
