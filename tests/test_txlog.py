"""Multi-writer transactional table (operators/txlog.py): commit
protocol, visibility resolution, concurrency, crash residue, and
compaction — the multi-writer form of the reference's Postgres
``ON CONFLICT`` sink (dags/crypto-etl-pipeline-psql.py:85-89)."""

import json
import os
import threading

import pytest
from pyspark.sql import functions as F

from crypto_etl_airflow_spark.operators.txlog import (
    TxConflictError,
    tx_append_if_absent,
    tx_compact,
    tx_delete,
    tx_history,
    tx_init,
    tx_merge,
    tx_read,
    tx_vacuum,
)


def _rows(df):
    return sorted((r["k"], r["val"]) for r in df.collect())


def _mk(spark, pairs):
    return spark.createDataFrame(
        [(k, v) for k, v in pairs], "k long, val string"
    )


def test_append_roundtrip_and_idempotence(spark, tmp_path):
    path = str(tmp_path / "t")
    out = tx_append_if_absent(spark, _mk(spark, [(1, "a"), (2, "b")]), path, ["k"])
    assert out == {"version": 1, "rows_written": 2, "retries": 0}
    # re-running the same batch writes nothing and commits nothing
    again = tx_append_if_absent(spark, _mk(spark, [(1, "a"), (2, "b")]), path, ["k"])
    assert again["version"] is None and again["rows_written"] == 0
    assert _rows(tx_read(spark, path)) == [(1, "a"), (2, "b")]
    assert [c["version"] for c in tx_history(path)] == [1]


def test_append_filters_only_existing_keys(spark, tmp_path):
    path = str(tmp_path / "t")
    tx_append_if_absent(spark, _mk(spark, [(1, "a")]), path, ["k"])
    out = tx_append_if_absent(
        spark, _mk(spark, [(1, "CHANGED"), (2, "b")]), path, ["k"]
    )
    assert out["rows_written"] == 1
    # existing key keeps its original value — DO NOTHING, not UPDATE
    assert _rows(tx_read(spark, path)) == [(1, "a"), (2, "b")]


def test_merge_replaces_and_last_writer_wins(spark, tmp_path):
    path = str(tmp_path / "t")
    tx_append_if_absent(spark, _mk(spark, [(1, "a"), (2, "b")]), path, ["k"])
    v2 = tx_merge(spark, _mk(spark, [(2, "B2"), (3, "c")]), path, ["k"])
    assert v2 == 2
    assert _rows(tx_read(spark, path)) == [(1, "a"), (2, "B2"), (3, "c")]
    tx_merge(spark, _mk(spark, [(2, "B3")]), path, ["k"])
    assert _rows(tx_read(spark, path)) == [(1, "a"), (2, "B3"), (3, "c")]


def test_delete_tombstone_and_reinsert(spark, tmp_path):
    path = str(tmp_path / "t")
    tx_append_if_absent(spark, _mk(spark, [(1, "a"), (2, "b")]), path, ["k"])
    tx_delete(spark, spark.createDataFrame([(2,)], "k long"), path, ["k"])
    assert _rows(tx_read(spark, path)) == [(1, "a")]
    # a later insert of the deleted key is visible again
    out = tx_append_if_absent(spark, _mk(spark, [(2, "b2")]), path, ["k"])
    assert out["rows_written"] == 1
    assert _rows(tx_read(spark, path)) == [(1, "a"), (2, "b2")]


def test_time_travel(spark, tmp_path):
    path = str(tmp_path / "t")
    tx_append_if_absent(spark, _mk(spark, [(1, "a")]), path, ["k"])
    tx_merge(spark, _mk(spark, [(1, "a2")]), path, ["k"])
    assert _rows(tx_read(spark, path, version=1)) == [(1, "a")]
    assert _rows(tx_read(spark, path, version=2)) == [(1, "a2")]
    assert tx_read(spark, path, version=0) is None


def test_concurrent_append_exactly_once_per_key(spark, tmp_path):
    """Four writers race overlapping batches: every key lands exactly
    once, with a value one of the racing writers actually wrote —
    the double-insert race the single-writer upsert documents is the
    thing this protocol removes."""
    path = str(tmp_path / "t")
    tx_init(path)
    results, errors = {}, []

    def writer(wid):
        try:
            batch = _mk(spark, [(k, f"w{wid}") for k in range(wid, wid + 6)])
            results[wid] = tx_append_if_absent(
                spark, batch, path, ["k"], max_retries=30
            )
        except Exception as e:  # pragma: no cover - surfaced by assert
            errors.append(e)

    threads = [threading.Thread(target=writer, args=(w,)) for w in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    rows = tx_read(spark, path).collect()
    keys = sorted(r["k"] for r in rows)
    assert keys == list(range(0, 8 + 1))  # 0..8, each exactly once
    assert all(r["val"] in {"w0", "w1", "w2", "w3"} for r in rows)
    # versions are dense and the log agrees with the writers' receipts
    versions = [c["version"] for c in tx_history(path)]
    assert versions == list(range(1, len(versions) + 1))
    committed = {r["version"] for r in results.values() if r["version"]}
    assert committed <= set(versions)


def test_concurrent_merges_serialize_by_version(spark, tmp_path):
    path = str(tmp_path / "t")
    tx_init(path)
    done = []

    def writer(wid):
        v = tx_merge(spark, _mk(spark, [(1, f"w{wid}")]), path, ["k"])
        done.append((v, f"w{wid}"))

    threads = [threading.Thread(target=writer, args=(w,)) for w in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    # the highest committed version's value is the visible one
    winner = max(done)[1]
    assert _rows(tx_read(spark, path)) == [(1, winner)]
    assert sorted(v for v, _ in done) == [1, 2, 3, 4]


def test_orphan_delta_is_invisible_and_vacuumed(spark, tmp_path):
    path = str(tmp_path / "t")
    tx_append_if_absent(spark, _mk(spark, [(1, "a")]), path, ["k"])
    # simulate a writer that died between data write and claim
    orphan = os.path.join(path, "delta", "deadbeef")
    _mk(spark, [(99, "ghost")]).write.parquet(orphan)
    assert _rows(tx_read(spark, path)) == [(1, "a")]  # invisible
    assert tx_vacuum(path, retain_seconds=3600) == []  # too young: kept
    os.utime(orphan, (1, 1))
    removed = tx_vacuum(path, retain_seconds=3600)
    assert removed == ["delta/deadbeef"]
    assert not os.path.exists(orphan)
    assert _rows(tx_read(spark, path)) == [(1, "a")]


def test_partial_commit_files_are_ignored(spark, tmp_path):
    path = str(tmp_path / "t")
    tx_append_if_absent(spark, _mk(spark, [(1, "a")]), path, ["k"])
    # temp commit bodies (pre-link names) never count as commits
    with open(os.path.join(path, "_txlog", ".tmp-x"), "w") as f:
        f.write("{")
    assert [c["version"] for c in tx_history(path)] == [1]
    assert _rows(tx_read(spark, path)) == [(1, "a")]


def test_compact_preserves_state_and_bounds_the_log(spark, tmp_path):
    path = str(tmp_path / "t")
    tx_append_if_absent(spark, _mk(spark, [(1, "a"), (2, "b")]), path, ["k"])
    tx_merge(spark, _mk(spark, [(2, "B")]), path, ["k"])
    tx_delete(spark, spark.createDataFrame([(1,)], "k long"), path, ["k"])
    before = _rows(tx_read(spark, path))
    cv = tx_compact(spark, path)
    assert cv == 4
    assert _rows(tx_read(spark, path)) == before == [(2, "B")]
    # post-compact mutations still apply on top
    tx_merge(spark, _mk(spark, [(2, "B5")]), path, ["k"])
    assert _rows(tx_read(spark, path)) == [(2, "B5")]
    # vacuum drops the pre-compact history and its data dirs
    for kind in ("delta", "effects"):
        root = os.path.join(path, kind)
        for name in os.listdir(root):
            os.utime(os.path.join(root, name), (1, 1))
    tx_vacuum(path, retain_seconds=3600)
    versions = [c["version"] for c in tx_history(path)]
    assert versions == [4, 5]
    assert _rows(tx_read(spark, path)) == [(2, "B5")]


def test_compact_refuses_to_fold_away_a_concurrent_commit(spark, tmp_path, monkeypatch):
    """A commit landing between compact's resolve and its claim must
    fail the claim (version taken) and force a fresh resolve — the
    interleaved merge survives."""
    import crypto_etl_airflow_spark.operators.txlog as tx

    path = str(tmp_path / "t")
    tx_append_if_absent(spark, _mk(spark, [(1, "a")]), path, ["k"])

    real_claim = tx._claim
    fired = {"done": False}

    def racing_claim(p, version, body):
        if body["action"] == "compact" and not fired["done"]:
            fired["done"] = True
            tx_merge(spark, _mk(spark, [(1, "RACED")]), p, ["k"])
        return real_claim(p, version, body)

    monkeypatch.setattr(tx, "_claim", racing_claim)
    cv = tx_compact(spark, path)
    assert _rows(tx_read(spark, path)) == [(1, "RACED")]
    # the winning compact is a successor of the raced merge
    actions = {c["version"]: c["action"] for c in tx_history(path)}
    assert actions[cv] == "compact" and actions[cv - 1] == "merge"


def test_conflict_error_when_claims_exhausted(spark, tmp_path, monkeypatch):
    import crypto_etl_airflow_spark.operators.txlog as tx

    path = str(tmp_path / "t")
    tx_init(path)
    monkeypatch.setattr(tx, "_claim", lambda *a, **k: False)
    with pytest.raises(TxConflictError):
        tx_merge(spark, _mk(spark, [(1, "a")]), path, ["k"], max_retries=2)


def test_commit_log_is_valid_json_metadata(spark, tmp_path):
    path = str(tmp_path / "t")
    tx_append_if_absent(spark, _mk(spark, [(1, "a")]), path, ["k"])
    tx_merge(spark, _mk(spark, [(1, "b")]), path, ["k"])
    log = os.path.join(path, "_txlog")
    for name in sorted(os.listdir(log)):
        with open(os.path.join(log, name)) as f:
            c = json.load(f)
        assert {"version", "action", "delta", "effects", "keys"} <= set(c)


def test_vacuum_cleans_aged_claim_tmp_files(spark, tmp_path):
    path = str(tmp_path / "t")
    tx_append_if_absent(spark, _mk(spark, [(1, "a")]), path, ["k"])
    log = os.path.join(path, "_txlog")
    ghost = os.path.join(log, ".tmp-deadwriter")
    with open(ghost, "w") as f:
        f.write("{}")
    assert tx_vacuum(path, retain_seconds=3600) == []  # young: kept
    os.utime(ghost, (1, 1))
    assert tx_vacuum(path, retain_seconds=3600) == ["_txlog/.tmp-deadwriter"]
    assert not os.path.exists(ghost)


def test_reader_tolerates_commit_vacuumed_mid_listing(spark, tmp_path, monkeypatch):
    """A concurrent vacuum unlinking a pre-compact commit between the
    reader's listdir and open must be skipped, not crash the read."""
    import builtins

    import crypto_etl_airflow_spark.operators.txlog as tx

    path = str(tmp_path / "t")
    tx_append_if_absent(spark, _mk(spark, [(1, "a")]), path, ["k"])
    tx_merge(spark, _mk(spark, [(1, "b")]), path, ["k"])
    tx_compact(spark, path)
    victim = os.path.join(path, "_txlog", f"{1:010d}.json")

    real_open = builtins.open

    def racing_open(file, *a, **kw):
        if str(file) == victim and os.path.exists(victim):
            os.unlink(victim)  # the vacuum wins the race
        return real_open(file, *a, **kw)

    monkeypatch.setattr(builtins, "open", racing_open)
    assert _rows(tx_read(spark, path)) == [(1, "b")]
