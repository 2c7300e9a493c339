"""Multi-writer transactional parquet table — optimistic concurrency
over a commit log (the published Delta-Lake/Iceberg protocol shape,
re-implemented minimally on filesystem primitives; Armbrust et al.,
"Delta Lake: High-Performance ACID Table Storage over Cloud Object
Stores", VLDB 2020, is the public description of the pattern).

Closes the one semantic gap the plain writer documents: the
reference's Postgres sink (``INSERT ... ON CONFLICT DO NOTHING``,
reference dags/crypto-etl-pipeline-psql.py:85-89) serializes
CONCURRENT loaders through row locks, while the left-anti-append
writer (operators/upsert.py:21) is single-writer by contract — a
read-append race between two writers can double-insert a key. This
module provides the multi-writer form without a table-format
dependency: every mutation is a numbered commit claimed atomically,
readers see only committed data, and concurrent insert-if-absent
writers converge to exactly-once-per-key.

Layout under the table root::

    {path}/_txlog/{version:010d}.json   one JSON per commit
    {path}/delta/{uuid}/                parquet rows added by one commit
    {path}/effects/{uuid}/              parquet keys replaced/deleted

Protocol:

- **claim** — the commit body is fully written to a temp file, then
  ``os.link(tmp, _txlog/N.json)`` claims version N create-exclusively
  (atomic on POSIX and HDFS; object stores need a putIfAbsent or a
  coordination service — same caveat Delta documents). The loser gets
  ``FileExistsError``, re-reads, and retries at N+1. Because content
  lands before the name, a reader can never observe a partial commit.
- **merge / delete are blind commits**: their semantics ("replace /
  delete every row of key K committed below my version") do not
  depend on the writer's snapshot, so last-writer-wins per key is
  serializable with no conflict check — version order IS the
  serialization order. A lost claim retries the claim only; the data
  files are reused as written.
- **insert-if-absent depends on its snapshot** ("K absent as of V"):
  after losing a claim the writer re-resolves the table and re-runs
  the left-anti filter before retrying, so a key another writer just
  committed is dropped, not double-inserted.
- **compact** rewrites the resolved snapshot as one delta and is
  valid only as the IMMEDIATE successor of the version it resolved
  (claiming snapshot+1); any interleaved commit fails the claim and
  forces a fresh resolve, so no concurrent mutation is ever folded
  away.
- **crash safety**: a writer that dies before its claim leaves an
  unreferenced delta/effects dir — invisible to every reader,
  removed by :func:`tx_vacuum` once older than the retention window
  (age-gated exactly because a LIVE writer may be between write and
  claim). A writer that dies after the claim has fully committed.

Reader resolution — one dataflow, no driver materialization of data::

    rows    = Σ_c  read(delta_c)  ⊕ __v  = c.version   (c ≥ last compact)
    effects = Σ_c  read(effects_c) ⊕ __ev = c.version
    visible = rows ⟕ (max __ev per key)  WHERE __v ≥ coalesce(max_ev, 0)

A merge's own rows carry ``__v`` equal to their effect version, so
they survive their own replacement; every older row of the key is
hidden; a key re-inserted after a delete is visible again (insert
version exceeds the tombstone's).

Scale posture at 100 TB: commit JSONs are driver-side metadata,
O(live commits), collapsed by :func:`tx_compact`; row data stays in
executor-side parquet scans (the union is per-commit scans, never a
collect); the visibility join shuffles on the key — or broadcasts
when AQE sees a small effect table — and prunes to key columns on
the effects scan. Keys are assumed non-null (null never equals null
in the join, so a null-keyed row would be invisible to replacement).
One logical schema and ONE key set per table: every commit must
write the same columns (the reader unions by name, strictly) and
declare the same key columns — schema evolution is out of scope, as
is a composite-key change mid-history.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_LOG = "_txlog"
_PAD = 10


class TxConflictError(RuntimeError):
    """Raised when a commit cannot be claimed within ``max_retries``."""


def _log_dir(path: str) -> str:
    return os.path.join(path, _LOG)


def tx_init(path: str) -> None:
    """Create the table layout (idempotent)."""
    for sub in (_LOG, "delta", "effects"):
        os.makedirs(os.path.join(path, sub), exist_ok=True)


def _committed(path: str) -> list[dict]:
    """All committed versions, ascending. Only fully-linked commit
    files are visible (see module docstring), so no partial-read
    guard is needed beyond the numeric-name filter."""
    out = []
    log = _log_dir(path)
    if not os.path.isdir(log):
        return out
    for name in os.listdir(log):
        stem, ext = os.path.splitext(name)
        if ext != ".json" or not stem.isdigit():
            continue
        try:
            with open(os.path.join(log, name)) as f:
                out.append(json.load(f))
        except FileNotFoundError:
            # a concurrent vacuum dropped a pre-compact commit
            # between our listdir and open — it was below the compact
            # base, so the resolution is unaffected
            continue
    out.sort(key=lambda c: c["version"])
    return out


def _next_version(path: str) -> int:
    commits = _committed(path)
    return (commits[-1]["version"] + 1) if commits else 1


def _claim(path: str, version: int, body: dict) -> bool:
    """Atomically claim ``version``: full content first (temp file,
    flushed + fsynced), then a create-exclusive hard link gives the
    name to exactly one writer."""
    log = _log_dir(path)
    tmp = os.path.join(log, f".tmp-{uuid.uuid4().hex}")
    with open(tmp, "w") as f:
        json.dump({**body, "version": version}, f)
        f.flush()
        os.fsync(f.fileno())
    target = os.path.join(log, f"{version:0{_PAD}d}.json")
    try:
        os.link(tmp, target)
        return True
    except FileExistsError:
        return False
    finally:
        os.unlink(tmp)


def _write_dir(df: DataFrame, path: str, kind: str) -> str:
    rel = f"{kind}/{uuid.uuid4().hex}"
    df.write.mode("error").parquet(os.path.join(path, rel))
    return rel


def tx_history(path: str) -> list[dict]:
    """Commit metadata, ascending by version (driver-side, O(log))."""
    return _committed(path)


def tx_read(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame | None:
    """The resolved table as of ``version`` (default: latest). None
    when no commit is visible — callers distinguish "empty table"
    from "no table yet" exactly as upsert.py's ``table_exists``."""
    commits = _committed(path)
    if version is not None:
        commits = [c for c in commits if c["version"] <= version]
    if not commits:
        return None
    base = 0
    for c in commits:
        if c["action"] == "compact":
            base = c["version"]
    commits = [c for c in commits if c["version"] >= base]

    rows: DataFrame | None = None
    effects: DataFrame | None = None
    keys: list[str] = []
    for c in commits:
        if c.get("delta"):
            d = spark.read.parquet(os.path.join(path, c["delta"]))
            d = d.withColumn("__v", F.lit(c["version"]))
            rows = d if rows is None else rows.unionByName(d)
        if c.get("effects"):
            keys = c["keys"]
            e = spark.read.parquet(os.path.join(path, c["effects"]))
            e = e.select(*keys).withColumn("__ev", F.lit(c["version"]))
            effects = e if effects is None else effects.unionByName(e)
    if rows is None and effects is None:
        return None
    if rows is None:
        return None  # only tombstones — nothing visible
    if effects is None:
        return rows.drop("__v")
    max_ev = effects.groupBy(*keys).agg(F.max("__ev").alias("__ev"))
    return (
        rows.join(max_ev, keys, "left")
        .filter(F.col("__v") >= F.coalesce(F.col("__ev"), F.lit(0)))
        .drop("__v", "__ev")
    )


def tx_append_if_absent(
    spark: SparkSession,
    batch: DataFrame,
    path: str,
    keys: list[str],
    max_retries: int = 10,
) -> dict:
    """Concurrent-safe insert-if-absent: exactly-once-per-key across
    ANY number of writers (the multi-writer form of
    ``upsert.upsert_append``). Returns ``{"version", "rows_written",
    "retries"}`` (version None when every key already existed).

    Each attempt re-resolves the table, left-anti-filters the batch,
    writes a fresh delta, and claims the next version; a lost claim
    means a concurrent commit landed after our snapshot, so the
    absence decision is recomputed from scratch (the only
    snapshot-dependent action in the protocol). Orphan deltas from
    lost attempts are retention-vacuumed."""
    tx_init(path)
    batch = batch.dropDuplicates(keys)
    for attempt in range(max_retries):
        v = _next_version(path)
        snap = tx_read(spark, path)
        delta = (
            batch.join(snap.select(*keys), keys, "left_anti")
            if snap is not None
            else batch
        )
        rel = _write_dir(delta, path, "delta")
        n = spark.read.parquet(os.path.join(path, rel)).count()
        if n == 0:
            return {"version": None, "rows_written": 0, "retries": attempt}
        if _claim(path, v, {
            "action": "append", "delta": rel, "effects": None,
            "keys": keys, "ts": time.time(),
        }):
            return {"version": v, "rows_written": n, "retries": attempt}
        # lost the claim: the written delta may now conflict — leave
        # it unreferenced (vacuumable) and recompute against the new
        # snapshot
    raise TxConflictError(f"append_if_absent: {max_retries} claims lost")


def tx_merge(
    spark: SparkSession,
    batch: DataFrame,
    path: str,
    keys: list[str],
    max_retries: int = 50,
) -> int:
    """MERGE (replace-by-key): every committed row of a batch key is
    hidden, the batch rows become current — the reference's
    ``ON CONFLICT DO UPDATE`` shape. Blind commit: semantics carry
    the writer's version, not its snapshot, so data files are written
    ONCE and only the claim retries under contention."""
    tx_init(path)
    batch = batch.dropDuplicates(keys)
    rel = _write_dir(batch, path, "delta")
    eff = _write_dir(
        spark.read.parquet(os.path.join(path, rel)).select(*keys),
        path,
        "effects",
    )
    for attempt in range(max_retries):
        v = _next_version(path)
        if _claim(path, v, {
            "action": "merge", "delta": rel, "effects": eff,
            "keys": keys, "ts": time.time(),
        }):
            return v
    raise TxConflictError(f"merge: {max_retries} claims lost")


def tx_delete(
    spark: SparkSession,
    keys_df: DataFrame,
    path: str,
    keys: list[str],
    max_retries: int = 50,
) -> int:
    """Delete-by-key tombstone commit (blind, like merge): hides
    every committed row of the given keys; a later insert of the same
    key is visible again."""
    tx_init(path)
    eff = _write_dir(keys_df.select(*keys).distinct(), path, "effects")
    for attempt in range(max_retries):
        v = _next_version(path)
        if _claim(path, v, {
            "action": "delete", "delta": None, "effects": eff,
            "keys": keys, "ts": time.time(),
        }):
            return v
    raise TxConflictError(f"delete: {max_retries} claims lost")


def tx_compact(
    spark: SparkSession, path: str, max_retries: int = 10
) -> int | None:
    """Rewrite the resolved snapshot as ONE delta so readers scan one
    dir instead of the whole commit history. Valid only as the
    immediate successor of the resolved version: any interleaved
    commit fails the claim and forces a fresh resolve (folding a
    concurrent mutation away is the data-loss mode this guards).
    Returns the compact version, or None on an empty table."""
    for attempt in range(max_retries):
        commits = _committed(path)
        if not commits:
            return None
        v = commits[-1]["version"] + 1
        snap = tx_read(spark, path)
        if snap is None:
            return None
        rel = _write_dir(snap, path, "delta")
        if _claim(path, v, {
            "action": "compact", "delta": rel, "effects": None,
            "keys": [], "ts": time.time(),
        }):
            return v
    raise TxConflictError(f"compact: {max_retries} claims lost")


def tx_vacuum(path: str, retain_seconds: float = 3600.0) -> list[str]:
    """Remove delta/effects dirs no commit references — the residue
    of writers that lost a claim or died before one. Age-gated
    (mtime older than ``retain_seconds``) because a LIVE writer may
    be between its data write and its claim; also drops commits
    strictly below the latest compact (their data dirs follow).
    Returns the removed relative paths."""
    import shutil

    commits = _committed(path)
    base = 0
    for c in commits:
        if c["action"] == "compact":
            base = c["version"]
    live = {
        c[k]
        for c in commits
        if c["version"] >= base
        for k in ("delta", "effects")
        if c.get(k)
    }
    removed: list[str] = []
    now = time.time()
    for kind in ("delta", "effects"):
        root = os.path.join(path, kind)
        if not os.path.isdir(root):
            continue
        for name in os.listdir(root):
            rel = f"{kind}/{name}"
            full = os.path.join(root, name)
            if rel in live:
                continue
            if now - os.path.getmtime(full) < retain_seconds:
                continue
            shutil.rmtree(full, ignore_errors=True)
            removed.append(rel)
    for c in commits:
        if c["version"] < base:
            os.unlink(
                os.path.join(_log_dir(path), f"{c['version']:0{_PAD}d}.json")
            )
            removed.append(f"{_LOG}/{c['version']:0{_PAD}d}.json")
    # claim bodies a writer wrote but never linked (died mid-claim):
    # same age gate as data dirs — a live writer is between write and
    # link for milliseconds, not hours
    log = _log_dir(path)
    for name in os.listdir(log):
        if not name.startswith(".tmp-"):
            continue
        full = os.path.join(log, name)
        try:
            if now - os.path.getmtime(full) >= retain_seconds:
                os.unlink(full)
                removed.append(f"{_LOG}/{name}")
        except FileNotFoundError:
            pass
    return removed
