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

- **claim** — the commit body is bound create-exclusively to
  ``_txlog/N.json`` through a pluggable :class:`ClaimBackend`. The
  default (:class:`PosixLinkClaim`) writes the content to a temp file
  then hard-links it into place (atomic on POSIX and HDFS);
  object stores implement the same one-method contract over their
  conditional put (S3 ``If-None-Match: *`` et al. — the putIfAbsent
  caveat Delta documents, here an injection point instead of a
  rewrite). The loser sees the claim fail, re-reads, and retries at
  N+1 with jittered backoff. Because content lands before the name,
  a reader can never observe a partial commit.
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
import random
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_LOG = "_txlog"
_PAD = 10


class TxConflictError(RuntimeError):
    """Raised when a commit cannot be claimed within ``max_retries``."""


class ClaimBackend:
    """Pluggable atomicity primitive behind every version claim.

    The protocol needs exactly ONE storage guarantee: ``claim`` binds
    fully-written content to a version-numbered name such that at most
    one concurrent caller per name succeeds (a compare-and-swap on
    existence). Everything else — snapshot resolution, blind commits,
    insert re-resolution, compact-at-snapshot+1 — is backend-agnostic,
    so an object-store deployment implements this one method over its
    conditional put (S3 ``If-None-Match: *``, GCS
    ``ifGenerationMatch=0``, Azure ``If-None-Match: *``) or a
    coordination service, and passes it as ``backend=`` to the tx_*
    functions without touching protocol code.

    Beyond the CAS, the backend also owns the log's READ protocol —
    :meth:`list_log` (version allocation, snapshot resolution) and
    :meth:`read_log_text` (commit bodies) — with local-filesystem
    defaults, so a store whose log does not live on a POSIX path
    (the S3 backend below) serves ``tx_read``/``tx_history``/
    ``tx_append_if_absent`` end-to-end, not just the publish. This is
    the external-log-store shape Delta Lake uses on S3 (the log is
    the coordination layer; data files go wherever the engine's own
    filesystem layer can read).
    """

    def claim(self, log_dir: str, name: str, payload: str) -> bool:
        """Atomically create ``log_dir/name`` with ``payload``; return
        False (without clobbering) when the name already exists."""
        raise NotImplementedError

    def list_log(self, log_dir: str) -> list[str]:
        """Entry names in the log ('N.json' flat or 'N.json.d' dir
        form), [] when the log does not exist yet."""
        try:
            return os.listdir(log_dir)
        except (FileNotFoundError, NotADirectoryError):
            return []

    def read_log_text(self, log_dir: str, rel: str) -> str | None:
        """Text of a commit body (``rel`` is 'N.json' or
        'N.json.d/payload'); None when it vanished between the listing
        and the read (a concurrent vacuum)."""
        try:
            with open(os.path.join(log_dir, rel)) as f:
                return f.read()
        except (FileNotFoundError, NotADirectoryError):
            return None


class PosixLinkClaim(ClaimBackend):
    """Default backend: payload to a temp file (flushed + fsynced),
    then ``os.link`` gives the name to exactly one writer — atomic on
    POSIX filesystems and HDFS. Because content lands before the name,
    a reader can never observe a partial commit."""

    def claim(self, log_dir: str, name: str, payload: str) -> bool:
        tmp = os.path.join(log_dir, f".tmp-{uuid.uuid4().hex}")
        with open(tmp, "w") as f:
            f.write(payload)
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp, os.path.join(log_dir, name))
            return True
        except FileExistsError:
            return False
        finally:
            os.unlink(tmp)


class DirRenameClaim(ClaimBackend):
    """Object-store-shaped backend: the claim is an atomic DIRECTORY
    rename instead of a hard link. The payload is written (flushed +
    fsynced) as the single file inside a staging directory, then
    ``os.rename(staging, log_dir/name + ".d")`` publishes it — rename
    onto an existing non-empty directory fails on POSIX, so at most
    one concurrent writer per name wins, and content lands before the
    name exactly like :class:`PosixLinkClaim`.

    Why it exists: hard links are the one primitive object stores and
    some network filesystems lack. This backend uses only
    write + rename, the portable subset (NFS, FUSE mounts, and the
    commit dance most table formats use on HDFS). For a REAL object
    store the recipe is shipped as :class:`S3ConditionalPutClaim`
    below — one conditional ``PutObject`` + ``If-None-Match: *``
    (GCS: ``ifGenerationMatch=0``, Azure: ``Put Blob`` +
    ``If-None-Match: *``); this class's stage-then-bind shape is the
    same recipe for stores without conditional puts. Readers resolve claims
    through :func:`_commit_entries`, which lists both the flat file
    and the directory form, so a table MIGRATED between backends
    stays readable; concurrent writers must share one backend (the
    existence CAS is per-name, and the forms use different names).
    """

    def claim(self, log_dir: str, name: str, payload: str) -> bool:
        staging = os.path.join(log_dir, f".stage-{uuid.uuid4().hex}")
        os.makedirs(staging)
        with open(os.path.join(staging, "payload"), "w") as f:
            f.write(payload)
            f.flush()
            os.fsync(f.fileno())
        target = os.path.join(log_dir, name + ".d")
        try:
            os.rename(staging, target)
            return True
        except OSError as exc:
            import errno
            import shutil

            shutil.rmtree(staging, ignore_errors=True)
            # ONLY the target-already-exists errnos mean "lost the
            # race" (ENOTEMPTY/EEXIST per POSIX rename(2); ENOTDIR
            # when the winner was a flat-file claim). Anything else —
            # EACCES, EROFS, EXDEV (staging on another device) — is an
            # environment failure that must surface, not burn
            # tx_append_if_absent's retries as phantom contention
            # (ADVICE r15).
            if exc.errno in (errno.ENOTEMPTY, errno.EEXIST, errno.ENOTDIR):
                return False
            raise


class S3ConditionalPutClaim(ClaimBackend):
    """Real object-store backend: the claim is ONE conditional
    ``PutObject`` with ``If-None-Match: *`` — S3 (and any
    S3-compatible store: MinIO, R2, GCS's XML layer) accepts the put
    only when no object exists under the key, returning HTTP 412
    ``PreconditionFailed`` to every losing writer. A single S3 put is
    atomic (content and name bind together), so the
    stage-then-publish dance of :class:`DirRenameClaim` collapses
    into one call; readers can never observe a partial commit.

    ``log_dir`` (a local-path-shaped string in the tx_* protocol) is
    normalized into the object key under ``prefix``, so one backend
    instance serves a whole table tree. The errno discipline mirrors
    :class:`DirRenameClaim`: ONLY 412/PreconditionFailed means "lost
    the race"; auth/permission/endpoint failures surface to the
    caller instead of burning ``tx_append_if_absent`` retries as
    phantom contention.

    boto3 is imported lazily — the engine never requires it unless
    this backend is constructed. Tested against moto's S3
    implementation (`tests/test_txlog_s3.py`: N-writer race, exactly
    one winner, loser content never clobbers)."""

    def __init__(self, bucket: str, prefix: str = "", client=None):
        if client is None:
            import boto3

            client = boto3.client("s3")
        self._client = client
        self._bucket = bucket
        self._prefix = prefix.strip("/")

    def _key(self, log_dir: str, name: str) -> str:
        parts = [p for p in (self._prefix, log_dir.strip("/"), name) if p]
        return "/".join(parts)

    def claim(self, log_dir: str, name: str, payload: str) -> bool:
        from botocore.exceptions import ClientError

        try:
            self._client.put_object(
                Bucket=self._bucket,
                Key=self._key(log_dir, name),
                Body=payload.encode("utf-8"),
                IfNoneMatch="*",
            )
            return True
        except ClientError as exc:
            code = exc.response.get("Error", {}).get("Code", "")
            status = (
                exc.response.get("ResponseMetadata", {}).get(
                    "HTTPStatusCode"
                )
            )
            if code == "PreconditionFailed" or status == 412:
                return False
            raise

    def list_log(self, log_dir: str) -> list[str]:
        """Entry names under the log prefix. S3 has no directories —
        a key is its full path — so the names are the FIRST path
        segment after the prefix (a ``N.json.d/payload`` key written
        by a pre-migration :class:`DirRenameClaim` log lists as
        ``N.json.d``, exactly like ``os.listdir``). Paginated:
        list_objects_v2 caps a page at 1000 keys and a busy log
        outgrows that between compactions."""
        prefix = self._key(log_dir, "")
        if prefix:
            prefix += "/"
        names: list[str] = []
        seen: set[str] = set()
        paginator = self._client.get_paginator("list_objects_v2")
        for page in paginator.paginate(
            Bucket=self._bucket, Prefix=prefix
        ):
            for obj in page.get("Contents", []):
                first = obj["Key"][len(prefix):].split("/", 1)[0]
                if first and first not in seen:
                    seen.add(first)
                    names.append(first)
        return names

    def read_log_text(self, log_dir: str, rel: str) -> str | None:
        from botocore.exceptions import ClientError

        try:
            body = self._client.get_object(
                Bucket=self._bucket, Key=self._key(log_dir, rel)
            )["Body"]
            return body.read().decode("utf-8")
        except ClientError as exc:
            # vanished between listing and read (concurrent vacuum /
            # lifecycle expiry) — same contract as the POSIX default
            if exc.response.get("Error", {}).get("Code", "") in (
                "NoSuchKey",
                "404",
            ):
                return None
            raise


DEFAULT_CLAIM_BACKEND: ClaimBackend = PosixLinkClaim()


def _backoff(attempt: int) -> None:
    """Jittered exponential pause between lost claims so N contending
    writers stop hot-spinning the log listing (capped ~1.3 s)."""
    time.sleep(random.uniform(0.0, 0.02 * min(2**attempt, 64)))


def _log_dir(path: str) -> str:
    return os.path.join(path, _LOG)


def tx_init(path: str) -> None:
    """Create the table layout (idempotent)."""
    for sub in (_LOG, "delta", "effects"):
        os.makedirs(os.path.join(path, sub), exist_ok=True)


def _be(backend: "ClaimBackend | None") -> "ClaimBackend":
    return backend if backend is not None else DEFAULT_CLAIM_BACKEND


def _commit_entries(
    log: str, backend: "ClaimBackend | None" = None
) -> list[tuple[int, str]]:
    """(version, body name relative to the log) for every committed
    name, resolving BOTH claim forms: flat ``N.json``
    (:class:`PosixLinkClaim`) and directory ``N.json.d/payload``
    (:class:`DirRenameClaim`). Listing-only — no payload reads; the
    listing itself goes through the backend so a non-POSIX log
    (:class:`S3ConditionalPutClaim`) resolves identically.

    Mixing forms is a READ capability (e.g. a table migrated between
    backends); concurrent WRITERS must share one backend per table,
    because the existence CAS is per-name and the two forms use
    different names for the same version."""
    out = []
    for name in _be(backend).list_log(log):
        if name.endswith(".json.d"):
            stem = name[: -len(".json.d")]
            if stem.isdigit():
                out.append((int(stem), f"{name}/payload"))
            continue
        stem, ext = os.path.splitext(name)
        if ext == ".json" and stem.isdigit():
            out.append((int(stem), name))
    return out


def _committed(
    path: str, backend: "ClaimBackend | None" = None
) -> list[dict]:
    """All committed versions, ascending. Only fully-linked commit
    files are visible (see module docstring), so no partial-read
    guard is needed beyond the numeric-name filter."""
    out = []
    log = _log_dir(path)
    be = _be(backend)
    for _v, rel in _commit_entries(log, be):
        # None = a concurrent vacuum dropped a pre-compact commit
        # between the listing and the read — it was below the compact
        # base, so the resolution is unaffected
        text = be.read_log_text(log, rel)
        if text is not None:
            out.append(json.loads(text))
    out.sort(key=lambda c: c["version"])
    return out


def _next_version(path: str, backend: "ClaimBackend | None" = None) -> int:
    """Next claimable version from the MAX numeric commit filename —
    a log listing only, never a JSON parse of every commit body
    (retry loops call this per attempt; under contention the parse
    form is O(commits) work per lost claim)."""
    top = 0
    for v, _p in _commit_entries(_log_dir(path), backend):
        if v > top:
            top = v
    return top + 1


def _claim(
    path: str, version: int, body: dict, backend: ClaimBackend | None = None
) -> bool:
    """Atomically claim ``version`` through the claim backend (default
    POSIX create-exclusive hard link)."""
    payload = json.dumps({**body, "version": version})
    return _be(backend).claim(
        _log_dir(path), f"{version:0{_PAD}d}.json", payload
    )


def _write_dir(df: DataFrame, path: str, kind: str) -> str:
    rel = f"{kind}/{uuid.uuid4().hex}"
    df.write.mode("error").parquet(os.path.join(path, rel))
    return rel


def tx_history(
    path: str, backend: ClaimBackend | None = None
) -> list[dict]:
    """Commit metadata, ascending by version (driver-side, O(log))."""
    return _committed(path, backend)


def tx_read(
    spark: SparkSession,
    path: str,
    version: int | None = None,
    backend: ClaimBackend | None = None,
) -> DataFrame | None:
    """The resolved table as of ``version`` (default: latest). None
    when no commit is visible — callers distinguish "empty table"
    from "no table yet" exactly as upsert.py's ``table_exists``.
    ``backend`` resolves the LOG (listing + bodies); the referenced
    delta/effects parquet goes through Spark's own filesystem layer."""
    return _resolve(spark, path, _committed(path, backend), version)


def _resolve(
    spark: SparkSession,
    path: str,
    commits: list[dict],
    version: int | None = None,
) -> DataFrame | None:
    """Resolution from an ALREADY-FETCHED commit list — the shared
    core of :func:`tx_read` and the retry loops, which fetch the list
    once per attempt and derive both the snapshot and the next
    claimable version from it (on the S3 backend a separate
    ``_next_version`` + ``tx_read`` pair would cost a second LIST
    plus O(commits) duplicate GETs per attempt)."""
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
    backend: ClaimBackend | None = None,
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
        commits = _committed(path, backend)
        v = (commits[-1]["version"] if commits else 0) + 1
        snap = _resolve(spark, path, commits)
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
        }, backend):
            return {"version": v, "rows_written": n, "retries": attempt}
        # lost the claim: the written delta may now conflict — leave
        # it unreferenced (vacuumable) and recompute against the new
        # snapshot
        _backoff(attempt)
    raise TxConflictError(f"append_if_absent: {max_retries} claims lost")


def tx_merge(
    spark: SparkSession,
    batch: DataFrame,
    path: str,
    keys: list[str],
    max_retries: int = 50,
    backend: ClaimBackend | None = None,
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
        v = _next_version(path, backend)
        if _claim(path, v, {
            "action": "merge", "delta": rel, "effects": eff,
            "keys": keys, "ts": time.time(),
        }, backend):
            return v
        _backoff(attempt)
    raise TxConflictError(f"merge: {max_retries} claims lost")


def tx_delete(
    spark: SparkSession,
    keys_df: DataFrame,
    path: str,
    keys: list[str],
    max_retries: int = 50,
    backend: ClaimBackend | None = None,
) -> int:
    """Delete-by-key tombstone commit (blind, like merge): hides
    every committed row of the given keys; a later insert of the same
    key is visible again."""
    tx_init(path)
    eff = _write_dir(keys_df.select(*keys).distinct(), path, "effects")
    for attempt in range(max_retries):
        v = _next_version(path, backend)
        if _claim(path, v, {
            "action": "delete", "delta": None, "effects": eff,
            "keys": keys, "ts": time.time(),
        }, backend):
            return v
        _backoff(attempt)
    raise TxConflictError(f"delete: {max_retries} claims lost")


def tx_compact(
    spark: SparkSession, path: str, max_retries: int = 10,
    backend: ClaimBackend | None = None,
) -> int | None:
    """Rewrite the resolved snapshot as ONE delta so readers scan one
    dir instead of the whole commit history. Valid only as the
    immediate successor of the resolved version: any interleaved
    commit fails the claim and forces a fresh resolve (folding a
    concurrent mutation away is the data-loss mode this guards).
    Returns the compact version, or None on a table with no commits.

    A history whose visible row set is EMPTY (tombstone-only: deletes
    were committed but no insert ever was, or every insert's keys were
    later deleted below the last compact) still compacts — as an
    empty commit (``delta=None``) — so a delete-heavy log can always
    be truncated by vacuum instead of growing unboundedly. When the
    base compact is already the only live commit there is nothing to
    fold, so the existing base version is returned unchanged."""
    for attempt in range(max_retries):
        commits = _committed(path, backend)
        if not commits:
            return None
        v = commits[-1]["version"] + 1
        snap = _resolve(spark, path, commits)
        if snap is None:
            base = 0
            for c in commits:
                if c["action"] == "compact":
                    base = c["version"]
            live = [c for c in commits if c["version"] >= base]
            if len(live) == 1 and live[0]["action"] == "compact":
                return base  # already fully compacted (and empty)
            if _claim(path, v, {
                "action": "compact", "delta": None, "effects": None,
                "keys": [], "ts": time.time(),
            }, backend):
                return v
            _backoff(attempt)
            continue
        rel = _write_dir(snap, path, "delta")
        if _claim(path, v, {
            "action": "compact", "delta": rel, "effects": None,
            "keys": [], "ts": time.time(),
        }, backend):
            return v
        _backoff(attempt)
    raise TxConflictError(f"compact: {max_retries} claims lost")


def tx_vacuum(
    path: str,
    retain_seconds: float = 3600.0,
    backend: ClaimBackend | None = None,
) -> list[str]:
    """Remove delta/effects dirs no LIVE commit references. Two
    residue classes, two gates (Delta publishes the same split —
    deletion-timestamp retention for superseded files, age retention
    for orphans):

    - **superseded by a compact** (referenced only by commits below
      the latest compact): removable once the COMPACT COMMIT is older
      than ``retain_seconds`` — ``now - compact.ts``, never the data
      dir's own mtime, which predates the compact by arbitrarily long
      (a fresh compact must not instantly strand a reader that
      resolved its scan just before it, nor a time-travel read pinned
      below the new base). The pre-compact commit JSONs are gated
      identically, so ``tx_read(version=...)`` below the base keeps
      resolving for the full retention window after every compact.
    - **never referenced** (a writer lost its claim or died before
      one): age-gated on the dir's own mtime, because a live writer
      may be between its data write and its claim.

    Returns the removed relative paths. ``backend`` resolves the
    LIVE set from the table's real log — it MUST match the writers'
    backend (an S3-logged table vacuumed without its backend would
    resolve zero commits and classify every committed data dir as an
    aged orphan: silent data loss). As a second line of defense,
    when ZERO commits are visible but delta/effects dirs exist, the
    vacuum refuses (returns ``[]``) — indistinguishable from a
    mis-specified backend; a genuinely never-committed table's
    orphans become reclaimable after its first real commit. The
    removal side stays local-filesystem (data dirs always are; the
    local pre-compact commit JSONs likewise) — an S3-resident log
    retires its pre-compact commit OBJECTS with a bucket
    lifecycle/prefix policy instead (standard object-store practice;
    the retention gate is the same)."""
    import shutil

    commits = _committed(path, backend)
    if not commits:
        for kind in ("delta", "effects"):
            root = os.path.join(path, kind)
            if os.path.isdir(root) and os.listdir(root):
                return []  # data with no visible log: refuse
    base = 0
    compact_ts: float | None = None
    for c in commits:
        if c["action"] == "compact":
            base = c["version"]
            compact_ts = c.get("ts")
    if base and compact_ts is None:
        # pre-ts log format: fall back to the compact FILE's mtime
        # (still the supersession instant, not the data's write time)
        flat = os.path.join(_log_dir(path), f"{base:0{_PAD}d}.json")
        try:
            compact_ts = os.path.getmtime(
                flat if os.path.exists(flat) else flat + ".d"
            )
        except OSError:
            compact_ts = time.time()  # unknowable — treat as fresh
    now = time.time()
    compact_aged = (
        compact_ts is not None and now - compact_ts >= retain_seconds
    )
    live = {
        c[k]
        for c in commits
        if c["version"] >= base
        for k in ("delta", "effects")
        if c.get(k)
    }
    superseded = {
        c[k]
        for c in commits
        if c["version"] < base
        for k in ("delta", "effects")
        if c.get(k)
    }
    removed: list[str] = []
    for kind in ("delta", "effects"):
        root = os.path.join(path, kind)
        if not os.path.isdir(root):
            continue
        for name in os.listdir(root):
            rel = f"{kind}/{name}"
            full = os.path.join(root, name)
            if rel in live:
                continue
            if rel in superseded:
                if not compact_aged:
                    continue
            elif now - os.path.getmtime(full) < retain_seconds:
                continue
            shutil.rmtree(full, ignore_errors=True)
            removed.append(rel)
    if compact_aged:
        for c in commits:
            if c["version"] < base:
                flat = os.path.join(
                    _log_dir(path), f"{c['version']:0{_PAD}d}.json"
                )
                if os.path.exists(flat):
                    os.unlink(flat)
                    removed.append(f"{_LOG}/{c['version']:0{_PAD}d}.json")
                else:  # DirRenameClaim form — report the REAL name
                    shutil.rmtree(flat + ".d", ignore_errors=True)
                    removed.append(
                        f"{_LOG}/{c['version']:0{_PAD}d}.json.d"
                    )
    # claim bodies a writer wrote but never linked (died mid-claim):
    # same age gate as data dirs — a live writer is between write and
    # link for milliseconds, not hours
    log = _log_dir(path)
    for name in os.listdir(log):
        if not (name.startswith(".tmp-") or name.startswith(".stage-")):
            continue
        full = os.path.join(log, name)
        try:
            if now - os.path.getmtime(full) >= retain_seconds:
                if os.path.isdir(full):  # DirRenameClaim staging dir
                    shutil.rmtree(full, ignore_errors=True)
                else:
                    os.unlink(full)
                removed.append(f"{_LOG}/{name}")
        except FileNotFoundError:
            pass
    return removed
