"""SparkSession factory.

One place to set the execution posture for the whole engine:

- **AQE on** (runtime re-planning, partition coalescing, skew-join
  splitting) so join strategy and shuffle sizing adapt to real data
  sizes rather than estimates — essential at 100 TB where static plans
  mis-size.
- **UTC session timezone** — the reference stamps naive local wall
  clock (reference dags/crypto-etl-pipeline-psql.py:56) while its
  README claims UTC; we standardize on UTC and document the deviation.
- **Arrow enabled** for any pandas interchange (Pandas UDFs, toPandas).
- **shuffle.partitions** sized from the env; at cluster scale this is a
  deploy-time config (partitions ≈ 2-3× total cores), never code.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

#: Input bytes per shuffle partition for the size-aware heuristic
#: below. Deliberately SMALL relative to the classic 128 MB-per-
#: partition rule because it counts COMPRESSED parquet input, and the
#: engine's heavy operators (shingle/token explodes) expand that
#: ~20–50× into shuffle rows; and because with AQE partition
#: coalescing ON, ``spark.sql.shuffle.partitions`` is effectively an
#: UPPER bound — over-provisioning costs a cheap runtime coalesce,
#: under-provisioning costs the measured fixed-partition sort term
#: (SCALE.md r9: the 1000× ngram decade ran ×15.1 at 32 partitions
#: vs ×8.5 at 128 — this heuristic picks ~150 there).
PARTITION_INPUT_BYTES = 4 * 1024 * 1024
MAX_SHUFFLE_PARTITIONS = 65536

#: Below this TOTAL input size a workload is scheduling-bound, not
#: data-bound: a multi-stage plan over a few MB spends its wall-clock
#: launching 32-task stages and (with AQE) re-planning after every
#: exchange, not computing. Measured r15 on the 17 MB sf0.1 set: the
#: curation pipeline ran ~35 s with AQE + a 32-partition floor and
#: ~18 s with AQE off + size-proportional partitions — identical
#: values either way (AQE and partition count never change results).
#: At or above this size the classic posture (AQE on, core floor)
#: wins and is essential at 100 TB.
SMALL_INPUT_BYTES = 64 * 1024 * 1024

#: Session conf naming the StorageLevel ``operators/dedup._reuse``
#: persists multi-consumer intermediates at (an engine conf key —
#: Spark carries arbitrary session confs). Part of the size-aware
#: posture because the right level flips with scale (see
#: :func:`tune_execution`).
REUSE_LEVEL_CONF = "spark.crypto_etl.reuse.storageLevel"

#: At or above this input size (or unknown = 0), ``_reuse`` persists
#: MEMORY_ONLY instead of MEMORY_AND_DISK — the SAME boundary as the
#: AQE/partition regimes (``SMALL_INPUT_BYTES``), so the posture has
#: exactly two regimes. The persisted intermediates (exploded
#: shingle/token tables, semdedup assignments) run ~10–50× the
#: compressed input, so past the tiny regime they exceed executor
#: storage memory BY CONSTRUCTION and MEMORY_AND_DISK writes nearly
#: the whole intermediate to executor disk. Measured r16 at ×100
#: (112 MB compressed input, isolated A/B, fresh session per level):
#: the disk tier buys NOTHING — tK_first 191.1 vs 192.5 s, tK_steady
#: 134.0 vs 132.5 s (inside noise) — because re-reading spilled
#: blocks runs at the same speed as recomputing the Arrow-kernel
#: lineage. What the disk tier DOES do is accumulate: the r16
#: full-session decade run (funnel's ×100 persists still spilled
#: when the corpus query ran) measured corpus tK_steady 178.8 s vs
#: tK_first 131.9 s — cache reads SLOWER than the uncached run.
#: MEMORY_ONLY keeps the cache-assist for whatever fits, silently
#: recomputes the rest, and never owns executor disk — the
#: scale-safe default; the disk-backed level stays for tiny inputs
#: where spill-read is cheap and cache-assist dominates
#: repeated-analytics latency.
REUSE_SPILL_INPUT_BYTES = SMALL_INPUT_BYTES

#: Session confs recording the size-aware BASELINE posture
#: :func:`tune_execution` chose, so :func:`apply_query_posture` can
#: restore it after a per-query override ("classic") without the
#: caller having to thread the baseline around. Engine conf keys —
#: Spark carries arbitrary session confs.
POSTURE_BASE_PARTS_CONF = "spark.crypto_etl.posture.base.shufflePartitions"
POSTURE_BASE_AQE_CONF = "spark.crypto_etl.posture.base.adaptive"


def reuse_level_for_bytes(n_bytes: int) -> str:
    """The ``_reuse`` StorageLevel name for an input size — ONE
    definition shared by :func:`tune_execution` and the decade bench
    (a harness that re-derived it could silently measure a different
    posture than production applies)."""
    if 0 < n_bytes < REUSE_SPILL_INPUT_BYTES:
        return "MEMORY_AND_DISK"
    return "MEMORY_ONLY"  # large or unknown: drop, don't spill


def shuffle_partitions_for_bytes(
    n_bytes: int, cpus: int | None = None
) -> int:
    """Size-aware shuffle-partition count: one partition per
    ~``PARTITION_INPUT_BYTES`` of compressed input, floored at the
    core count (never idle a core) and capped to bound scheduler
    overhead. On a real cluster the same formula runs with the
    cluster's total core count — partitions scale with BOTH the data
    and the machine, which is what the fixed-resource scale harness
    exists to emulate.

    EXCEPT for tiny inputs (< ``SMALL_INPUT_BYTES``): there the core
    floor inverts — 32 tasks per shuffle stage costs more scheduler
    latency than the parallelism recovers on a few MB, so partitions
    stay proportional to the data (≥1). Expression-heavy narrow
    stages are independently widened to the core count by
    ``operators/parallel.py::widen_small_input``, so CPU-bound scans
    keep their parallelism; this bound governs only post-shuffle
    stages.

    ``n_bytes == 0`` means UNKNOWN, not tiny (ADVICE r15):
    :func:`input_dir_bytes` returns 0 for remote-FS URIs, nonexistent
    dirs, and anything ``os.walk`` can't traverse — a 100 TB s3://
    input stats as 0. At unknown scale the safe posture is the
    classic one (core floor; callers keep AQE on), never the
    single-partition/AQE-off tiny regime — the same gating
    ``pipeline_curate._stages`` applies to ``reclaim_disk``."""
    cpus = cpus or DEFAULT_SHUFFLE_PARTITIONS
    raw = max(1, n_bytes // PARTITION_INPUT_BYTES)
    if 0 < n_bytes < SMALL_INPUT_BYTES:
        return min(cpus, raw)
    return max(cpus, min(MAX_SHUFFLE_PARTITIONS, raw))


def input_dir_bytes(*paths: str) -> int:
    """Total on-disk bytes of the given table dirs/files."""
    total = 0
    for p in paths:
        if os.path.isfile(p):
            total += os.path.getsize(p)
            continue
        for root, _dirs, files in os.walk(p):
            total += sum(
                os.path.getsize(os.path.join(root, f)) for f in files
            )
    return total


def tune_shuffle_partitions(spark: SparkSession, *paths: str) -> int:
    """Set ``spark.sql.shuffle.partitions`` from the actual input size
    (a runtime-settable session conf — it takes effect for every plan
    compiled afterwards) and return the chosen count. The harnesses
    call this per input directory, so the measured partition-scaling
    fix is default engine behavior, not a manual config footnote."""
    n = shuffle_partitions_for_bytes(input_dir_bytes(*paths))
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    return n


def tune_execution(spark: SparkSession, *paths: str) -> dict:
    """Size-aware execution posture, set from the ACTUAL input size
    (both confs are runtime-settable; they affect every plan compiled
    afterwards and never change query RESULTS — only physical
    strategy):

    - ``spark.sql.shuffle.partitions`` — proportional for tiny
      inputs, core-floored otherwise (:func:`shuffle_partitions_for_bytes`).
    - ``spark.sql.adaptive.enabled`` — OFF below
      ``SMALL_INPUT_BYTES``: AQE materializes every exchange as its
      own query stage and re-plans between them, which is pure
      latency when the statically-chosen plan is already right
      (everything broadcastable, nothing skewed — guaranteed by
      construction on a few-MB input). ON at or above the bound,
      where runtime re-planning (BHJ flips, skew splits, partition
      coalescing) is the thing that keeps 100 TB plans honest.
    - ``REUSE_LEVEL_CONF`` — the StorageLevel for ``_reuse``
      persists: disk-backed below ``REUSE_SPILL_INPUT_BYTES``,
      MEMORY_ONLY at scale (see the constant's rationale).

    An input that stats as 0 bytes is UNKNOWN scale (remote FS /
    unreadable path — see :func:`shuffle_partitions_for_bytes`):
    unknown gets the classic posture (core floor, AQE ON), because
    mis-classifying a 100 TB remote input as tiny would run every
    shuffle single-partition with no AQE to rescue it, while
    mis-classifying a tiny input as big costs only scheduler latency.

    Returns the chosen posture for logging."""
    n_bytes = input_dir_bytes(*paths)
    n = shuffle_partitions_for_bytes(n_bytes)
    adaptive = n_bytes == 0 or n_bytes >= SMALL_INPUT_BYTES
    reuse_level = reuse_level_for_bytes(n_bytes)
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    spark.conf.set("spark.sql.adaptive.enabled", str(adaptive).lower())
    spark.conf.set(REUSE_LEVEL_CONF, reuse_level)
    # record the chosen baseline so apply_query_posture can restore it
    # after a per-query "classic" override
    spark.conf.set(POSTURE_BASE_PARTS_CONF, str(n))
    spark.conf.set(POSTURE_BASE_AQE_CONF, str(adaptive).lower())
    return {
        "input_bytes": n_bytes,
        "shuffle_partitions": n,
        "adaptive": adaptive,
        "reuse_level": reuse_level,
    }


def _session_cores(spark: SparkSession) -> int:
    """Scheduler core count for the core-floor — guarded so a Spark
    Connect session (no ``sparkContext``) degrades to the env-derived
    default instead of failing."""
    try:
        return int(spark.sparkContext.defaultParallelism)
    except Exception:
        return DEFAULT_SHUFFLE_PARTITIONS


def apply_query_posture(spark: SparkSession, posture: str = "auto") -> None:
    """Apply a per-query execution-posture override (the registry's
    ``QuerySpec.posture`` field) ON TOP of the session's size-aware
    baseline — in the ENGINE, so every entry point (driver contract,
    bench, production callers) gets the measured configuration, not
    just the measurement harness (VERDICT r16 item 4: the hybrid-RRF
    "classic" win was wired only into bench.py).

    - ``"auto"``: restore the :func:`tune_execution` baseline (the
      recorded ``POSTURE_BASE_*`` confs). On a session that never ran
      ``tune_execution`` (e.g. the external driver's vanilla session)
      the baseline is whatever the session started with — recorded on
      the first override so a classic query never leaks its posture
      into the next query.
    - ``"classic"``: AQE on + core-floored shuffle partitions even on
      a tiny input — for plans whose runtime SMJ→BHJ flips outweigh
      AQE's re-planning latency (measured r16: hybrid RRF 2.05 s tiny
      vs 1.25 s classic; its BM25 legs carry ~16 static SMJs AQE
      converts at runtime). The floor only ever RAISES the partition
      count: at real scale the baseline is already ≥ the core count
      and AQE is already on, so classic ≡ auto there.

    Physical strategy only — results are identical under either
    posture (AQE and the partition count never change values)."""
    base_p = spark.conf.get(POSTURE_BASE_PARTS_CONF, None)
    base_a = spark.conf.get(POSTURE_BASE_AQE_CONF, None)
    if base_p is None or base_a is None:
        # no tune_execution baseline: snapshot the session's current
        # posture ONCE, before the first override mutates it
        base_p = spark.conf.get("spark.sql.shuffle.partitions")
        base_a = spark.conf.get("spark.sql.adaptive.enabled", "true")
        spark.conf.set(POSTURE_BASE_PARTS_CONF, base_p)
        spark.conf.set(POSTURE_BASE_AQE_CONF, base_a)
    if posture == "classic":
        parts = max(_session_cores(spark), int(base_p))
        spark.conf.set("spark.sql.shuffle.partitions", str(parts))
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    else:
        spark.conf.set("spark.sql.shuffle.partitions", str(base_p))
        spark.conf.set("spark.sql.adaptive.enabled", base_a)


def get_spark(
    app_name: str = "crypto_etl_airflow_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    Local runs default to ``local[$SPARK_GRAFT_CPUS]``; on a real
    cluster the master comes from spark-submit and this factory only
    contributes the SQL posture.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
