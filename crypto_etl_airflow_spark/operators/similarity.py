"""Similarity search over an embedding column (``array<float>``).

Brute-force cosine top-k as the exact baseline, and a random-
hyperplane-LSH-bucketed variant as the scale path (BASELINE.json
``north_star``; SURVEY.md §7.5; candidate-pruning pattern cf.
/root/repo/PAPERS.md REPOSE ICDE 2021).

The dot product is a pure array expression — ``zip_with`` then
``aggregate`` — evaluated in the JVM with sequential summation
(bit-identical to a sequential C loop over the same doubles, which is
what makes the DuckDB oracle hash-match exactly).

Scale posture: brute force is O(n·m) pairs (n probes × m corpus) —
fine when one side is small (it broadcasts); the LSH variant buckets
both sides so each probe only scores its bucket's candidates,
shuffling on the bucket key instead of building the cross-product.

LSH parameterization is THE scale dial, not a tuning nicety: a random
(dissimilar) pair collides in one table with p = 2^-num_planes, so the
expected candidate fraction of all n² pairs is
``1 - (1 - 2^-planes)^tables`` — planes=4/tables=8 keeps ~40% of all
pairs (a constant-factor reduction only, fine as a high-recall
demonstrator on small corpora), while planes=12/tables=16 keeps ~0.4%
and planes=16/tables=16 ~0.024%. At 100 TB corpus sizes only the high-plane
configurations keep candidate volume tracking true near-dup volume;
``num_tables`` then buys recall back (overall collision for a
similar pair at angle θ is 1-(1-(1-θ/π)^planes)^tables).
"""

from __future__ import annotations

import hashlib
import itertools
import threading
import weakref
from collections import OrderedDict

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..functions.vector import cosine, dot as _dot, norm as _norm  # noqa: F401 — cosine re-exported for callers
from .parallel import widen_small_input as _widen


#: Probe-cardinality bound for :func:`cosine_topk_bruteforce`'s
#: contract broadcast: 500k probes × a few-hundred-dim double vector
#: ≈ a few hundred MB — the top of the comfortable broadcast range.
#: Checked with ``limit(bound+1).count()``, so the guard costs O(bound)
#: regardless of how large the probe set actually is.
BROADCAST_PROBE_LIMIT = 500_000


def capped_probe_count(
    probes: DataFrame, max_broadcast_probes: int | None
) -> int | None:
    """The O(bound) cardinality check behind ``bounded_broadcast``,
    exposed so a query with SEVERAL probe-side hints pays for ONE
    count job and shares the result: returns
    ``min(|probes|, bound+1)`` via ``limit(bound+1).count()`` —
    exact for every threshold ≤ bound — or ``None`` when the guard
    is disabled (``max_broadcast_probes is None``)."""
    if max_broadcast_probes is None:
        return None
    bound = max(1, max_broadcast_probes)
    return probes.limit(bound + 1).count()


def bounded_broadcast(
    side: DataFrame,
    n_probes: int | None,
    rows_per_probe: int = 1,
    max_broadcast_probes: int | None = BROADCAST_PROBE_LIMIT,
) -> DataFrame:
    """Broadcast-hint ``side`` only while the contract bound holds —
    the guard every probe-side contract broadcast shares (bruteforce
    grew it in r9; the IVF flat/SQ8/PQ query paths adopt it in r12).

    ``side`` carries ~|probes| × ``rows_per_probe`` rows (e.g. the
    probe→list fan-out is ``nprobe`` rows per probe), so ``n_probes``
    (from :func:`capped_probe_count`, computed ONCE per query) is
    checked against ``max_broadcast_probes // rows_per_probe``:
    inside the bound the hint pins the broadcast AQE wants to flip
    (the r10 decade lesson); past it the side is returned UNHINTED
    so AQE degrades to a shuffled, memory-safe join instead of a
    driver OOM. ``max_broadcast_probes is None`` (and hence
    ``n_probes is None``) disables the guard — the caller vouches
    the probe batch fits."""
    if max_broadcast_probes is None or n_probes is None:
        return F.broadcast(side)
    bound = max_broadcast_probes // max(1, rows_per_probe)
    if n_probes > bound:
        return side
    return F.broadcast(side)


def cosine_topk_bruteforce(
    probes: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    max_broadcast_probes: int | None = BROADCAST_PROBE_LIMIT,
) -> DataFrame:
    """Exact top-k cosine neighbors for every probe vector.

    Output: (probe_id, neighbor_id, cosine_sim, rank), self-matches
    excluded. The PROBE side broadcasts (the operator's regime is few
    probes × huge corpus — the exact anchor / rerank path) and the
    corpus streams, scanned ONCE in parallel by its own partitions;
    ranking is deterministic: (rounded sim DESC, neighbor_id ASC).

    The pre-r9 shape streamed the probes and left the corpus to AQE's
    broadcast decision; once the corpus outgrew the broadcast
    threshold the plan silently degraded to a CartesianProduct that
    re-read every corpus partition once per probe partition — caught
    by the 1000× scale decade (×33.8 for 10× data) and pinned by
    tests/test_plan_quality.py.

    ``max_broadcast_probes`` bounds the contract broadcast (ADVICE
    r9): a probe set larger than the bound falls back to an unhinted
    cross join — AQE then picks a shuffled plan, slow for this
    operator's regime but memory-safe, instead of a broadcast-size
    failure or driver OOM. ``None`` disables the guard (caller vouches
    the probes fit). Probe sets that large should use the LSH/IVF
    paths or :func:`neardup_pairs_cosine` instead.
    """
    # norms are per-ROW quantities: compute them once before the
    # pair join instead of once per pair (n+m norms, not 2·n·m) —
    # same expression, same doubles, so oracle exactness is unchanged.
    # The corpus is the streamed side: widen it so pair scoring
    # parallelizes even when the corpus arrives as one small file
    corpus = _widen(corpus)
    p = probes.select(
        F.col(id_col).alias("probe_id"),
        F.col(vec_col).alias("p_vec"),
        _norm(F.col(vec_col)).alias("p_norm"),
    )
    if (
        max_broadcast_probes is not None
        and probes.limit(max_broadcast_probes + 1).count()
        > max_broadcast_probes
    ):
        p_side = p  # too many probes to broadcast: let AQE plan it
    else:
        p_side = F.broadcast(p)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        _norm(F.col(vec_col)).alias("c_norm"),
    )
    scored = (
        c.crossJoin(p_side)
        .filter(F.col("probe_id") != F.col("neighbor_id"))
        .select(
            "probe_id",
            "neighbor_id",
            F.round(
                _dot(F.col("p_vec"), F.col("c_vec"))
                / (F.col("p_norm") * F.col("c_norm")),
                6,
            ).alias("cosine_sim"),
        )
    )
    w = W.partitionBy("probe_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def neardup_pairs_cosine(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.45,
) -> DataFrame:
    """All pairs with cosine ≥ threshold (embedding near-dup dedup).
    Brute-force pairs with id_a < id_b; the LSH variant below is the
    scale path."""
    vectors = _widen(vectors)
    a = vectors.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("va"),
        _norm(F.col(vec_col)).alias("na"),
    )
    b = vectors.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vb"),
        _norm(F.col(vec_col)).alias("nb"),
    )
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            (_dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))).alias(
                "__cos_raw"
            ),
        )
        # threshold on the UNROUNDED cosine — the registered oracles
        # filter on the raw expression, so rounding first would keep a
        # pair with true cosine in [threshold-5e-7, threshold) that
        # the oracle excludes. Round only the OUTPUT column.
        .filter(F.col("__cos_raw") >= threshold)
        .select(
            "id_a", "id_b", F.round(F.col("__cos_raw"), 6).alias("cosine_sim")
        )
    )


def hyperplane_components(table_idx: int, plane_idx: int, dim: int) -> list[float]:
    """Deterministic pseudo-random hyperplane as PYTHON floats:
    component j is (md5("rhp-<table>-<plane>-<j>") % 2049 − 1024) /
    1024 ∈ [−1, 1] — a dyadic rational, hence an EXACT double whose
    decimal repr round-trips, so the identical literals can be inlined
    into both the Spark plan and a DuckDB oracle. No RNG state; same
    plane on every executor, run, and engine."""
    comps = []
    for j in range(dim):
        digest = hashlib.md5(f"rhp-{table_idx}-{plane_idx}-{j}".encode()).digest()
        comps.append((int.from_bytes(digest[:6], "big") % 2049 - 1024) / 1024.0)
    return comps


def rhp_bucket_rows(
    v: DataFrame,
    vec_col: str = "vec",
    num_planes: int = 4,
    num_tables: int = 8,
    dim: int = 64,
) -> DataFrame:
    """All tables' LSH buckets per vector — every input column plus
    (t, bucket), one output row per (input row, table), from ONE scan.

    The hyperplanes travel as a broadcast DATA table (one row per
    hash table, holding its planes as ``array<array<double>>``) —
    inlining tables×planes×dim literals into the expression tree
    (a since-removed per-table variant did this) makes analysis/
    codegen the dominant cost long before the data is large. The
    DuckDB oracles re-derive the same planes in SQL. Values are identical:
    the same exact dyadic-rational components, the same sequential
    dot-product fold, ``bucket = Σ (1<<i)·[v·plane_i ≥ 0]``. No
    shuffle: broadcast nested-loop join + per-row array fold.
    """
    spark = v.sparkSession
    rows = [
        (t, [hyperplane_components(t, i, dim) for i in range(num_planes)])
        for t in range(num_tables)
    ]
    planes = spark.createDataFrame(rows, "t INT, pws ARRAY<ARRAY<DOUBLE>>")
    weights = F.array(*[F.lit(1 << i).cast("long") for i in range(num_planes)])
    sign_bits = F.zip_with(
        F.col("pws"),
        weights,
        lambda pw, w: F.when(_dot(F.col(vec_col), pw) >= 0, w)
        .otherwise(F.lit(0).cast("long")),
    )
    return v.crossJoin(F.broadcast(planes)).select(
        *[F.col(c) for c in v.columns],
        F.col("t"),
        F.aggregate(sign_bits, F.lit(0).cast("long"), lambda a, x: a + x).alias(
            "bucket"
        ),
    )


def neardup_pairs_cosine_lsh(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.45,
    num_planes: int = 4,
    num_tables: int = 8,
    dim: int = 64,
) -> DataFrame:
    """Bucketed embedding near-dup pairs — the scale path for
    :func:`neardup_pairs_cosine`: only pairs sharing an LSH bucket in
    at least one table are scored. Same output schema (id_a, id_b,
    cosine_sim ≥ threshold), up to LSH recall.

    Candidate volume is governed by ``num_planes`` (see module
    docstring): a random pair is a candidate with probability
    ~``1-(1-2^-planes)^tables``. The planes=4/tables=8 default keeps
    ~40% of all n² pairs — a recall-heavy demonstrator configuration,
    NOT the 100 TB operating point. For scale use planes 12-16 with
    tables sized for the recall target (the registered
    ``embedding_neardup_pairs_lsh_scaled`` query certifies
    planes=12/tables=16, ~0.4% expected candidate fraction)."""
    vectors = _widen(vectors)
    v = vectors.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("vec"),
        _norm(F.col(vec_col)).alias("nrm"),
    )
    # every table's bucket from ONE scan (broadcast planes table, see
    # rhp_bucket_rows), then ONE self-join on the composite (t,
    # bucket) key replaces num_tables separate bucket joins; the two
    # join inputs are plan-identical, so the shuffle exchange is
    # reused, not recomputed.
    #
    # Vectors ride THROUGH the bucket join and pairs are deduped
    # AFTER the threshold filter: a same-bucket-in-k-tables pair is
    # scored k times (the dot is cheap, JVM-side), but the distinct
    # then runs on the few surviving near-dups instead of the full
    # candidate multiset, and no join-back to fetch vectors is needed
    # — two fewer shuffles of the candidate set. (The shuffle carries
    # each vector num_tables×; for very wide vectors at extreme scale,
    # trade back to candidate-distinct + join-back.) Scores of
    # duplicate candidates are bit-identical, so the post-filter
    # distinct collapses them exactly.
    b = rhp_bucket_rows(
        v, vec_col="vec",
        num_planes=num_planes, num_tables=num_tables, dim=dim,
    )
    lhs = b.select(
        "t", "bucket",
        F.col("vid").alias("id_a"), F.col("vec").alias("va"),
        F.col("nrm").alias("na"),
    )
    rhs = b.select(
        "t", "bucket",
        F.col("vid").alias("id_b"), F.col("vec").alias("vb"),
        F.col("nrm").alias("nb"),
    )
    return (
        lhs.join(rhs, ["t", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            (_dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))).alias(
                "__cos_raw"
            ),
        )
        # unrounded threshold, rounded output — identical predicate to
        # the oracle (see neardup_pairs_cosine)
        .filter(F.col("__cos_raw") >= threshold)
        .select(
            "id_a", "id_b", F.round(F.col("__cos_raw"), 6).alias("cosine_sim")
        )
        .distinct()
    )


def cosine_topk_lsh(
    probes: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    num_planes: int = 4,
    num_tables: int = 8,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: score only candidates that share an LSH
    bucket with the probe in AT LEAST ONE of ``num_tables``
    independent hash tables (multi-table LSH — the standard
    recall/cost dial: per-table collision probability for angle θ is
    (1-θ/π)^planes, overall 1-(1-p)^tables).

    The join shuffles on the (table, bucket) key — ~m/2^planes
    candidates per probe per table, so ``num_planes`` sets candidate
    volume (see module docstring: planes=4 keeps ~40% of the corpus
    per probe across 8 tables; planes=12/tables=16 ~0.4%); candidates
    are deduped before scoring so each pair's cosine is computed once.
    Same output schema as the brute-force variant."""
    # widen both sides: the per-row bucket hash (tables × planes
    # 64-dim dots) is the expensive expression stage here
    probes, corpus = _widen(probes), _widen(corpus)
    p_ids = probes.select(
        F.col(id_col).alias("probe_id"),
        F.col(vec_col).alias("p_vec"),
        _norm(F.col(vec_col)).alias("p_norm"),
    )
    c_ids = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        _norm(F.col(vec_col)).alias("c_norm"),
    )

    # one scan per side computes every table's bucket (broadcast
    # planes table — see rhp_bucket_rows), one join on (t, bucket)
    pb = rhp_bucket_rows(
        p_ids.select("probe_id", F.col("p_vec").alias("vec")),
        num_planes=num_planes, num_tables=num_tables, dim=dim,
    ).select("probe_id", "t", "bucket")
    cb = rhp_bucket_rows(
        c_ids.select("neighbor_id", F.col("c_vec").alias("vec")),
        num_planes=num_planes, num_tables=num_tables, dim=dim,
    ).select("neighbor_id", "t", "bucket")
    cand = pb.join(cb, ["t", "bucket"]).select("probe_id", "neighbor_id")

    scored = (
        cand.distinct()
        .filter(F.col("probe_id") != F.col("neighbor_id"))
        .join(p_ids, "probe_id")
        .join(c_ids, "neighbor_id")
        .select(
            "probe_id",
            "neighbor_id",
            F.round(
                _dot(F.col("p_vec"), F.col("c_vec"))
                / (F.col("p_norm") * F.col("c_norm")),
                6,
            ).alias("cosine_sim"),
        )
    )
    w = W.partitionBy("probe_id").orderBy(F.desc("cosine_sim"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def _probe_dim(df: DataFrame, vec_col: str) -> int | None:
    """Guarded embedding-dimension probe: ONE ``head(1)`` job, and
    ``None`` (→ callers fall back to the interpreted, length-agnostic
    :func:`_dot`) unless the sampled vector has a positive length.
    The guard matters (ADVICE r14): ``F.size(NULL)`` is −1 under the
    legacy ``sizeOfNull``, and an unguarded ``int(-1)`` would unroll a
    ZERO-term dot product, silently scoring every vector 0.0 against
    every centroid.

    Memoized per (session, plan identity, vec_col) with the same key
    machinery as the assignment memo — repeated same-session operator
    calls over one corpus pay the head(1) job once, not per call
    (VERDICT r15 noted the per-call probe; the memo's file-listing
    component keeps a rewritten path from serving a stale answer)."""
    sess = df.sparkSession
    pk = _plan_key(df)
    key = ("probe", pk, vec_col) if pk is not None else None
    if key is not None:
        with _MEMO_LOCK:
            hit = _PROBE_MEMO.get(key)
            if hit is not None and hit[0] is sess:
                return hit[1]
    head = df.select(F.size(F.col(vec_col)).alias("d")).head(1)
    d = head[0]["d"] if head else None
    dim = int(d) if d is not None and d > 0 else None
    if key is not None:
        with _MEMO_LOCK:
            _PROBE_MEMO[key] = (sess, dim)
            while len(_PROBE_MEMO) > _PLAN_MEMO_MAX:
                _PROBE_MEMO.popitem(last=False)
    return dim


# ---------------------------------------------------------------------
# Cross-call reuse for kernel-bearing plans (VERDICT r15 item 2).
#
# Spark's CacheManager matches persisted plans by CANONICAL PLAN, and a
# ``mapInPandas`` kernel can never match across builder calls: each call
# pickles a fresh closure, and PythonUDF equality is function-instance
# equality. r15 measured the consequence — every same-session re-run of
# a semdedup/IVF query re-ran the whole assignment and every persisted
# intermediate DOWNSTREAM of it (steady regime ×3.2→×5.6/decade
# regressions). The fix is to memoize the assignment OUTPUT at the
# Python layer: an identical logical request returns the SAME DataFrame
# object, so the kernel subtree in every later consumer is the same JVM
# function instance and downstream `_reuse` persists canonical-match
# again.
#
# Key soundness: inputs are keyed by their CANONICALIZED analyzed plan
# string (exprIds normalized — the same identity CacheManager uses,
# with the same staleness semantics for externally-mutated files). A
# canonical string that itself CONTAINS a Python-kernel node is
# refused (None key → no memoization): two different closures print
# identically there, so the string under-distinguishes — e.g.
# assignment over the same corpus against nlist=16 vs nlist=32 seed
# centroids yields the same MapInPandas canonical text. Memoized
# OUTPUTS therefore carry a unique `_graft_plan_key` token that
# downstream memo keys use INSTEAD of the canonical string, which is
# what lets ivf_centroids → _nearest_centroid chains (whose cents plan
# contains the seed-assignment kernel) stay memoizable without ever
# trusting a kernel-bearing string.
#
# Entries are per-session (`is`-checked), bounded, and cleared by
# dedup.release_reuse_caches() — so the decade harness's cache-cleared
# "first regime" stays an honest single-pass measurement.
_MEMO_LOCK = threading.Lock()
#: serializes _plan_key's session-global maxToStringFields dance
#: (own lock, not _MEMO_LOCK: non-reentrant, and the render is
#: independent of memo-table access)
_RENDER_LOCK = threading.Lock()
_PLAN_MEMO: OrderedDict = OrderedDict()  # key -> (session, DataFrame)
_PROBE_MEMO: OrderedDict = OrderedDict()  # key -> (session, dim|None)
_PLAN_MEMO_MAX = 64
_MEMO_SEQ = itertools.count()
#: df object -> computed key ("" = refused); weak so the cache never
#: pins a DataFrame past its natural lifetime
_KEY_CACHE: "weakref.WeakKeyDictionary[DataFrame, str]" = (
    weakref.WeakKeyDictionary()
)
_PY_PLAN_NODES = (
    "MapInPandas",
    "MapInArrow",
    "FlatMapGroupsInPandas",
    "FlatMapCoGroupsInPandas",
    "PythonUDF",
    "ArrowEval",
    "BatchEval",
    # in-memory relations print SCHEMA but not DATA in canonical form
    # — two different createDataFrame tables would collide
    "LocalRelation",
    "LogicalRDD",
    "ExistingRDD",
)


def _plan_key(df: DataFrame) -> str | None:
    """Stable identity for a memo-key component, or None (→ the
    caller skips memoization).

    The key is the canonicalized analyzed-plan string (structure,
    filters, literals — exprIds normalized) PLUS a hash of
    ``df.inputFiles()``: the canonical string alone does NOT name the
    scanned location (``Relation [none#0L…] parquet`` — two tables
    with one schema print identically), while the file listing names
    the exact parquet parts. Because Spark writes unique part names,
    a store path the engine REWRITES (index add/delete/compact)
    produces a different listing and the stale entry silently misses
    — the same freshness semantics as CacheManager-with-refresh. The
    caveat that remains is an external writer overwriting a file IN
    PLACE under the same name, which CacheManager misses too.

    Tokens stamped by :func:`_memo_put` short-circuit everything: an
    input that IS a memoized output is identified by its token, never
    by its (kernel-bearing, under-distinguishing) plan string.

    The computed key is cached per DataFrame OBJECT (weakly — the
    parallel.py probe discipline): operators call this on the same
    corpus df several times per build, and each canonical-string +
    file-listing fetch is a py4j roundtrip (the r15 plan-build-latency
    lesson)."""
    token = getattr(df, "_graft_plan_key", None)
    if token is not None:
        return token
    cached = _KEY_CACHE.get(df)
    if cached is not None:
        return cached or None  # "" sentinel = previously refused
    try:
        # tree rendering truncates long field lists at
        # spark.sql.debug.maxToStringFields (default 25): two plans
        # differing only inside a wide projection would both print
        # "... N more fields" and COLLIDE. Raise the cap for the
        # rendering (restored in finally — it only affects string
        # rendering, never execution), and fold the full output
        # schema json in as a second line of defense.
        # the set/render/restore is a session-GLOBAL conf mutation:
        # unlocked, two driver threads could interleave (one restores
        # while the other renders → truncated string cached forever,
        # or the raised cap leaks for the session). _RENDER_LOCK
        # serializes the whole dance — driver-side and cheap.
        conf = df.sparkSession.conf
        _FIELDS_KEY = "spark.sql.debug.maxToStringFields"
        with _RENDER_LOCK:
            old = conf.get(_FIELDS_KEY, None)
            conf.set(_FIELDS_KEY, "100000")
            try:
                s = (
                    df._jdf.queryExecution()
                    .analyzed()
                    .canonicalized()
                    .toString()
                )
            finally:
                if old is None:
                    conf.unset(_FIELDS_KEY)
                else:
                    conf.set(_FIELDS_KEY, old)
        if any(m in s for m in _PY_PLAN_NODES):
            _KEY_CACHE[df] = ""
            return None
        files = df.inputFiles()
    except Exception:
        return None
    if not files:
        _KEY_CACHE[df] = ""
        return None  # no identifiable storage behind the plan
    h = hashlib.sha256("\n".join(sorted(files)).encode()).hexdigest()
    key = f"{h}:{df.schema.json()}:{s}"
    _KEY_CACHE[df] = key
    return key


def _memo_get(key: tuple, session) -> DataFrame | None:
    with _MEMO_LOCK:
        hit = _PLAN_MEMO.get(key)
        if hit is None:
            return None
        sess, df = hit
        if sess is not session:  # stale entry from a replaced session
            del _PLAN_MEMO[key]
            return None
        _PLAN_MEMO.move_to_end(key)
        return df


def _memo_put(key: tuple, session, df: DataFrame) -> DataFrame:
    df._graft_plan_key = f"__graft_memo_{next(_MEMO_SEQ)}"
    with _MEMO_LOCK:
        _PLAN_MEMO[key] = (session, df)
        _PLAN_MEMO.move_to_end(key)
        while len(_PLAN_MEMO) > _PLAN_MEMO_MAX:
            _PLAN_MEMO.popitem(last=False)
    return df


def _clear_plan_memo() -> None:
    with _MEMO_LOCK:
        _PLAN_MEMO.clear()
        _PROBE_MEMO.clear()


from .dedup import register_release_hook as _register_release_hook  # noqa: E402

_register_release_hook(_clear_plan_memo)


def _nearest_centroid_expr(
    vecs: DataFrame,
    cents: DataFrame,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Pure-Column fallback assignment for an UNKNOWN embedding
    dimension (empty/NULL-headed input — :func:`_probe_dim` returned
    None): the two hash-aggregable argmax passes over the interpreted
    ``zip_with`` dot. Semantics are the contract the fast path
    reproduces — NaN/NULL sims fold to −Inf (total: every vector gets
    a verdict row; all-−Inf resolves to the lowest centroid id).

    Pass 2 expresses the max-equality as a PROJECTED conditional,
    never a filter: a Filter over a cross join is pushed into the
    BroadcastNestedLoopJoin as its join CONDITION, and BNLJ evaluates
    join conditions interpreted per (row × centroid) — the r15 ×100
    finding that motivated the Arrow fast path below."""

    def _sim() -> F.Column:
        d = _dot(F.col(vec_col), F.col("c_vec"))
        neg_inf = F.lit(float("-inf"))
        return F.coalesce(F.nanvl(d / F.col("c_norm"), neg_inf), neg_inf)

    narrow = vecs.select(F.col(id_col), F.col(vec_col))
    best_sim = (
        narrow.crossJoin(F.broadcast(cents))
        .select(F.col(id_col), _sim().alias("__sim"))
        .groupBy(id_col)
        .agg(F.max("__sim").alias("__best_sim"))
    )
    best = (
        narrow.join(best_sim, id_col)
        .crossJoin(F.broadcast(cents))
        .select(
            F.col(id_col),
            F.when(
                _sim() == F.col("__best_sim"), F.col("centroid_id")
            ).alias("__cand"),
        )
        .groupBy(id_col)
        .agg(F.min("__cand").alias("centroid_id"))
    )
    return vecs.join(best, id_col).select(
        F.col(id_col),
        *[F.col(c) for c in vecs.columns if c != id_col],
        "centroid_id",
    )


def _nearest_centroid(
    vecs: DataFrame,
    cents: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int | None = None,
) -> DataFrame:
    """Best-cosine centroid id for every row of ``vecs``. Ties
    resolve deterministically to the lowest centroid id; the operator
    is TOTAL (a vector whose every score is NULL/NaN folds to −Inf
    and resolves to the lowest centroid id — ADVICE r14).

    Execution: an Arrow-native ``mapInArrow`` kernel (r17 — the
    mapInPandas form paid a per-row Python packing loop and a
    per-batch pandas copy; the list<double> column now reshapes into
    the (row, dim) matrix as one vectorized gather straight off the
    Arrow buffers, and input buffers pass through unchanged on
    emit). The centroid
    table (nlist ≤ ~16k rows by the nlist ∝ corpus contract, ~8 MB at
    the decade point) is collected once — the moral equivalent of the
    broadcast build it replaces. The semantic reference per
    (row, centroid) is the engine's canonical left-to-right IEEE
    fold::

        acc[r, c] = 0.0
        for i in 1..dim:  acc[r, c] += v[r, i] * c_vec[c, i]
        sim[r, c] = nanvl(acc[r, c] / c_norm[c], -inf)

    computed vectorized over rows, SEQUENTIAL over dimensions — numpy
    elementwise double ops are plain IEEE doubles, so every sim is
    bit-identical to the Column form and to the DuckDB oracle's fold,
    and the argmax/tie decisions cannot diverge.

    On clean data (finite components, finite positive norms) a BLAS
    fast path runs FIRST (r16): a GEMM — a different summation order,
    so never trusted for values — SELECTS argmax candidates under a
    rigorous error bound, and the exact fold above re-scores only
    those candidates to make the decision; the chosen centroid is
    bit-identical to the all-sequential form (see ``assign`` inline
    comments and the tie/NaN stress test). This is the ×1000 decade
    lever: assignment is O(n·nlist·dim) with nlist ∝ corpus — the
    engine's one super-linear term — and the GEMM runs it at
    compute-bound instead of memory-bound speed.

    WHY a Python kernel, when the repo's discipline is JVM-first
    (this is the one measured exception): the r14 answer — unroll the
    dot into a 64-term codegen chain — was re-measured honestly in
    r15 after the ×100 funnel stalled, and the unrolled chain runs at
    ~1-10 µs/dot because the generated method exceeds HotSpot's
    DontCompileHugeMethods bytecode limit and executes as INTERPRETED
    BYTECODE (jstack: the hashAgg consume never JITs; r14's 10-20×
    claim was an artifact of count() pruning the aggregate values —
    the dots never ran). JVM remedies were measured and rejected:
    ``spark.sql.codegen.hugeMethodLimit=8000`` (split fallback) 327 s
    → 40 s per 32M dots, ``-XX:-DontCompileHugeMethods`` → 23 s —
    both still ~1 µs/dot and both session-owner confs the engine
    cannot rely on under a vanilla driver session. The Arrow kernel
    runs the same 32M dots in well under a second of vectorized
    numpy, scales linearly in |vecs| × nlist, and ships the batch's
    vectors once (Arrow columnar, no per-row Python).

    ``dim``: the embedding dimension when the CALLER knows it (index
    sidecar, build-time params); left None, one guarded
    :func:`_probe_dim` job samples it. When even the probe cannot
    name a dimension (empty input), the pure-Column
    :func:`_nearest_centroid_expr` fallback preserves the plan-only
    behavior on empty/degenerate tables.

    Semantics parity notes (pinned by tests): a NULL vector, a
    NULL-element vector (Arrow surfaces NULL doubles as NaN; the
    engine fold turns a NULL term into a NULL → −Inf sim — same
    verdict), and a SHORTER-than-dim vector (excluded outright —
    ANSI ``element_at`` would THROW past the array end in a Column
    form; one malformed vector must not kill a corpus-scale job)
    all resolve to the lowest centroid id; a
    LONGER vector scores on its first ``dim`` components exactly as
    the unrolled chain did; NaN scores lose to any real score
    (nanvl) and ±Inf scores propagate IEEE-identically."""
    if dim is None:
        dim = _probe_dim(vecs, vec_col)
    if dim is None:
        return _nearest_centroid_expr(vecs, cents, id_col, vec_col)

    # cross-call reuse (VERDICT r15 item 2): an identical logical
    # request returns the SAME DataFrame object, restoring canonical-
    # plan cache matching for everything downstream of the kernel
    sess = vecs.sparkSession
    memo_key = None
    kv, kc = _plan_key(vecs), _plan_key(cents)
    if kv is not None and kc is not None:
        memo_key = ("assign", kv, kc, id_col, vec_col, int(dim))
        hit = _memo_get(memo_key, sess)
        if hit is not None:
            return hit

    from pyspark.sql.types import StructField, StructType

    crows = cents.select("centroid_id", "c_vec", "c_norm").collect()
    crows.sort(key=lambda r: r["centroid_id"])
    out_schema = StructType(
        list(vecs.schema.fields)
        + [StructField("centroid_id", cents.schema["centroid_id"].dataType)]
    )
    if not crows:
        # empty quantizer (empty-corpus build): assignment is empty,
        # exactly as the old inner join against an empty best table
        empty = vecs.sparkSession.createDataFrame([], out_schema)
        return (
            _memo_put(memo_key, sess, empty) if memo_key else empty
        )
    import numpy as _np

    # driver-side numpy packing, NOT Python lists: a memoized
    # assignment closure lives as long as the memo entry, and a
    # list-of-lists form pins ~nlist·dim BOXED floats on the driver
    # heap (~30+ MB at the decade point vs ~8 MB packed); the kernel
    # also skips a per-task list→array conversion. A NULL/short
    # centroid vector is a zeroed row flagged dead (scores −inf).
    _nc = len(crows)
    C_arr = _np.zeros((_nc, dim), dtype=_np.float64)
    c_dead_arr = _np.zeros(_nc, dtype=bool)
    norms_arr = _np.empty(_nc, dtype=_np.float64)
    for _j, _r in enumerate(crows):
        _cv = _r["c_vec"]
        if _cv is None or len(_cv) < dim:
            c_dead_arr[_j] = True
        else:
            C_arr[_j] = [
                float(x) if x is not None else float("nan")
                for x in _cv[:dim]
            ]
        _cn = _r["c_norm"]
        norms_arr[_j] = float(_cn) if _cn is not None else float("nan")
    ids_arr = _np.array([_r["centroid_id"] for _r in crows])
    del crows
    # exact Arrow type of the id column, captured by value: the
    # emitted batch must match the DECLARED schema (a long array
    # against an int32 field fails executor-side with getInt errors)
    from pyspark.sql.pandas.types import to_arrow_type

    _id_arrow_type = to_arrow_type(cents.schema["centroid_id"].dataType)
    kernel_dim = dim
    vec_name = vec_col
    # measurement-hygiene toggle (captured BY VALUE here so the
    # closure stays self-contained): SPARK_GRAFT_ASSIGN_BLAS=0 forces
    # the all-sequential path — the A/B knob behind the r16 decade
    # numbers, never a semantics switch (the decision is bit-identical
    # either way)
    import os as _os

    allow_fast = _os.environ.get("SPARK_GRAFT_ASSIGN_BLAS", "1") != "0"
    # r17: the candidate GEMM runs in FLOAT32 when provably safe —
    # the pass is memory-bandwidth-bound (r16 measured ~2×, not the
    # 10× of a compute-bound GEMM), so halving the bytes is the one
    # lever left; measured 21.2 → 12.0 s per ×1000-shaped task
    # (62.5k × 16000 × 64). Candidates still re-score through the
    # exact fp64 sequential fold, so the DECISION stays bit-identical;
    # the fp32 error bound below only widens the candidate sliver
    # (~+0.7% measured). SPARK_GRAFT_ASSIGN_GEMM32=0 forces the fp64
    # GEMM — an A/B knob, never a semantics switch.
    allow_32 = _os.environ.get("SPARK_GRAFT_ASSIGN_GEMM32", "1") != "0"

    # NOTE: ships to Python workers via cloudpickle — self-contained
    # closure over numpy arrays (pickled by value), no module refs
    def assign(batches):
        import numpy as np

        # one BLAS thread per worker: 32 concurrent Python workers ×
        # OpenBLAS's default thread-per-core GEMM would oversubscribe
        # the machine 32×; parallelism comes from Spark tasks here.
        # Runtime clamp via the loaded library handle (env vars are
        # too late on a REUSED worker where numpy is already loaded);
        # best-effort — a failure only costs scheduling noise.
        try:
            import ctypes
            import glob
            import os as _os

            for _p in glob.glob(
                _os.path.join(
                    _os.path.dirname(np.__file__), "..", "numpy.libs",
                    "libopenblas*",
                )
            ):
                _lib = ctypes.CDLL(_p)
                for _fn in (
                    "openblas_set_num_threads64_",
                    "openblas_set_num_threads",
                ):
                    _f = getattr(_lib, _fn, None)
                    if _f is not None:
                        _f(1)
                        break
        except Exception:
            pass

        neg_inf = float("-inf")
        # packed driver-side (see above): dead rows are zeroed and
        # score -inf against everything (engine: NULL term -> NULL
        # sim -> -inf)
        C = C_arr
        c_dead = c_dead_arr
        norms = norms_arr
        ids = ids_arr
        nlist = len(ids)
        # centroid components TRANSPOSED to (dim, nlist): the fold
        # reads one full dimension of every centroid per iteration,
        # and the row-major C[:, i] form gathers nlist cache lines at
        # a 8·dim-byte stride — measured at the ×1000 decade as the
        # difference between L2-speed and DRAM-speed inner loops
        Ct = np.ascontiguousarray(C.T)
        # row tile sized so block+tmp stay ~L2-resident (~1 MB each):
        # the fold updates every (row, centroid) cell dim times, and
        # 32 CONCURRENT workers share the L3, so per-worker tiles
        # must be small (the first 16 MB tiling thrashed shared L3
        # and ran ~10× slower at nlist=16k)
        tile = max(8, (1 << 20) // (8 * nlist))

        def seq_assign(V, rows, choice):
            """The canonical sequential fold over a row subset —
            handles every value class (NaN/Inf/dead) and defines the
            semantics the fast path must reproduce bit-exactly."""
            for lo in range(0, len(rows), tile):
                sub = rows[lo : lo + tile]
                m = len(sub)
                block = np.zeros((m, nlist), dtype=np.float64)
                tmp = np.empty((m, nlist), dtype=np.float64)
                # sequential fold over dimensions: bit-identical to
                # ((0.0 + v1*c1) + v2*c2) + ... per cell
                for i in range(kernel_dim):
                    np.multiply(
                        V[sub, i : i + 1], Ct[i][None, :], out=tmp
                    )
                    np.add(block, tmp, out=block)
                np.divide(block, norms[None, :], out=block)
                block[np.isnan(block)] = neg_inf
                block[:, c_dead] = neg_inf
                # first max along ascending centroid ids == lowest id
                choice[sub] = np.argmax(block, axis=1)

        # BLAS fast path (r16, the ×1000 third-decade lever): the
        # assignment is O(n·nlist·dim) with nlist ∝ corpus — the
        # engine's one super-linear term. A GEMM computes the same
        # score matrix ~30× faster but in a different summation order
        # (blocked/SIMD/FMA), so it is used ONLY to SELECT argmax
        # candidates under a rigorous error bound, and the exact
        # sequential fold re-scores the few candidates per row to
        # make the DECISION — the chosen centroid is bit-identical to
        # seq_assign's. Bound: |gemm − seq| ≤ 2·γ_dim·Σ|vᵢcᵢ| with
        # γ_dim = dim·2⁻⁵³ (standard fp summation error, FMA only
        # tightens it); GAMMA below carries a ~100× safety margin,
        # which costs only a sliver of extra candidates. Fast path
        # requires clean data — finite vector/centroid components,
        # finite positive norms (then no NaN/Inf sim can arise);
        # everything else routes to seq_assign.
        col_regular = (
            ~c_dead
            & np.isfinite(C).all(axis=1)
            & np.isfinite(norms)
            & (norms > 0)
        )
        fast_ok = (
            allow_fast
            and bool((col_regular | c_dead).all())
            and bool(col_regular.any())
        )
        GAMMA = 2.0e-12
        # fp32 candidate-GEMM bound: cast(v) + cast(c) + product +
        # 63-term sum + divide-by-norm each contribute ≤ ~2⁻²⁴
        # relative per term, so |S₃₂ − seq| ≤ ~70·2⁻²⁴·Σ|vᵢcᵢ| ≈
        # 4.2e-6·‖v‖‖c‖ — GAMMA32 carries a ~25× margin. ABS32 covers
        # the subnormal-underflow floor of fp32 products (≤ 64·1.4e-45
        # absolute, ≤ ~9e-29 after the ÷norm with norms ≥ F32_MAG⁻¹);
        # both only ever WIDEN the candidate set the exact fp64 fold
        # re-scores. F32_MAG gates representability: components and
        # norms must sit in [1e-15, 1e15] so no product can overflow
        # fp32 (64·1e30 ≪ 3.4e38) and no norm division can amplify the
        # underflow floor past ABS32; anything outside routes to the
        # fp64 GEMM tile or (non-finite) the sequential fold.
        GAMMA32 = 1.0e-4
        ABS32 = 1.0e-25
        F32_MAG = 1.0e15
        if fast_ok:
            reg_idx = np.flatnonzero(col_regular)
            Creg = np.ascontiguousarray(C[col_regular])
            CregT = np.ascontiguousarray(Creg.T)
            nrm_reg = norms[col_regular]
            # per-col error scale via Cauchy-Schwarz: Σ|vᵢcᵢ| ≤
            # ‖v‖₂·‖c‖₂, so eps = GAMMA·‖v‖·(‖c‖/c_norm) needs only an
            # OUTER PRODUCT of norms — not a second |V|@|C|ᵀ GEMM
            # (measured: the abs-GEMM doubled the fast path's cost)
            cl2 = np.sqrt((Creg * Creg).sum(axis=1))
            ceps = GAMMA * cl2 / nrm_reg
            nreg = len(reg_idx)
            use32 = (
                allow_32
                and float(np.abs(Creg).max(initial=0.0)) <= F32_MAG
                and float(nrm_reg.min(initial=np.inf)) >= 1.0 / F32_MAG
                and float(nrm_reg.max(initial=0.0)) <= F32_MAG
            )
            if use32:
                Creg32T = np.ascontiguousarray(CregT, dtype=np.float32)
                nrm_reg32 = nrm_reg.astype(np.float32)
                ceps32 = GAMMA32 * cl2 / nrm_reg
            # dead cols are -inf and can never beat a finite regular
            # sim, so the argmax is decided among regular cols only;
            # the fp32 tile budget doubles the rows per tile for the
            # same ~32 MB score block
            _bpc = 4 if use32 else 8
            rtile = min(65536, max(16, (32 << 20) // (_bpc * nreg)))

        def fast_assign(V, rows, choice):
            for lo in range(0, len(rows), rtile):
                sub = rows[lo : lo + rtile]
                Vb = V[sub]
                vnorm = np.sqrt((Vb * Vb).sum(axis=1))
                if use32 and float(np.abs(Vb).max(initial=0.0)) <= F32_MAG:
                    # fp32 GEMM: half the memory traffic of the fp64
                    # pass; eps uses the fp32 bound above and is
                    # downcast CONSERVATIVELY (1.001 inflation covers
                    # the downcast rounding) so the compares stay in
                    # fp32 — broadcasting an fp64 eps would silently
                    # upcast the whole score block back to fp64
                    S = Vb.astype(np.float32) @ Creg32T
                    np.divide(S, nrm_reg32[None, :], out=S)
                    eps = (
                        (vnorm[:, None] * ceps32[None, :] + ABS32) * 1.001
                    ).astype(np.float32)
                else:
                    S = Vb @ CregT
                    np.divide(S, nrm_reg[None, :], out=S)
                    eps = None  # fp64 eps built below
                # finite inputs do not guarantee finite INTERMEDIATES:
                # ~1e200-magnitude components overflow the GEMM (or
                # vnorm) to inf, S−eps goes NaN, and the candidate
                # mask comes back EMPTY for the row — reduceat on an
                # empty segment would kill the task, and a silent
                # position-0 default would break the bit-identical-
                # decision contract (seq picks the +inf-scoring
                # column). Route overflowed rows to the exact fold,
                # whose semantics ARE the contract.
                row_ok = np.isfinite(vnorm) & np.isfinite(S).all(axis=1)
                if not row_ok.all():
                    seq_assign(V, sub[~row_ok], choice)
                    if not row_ok.any():
                        continue
                    sub = sub[row_ok]
                    Vb = Vb[row_ok]
                    S = S[row_ok]
                    vnorm = vnorm[row_ok]
                    if eps is not None:
                        eps = eps[row_ok]
                if eps is None:
                    eps = vnorm[:, None] * ceps[None, :] + 1e-300
                m_star = (S - eps).max(axis=1)
                r_idx, c_idx = np.nonzero(S + eps >= m_star[:, None])
                if len(r_idx) > 32 * len(sub):
                    # degenerate near-tie blowup (e.g. zero vectors:
                    # every col ties at 0) — the exact pass would
                    # gather candidate × dim copies; score these rows
                    # sequentially instead
                    seq_assign(V, sub, choice)
                    continue
                # exact sequential fold over the candidates only
                Vc = Vb[r_idx]
                Cc = Creg[c_idx]
                acc = np.zeros(len(r_idx), dtype=np.float64)
                prod = np.empty(len(r_idx), dtype=np.float64)
                for i in range(kernel_dim):
                    np.multiply(Vc[:, i], Cc[:, i], out=prod)
                    np.add(acc, prod, out=acc)
                sim = acc / nrm_reg[c_idx]
                # the sequential fold sums in a DIFFERENT order than
                # the GEMM (strict left-to-right vs blocked/FMA), so
                # a row whose S was finite can still overflow HERE
                # (partial sums that cancelled in the GEMM's order
                # hit ±inf→NaN sequentially). A NaN sim would poison
                # the segmented argmax below (no position matches its
                # segment max → out-of-bounds first index); ±inf
                # would silently break decision parity. Same remedy
                # as row_ok: those rows belong to the exact fold.
                bad = ~np.isfinite(sim)
                if bad.any():
                    badrow = np.zeros(len(sub), dtype=bool)
                    badrow[r_idx[bad]] = True
                    seq_assign(V, sub[badrow], choice)
                    keep = ~badrow[r_idx]
                    if not keep.any():
                        continue
                    r_idx = r_idx[keep]
                    c_idx = c_idx[keep]
                    sim = sim[keep]
                # segmented FIRST-argmax (cols ascend within a row ⇒
                # ties resolve to the lowest centroid id, as argmax)
                seg = np.flatnonzero(
                    np.r_[True, r_idx[1:] != r_idx[:-1]]
                )
                seg_max = np.maximum.reduceat(sim, seg)
                lens = np.diff(np.r_[seg, len(r_idx)])
                pos = np.where(
                    sim == np.repeat(seg_max, lens),
                    np.arange(len(r_idx)),
                    len(r_idx),
                )
                first = np.minimum.reduceat(pos, seg)
                choice[sub[r_idx[seg]]] = reg_idx[c_idx[first]]

        import pyarrow as pa

        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            col = batch.column(batch.schema.get_field_index(vec_name))
            # vectorized extraction straight from the Arrow buffers
            # (r17, guide §4.2): the r16 mapInPandas form paid a
            # PYTHON loop over every row (2M tiny numpy objects per
            # ×1000 task — measured as the dominant term once the
            # GEMM was fast) plus a whole-frame pandas copy on emit.
            # A list<double> column is one contiguous values buffer
            # plus offsets, so the (row, dim) matrix is a single
            # vectorized gather — zero Python per row — and rows
            # shorter than dim / NULL vectors drop out via masks with
            # the exact semantics of the old loop (NULL element →
            # NaN via Arrow → routed to the sequential fold, same
            # verdict as before).
            offs = col.offsets.to_numpy().astype(np.int64)
            lens = np.diff(offs)
            valid = lens >= kernel_dim
            if col.null_count:
                valid &= ~col.is_null().to_numpy(zero_copy_only=False)
            # element nulls surface as NaN (float64 conversion);
            # zero-copy when the values carry no nulls
            flat = col.values.to_numpy(zero_copy_only=False)
            safe = np.where(valid, offs[:-1], 0)
            if len(flat) == 0:
                V = np.zeros((n, kernel_dim), dtype=np.float64)
            else:
                V = flat[
                    np.minimum(
                        safe[:, None] + np.arange(kernel_dim)[None, :],
                        len(flat) - 1,
                    )
                ]
                V[~valid] = 0.0
            # invalid rows default to position 0 = the lowest centroid
            # id (their sims are all -inf), as in the sequential form
            choice = np.zeros(n, dtype=np.int64)
            if fast_ok:
                clean = valid & np.isfinite(V).all(axis=1)
                hard = np.flatnonzero(valid & ~clean)
                fast = np.flatnonzero(clean)
                if len(fast):
                    fast_assign(V, fast, choice)
                if len(hard):
                    seq_assign(V, hard, choice)
            else:
                rows = np.flatnonzero(valid)
                if len(rows):
                    seq_assign(V, rows, choice)
            # passthrough emit: input buffers move unchanged (no
            # pandas frame copy), one appended id column
            yield pa.RecordBatch.from_arrays(
                [batch.column(j) for j in range(batch.num_columns)]
                + [pa.array(ids[choice], type=_id_arrow_type)],
                names=list(batch.schema.names) + ["centroid_id"],
            )

    result = vecs.mapInArrow(assign, schema=out_schema)
    return _memo_put(memo_key, sess, result) if memo_key else result


def ivf_centroids(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nlist: int = 16,
    dim: int | None = None,
) -> DataFrame:
    """Deterministic IVF coarse quantizer: the ``nlist`` lowest-id
    vectors seed the lists; one k-means-style refinement (assign →
    per-list component mean) produces the final centroids.

    Returns (centroid_id, c_vec, c_norm). Fully deterministic — no
    RNG, stable across runs/engines. ``dim``: see
    :func:`_nearest_centroid` — pass it when known so the seed
    assignment runs with zero extra driver actions.

    Memoized per (corpus plan, params, session): the result plan
    contains the seed-assignment KERNEL, whose canonical form two
    builder calls can never share — same-object reuse is what keeps
    the persisted nlist-row table (and every downstream consumer's
    cached blocks) matchable across calls in one session."""
    if dim is None:
        dim = _probe_dim(corpus, vec_col)
    sess = corpus.sparkSession
    memo_key = None
    kc = _plan_key(corpus)
    if kc is not None:
        memo_key = (
            "ivfc", kc, id_col, vec_col, int(nlist),
            -1 if dim is None else int(dim),
        )
        hit = _memo_get(memo_key, sess)
        if hit is not None:
            return hit
    seeds = (
        corpus.orderBy(F.asc(id_col))
        .limit(nlist)
        .select(
            F.col(id_col).alias("centroid_id"),
            F.col(vec_col).cast("array<double>").alias("c_vec"),
        )
        .withColumn("c_norm", _norm(F.col("c_vec")))
    )
    assigned = _nearest_centroid(
        corpus.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("v")),
        seeds,
        id_col,
        "v",
        dim=dim,
    )
    # refine: element-wise mean per list (partial sums shuffle, not
    # vectors), rounded to 6 decimals so the refined centroids are
    # identical doubles in any engine that re-derives them (summation
    # order varies across engines; the round absorbs the last-ulp
    # difference exactly as the green centroids-by-label query does)
    comp = assigned.select("centroid_id", F.posexplode("v").alias("pos", "x"))
    means = (
        comp.groupBy("centroid_id", "pos")
        .agg(F.round(F.avg("x"), 6).alias("m"))
        .groupBy("centroid_id")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
        .select(
            "centroid_id",
            F.transform("pm", lambda s: s.getField("m")).alias("c_vec"),
        )
        .withColumn("c_norm", _norm(F.col("c_vec")))
    )
    # persist the nlist-row result: every consumer BROADCASTS the
    # centroids, and _nearest_centroid broadcasts them twice (both
    # hash-agg passes) — unpersisted, each broadcast re-evaluates this
    # whole subplan (seed assignment + refinement = several corpus
    # scans), which r15 measured as ~half of SemDeDup's wall-clock.
    # The table is nlist × dim doubles (~8 MB at the decade point
    # under nlist ∝ corpus), so the persist is free at EITHER posture
    # level (always fits memory) and lineage survives block loss (the
    # _reuse discipline).
    from .dedup import _reuse

    out = _reuse(means)
    return _memo_put(memo_key, sess, out) if memo_key else out


def cosine_topk_ivf(
    probes: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nlist: int = 16,
    nprobe: int = 4,
) -> DataFrame:
    """IVF-flat approximate top-k: corpus vectors live in ``nlist``
    inverted lists (nearest-centroid assignment); each probe scores
    only the vectors of its ``nprobe`` nearest lists — per-probe work
    drops to ~nprobe/nlist of the corpus. The recall/cost dial is
    nprobe (vs num_tables/planes for the LSH variant).

    Same output schema as the brute-force baseline."""
    corpus = _widen(corpus)
    dim = _probe_dim(corpus, vec_col)
    cents = ivf_centroids(corpus, id_col, vec_col, nlist, dim=dim)

    c_lists = _nearest_centroid(
        corpus.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).cast("array<double>").alias("c_v"),
        ),
        cents,
        "neighbor_id",
        "c_v",
        dim=dim,
    ).withColumn("c_nrm", _norm(F.col("c_v")))

    p = probes.select(
        F.col(id_col).alias("probe_id"),
        F.col(vec_col).cast("array<double>").alias("p_v"),
    ).withColumn("p_nrm", _norm(F.col("p_v")))
    p_scored = p.crossJoin(F.broadcast(cents)).withColumn(
        "__sim", _dot(F.col("p_v"), F.col("c_vec")) / F.col("c_norm")
    )
    wp = W.partitionBy("probe_id").orderBy(F.desc("__sim"), F.asc("centroid_id"))
    p_lists = (
        p_scored.withColumn("__rn", F.row_number().over(wp))
        .filter(F.col("__rn") <= nprobe)
        .select("probe_id", "p_v", "p_nrm", "centroid_id")
    )

    scored = (
        p_lists.join(c_lists, "centroid_id")
        .filter(F.col("probe_id") != F.col("neighbor_id"))
        # a vector can reach a probe through one list only (hard
        # assignment), so no candidate dedup is needed
        .select(
            "probe_id",
            "neighbor_id",
            F.round(
                _dot(F.col("p_v"), F.col("c_v")) / (F.col("p_nrm") * F.col("c_nrm")),
                6,
            ).alias("cosine_sim"),
        )
    )
    w = W.partitionBy("probe_id").orderBy(F.desc("cosine_sim"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )
