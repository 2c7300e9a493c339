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
    every centroid."""
    head = df.select(F.size(F.col(vec_col)).alias("d")).head(1)
    if not head:
        return None
    d = head[0]["d"]
    return int(d) if d is not None and d > 0 else None


def _nearest_centroid(
    vecs: DataFrame,
    cents: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int | None = None,
) -> DataFrame:
    """Best-cosine centroid id for every row of ``vecs`` (centroid
    table is tiny → broadcast). Ties resolve deterministically to the
    lowest centroid id.

    The argmax runs as TWO all-hash-aggregable passes over the
    cross-score instead of one ``min_by``: pass 1 keeps ``max(sim)``
    per vector; pass 2 recomputes the IDENTICAL sim expression (same
    codegen, same fold order → bit-identical doubles), keeps the rows
    equal to the per-vector max, and resolves ties with
    ``min(centroid_id)``. Both aggregates collapse map-side in the
    hash aggregate, so the |vecs| × |cents| cross-score is never
    materialized OR sorted. The pre-r14 single-pass ``min_by``
    carried a struct buffer, which Spark can only sort-aggregate — at
    the SemDeDup decade point (2M vectors × 16k centroids under the
    nlist ∝ corpus contract) each task sorted its whole slice of the
    32G-row cross-score and filled the node's spill disk; paying the
    dot products twice is minutes of codegen arithmetic instead.
    NaN/±Inf parity with the old ordering: sims are folded through
    ``nanvl(sim, -Inf)``, so a NaN score never wins unless every
    score is NaN — exactly the old (−sim, centroid_id) ordering's
    behavior (Spark sorts NaN above every double). NULL sims (a NULL
    embedding, a NULL element, a length-mismatched vector under the
    interpreted ``zip_with`` dot) additionally coalesce to −Inf, so
    the operator is TOTAL — every input vector gets exactly one
    verdict row (lowest centroid id when all scores are −Inf), never
    a silent drop through the final equality join (ADVICE r14: the
    bare two-pass form vanished all-NULL vectors, which downstream
    SemDeDup would have read as "not a duplicate").

    ``dim``: the embedding dimension when the CALLER knows it (index
    sidecar, build-time params) — passing it makes this operator
    issue ZERO driver actions, which matters because it sits on the
    hot path of every IVF/SQ/PQ/SemDeDup build and add. Left None,
    one guarded :func:`_probe_dim` job samples it (falling back to
    the interpreted dot when the sample is NULL/empty).

    The dot product itself runs UNROLLED for the known embedding
    dimension (functions/vector.py::dot_unrolled — bit-identical fold
    order, but whole-stage-codegen instead of interpreted
    higher-order functions: the cross-score is the one place the
    engine evaluates billions of dots, and the interpreted form was
    measured ~10-20× slower — hours, not minutes, at the ×1000
    decade).
    """
    from ..functions.vector import dot_unrolled

    if dim is None:
        dim = _probe_dim(vecs, vec_col)

    def _sim() -> F.Column:
        d = (
            # name (str) form: the chain builds as ONE parsed SQL
            # string — the Column-loop form cost seconds of driver
            # wall-clock PER CALL SITE in py4j roundtrips (r15)
            dot_unrolled(vec_col, "c_vec", dim)
            if dim is not None
            else _dot(F.col(vec_col), F.col("c_vec"))
        )
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
        .filter(_sim() == F.col("__best_sim"))
        .groupBy(id_col)
        .agg(F.min("centroid_id").alias("centroid_id"))
    )
    return vecs.join(best, id_col).select(
        F.col(id_col),
        *[F.col(c) for c in vecs.columns if c != id_col],
        "centroid_id",
    )


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
    assignment unrolls its dots with zero extra driver actions."""
    if dim is None:
        dim = _probe_dim(corpus, vec_col)
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
    # under nlist ∝ corpus), so MEMORY_AND_DISK persist is free and
    # lineage survives block loss (the _reuse discipline).
    from .dedup import _reuse

    return _reuse(means)


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
