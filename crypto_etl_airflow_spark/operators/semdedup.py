"""Semantic deduplication (SemDeDup-style): cluster the embedding
space with the deterministic IVF coarse quantizer, then search for
cosine-similar pairs ONLY within each cluster and drop every
non-canonical member.

This is the embedding-space counterpart of MinHash-LSH for text: the
cluster assignment plays the role of the LSH bucket, bounding the
pair search to within-cluster candidates instead of all n² pairs
(Abbas et al., "SemDeDup", arXiv:2303.09540 — the public recipe:
k-means cluster, intra-cluster pairwise cosine, keep one
representative).

Scale posture at 100 TB:

- centroids derive from the corpus deterministically (lowest-id
  seeds + one refinement — operators/similarity.py::ivf_centroids)
  and broadcast: assignment is a map-side cross-score, no shuffle of
  the corpus;
- the only shuffle is the self-join on ``centroid_id``; per-cluster
  work is quadratic in CLUSTER size, so ``nlist`` is the scale dial —
  grow it with the corpus (n/√nlist constant) exactly as SemDeDup
  runs 50k clusters for LAION-scale data. A skewed giant cluster is
  the failure mode to watch; the cluster-size histogram is one
  groupBy away and re-seeding with a larger nlist is cheap;
- vectors shuffle once (8-byte key + the array payload); cosine is a
  JVM array expression (zip_with/aggregate), no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.vector import dot as _dot, norm as _norm
from .similarity import _nearest_centroid, ivf_centroids


def assign_clusters(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nlist: int = 16,
    dim: int | None = None,
) -> DataFrame:
    """(id, v double-array, nrm, centroid_id) — nearest refined IVF
    centroid per vector, deterministic (lowest-centroid tiebreak).

    One guarded dimension probe serves BOTH assignment passes (seed
    assignment inside ivf_centroids + the final assignment), so the
    dot products unroll into codegen with a single head(1) job."""
    from .similarity import _probe_dim

    if dim is None:
        dim = _probe_dim(corpus, vec_col)
    cents = ivf_centroids(corpus, id_col, vec_col, nlist, dim=dim)
    v = corpus.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("v")
    )
    return _nearest_centroid(v, cents, id_col, "v", dim=dim).withColumn(
        "nrm", _norm(F.col("v"))
    )


def _pairs_from_assigned(
    assigned: DataFrame, id_col: str, threshold: float,
    dim: int | None = None,
) -> DataFrame:
    """Within-cluster pair search over an already-clustered table —
    shared by :func:`semdedup_pairs` and :func:`semdedup_keep` so the
    keep path never re-runs the clustering. ``dim``: known embedding
    dimension → the pair dot products unroll into codegen
    (functions/vector.py::dot_unrolled, bit-identical fold); this is
    the SAME interpreted-HOF hotspot the r14 ×1000 run hit on the
    centroid cross-score, and the pair volume (Σ_c |cluster_c|²) is
    even larger than the cross-score at small nlist."""
    from ..functions.vector import dot_unrolled

    a = assigned.select(
        "centroid_id", F.col(id_col).alias("id_a"),
        F.col("v").alias("va"), F.col("nrm").alias("na"),
    )
    b = assigned.select(
        "centroid_id", F.col(id_col).alias("id_b"),
        F.col("v").alias("vb"), F.col("nrm").alias("nb"),
    )
    d = (
        dot_unrolled("va", "vb", dim)
        if dim is not None
        else _dot(F.col("va"), F.col("vb"))
    )
    sim = F.round(d / (F.col("na") * F.col("nb")), 6)
    return (
        a.join(b, "centroid_id")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("centroid_id", "id_a", "id_b", sim.alias("cosine_sim"))
        .filter(F.col("cosine_sim") >= threshold)
    )


def semdedup_pairs(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nlist: int = 16,
    threshold: float = 0.4,
) -> DataFrame:
    """Within-cluster cosine-similar pairs:
    ``(centroid_id, id_a, id_b, cosine_sim)`` with id_a < id_b and
    cosine_sim ≥ threshold (rounded to 6 — oracle-stable)."""
    from .similarity import _probe_dim

    dim = _probe_dim(corpus, vec_col)
    assigned = assign_clusters(corpus, id_col, vec_col, nlist, dim=dim)
    return _pairs_from_assigned(assigned, id_col, threshold, dim=dim)


def semdedup_keep(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nlist: int = 16,
    threshold: float = 0.4,
) -> DataFrame:
    """Per-vector verdict: ``(id, centroid_id, is_duplicate)`` —
    a vector is duplicate iff it is the LARGER id of some
    within-cluster pair at ≥ threshold (so each similar pair keeps
    its lowest id; a chain a~b~c keeps only a, matching the
    keep-one-representative SemDeDup policy for transitive groups
    whose members all pairwise collide in one cluster).

    The clustering runs ONCE: the persisted assignment feeds the
    pair search (both self-join sides) and the verdict projection —
    at corpus scale the clustering pass is the dominant cost, so
    re-deriving it per consumer would double the corpus scans."""
    from .dedup import _reuse
    from .similarity import _probe_dim

    dim = _probe_dim(corpus, vec_col)
    assigned = _reuse(
        assign_clusters(corpus, id_col, vec_col, nlist, dim=dim)
    )
    dups = (
        _pairs_from_assigned(assigned, id_col, threshold, dim=dim)
        .select(F.col("id_b").alias(id_col))
        .distinct()
        .withColumn("__dup", F.lit(True))
    )
    return assigned.join(dups, id_col, "left").select(
        id_col,
        "centroid_id",
        F.coalesce("__dup", F.lit(False)).alias("is_duplicate"),
    )


def incremental_semantic_pairs(
    new_vecs: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.4,
) -> DataFrame:
    """SemDeDup in its steady-state form: within-cluster cosine pairs
    INVOLVING a new ingest batch, searched against the PERSISTED IVF
    index (operators/ann_index.py) — batch×store and batch×batch,
    never store×store. Completes the incremental family alongside the
    MinHash / fingerprint / SimHash / shingle stores
    (operators/dedup_store.py): the embedding corpus is signatured
    (assigned + normed) once into the index; an ingest batch is
    assigned with the FROZEN quantizer and compared only within its
    clusters. Run BEFORE ``add_to_ivf_index`` for the batch (ids
    must be disjoint between batch and store); append after.

    Returns ``(centroid_id, id_a, id_b, cosine_sim)`` with
    id_a < id_b and cosine_sim ≥ threshold (rounded to 6) — the
    :func:`semdedup_pairs` contract under the index's frozen
    quantizer, restricted to batch-involving pairs.

    Scale shape: the store side reads PERSISTED assignments and norms
    (no re-scoring, no re-clustering of the corpus — the point of the
    store); the batch's assigned rows are the small side of the one
    ``centroid_id`` join, so AQE broadcasts them against the lists
    scan; candidate volume is Σ_c |store_c|·|batch_c| — linear in the
    store for a fixed batch. The failure mode is the same as batch
    SemDeDup: a skewed giant cluster (grow nlist; rebuild)."""
    from .ann_index import _stored_dim, read_ivf_centroids, read_ivf_lists
    from .dedup import _reuse

    spark = new_vecs.sparkSession
    cents = read_ivf_centroids(spark, path)
    batch = _reuse(
        _nearest_centroid(
            new_vecs.select(
                F.col(id_col), F.col(vec_col).cast("array<double>").alias("v")
            ),
            cents,
            id_col,
            "v",
            dim=_stored_dim(path),
        ).withColumn("nrm", _norm(F.col("v")))
    )
    b_side = batch.select(
        "centroid_id", F.col(id_col).alias("id_b"),
        F.col("v").alias("vb"), F.col("nrm").alias("nb"),
    )
    # store×batch rows appear exactly once (ids disjoint by contract);
    # batch×batch comes from the self-join with the a<b filter — the
    # two-leg union needs no distinct over candidate rows
    sb_leg = read_ivf_lists(spark, path).select(
        "centroid_id", F.col("neighbor_id").alias("id_a"),
        F.col("c_v").alias("va"), F.col("c_nrm").alias("na"),
    ).join(b_side, "centroid_id")
    bb_leg = (
        batch.select(
            "centroid_id", F.col(id_col).alias("id_a"),
            F.col("v").alias("va"), F.col("nrm").alias("na"),
        )
        .join(b_side, "centroid_id")
        .filter(F.col("id_a") < F.col("id_b"))
    )
    from ..functions.vector import dot_unrolled

    _sdim = _stored_dim(path)
    _d = (
        dot_unrolled("va", "vb", _sdim)
        if _sdim is not None
        else _dot(F.col("va"), F.col("vb"))
    )
    sim = F.round(_d / (F.col("na") * F.col("nb")), 6)
    return (
        sb_leg.unionByName(bb_leg)
        .select(
            "centroid_id",
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
            sim.alias("cosine_sim"),
        )
        .filter(F.col("cosine_sim") >= threshold)
    )
