"""Connected components via min-label propagation.

Near-duplicate PAIRS (dedup, similarity) only become actionable as
duplicate CLUSTERS — "keep one document per component". Components
of the similarity graph come from iterative min-label propagation:

    label(v) ← min(label(v), min over neighbors' labels)

repeated until a fixed point; every vertex ends up labeled with the
smallest vertex id reachable from it. Convergence takes O(graph
diameter) rounds — small for dedup graphs (clusters are dense blobs,
not long chains).

Scale posture: each round is one join edges⋈labels + one min-agg —
all shuffles on the vertex id, so rounds reuse the same partitioning.
Lineage is truncated every round (``localCheckpoint``) or the plan
would double each iteration; the driver only ever sees the
changed-label COUNT (a scalar), never the data. The classic
large-star/small-star optimization (fewer rounds on high-diameter
graphs) can replace the inner step without changing the contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Label every vertex of the undirected graph ``edges`` with the
    min vertex id of its component. Vertices are ids appearing in any
    edge. Returns (id, component).

    ``checkpoint_dir`` selects RELIABLE checkpoints (written beneath
    that directory, typically on the cluster's shared filesystem) for
    the per-round lineage truncation: ``localCheckpoint`` blocks live
    on executor local storage, so an executor loss mid-algorithm is
    unrecoverable — fine single-node, wrong on a 1000-executor run.
    Default stays the zero-IO local fast path.
    """
    if checkpoint_dir is not None:
        edges.sparkSession.sparkContext.setCheckpointDir(checkpoint_dir)

        def ckpt(df: DataFrame) -> DataFrame:
            return df.checkpoint(eager=True)
    else:

        def ckpt(df: DataFrame) -> DataFrame:
            return df.localCheckpoint(eager=True)

    und = ckpt(
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionAll(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
    )
    labels = ckpt(
        und.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
    )

    for _ in range(max_iter):
        neighbor_min = (
            und.join(labels, und.b == labels.id)
            .groupBy("a")
            .agg(F.min("component").alias("nbr_min"))
        )
        updated = ckpt(
            labels.join(neighbor_min, labels.id == neighbor_min.a, "left")
            .select(
                "id",
                F.least(
                    F.col("component"), F.coalesce("nbr_min", F.col("component"))
                ).alias("component"),
                (F.coalesce("nbr_min", F.col("component")) < F.col("component")).alias(
                    "__changed"
                ),
            )
        )
        n_changed = updated.filter("__changed").count()
        labels = updated.drop("__changed")
        if n_changed == 0:
            break
    return labels


def keep_best_per_cluster(
    components: DataFrame,
    scores: DataFrame,
    id_col: str = "id",
    score_col: str = "score",
) -> DataFrame:
    """Canonical-document selection: given ``components`` (id,
    component) from :func:`connected_components` and per-id
    ``scores``, keep ONE id per duplicate cluster — the highest
    score, ties to the lowest id. This is the policy step that turns
    duplicate clusters into a training set ("keep the best-quality
    copy", not "keep the arbitrary min-id copy").

    Returns (component, kept_id, best_score, n_members). One grouped
    ``min_by`` over (−score, id) — a single shuffle on the component
    id, no window over data rows.
    """
    joined = components.join(
        scores.withColumnRenamed(id_col, "id") if id_col != "id" else scores,
        "id",
    )
    order = F.struct(
        (-F.col(score_col)).alias("neg"), F.col("id").alias("i")
    )
    return joined.groupBy("component").agg(
        F.min_by(F.col("id"), order).alias("kept_id"),
        F.max(score_col).alias("best_score"),
        F.count("*").alias("n_members"),
    )
