"""Declared streaming surface (SURVEY.md §2.7, §7.3).

The window/stateful queries here EXECUTE as Structured Streaming
(file source → availableNow → memory sink) and are still
oracle-checked: drained-in-full streams produce the same answer as
the batch aggregation, so DuckDB SQL over the at-rest table is an
exact oracle. Session windows additionally register in batch form —
``session_window`` is the same code path either way.

Oracle notes:
- tumbling window start  ≡ DuckDB ``time_bucket(width, ts)``;
- sliding windows (width 10 m / slide 5 m): each event belongs to
  exactly width/slide = 2 windows — the bucket it starts in and the
  one 5 m earlier — expressed as a UNION ALL of two shifted buckets;
- session windows ≡ classic gaps-and-islands (lag + cumulative sum),
  session end = last event + gap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
# the streaming incremental dedup certifies against the SAME oracle
# family as the batch incremental query (no import cycle: extensions
# does not import this module)
from .extensions import (
    _ivfpq_oracle,
    _FP_STORE_SQL,
    _incremental_minhash_oracle,
    _ivf_oracle,
)
from ..streaming.ingest import ingest_events_stream

# Process-lifetime drained-stream cache (VERDICT r14 item 8 → r15):
# every streaming-ingest query here drains an availableNow stream to a
# DETERMINISTIC at-rest state (sink parquet / persisted index), so the
# drain is a fixed point — it runs once per (query, sf_dir) through
# extensions._cached_store and the registered query returns a LIVE
# plan over the drained state instead of collecting inside a
# TemporaryDirectory (whose plan was an opaque Scan ExistingRDD that
# neither bench.py nor plan_audit could see through). The streaming
# execution itself is unchanged — file source, maxFilesPerTrigger=1,
# foreachBatch, availableNow — it just happens inside the cached
# build.
from .extensions import _cached_store


def _write_waves(df: DataFrame, root: str, key_col: str, n: int = 3) -> str:
    """Split ``df`` into ``n`` arrival waves by ``key_col % n`` and
    lay them out as single-file parquet waves under ``root/src`` (the
    file-source ingest fixture every streaming query here shares)."""
    import glob as globmod
    import os
    import shutil

    src = os.path.join(root, "src")
    os.makedirs(src)
    for k in range(n):
        staging = os.path.join(root, f"stage{k}")
        df.filter(F.col(key_col) % n == k).coalesce(1).write.parquet(staging)
        part = globmod.glob(f"{staging}/part-*.parquet")[0]
        shutil.copy(part, os.path.join(src, f"wave{k}.parquet"))
        shutil.rmtree(staging)
    return src


def _drain(spark: SparkSession, schema, src: str, ckpt: str, on_batch) -> None:
    """Run the shared availableNow file-source drain to completion."""
    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("latestFirst", "false")
        .parquet(src)
        .writeStream.foreachBatch(on_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

from ..streaming.runner import run_append_to_memory, run_complete_to_memory
from ..streaming.sources import stream_events
from ..streaming.stateful import user_running_stats
from ..streaming.windows import session_stats, sliding_avg, tumbling_counts
from .registry import register


@register(
    "streaming_tumbling_counts",
    oracle="""
    SELECT time_bucket(INTERVAL '10 minutes', ts) AS window_start,
           event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 6) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    tags=("streaming", "window", "timeseries"),
)
def streaming_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-minute tumbling windows per event type — executed as a
    real streaming query (file source, availableNow, complete-mode
    memory sink)."""
    return run_complete_to_memory(tumbling_counts(stream_events(spark, sf_dir)))


@register(
    "streaming_sliding_avg",
    oracle="""
    WITH e AS (
        SELECT time_bucket(INTERVAL '5 minutes', ts) AS b, value FROM events
    ),
    w AS (
        SELECT b AS window_start, value FROM e
        UNION ALL
        SELECT b - INTERVAL '5 minutes' AS window_start, value FROM e
    )
    SELECT window_start,
           CAST(count(*) AS BIGINT) AS n_events,
           round(avg(value), 6) AS avg_value
    FROM w GROUP BY window_start
    """,
    tags=("streaming", "window", "timeseries"),
)
def streaming_sliding_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-minute windows sliding every 5 — overlapping event rate and
    mean value, executed as a streaming query."""
    return run_complete_to_memory(sliding_avg(stream_events(spark, sf_dir)))


_SESSION_ORACLE = """
    WITH o AS (
        SELECT user_id, ts, value,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w > INTERVAL '5 minutes'
                    THEN 1 ELSE 0 END AS new_s
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    s AS (
        SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                   ROWS UNBOUNDED PRECEDING) AS sid
        FROM o
    )
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL '5 minutes' AS session_end,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 6) AS total_value
    FROM s GROUP BY user_id, sid
"""


@register(
    "session_windows_per_user",
    oracle=_SESSION_ORACLE,
    tags=("streaming", "window", "session", "timeseries"),
)
def session_windows_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user activity sessions (5-minute inactivity gap) via
    ``session_window`` — batch execution of the streaming-native
    operator; the streaming execution is tests/test_streaming.py."""
    return session_stats(load_table(spark, sf_dir, "events"))


@register(
    "streaming_stateful_user_stats",
    oracle="""
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 6) AS total_value,
           min(ts) AS first_ts,
           max(ts) AS last_ts
    FROM events GROUP BY user_id
    """,
    tags=("streaming", "stateful"),
)
def streaming_stateful_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative per-user stats via ``applyInPandasWithState`` —
    real streaming execution; the fixture is one file → one
    micro-batch, so the single emission per user equals the batch
    aggregate."""
    out = run_append_to_memory(user_running_stats(stream_events(spark, sf_dir)))
    return out.withColumn("total_value", F.round("total_value", 6))


@register(
    "streaming_ingest_idempotent",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(DISTINCT event_id) AS BIGINT) AS n_keys
    FROM events
    """,
    tags=("streaming", "ingest", "parity"),
)
def streaming_ingest_idempotent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drain events into a parquet warehouse through the
    foreachBatch+upsert sink TWICE (fresh checkpoint each run, so the
    second run re-reads everything); the key-based writer must keep
    the table exactly one-copy-per-key — the streaming form of the
    reference's ON CONFLICT DO NOTHING contract."""
    import os

    def _build(root: str) -> None:
        os.makedirs(root)
        for run in ("run1", "run2"):
            ingest_events_stream(
                spark, sf_dir, os.path.join(root, "warehouse"),
                checkpoint_dir=os.path.join(root, f"ckpt_{run}"),
            )

    root = _cached_store("stream_ingest", sf_dir, _build)
    return spark.read.parquet(os.path.join(root, "warehouse")).agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("event_id").alias("n_keys"),
    )


@register(
    "streaming_dedup_exact",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 6) AS total_value
    FROM events GROUP BY 1
    """,
    tags=("streaming", "dedup", "stateful"),
)
def streaming_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup: the event stream is polluted with a
    duplicate copy of every 5th event (same event_id — an at-least-
    once source replaying records), then deduplicated with
    ``dropDuplicatesWithinWatermark`` on the key — the state-BOUNDED
    streaming dedup (plain ``dropDuplicates`` retains every key
    forever; the within-watermark form evicts state once the key's
    event time passes the watermark, which is what survives an
    unbounded 100 TB stream). Executed as a real streaming query;
    the drained, deduplicated rows then batch-aggregate per type.
    A fully drained stream must equal the clean batch table — the
    duplicates must vanish exactly."""
    stream = stream_events(spark, sf_dir)
    dupes = stream.filter(F.col("event_id") % 5 == 0)
    polluted = stream.unionByName(dupes)
    # the fixture's ts is TimestampNTZ; watermarks require an
    # instant-typed column, so cast transiently (the column is only
    # the state-eviction clock here — it is not in the output, and
    # the duplicate copies carry identical values either way)
    deduped = (
        polluted.withColumn("__wm_ts", F.col("ts").cast("timestamp"))
        .withWatermark("__wm_ts", "1 hour")
        .dropDuplicatesWithinWatermark(["event_id"])
    )
    out = run_append_to_memory(
        deduped.select("event_id", "event_type", "value")
    )
    return out.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 6).alias("total_value"),
    )


@register(
    "streaming_enrich_segment",
    oracle="""
    SELECT c.c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(e.value), 6) AS total_value
    FROM events e JOIN customer c ON c.c_custkey = e.user_id
    GROUP BY 1
    """,
    tags=("streaming", "join", "enrichment"),
)
def streaming_enrich_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-STATIC enrichment: the event stream joins the static
    customer dimension — broadcast, no streaming state, the standard
    dimension-lookup pattern — then aggregates per market segment.
    Executed as a real streaming query (file source, availableNow,
    complete-mode memory sink); a fully drained stream equals the
    batch join, which is the oracle."""
    dim = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    stream = stream_events(spark, sf_dir)
    joined = stream.join(F.broadcast(dim), stream.user_id == dim.c_custkey)
    agg = joined.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 6).alias("total_value"),
    )
    return run_complete_to_memory(agg)


@register(
    "streaming_dedup_incremental",
    # the streaming union over ALL arrival waves covers every pair
    # exactly once (a pair is discovered when its LATER member's
    # micro-batch runs against the store of earlier docs), so the
    # oracle is the incremental-store oracle with the batch
    # restriction dissolved (batch_mod=1: every doc is some batch's
    # member) — the final pair set is arrival-order-INVARIANT.
    oracle=_incremental_minhash_oracle(batch_mod=1),
    tags=("streaming", "dedup", "approx"),
)
def streaming_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming near-dup dedup against a persisted MinHash signature
    store — the 100 TB steady-state INGEST shape run as a real
    Structured Streaming query: the corpus arrives in three
    micro-batches (file source, maxFilesPerTrigger=1, availableNow);
    each batch signatures ONLY itself inside ``foreachBatch``, joins
    its band keys against the store of everything that arrived
    before, scores candidates by signature agreement (threshold 0.5 =
    ≥16/32 permutations agree), appends its pairs to the sink, and
    idempotently registers its own signatures in the store. No batch
    ever re-shingles earlier data; store×store pairs are never
    generated. The drained sink equals the full-corpus banded
    agreement pairs — which is what the oracle recomputes."""
    import os

    from ..operators import dedup_store
    from ..operators.dedup import minhash_signatures

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def _build(root: str) -> None:
        os.makedirs(root)
        src = _write_waves(docs, root, "doc_id")
        store_path = os.path.join(root, "sig_store")
        sink_path = os.path.join(root, "pairs")

        def on_batch(batch_df: DataFrame, _batch_id: int) -> None:
            s = batch_df.sparkSession
            if os.path.exists(store_path):
                store = dedup_store.read_minhash_store(s, store_path)
            else:  # first wave: empty store with the signature schema
                store = minhash_signatures(
                    batch_df.limit(0), "doc_id", "text", portable=True
                )
            pairs = dedup_store.incremental_minhash_pairs(
                batch_df, store, threshold=0.5, portable=True,
                verify="estimate",
            )
            pairs.write.mode("append").parquet(sink_path)
            dedup_store.write_minhash_store(
                batch_df, store_path, portable=True
            )

        _drain(spark, docs.schema, src, os.path.join(root, "ckpt"), on_batch)

    root = _cached_store("stream_neardup", sf_dir, _build)
    return spark.read.parquet(os.path.join(root, "pairs")).select(
        "id_a", "id_b", "score"
    )


@register(
    "streaming_dedup_incremental_fingerprint",
    # every pair is discovered exactly once — when its LATER member's
    # micro-batch runs against the store of earlier docs (same-wave
    # pairs via the batch×batch leg) — so the drained sink equals the
    # FULL exact-duplicate pair set over the augmented corpus: the
    # batch restriction of dedup_incremental_fingerprint's oracle
    # dissolved, arrival-order-INVARIANT.
    oracle=f"""
    WITH {_FP_STORE_SQL}
    SELECT DISTINCT least(l.doc_id, r.doc_id) AS id_a,
           greatest(l.doc_id, r.doc_id) AS id_b, l.fingerprint
    FROM allfp l JOIN allfp r
      ON l.fingerprint = r.fingerprint AND l.doc_id < r.doc_id
    """,
    tags=("streaming", "dedup", "incremental"),
)
def streaming_dedup_incremental_fingerprint(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Streaming EXACT dedup against a persisted fingerprint store —
    the steady-state exact-dedup ingest shape as a real Structured
    Streaming query (file source, maxFilesPerTrigger=1, availableNow):
    each micro-batch fingerprints ONLY itself inside ``foreachBatch``,
    joins against the store of everything that arrived before (plus
    its own batch×batch leg), appends matches to the sink, and
    idempotently registers its own fingerprints. The corpus is the
    same duplicate-planted augmentation as
    ``dedup_incremental_fingerprint`` (verbatim +10000/+20000 copies),
    split into 3 arrival waves by doc_id % 3 — so copies land in
    DIFFERENT waves and the cross-wave store join is exercised."""
    import os

    from ..functions.text import fingerprint
    from ..operators import dedup_store

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    did = F.col("doc_id")
    aug = docs.unionByName(
        docs.filter(did % 5 == 0).select((did + 10000).alias("doc_id"), "text")
    ).unionByName(
        docs.filter(did % 25 == 0).select((did + 20000).alias("doc_id"), "text")
    )

    def _build(root: str) -> None:
        os.makedirs(root)
        src = _write_waves(aug, root, "doc_id")
        store_path = os.path.join(root, "fp_store")
        sink_path = os.path.join(root, "pairs")

        def on_batch(batch_df: DataFrame, _batch_id: int) -> None:
            s = batch_df.sparkSession
            if os.path.exists(store_path):
                store = dedup_store.read_fingerprint_store(s, store_path)
            else:  # first wave: empty store with the fingerprint schema
                store = batch_df.limit(0).select(
                    "doc_id", fingerprint(F.col("text")).alias("fingerprint")
                )
            matches = dedup_store.incremental_fingerprint_matches(
                batch_df, store
            )
            matches.write.mode("append").parquet(sink_path)
            dedup_store.write_fingerprint_store(batch_df, store_path)

        _drain(spark, aug.schema, src, os.path.join(root, "ckpt"), on_batch)

    root = _cached_store("stream_fp", sf_dir, _build)
    return spark.read.parquet(os.path.join(root, "pairs")).select(
        "id_a", "id_b", "fingerprint"
    )


@register(
    "streaming_ann_index_ingest",
    # the FIRST arrival wave trains the quantizer (build), later waves
    # are added frozen — so the drained index equals a batch
    # build-on-wave0 + add-the-rest, which is what the oracle
    # recomputes (training restricted to vec_id % 3 = 0, assignment
    # over everything)
    oracle=_ivf_oracle(train_where="vec_id % 3 = 0"),
    tags=("streaming", "similarity", "incremental", "approx"),
)
def streaming_ann_index_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming ANN-index ingest (operators/ann_index.py) as a real
    Structured Streaming query: embeddings arrive in three
    micro-batches (file source, maxFilesPerTrigger=1, availableNow);
    inside ``foreachBatch`` the FIRST wave builds the index (trains
    the deterministic quantizer), every later wave is ADDED with the
    frozen quantizer — the steady-state vector-ingest shape. After the
    stream drains, probes (vec_id < 50) query the persisted index with
    partition-pruned list reads; the result must equal the batch
    build+add pipeline, which the oracle recomputes in SQL."""
    import os

    from ..operators import ann_index

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )

    def _build(root: str) -> None:
        os.makedirs(root)
        src = _write_waves(emb, root, "vec_id")
        index_path = os.path.join(root, "index")

        def on_batch(batch_df: DataFrame, _batch_id: int) -> None:
            if os.path.isdir(index_path):
                ann_index.add_to_ivf_index(batch_df, index_path)
            else:  # first wave trains the quantizer
                ann_index.build_ivf_index(batch_df, index_path, nlist=16)

        _drain(spark, emb.schema, src, os.path.join(root, "ckpt"), on_batch)

    root = _cached_store("stream_ann", sf_dir, _build)
    probes = emb.filter(F.col("vec_id") < 50)
    return ann_index.query_ivf_index(
        probes, os.path.join(root, "index"), k=5, nprobe=4
    )


@register(
    "streaming_ivfpq_index_ingest",
    # wave 0 trains coarse quantizer AND codebooks (build); later
    # waves are encoded and added frozen — the drained index equals a
    # batch build-on-wave0 + add-the-rest, which the oracle recomputes
    # (training restricted to vec_id % 3 = 0, encoding over all)
    oracle=_ivfpq_oracle(train_where="vec_id % 3 = 0"),
    tags=("streaming", "similarity", "incremental", "approx"),
)
def streaming_ivfpq_index_ingest(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Streaming COMPRESSED-index ingest (operators/pq.py) as a real
    Structured Streaming query — the PQ twin of
    ``streaming_ann_index_ingest``: embeddings arrive in three
    micro-batches; the first wave builds the IVF-PQ index (trains the
    coarse quantizer and subspace codebooks), later waves are PQ-
    encoded and added under the FROZEN quantizers — each appended row
    is ~16 bytes instead of a raw vector, the shape that keeps a
    steady 100 TB vector ingest bounded by code bytes rather than
    embedding bytes. After the drain, probes ADC-query the persisted
    index; the result must equal the batch build+add pipeline, which
    the oracle recomputes in SQL end-to-end."""
    import os

    from ..operators import pq

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )

    def _build(root: str) -> None:
        os.makedirs(root)
        src = _write_waves(emb, root, "vec_id")
        index_path = os.path.join(root, "index")

        def on_batch(batch_df: DataFrame, _batch_id: int) -> None:
            if os.path.isdir(index_path):
                pq.add_to_ivfpq_index(batch_df, index_path)
            else:  # first wave trains coarse quantizer + codebooks
                pq.build_ivfpq_index(
                    batch_df, index_path, nlist=16, m=8, ksub=16
                )

        _drain(spark, emb.schema, src, os.path.join(root, "ckpt"), on_batch)

    root = _cached_store("stream_ivfpq", sf_dir, _build)
    probes = emb.filter(F.col("vec_id") < 50)
    return pq.query_ivfpq_index(
        probes, os.path.join(root, "index"), k=5, nprobe=4
    )


def _semdedup_stream_oracle() -> str:
    from .curation import _semdedup_clusters_sql

    return f"""
    WITH {_semdedup_clusters_sql("vec_id % 3 = 0")}
    SELECT centroid_id, id_a, id_b, cosine_sim
    FROM pairs WHERE cosine_sim >= 0.4
    """


@register(
    "streaming_dedup_incremental_semantic",
    # every pair is discovered exactly once: wave 0's pairs at build
    # time (the store holds only wave 0), each later wave's via
    # batch×store + batch×batch — so the drained sink equals the FULL
    # within-cluster pair set under the quantizer trained on wave 0,
    # which the oracle recomputes (training restricted to
    # vec_id % 3 = 0, assignment over everything).
    oracle=_semdedup_stream_oracle(),
    tags=("streaming", "similarity", "dedup", "incremental"),
)
def streaming_dedup_incremental_semantic(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Streaming SemDeDup against the persisted IVF index — the
    steady-state SEMANTIC ingest shape as a real Structured Streaming
    query (file source, maxFilesPerTrigger=1, availableNow):
    embeddings arrive in three waves; the FIRST wave trains the
    quantizer, builds the index, and emits its own within-cluster
    pairs; every later wave runs
    ``incremental_semantic_pairs`` (batch×store + batch×batch, frozen
    quantizer) BEFORE being added frozen — dedup-then-append, the
    same discipline as the fingerprint/MinHash streaming forms."""
    import os

    from ..operators import ann_index
    from ..operators.semdedup import (
        _pairs_from_assigned,
        incremental_semantic_pairs,
    )

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )

    def _build(root: str) -> None:
        os.makedirs(root)
        src = _write_waves(emb, root, "vec_id")
        index_path = os.path.join(root, "index")
        sink_path = os.path.join(root, "pairs")

        def on_batch(batch_df: DataFrame, _batch_id: int) -> None:
            s = batch_df.sparkSession
            if os.path.isdir(index_path):
                pairs = incremental_semantic_pairs(
                    batch_df, index_path, threshold=0.4
                )
                pairs.write.mode("append").parquet(sink_path)
                ann_index.add_to_ivf_index(batch_df, index_path)
            else:  # first wave trains the quantizer and seeds the store
                ann_index.build_ivf_index(batch_df, index_path, nlist=16)
                seeded = ann_index.read_ivf_lists(s, index_path).select(
                    "centroid_id",
                    F.col("neighbor_id").alias("vec_id"),
                    F.col("c_v").alias("v"),
                    F.col("c_nrm").alias("nrm"),
                )
                _pairs_from_assigned(seeded, "vec_id", 0.4).write.mode(
                    "append"
                ).parquet(sink_path)

        _drain(spark, emb.schema, src, os.path.join(root, "ckpt"), on_batch)

    root = _cached_store("stream_semdedup", sf_dir, _build)
    return spark.read.parquet(os.path.join(root, "pairs")).select(
        "centroid_id", "id_a", "id_b", "cosine_sim"
    )


def _bm25_stream_oracle() -> str:
    from .retrieval import BM25_B, BM25_K1, BM25_TOPK, _TERMS_SQL

    return f"""
    WITH tok AS (
        SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS term
        FROM documents
    ),
    tok2 AS (SELECT * FROM tok WHERE term != ''),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM tok2 GROUP BY 1, 2),
    dl AS (SELECT doc_id, count(*) AS dl FROM tok2 GROUP BY 1),
    stats AS (SELECT avg(dl) AS avgdl, count(*) AS n FROM dl),
    q AS (SELECT unnest({_TERMS_SQL}) AS term),
    qtf AS (SELECT tf.* FROM tf JOIN q USING (term)),
    dfreq AS (SELECT term, count(DISTINCT doc_id) AS dfq FROM qtf GROUP BY 1),
    scored AS (
        SELECT qtf.doc_id,
               ln((s.n - d.dfq + 0.5) / (d.dfq + 0.5) + 1)
               * (qtf.tf * ({BM25_K1} + 1))
               / (qtf.tf + {BM25_K1}
                  * (1 - {BM25_B} + {BM25_B} * dl.dl / s.avgdl)) AS sc
        FROM qtf
        JOIN dfreq d USING (term)
        JOIN dl USING (doc_id)
        CROSS JOIN stats s
    )
    SELECT doc_id, round(sum(sc), 6) AS bm25,
           CAST(count(*) AS INTEGER) AS n_hit_terms
    FROM scored GROUP BY doc_id
    ORDER BY bm25 DESC, doc_id
    LIMIT {BM25_TOPK}
    """


@register(
    "streaming_bm25_index_ingest",
    # the drained store holds every wave's postings exactly once
    # (idempotent membership anti-join), so the post-drain query must
    # equal the batch full-corpus BM25 — the same oracle as
    # similarity_bm25_topk / similarity_bm25_indexed
    oracle=_bm25_stream_oracle(),
    tags=("streaming", "similarity", "retrieval", "incremental"),
)
def streaming_bm25_index_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming postings-index ingest
    (operators/postings_store.py) as a real Structured Streaming
    query: documents arrive in three waves (file source,
    maxFilesPerTrigger=1, availableNow); each micro-batch tokenizes
    ONLY itself inside ``foreachBatch`` and registers its postings +
    lengths idempotently; after the stream drains, the store answers
    the fixed BM25 query equal to the batch full-corpus computation.
    Completes the streaming-ingest triptych: signature stores
    (dedup), ANN index (similarity), postings index (retrieval)."""
    import os

    from ..operators import postings_store
    from .retrieval import BM25_B, BM25_K1, BM25_QUERY_TERMS, BM25_TOPK

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def _build(root: str) -> None:
        os.makedirs(root)
        src = _write_waves(docs, root, "doc_id")
        index_path = os.path.join(root, "index")

        def on_batch(batch_df: DataFrame, _batch_id: int) -> None:
            postings_store.write_postings_store(batch_df, index_path)

        _drain(spark, docs.schema, src, os.path.join(root, "ckpt"), on_batch)

    root = _cached_store("stream_bm25", sf_dir, _build)
    return postings_store.bm25_topk_indexed(
        spark, os.path.join(root, "index"), BM25_QUERY_TERMS,
        k=BM25_TOPK, k1=BM25_K1, b=BM25_B,
    )


@register(
    "interval_join_click_errors",
    oracle="""
    SELECT c.event_id AS click_id, c.user_id, c.ts AS click_ts,
           e.event_id AS error_id, e.ts AS error_ts,
           round(e.value, 6) AS error_value
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    JOIN (SELECT * FROM events WHERE event_type = 'error') e
      ON c.user_id = e.user_id
     AND e.ts >= c.ts - INTERVAL 10 MINUTE
     AND e.ts <= c.ts
    """,
    tags=("streaming", "join", "interval", "timeseries"),
)
def interval_join_click_errors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Errors within the 10 minutes before each click, per user —
    the interval join (streaming/joins.py) in batch form; the
    stream-stream execution with watermark-derived state retention is
    tests/test_streaming.py."""
    from ..streaming.joins import interval_join

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts").alias("click_ts"),
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        F.col("user_id"),
        F.col("ts").alias("error_ts"),
        F.round("value", 6).alias("error_value"),
    )
    return interval_join(
        clicks,
        errors,
        keys=["user_id"],
        left_ts="click_ts",
        right_ts="error_ts",
        lower="10 MINUTE",
        upper="0 SECONDS",
    )
