"""Multimodal column handling: opaque binary payloads + typed metadata.

Images/audio/video travel through the engine as ``binary`` columns
with a typed metadata struct alongside (BASELINE.json ``north_star``;
SURVEY.md §7.5). The Spark-side plumbing — schemas, Arrow-batched
``mapInPandas`` decode stage, partition-sized batches, frame
explosion — is real and tested; the actual codec step is STUBBED
(this container ships no image/audio libraries) behind
``decoder=None`` → deterministic fake features, or a user-supplied
decoder callable for real deployments.

Scale posture: binary payloads ride the columnar format untouched
(parquet keeps them compressed); decode happens ONCE per row inside
an Arrow batch on the executor, and only the extracted features —
not the blobs — flow into downstream shuffles.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)

FEATURE_DIM = 8

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("payload_bytes", T.LongType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ]
)


def documents_as_media(df: DataFrame) -> DataFrame:
    """Deterministic media fixture: wrap each document's text bytes
    as an opaque binary payload with synthesized metadata — the shape
    a real image/audio table would have (FIXTURES.md §4 note)."""
    return df.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("payload"),
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("media_type"),
        (F.col("n_chars") % 64 + 16).cast("int").alias("width"),
        (F.col("n_chars") % 48 + 16).cast("int").alias("height"),
        (F.col("n_chars") % 10 + 1).cast("int").alias("n_frames"),
    )


def extract_features(
    media: DataFrame,
    decoder: Callable[[bytes, str], list[float]] | None = None,
) -> DataFrame:
    """Decode / feature-extract stage over binary payloads.

    Arrow-batched ``mapInPandas``: each batch of (payload, type) rows
    is decoded inside one Python worker call; only features leave the
    stage. ``decoder(payload, media_type) -> list[float]`` plugs in a
    real codec; the default is the deterministic fake (the container
    has no image/audio libs — see module docstring).
    """

    # NOTE: this closure ships to Python workers via cloudpickle. It
    # must be fully self-contained — referencing module-level helpers
    # would pickle them BY REFERENCE to this package, which executors
    # outside the repo root cannot import. Locals (ints, the user's
    # decoder callable) pickle by value.
    feature_dim = FEATURE_DIM

    def run(batches: Iterator[Any]) -> Iterator[Any]:
        import hashlib as _hashlib

        def fake_features(payload: bytes) -> list[float]:
            digest = _hashlib.sha256(payload).digest()
            return [
                int.from_bytes(digest[4 * i : 4 * i + 4], "big") / 2**32
                for i in range(feature_dim)
            ]

        for pdf in batches:
            feats = []
            for payload, mtype in zip(pdf["payload"], pdf["media_type"]):
                raw = bytes(payload)
                if decoder is not None:
                    feats.append(decoder(raw, mtype))
                else:
                    feats.append(fake_features(raw))
            out = pdf[["media_id", "media_type"]].copy()
            out["payload_bytes"] = [len(bytes(p)) for p in pdf["payload"]]
            out["features"] = feats
            yield out

    return media.mapInPandas(run, schema=FEATURES_SCHEMA)


def sample_frames(media: DataFrame, every_nth: int = 2) -> DataFrame:
    """Frame-sampling plumbing for video payloads: explode each media
    row into its sampled frame indices (metadata-driven — the real
    frame decode would run per exploded row in a downstream
    ``extract_features``). Pure expressions, no Python."""
    frames = F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_nth))
    return media.filter(F.col("media_type") == "video").select(
        "media_id",
        F.col("n_frames").alias("total_frames"),
        F.explode(frames).alias("frame_idx"),
    )


def binary_stats(media: DataFrame) -> DataFrame:
    """Metadata/size profile per media type — pure column expressions
    over the binary column (no decode).

    The mean payload size is emitted as integer micro-bytes: the exact
    long sum divided by the count is one correctly-rounded IEEE
    division in any engine, so scaling to 1e-6 bytes and casting to
    BIGINT keeps the value hash engine-independent (a raw double mean
    can differ in decimal rendering across engines).
    """
    ol = F.octet_length("payload")
    return media.groupBy("media_type").agg(
        F.count("*").alias("n_items"),
        F.sum(ol).alias("total_bytes"),
        F.round(F.sum(ol).cast("double") / F.count("*") * 1e6)
        .cast("long")
        .alias("avg_micro_bytes"),
        F.max("width").alias("max_width"),
        F.max("height").alias("max_height"),
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def resize_images(
    media: DataFrame,
    target_w: int,
    target_h: int,
    resizer: Callable[[bytes, int, int], bytes] | None = None,
) -> DataFrame:
    """Decode → resize → re-encode stage for image payloads.

    Same Arrow-batched ``mapInPandas`` shape as ``extract_features``:
    binary in, binary out, metadata updated to the target dimensions.
    ``resizer(payload, w, h) -> bytes`` plugs in a real codec
    (PIL/opencv); the stub emits a deterministic pseudo-bitmap of
    exactly ``w*h`` bytes derived from the payload digest, so output
    sizes — the property downstream partitioning cares about — are
    real.
    """

    # self-contained closure: ships by value, workers never import us
    def run(batches: Iterator[Any]) -> Iterator[Any]:
        import hashlib as _hashlib

        def fake_resize(payload: bytes, w: int, h: int) -> bytes:
            seed = _hashlib.sha256(payload).digest()
            reps = (w * h) // len(seed) + 1
            return (seed * reps)[: w * h]

        do = resizer or fake_resize
        for pdf in batches:
            out = pdf[["media_id", "media_type"]].copy()
            out["width"] = target_w
            out["height"] = target_h
            out["payload"] = [
                do(bytes(p), target_w, target_h) for p in pdf["payload"]
            ]
            yield out

    images = media.filter(F.col("media_type") == "image")
    return images.mapInPandas(run, schema=RESIZED_SCHEMA)


def audio_windows(
    media: DataFrame, window_ms: int = 1000, hop_ms: int = 500
) -> DataFrame:
    """Overlapping analysis windows over audio payloads — the
    metadata-driven plumbing for STFT/feature stages (the per-window
    decode would run in a downstream ``extract_features``). Audio
    duration rides the ``n_frames`` metadata field as seconds. Pure
    expressions: sequence + explode, no Python."""
    duration_ms = F.col("n_frames") * 1000
    starts = F.sequence(
        F.lit(0), duration_ms - F.lit(window_ms), F.lit(hop_ms)
    )
    return (
        media.filter(
            (F.col("media_type") == "audio") & (duration_ms >= window_ms)
        )
        .select(
            "media_id",
            (duration_ms).cast("int").alias("duration_ms"),
            F.explode(starts).alias("window_start_ms"),
        )
        .withColumn(
            "window_end_ms", F.col("window_start_ms") + F.lit(window_ms)
        )
    )
