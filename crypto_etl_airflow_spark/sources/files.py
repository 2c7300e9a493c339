"""Schema-explicit file sources: CSV and JSON-lines, with quarantine.

Parquet is the warehouse format; CSV/JSONL are what upstream systems
hand a pipeline. Both readers here follow the engine's ingest rules
(SURVEY.md §2.1 S3, §2.2 P6):

- **explicit schema, never inferred** — inference is a full extra
  pass over the data (fatal at 100 TB) and schema drift must FAIL
  loudly, not silently re-type a column;
- **PERMISSIVE + corrupt-record quarantine** — malformed rows land
  in a quarantine DataFrame instead of killing the batch or being
  silently dropped (same split-don't-halt posture as
  ``json_ingest.split_valid_invalid``).

Both splittable text formats parallelize by input split at scale;
compression should be splittable too (bzip2/zstd-seekable, not gzip)
or the file count must carry the parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "__corrupt"


def _with_corrupt(schema: T.StructType) -> T.StructType:
    return T.StructType(
        [*schema.fields, T.StructField(CORRUPT_COL, T.StringType())]
    )


def _split(raw: DataFrame) -> tuple[DataFrame, DataFrame]:
    # Spark refuses queries whose referenced columns are ONLY the
    # corrupt-record column of a raw CSV/JSON scan
    # (QUERY_ONLY_CORRUPT_RECORD_COLUMN); its documented contract is
    # to materialize the parsed scan first. cache() serves the tiny-
    # to-medium case; a 100 TB ingest lands the parsed+corrupt frame
    # in a staging parquet once and splits from there — same one-pass
    # economics, durable instead of memory-resident.
    raw = raw.cache()
    valid = raw.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    quarantine = raw.filter(F.col(CORRUPT_COL).isNotNull()).withColumnRenamed(
        CORRUPT_COL, "raw_record"
    )
    return valid, quarantine


def read_csv_quarantined(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    **options: str,
) -> tuple[DataFrame, DataFrame]:
    """CSV with explicit schema; returns (valid, quarantine) where
    quarantine rows carry the raw malformed line. PERMISSIVE mode —
    a row with the wrong column count or an uncastable value fills
    the corrupt-record column instead of failing the scan."""
    raw = (
        spark.read.schema(_with_corrupt(schema))
        .option("header", str(header).lower())
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .options(**options)
        .csv(path)
    )
    return _split(raw)


def read_jsonl_quarantined(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    **options: str,
) -> tuple[DataFrame, DataFrame]:
    """JSON-lines with explicit schema; returns (valid, quarantine).
    Note Spark's lenient JSON contract: only rows that fail to PARSE
    as JSON are corrupt; a parseable object missing fields yields
    nulls (schema presence checks belong to the quality gate)."""
    raw = (
        spark.read.schema(_with_corrupt(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .options(**options)
        .json(path)
    )
    return _split(raw)


def write_jsonl_shards(
    df: DataFrame,
    path: str,
    max_records_per_file: int = 100_000,
    order_by: list[str] | None = None,
    compression: str | None = None,
    mode: str = "error",
) -> None:
    """Export as JSON-lines shards — the delivery format training
    loaders consume (one document per line, shards bounded so a
    loader can shuffle at shard granularity). ``mode`` follows
    ``DataFrameWriter.mode`` and defaults to ``"error"``: exporting
    onto an existing delivery path FAILS rather than silently
    destroying prior shards (ADVICE r8) — pass ``mode="overwrite"``
    to republish deliberately.

    Spark's native json sink serializes JVM-side (no Python in the
    row path); ``maxRecordsPerFile`` splits any oversized partition
    into additional files, so shard size is bounded regardless of
    upstream partitioning while the partition count still carries
    write parallelism. ``order_by`` sorts WITHIN partitions only —
    deterministic shard contents without a global sort (a total order
    at 100 TB is a full range-shuffle; if a global curriculum order
    is needed, Z-order/`training_shards_manifest` upstream decide
    placement instead). Compression note from the module docstring
    applies doubly here: gzip shards are non-splittable — prefer
    zstd (splittable-enough via shard granularity) or none.
    """
    w = df.sortWithinPartitions(*order_by) if order_by else df
    writer = w.write.option("maxRecordsPerFile", max_records_per_file)
    if compression is not None:
        writer = writer.option("compression", compression)
    writer.mode(mode).json(path)
