"""Fixed-length token chunking — training-sequence preparation.

Pretraining pipelines cut documents into overlapping fixed-length
token windows (context-window packing); this is that primitive as
pure array expressions: tokenize → explode window starts → slice.
No Python in the loop, so chunking runs at parquet-scan speed inside
whole-stage codegen, and the output (doc id, chunk index, window
text) is deterministic and engine-reproducible — the DuckDB oracle
recomputes every chunk string byte-for-byte.

Scale posture: one explode per document (rows × ~n_tokens/stride),
no shuffle at all until the caller aggregates; the widened-input
guard keeps small scans from serializing the tokenize stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .parallel import widen_small_input as _widen


def chunk_token_windows(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_size: int = 32,
    stride: int = 24,
) -> DataFrame:
    """Explode each document into whitespace-token windows of
    ``chunk_size`` tokens every ``stride`` tokens (overlap =
    chunk_size − stride; the final window may be shorter). Returns
    (id, chunk_idx, start_tok, n_tokens, chunk_text), 1-based
    ``start_tok``."""
    toks = F.split(F.lower(F.col(text_col)), r"\s+")
    starts = F.sequence(F.lit(1), F.size(toks), F.lit(stride))
    ex = _widen(df).select(
        F.col(id_col),
        toks.alias("__t"),
        F.explode(starts).alias("start_tok"),
    )
    chunk = F.slice(F.col("__t"), F.col("start_tok"), chunk_size)
    return ex.select(
        id_col,
        F.expr(f"CAST((start_tok - 1) DIV {stride} AS INT)").alias("chunk_idx"),
        F.col("start_tok").cast("int").alias("start_tok"),
        F.size(chunk).alias("n_tokens"),
        F.concat_ws(" ", chunk).alias("chunk_text"),
    )
