"""Scalar helper expressions: pure ``Column -> Column`` functions.

Everything here is built-in-expression composition — JVM-side,
whole-stage-codegen'd, zero Python in the hot path. Operators and
plans compose these; nothing in this package touches a DataFrame.
"""

from .text import (
    bpe_ish_token_count,
    fingerprint,
    language_id,
    language_scores,
    mean_token_length,
    punct_ratio,
    quality_score,
    stopword_ratio,
    whitespace_token_count,
)
from .vector import cosine, dot, norm

__all__ = [
    "bpe_ish_token_count",
    "fingerprint",
    "language_id",
    "language_scores",
    "mean_token_length",
    "punct_ratio",
    "quality_score",
    "stopword_ratio",
    "whitespace_token_count",
    "cosine",
    "dot",
    "norm",
]
