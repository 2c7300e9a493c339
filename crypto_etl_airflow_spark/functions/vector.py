"""Vector math over ``array<float|double>`` columns — pure Column
expressions (``zip_with`` + ``aggregate``), evaluated JVM-side with
sequential summation.

Sequential order matters: it is bit-identical to a sequential C loop
over the same doubles, which is what lets cosine scores hash-match
the DuckDB oracle exactly (SIMD/tree-reduced sums would differ in
the last ulps).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column | str, b: Column | str) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def dot_unrolled(a: Column | str, b: Column | str, dim: int) -> Column:
    """Bit-identical twin of :func:`dot` for a KNOWN fixed dimension,
    unrolled into a left-to-right chain of ``element_at`` products —
    ``((0.0 + a₁b₁) + a₂b₂) + …`` is exactly ``aggregate``'s fold
    order, so the IEEE result is the same double.

    PERFORMANCE CAVEAT (r15 re-measurement): at dim=64 the generated
    method exceeds HotSpot's DontCompileHugeMethods bytecode limit
    and runs as INTERPRETED bytecode at ~10 µs/dot — SLOWER than the
    interpreted HOF :func:`dot` (~6 µs); r14's "10-20× faster" claim
    was a ``count()``-pruning artifact (the dots never executed in
    the benches that supported it). Use this form only for SMALL
    fixed dims or one-off expressions; every bulk dot workload in
    the engine (nearest-centroid assignment, semdedup pair scoring)
    routes through the Arrow-batched kernels in
    ``operators/similarity.py`` / ``operators/semdedup.py`` instead.

    When ``a``/``b`` are plain column NAMES the chain is built as ONE
    SQL string through ``F.expr`` instead of ``6·dim`` Column calls:
    each PySpark Column operation is a py4j roundtrip, and at dim=64
    the loop form cost ~2-3 s of DRIVER wall-clock per call site just
    to CONSTRUCT the expression (r15 cProfile: expression build, not
    execution, dominated the curation pipeline's plan build). The
    parsed AST is operator-identical — ``0.0D`` is a double literal
    and SQL ``+``/``*`` associate left — so codegen and the IEEE
    result are unchanged (the bit-identity pytest covers both
    construction paths)."""
    if isinstance(a, str) and isinstance(b, str):
        qa, qb = f"`{a}`", f"`{b}`"
        terms = "".join(
            f" + (CAST(element_at({qa}, {i}) AS DOUBLE)"
            f" * CAST(element_at({qb}, {i}) AS DOUBLE))"
            for i in range(1, dim + 1)
        )
        return F.expr("0.0D" + terms)
    acc: Column = F.lit(0.0)
    for i in range(1, dim + 1):
        acc = acc + (
            F.element_at(a, i).cast("double")
            * F.element_at(b, i).cast("double")
        )
    return acc


def norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / (norm(a) * norm(b))
