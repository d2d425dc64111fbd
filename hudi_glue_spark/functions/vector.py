"""Vector (embedding) expression helpers for the §2b similarity ops.

All JVM-side via higher-order functions (``zip_with`` / ``aggregate``):
no Python boundary crossing, fully codegen'd, and — critically for the
DuckDB-oracle gate — the reduction runs in array order with a double
accumulator, matching DuckDB's ``list_dot_product`` semantics bit-for-bit
on float32 inputs widened to float64.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Names the SQL-text fast path accepts: a plain identifier or a dotted
#: struct path of identifiers (``qs.q``). Anything else — spaces,
#: hyphens, backticks — would parse as ARITHMETIC under F.expr (``a-b``
#: silently becomes a subtraction when columns a and b exist; ADVICE
#: r15), so those names take the Column/lambda path, which resolves
#: them exactly like ``F.col``.
_SAFE_NAME = re.compile(
    r"^[A-Za-z_][A-Za-z0-9_]*(\.[A-Za-z_][A-Za-z0-9_]*)*$"
)


def _sql_safe(name) -> bool:
    return isinstance(name, str) and bool(_SAFE_NAME.match(name))


def _ref(name: str) -> str:
    # quote every dotted segment; double embedded backticks (defense in
    # depth — _sql_safe gates out names that could carry one)
    return ".".join(
        "`" + seg.replace("`", "``") + "`" for seg in name.split(".")
    )


def dot_product_sql(a: str, b: str) -> str:
    """SQL text of :func:`dot_product` over column NAMES — one
    ``F.expr`` parse instead of ~40 py4j round-trips building the
    nested lambda Columns (r15: constructing the lambda form measured
    ~150 ms of DRIVER time per call; the knn/ann rows build several
    per query). Semantically identical expression tree."""
    return (
        f"aggregate(zip_with({_ref(a)}, {_ref(b)}, "
        f"(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        f"CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
    )


def l2_norm_sql(a: str) -> str:
    """SQL text of :func:`l2_norm` over a column NAME (see
    :func:`dot_product_sql` for why)."""
    return (
        f"sqrt(aggregate(transform({_ref(a)}, "
        f"x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), "
        f"CAST(0.0 AS DOUBLE), (acc, x) -> acc + x))"
    )


def dot_product(a: Column | str, b: Column | str) -> Column:
    """Elementwise product then ordered sum, double precision."""
    if _sql_safe(a) and _sql_safe(b):
        return F.expr(dot_product_sql(a, b))
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column | str) -> Column:
    if _sql_safe(a):
        return F.expr(l2_norm_sql(a))
    a = F.col(a) if isinstance(a, str) else a
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity of two ``array<float|double>`` columns.

    String args take the one-parse SQL path (r15 — see
    :func:`dot_product_sql`); Column args keep the lambda form."""
    if _sql_safe(a) and _sql_safe(b):
        return F.expr(
            f"({dot_product_sql(a, b)})"
            f" / (({l2_norm_sql(a)}) * ({l2_norm_sql(b)}))"
        )
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return dot_product(a, b) / (l2_norm(a) * l2_norm(b))


def quantize_int8(a: Column | str) -> Column:
    """Symmetric int8 quantization: per-vector scale = max|x| / 127,
    q_i = round(x_i / scale) ∈ [-127, 127]. Returns
    struct(scale double, q array<int>). 4× storage reduction for
    embedding columns at 100 TB; dequantize ≈ q_i · scale.

    Bankers'-rounding (``round`` HALF_UP in Spark SQL) on doubles —
    deterministic and DuckDB-reproducible."""
    from hudi_glue_spark.functions.scalar import let_

    a = F.col(a) if isinstance(a, str) else a
    scale_expr = F.aggregate(
        F.transform(a, lambda x: F.abs(x.cast("double"))),
        F.lit(0.0),
        lambda acc, x: F.greatest(acc, x),
    ) / F.lit(127.0)

    # let-bind the scale (r15): referencing the max-abs fold inside the
    # quantization lambda re-runs the whole O(len) fold PER ELEMENT —
    # O(len²) per vector. Bound, it is one fold + O(1) reads.
    def over_scale(scale: Column) -> Column:
        return F.struct(
            scale.alias("scale"),
            F.when(
                scale > 0,
                F.transform(
                    a, lambda x: F.round(x.cast("double") / scale).cast("int")
                ),
            )
            .otherwise(F.transform(a, lambda x: F.lit(0)))
            .alias("q"),
        )

    return let_(scale_expr, over_scale)


def dequantize_int8(qs: Column | str) -> Column:
    """Inverse of :func:`quantize_int8`: array<double> ≈ original."""
    qs = F.col(qs) if isinstance(qs, str) else qs
    return F.transform(qs["q"], lambda q: q.cast("double") * qs["scale"])
