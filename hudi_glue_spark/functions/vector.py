"""Vector (embedding) expression helpers for the §2b similarity ops.

All JVM-side via higher-order functions (``zip_with`` / ``aggregate``):
no Python boundary crossing, fully codegen'd, and — critically for the
DuckDB-oracle gate — the reduction runs in array order with a double
accumulator, matching DuckDB's ``list_dot_product`` semantics bit-for-bit
on float32 inputs widened to float64.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot_product(a: Column | str, b: Column | str) -> Column:
    """Elementwise product then ordered sum, double precision."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity of two ``array<float|double>`` columns."""
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
