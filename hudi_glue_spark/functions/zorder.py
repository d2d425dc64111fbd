"""Z-order (Morton) keys for multi-column file clustering.

``optimize(sort_by=[c])`` clusters files on ONE column; a query
filtering on a second column still scans everything. Interleaving the
bits of several quantized columns into one sort key makes files locally
contiguous in EVERY participating dimension — per-file min/max stay
tight on each column, so manifest skipping (``read_range``) prunes on
whichever dimension a query filters. This is the standard lakehouse
multi-dimensional clustering (Delta ``OPTIMIZE ZORDER BY``), built here
from plain JVM expressions: quantize each column to ``bits`` levels
against its [min, max], then OR the shifted bits together — no UDF, no
shuffle beyond the range partition that consumes the key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def quantize(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Map ``col`` linearly from [lo, hi] to integer [0, 2^bits - 1]
    (clamped; constant columns map to 0)."""
    levels = (1 << bits) - 1
    if hi <= lo:
        return F.lit(0).cast("long")
    scaled = (col.cast("double") - F.lit(float(lo))) / F.lit(float(hi - lo))
    clamped = F.least(F.greatest(scaled, F.lit(0.0)), F.lit(1.0))
    return F.floor(clamped * F.lit(float(levels))).cast("long")


def interleave_bits(qs: list[Column], bits: int) -> Column:
    """Morton interleave: bit b of column i lands at position
    ``b * len(qs) + i`` — a pure expression tree (bits × cols terms of
    shift/AND/OR), evaluated inside codegen."""
    n = len(qs)
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, q in enumerate(qs):
            bit = F.shiftright(q, b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, b * n + i))
    return z


def zorder_key(
    df: DataFrame, cols: list[str], bits: int = 16
) -> tuple[DataFrame, str]:
    """Attach a ``__z`` Morton key over ``cols``.

    Column ranges come from ONE metadata-scale aggregate (2×len(cols)
    scalars to the driver); timestamps/dates are quantized via their
    epoch value. Returns (df_with_key, key_col_name).

    ``bits`` is clamped so the interleaved key never reaches bit 63 —
    the sign bit of a long. Without the clamp, ≥4 columns at bits=16
    would place high values of the last column at position 63, making
    their Morton keys negative and sorting them FIRST (silently ruining
    min/max tightness for pruning)."""
    bits = min(bits, 63 // len(cols))
    aggs = []
    for c in cols:
        v = F.col(c).cast("double")
        aggs += [F.min(v).alias(f"__lo_{c}"), F.max(v).alias(f"__hi_{c}")]
    r = df.agg(*aggs).first()
    qs = [
        quantize(F.col(c).cast("double"), r[f"__lo_{c}"], r[f"__hi_{c}"], bits)
        for c in cols
    ]
    return df.withColumn("__z", interleave_bits(qs, bits)), "__z"
