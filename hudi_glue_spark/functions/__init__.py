"""Column-expression helpers: scalar (reference surface) + vector (§2b)."""

from hudi_glue_spark.functions.scalar import (
    hive_partition_value,
    stable_surrogate_key,
    surrogate_key,
    ts_from_string,
)
from hudi_glue_spark.functions.vector import cosine_similarity, dot_product, l2_norm

__all__ = [
    "hive_partition_value",
    "stable_surrogate_key",
    "surrogate_key",
    "ts_from_string",
    "cosine_similarity",
    "dot_product",
    "l2_norm",
]
