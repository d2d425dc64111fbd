"""Operators: the reference's relational surface + §2b LLM-pipeline ops."""

from hudi_glue_spark.operators.relational import (
    conditional_rewrite,
    drop_columns,
    filter_eq,
    is_non_empty,
    with_derived,
)

__all__ = [
    "conditional_rewrite",
    "drop_columns",
    "filter_eq",
    "is_non_empty",
    "with_derived",
]
