"""Plan-level utilities: parallelism guards and plan inspection."""

from hudi_glue_spark.plans.parallelism import ensure_parallelism
from hudi_glue_spark.plans.inspect import (
    explain_str,
    pushed_filters,
    assert_broadcast_join,
    scan_read_schema,
)

__all__ = [
    "ensure_parallelism",
    "explain_str",
    "pushed_filters",
    "assert_broadcast_join",
    "scan_read_schema",
]
