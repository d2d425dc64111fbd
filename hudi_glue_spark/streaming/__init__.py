"""Structured Streaming layer (SURVEY.md §2a #31 modernized).

The reference achieves incrementality with batch re-runs over day=N
folders (glue/NYTaxiDataPrep.py:25-27, glue/HudiJarGlueJob.py:17-18) —
no true streaming. The natural Spark modernization, anticipated in
SURVEY.md §1.1, is this module:

- file-source ``readStream`` over the same parquet layout (sources),
- watermarked tumbling/session window aggregation (windowed),
- ``foreachBatch`` incremental upsert into a :class:`KeyedTable`
  (ingest) — the streaming twin of the batch day=0/1/2 pipeline,
- ``applyInPandasWithState`` for custom stateful operators (stateful).
"""

from hudi_glue_spark.streaming.sources import stream_parquet, stream_table
from hudi_glue_spark.streaming.windowed import session_windows, tumbling_agg
from hudi_glue_spark.streaming.ingest import stream_ingest, run_to_memory
from hudi_glue_spark.streaming.stateful import running_user_totals

__all__ = [
    "stream_parquet",
    "stream_table",
    "tumbling_agg",
    "session_windows",
    "stream_ingest",
    "run_to_memory",
    "running_user_totals",
]
