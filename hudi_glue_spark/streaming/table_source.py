"""The KeyedTable COMMIT LOG as a Structured Streaming SOURCE.

Hudi's incremental streaming read (``hoodie.datasource.query.type=
incremental`` under spark.readStream — the consumption side of the
reference's upsert pipeline, glue/HudiJarGlueJob.py:83) re-expressed
as a Spark 4 Python Data Source stream: every micro-batch is the rows
ADDED by the next commits of the table's log, so a downstream pipeline
(derived-table maintenance, export, index feed) tails the table like a
queue — O(delta) per trigger, never a snapshot rescan.

Semantics (deterministic per offset range, so checkpoint replay is
exact):

- **Offset** = the last commit id applied (``{"last": cid}``; ``""``
  = before the first commit). The commit log is append-only and ids
  are lexically ordered, so offsets are totally ordered and a
  replayed ``partitions(start, end)`` plans the identical file set.
- **Batch for commit c** = the live rows of the files c ADDED, masked
  by c's OWN deletion vectors on those files (not the head's — a
  later delete must not rewrite history), with a ``_commit`` column
  attached. This is exactly ``read_incremental`` sliced per commit:
  CoW upserts stream their rewritten partitions' post-images,
  MoR/DV upserts stream just the appended winners, pure DV-delete
  commits stream nothing (file-level incremental parity — consumers
  needing retractions use ``diff_commits``'s change feed).
- **Retention**: offsets stay replayable until clean() ages the
  offset's commit out of the log — the Kafka-retention trade, and the
  reader refuses with a clear error instead of silently skipping.

Scale: latestOffset/partitions are driver-side METADATA reads (commit
JSONs + shard diffs, O(changed shards)); row decode happens in
executor tasks via the same pyarrow scan the manifest relation uses —
multi-file C++ datasets, per-batch bitmap masks, schema conform for
pre-evolution files. Nothing row-scale touches the driver.
"""

from __future__ import annotations

import json
import os
from typing import Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StringType, StructField, StructType

from hudi_glue_spark.table import manifest as M

FORMAT_NAME = "keyed_table_changes"
COMMIT_COL = "_commit"

#: files per executor task (mask-free ones share a pyarrow dataset)
_FILES_PER_TASK = 16


def _added_files(root: str, prev, cur) -> list[str]:
    """Files ``cur`` references that ``prev`` doesn't — the shard-level
    diff when both snapshots shard (O(changed shards), the
    read_incremental fast path), else a set diff of the file lists."""
    if prev is None:
        return sorted(cur.files)
    if cur.shards is not None and prev.shards is not None:
        shared = set(prev.shards) & set(cur.shards)
        mine: set[str] = set()
        for s in cur.shards:
            if s not in shared:
                mine |= M.shard_file_set(root, s)
        theirs: set[str] = set()
        for s in prev.shards:
            if s not in shared:
                theirs |= M.shard_file_set(root, s)
        return sorted(mine - theirs)
    return sorted(set(cur.files) - set(prev.files))


class _CommitSlice(InputPartition):
    """One task: (commit id, file relpaths, {rel: dv blob name})."""

    def __init__(self, cid: str, files: tuple, dvs: dict):
        self.value = (cid, files, dvs)


class TableChangesStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict, schema: StructType):
        self.root = options["path"]
        self.schema = schema
        self.partition_by: list[str] = json.loads(
            options.get("partition_by") or "[]"
        )
        self.starting = options.get("starting", "earliest")

    # -- offsets (driver, metadata-only) ----------------------------------

    def initialOffset(self) -> dict:
        if self.starting == "earliest":
            return {"last": ""}
        ids = M.list_commit_ids(self.root)
        if self.starting == "latest":
            return {"last": ids[-1] if ids else ""}
        if self.starting not in ids:
            raise ValueError(
                f"starting commit {self.starting!r} not in the log "
                f"(cleaned, or never existed)"
            )
        return {"last": self.starting}

    def latestOffset(self) -> dict:
        ids = M.list_commit_ids(self.root)
        return {"last": ids[-1] if ids else ""}

    def partitions(
        self, start: dict, end: dict
    ) -> Sequence[InputPartition]:
        ids = M.list_commit_ids(self.root)
        lo, hi = start.get("last", ""), end.get("last", "")
        if lo and lo not in ids:
            raise ValueError(
                f"stream offset {lo!r} aged out of the commit log "
                f"(clean() retention passed it) — restart the stream "
                f"from a live commit or 'earliest'"
            )
        take = [c for c in ids if c > lo and c <= hi]
        out: list[InputPartition] = []
        prev = M.read_manifest(self.root, lo) if lo else None
        for cid in take:
            cur = M.read_manifest(self.root, cid)
            if cur is None:  # raced a clean() past hi — skip forward
                prev = None
                continue
            added = _added_files(self.root, prev, cur)
            dvs = {f: cur.dvs[f][0] for f in added if f in (cur.dvs or {})}
            for i in range(0, len(added), _FILES_PER_TASK):
                chunk = tuple(added[i : i + _FILES_PER_TASK])
                out.append(
                    _CommitSlice(
                        cid, chunk, {f: dvs[f] for f in chunk if f in dvs}
                    )
                )
            prev = cur
        return out

    def commit(self, end: dict) -> None:  # offsets live in the checkpoint
        pass

    # -- rows (executor) ---------------------------------------------------

    def read(self, partition: _CommitSlice):
        """Same decode discipline as the manifest relation: one C++
        pyarrow dataset per hive-dir run for mask-free files, per-file
        sequential scan with a bitmap slice per batch where a DV
        applies, schema conform (NULL-fill / upcast) C++-side, and the
        constant ``_commit`` / partition columns attached per batch."""
        import itertools

        import pyarrow as pa
        import pyarrow.dataset as pds

        from pyspark.sql.pandas.types import to_arrow_schema

        from hudi_glue_spark.table import dv as DVB

        if partition is None or not partition.value[1]:
            return
        cid, files, dvs = partition.value
        target = to_arrow_schema(self.schema)
        ddir = M.data_dir(self.root)
        part_cols = set(self.partition_by)
        phys = pa.schema(
            [
                f
                for f in target
                if f.name not in part_cols and f.name != COMMIT_COL
            ]
        )

        def assemble(batch, pvals):
            n = batch.num_rows
            cols = []
            for field in target:
                if field.name == COMMIT_COL:
                    cols.append(pa.array([cid] * n, type=pa.string()))
                elif field.name in part_cols:
                    raw = pvals.get(field.name)
                    cols.append(
                        pa.nulls(n, field.type)
                        if raw is None
                        else pa.array([raw] * n, type=pa.string()).cast(
                            field.type
                        )
                    )
                else:
                    cols.append(batch.column(field.name))
            return pa.RecordBatch.from_arrays(cols, schema=target)

        for pdir, run in itertools.groupby(
            files, key=lambda rel: os.path.dirname(rel)
        ):
            grp = list(run)
            pvals: dict[str, str | None] = {}
            for seg in pdir.split("/") if pdir else []:
                col, _, raw = seg.partition("=")
                pvals[col] = (
                    None
                    if raw == "__HIVE_DEFAULT_PARTITION__"
                    else M.hive_unescape(raw)
                )
            plain = [rel for rel in grp if rel not in dvs]
            if plain:
                scan = pds.dataset(
                    [os.path.join(ddir, rel) for rel in plain],
                    format="parquet",
                    schema=phys,
                )
                for batch in scan.to_batches(use_threads=False):
                    yield assemble(batch, pvals)
            for rel in grp:
                if rel not in dvs:
                    continue
                blob = DVB.read(self.root, dvs[rel])
                offset = 0
                scan = pds.dataset(
                    [os.path.join(ddir, rel)], format="parquet", schema=phys
                )
                for batch in scan.to_batches(use_threads=False):
                    n = batch.num_rows
                    dead = DVB.dead_mask(blob, offset, n)
                    offset += n
                    if dead.any():
                        batch = batch.filter(pa.array(~dead))
                        if batch.num_rows == 0:
                            continue
                    yield assemble(batch, pvals)


class TableChangesDataSource(DataSource):
    """``spark.readStream.format("keyed_table_changes")`` — options:
    ``path`` (table root), ``schema_json`` (committed schema + the
    ``_commit`` column), ``partition_by`` (JSON list), ``starting``
    ('earliest' | 'latest' | a commit id)."""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self):
        return StructType.fromJson(json.loads(self.options["schema_json"]))

    def streamReader(self, schema: StructType):
        return TableChangesStreamReader(dict(self.options), schema)


_REG_LOCK = None


def ensure_registered(spark) -> None:
    """Idempotent, thread-safe registration — same double-checked-lock
    discipline as the manifest relation (Spark 4.1 raises
    DATA_SOURCE_ALREADY_EXISTS on a duplicate register)."""
    global _REG_LOCK
    import threading

    from hudi_glue_spark.sources.manifest_relation import _ship_package

    if _REG_LOCK is None:
        _REG_LOCK = threading.Lock()
    flag = "_hgs_table_changes_ds_registered"
    if getattr(spark, flag, False):
        return
    with _REG_LOCK:
        if getattr(spark, flag, False):
            return
        _ship_package(spark)
        try:
            spark.dataSource.register(TableChangesDataSource)
        except Exception as e:  # noqa: BLE001
            if "already exists" not in str(e).lower():
                raise
        setattr(spark, flag, True)


def stream_changes(spark, table, starting: str = "earliest"):
    """Open the table's commit log as a streaming DataFrame: committed
    schema plus a ``_commit`` string column; each micro-batch carries
    the rows added by the commits newly visible since the last trigger
    (see module docstring for exact semantics)."""
    man = M.read_manifest(table.path)
    if man is None:
        raise FileNotFoundError(f"no commits at {table.path}")
    ensure_registered(spark)
    schema = StructType.fromJson(json.loads(man.schema_json))
    out = StructType(
        [*schema.fields, StructField(COMMIT_COL, StringType(), False)]
    )
    return (
        spark.readStream.format(FORMAT_NAME)
        .option("path", table.path)
        .option("schema_json", json.dumps(out.jsonValue()))
        .option(
            "partition_by", json.dumps(list(table.partition_by or []))
        )
        .option("starting", starting)
        .load()
    )
