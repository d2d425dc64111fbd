"""Manifest-backed snapshot relation (Python Data Source API).

Full-snapshot ``KeyedTable.read()`` used to hand Spark an explicit
path list; correct (orphans invisible, time travel exact) but at ~1M
files the driver pays InMemoryFileIndex construction — Path parsing,
file-status population, and partition discovery over every live file —
before the first task launches. This module serves the scan straight
from the table's own columnar metadata instead (the Hudi
metadata-table/file-index idiom, cf. the reference's reliance on
``hoodie.metadata.enable``-style listing avoidance; SURVEY.md §4):

- The file list, per-file byte sizes, per-file column stats, and
  partition values all come from the arrow shard table
  (``manifest.shard_table()``) — ZERO filesystem listing or stat calls
  against the data directory, at any file count.
- Planning cost is O(live files) in vectorized arrow/numpy (bin-pack
  by recorded bytes), flat-ish 100k→1M (tools/manifest_stress.py,
  docs/SCALING.md) — vs the native path's per-path driver work.
- Predicate pushdown: Spark hands the scan its filters
  (``DataSourceReader.pushFilters``); file skipping runs against
  manifest min/max stats (``prune_range``/``prune_isin``, the same
  vectorized kernels ``read_range``/``read_isin`` use) and against
  hive partition-dir values C-side. All filters are RETURNED to Spark
  (re-applied above the scan), so pruning is purely an optimization —
  a file wrongly kept costs I/O, never correctness.
- Executors read their file group with pyarrow (C++ parquet) and ship
  Arrow RecordBatches — the committed-schema conform (NULL-fill
  dropped/added columns, upcast widened types) happens per batch, so
  schema evolution behaves exactly like the native path.

Known trade-off (documented, deliberate): the Python Data Source API
in Spark 4.1 has no column-pruning hook, so this relation decodes all
committed columns. It is therefore the FULL-snapshot path — projected
and key/range-pruned reads keep using the native JVM scan over the
(already small) pruned path list, which column-prunes and
whole-stage-codegens. ``KeyedTable.read(engine="auto")`` routes on
live-file count: below the threshold the native scan's setup is
negligible and its decode is faster; above it, driver setup dominates
and the manifest relation wins (crossover measured in
tools/manifest_stress.py).
"""

from __future__ import annotations

import json
import math
import os
from typing import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)
from pyspark.sql.types import StructType

from hudi_glue_spark.table import manifest as M

#: Practical lexical top for one-sided string ranges: no real value
#: compares above it, so using it as the missing bound can only KEEP
#: files (min_s > hi is never true), never wrongly skip.
_S_HI = "\U0010ffff" * 8

FORMAT_NAME = "keyed_manifest"

#: hidden scan columns (opt-in via ``with_positions``): the source file
#: (manifest-relative name) and the 0-based physical row position within
#: it — the row identity deletion vectors address (table/dv.py), and the
#: same coordinates Spark's ``_metadata.row_index`` would assign.
POS_FILE_COL = "__file"
POS_COL = "__pos"


def _norm(v):
    """Filter literal → the manifest's stats-value domain (timestamps
    and dates to ISO strings whose lexical order is time order) —
    mirrors ``keyed_table._stat_value`` without importing it (cycle)."""
    import datetime

    if isinstance(v, datetime.datetime):
        return v.strftime("%Y-%m-%dT%H:%M:%S.%f")
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.decode("utf-8", "replace")
    return v


def _range_for(f: Filter):
    """(col, nlo, nhi) pruning range for a supported filter on a
    top-level column, else None. One-sided ranges use ±inf / ""-to-top
    sentinels; strictness is dropped (conservative for skipping)."""
    if isinstance(f, (EqualTo,)):
        col, v = f.attribute, _norm(f.value)
    elif isinstance(f, (GreaterThan, GreaterThanOrEqual)):
        col, v = f.attribute, _norm(f.value)
    elif isinstance(f, (LessThan, LessThanOrEqual)):
        col, v = f.attribute, _norm(f.value)
    else:
        return None
    if len(col) != 1 or v is None:
        return None
    name = col[0]
    if isinstance(f, EqualTo):
        return name, v, v
    if isinstance(f, (GreaterThan, GreaterThanOrEqual)):
        return (name, v, _S_HI) if isinstance(v, str) else (name, v, math.inf)
    return (name, "", v) if isinstance(v, str) else (name, -math.inf, v)


class _FileGroup(InputPartition):
    """One executor task's worth of live files (relative names)."""

    def __init__(self, files: tuple):
        self.value = files


class ManifestSnapshotReader(DataSourceReader):
    def __init__(self, options: dict, schema: StructType):
        self.root = options["path"]
        self.at = options.get("at") or None
        self.schema = schema
        self.partition_by: list[str] = json.loads(
            options.get("partition_by") or "[]"
        )
        self.target_bytes = int(
            options.get("target_partition_bytes", 128 * 1024 * 1024)
        )
        self.parallelism_hint = int(options.get("parallelism_hint", "32"))
        # explicit file subset (pruned reads route their kept list here
        # when DV masks must apply); empty/absent = whole snapshot
        self.files_subset: list[str] | None = (
            json.loads(options["files"]) if options.get("files") else None
        )
        # deletion-vector masks: rather than shipping an O(masked
        # files) {rel: blob} map through the plan, the flag tells each
        # task to derive the map from ITS snapshot's commit JSON
        # (small, shard-free parse; ``at`` is always pinned to an exact
        # commit id by the caller when masks exist, so a concurrent
        # commit between planning and execution cannot skew it)
        self.apply_dvs = options.get("apply_dvs") == "1"
        # the complement flag: plan ONLY the files carrying no deletion
        # vector (the hybrid read's clean half — KeyedTable.read unions
        # this with a masked scan of the dv'd files, so neither side
        # ships an O(live files) list through the plan)
        self.exclude_dvs = options.get("exclude_dvs") == "1"
        self.with_positions = options.get("with_positions") == "1"
        self._dv_map: dict[str, str] | None = None
        self._pushed: list[Filter] = []

    @property
    def dvs(self) -> dict[str, str]:
        if self._dv_map is None:
            if not self.apply_dvs:
                self._dv_map = {}
            else:
                man = M.read_manifest(self.root, self.at)
                self._dv_map = {
                    f: v[0] for f, v in ((man.dvs if man else {}) or {}).items()
                }
        return self._dv_map

    # -- planning (driver side) -------------------------------------------

    def pushFilters(self, filters: "list[Filter]") -> "Iterator[Filter]":
        """Record filters usable for manifest/partition pruning; return
        ALL of them (Spark re-applies above the scan), so pruning stays
        advisory and exactness never depends on it."""
        self._pushed = [
            f
            for f in filters
            if _range_for(f) is not None
            or (isinstance(f, In) and len(f.attribute) == 1)
        ]
        return filters

    def _partition_dir_mask(self, files_arr, f: Filter):
        """C-side mask over relative file names for an EqualTo/In filter
        on a partition column: a live file's path carries
        ``col=value/`` exactly when it holds that partition's rows.
        Only value types whose ``str()`` matches the hive dir encoding
        (int/str/date — what the write path's ``hive_dirname`` emits)
        participate; anything else keeps every file."""
        import datetime

        import pyarrow as pa
        import pyarrow.compute as pc

        name = f.attribute[0]
        values = [f.value] if isinstance(f, EqualTo) else list(f.value)
        mask = None
        for v in values:
            if v is None or not isinstance(
                v, (int, str, datetime.date)
            ) or isinstance(v, bool):
                return None  # unprunable value type: keep all
            seg = M.hive_dirname(name, v) + "/"
            m = pc.match_substring(files_arr, seg)
            mask = m if mask is None else pc.or_(mask, m)
        return mask

    def partitions(self) -> Sequence[InputPartition]:
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        man = M.read_manifest(self.root, self.at)
        if man is None:
            raise FileNotFoundError(f"no commits at {self.root}")

        # live files + recorded bytes, one columnar pass
        t = man.shard_table()
        if t is not None:
            sub = t.filter(pc.is_null(t["col"])).select(["file", "bytes"])
            files_arr = sub["file"]
            if isinstance(files_arr, pa.ChunkedArray):
                files_arr = files_arr.combine_chunks()
            bytes_arr = sub["bytes"].to_numpy(zero_copy_only=False)
        else:  # legacy inline manifest
            files_arr = man.files_arrow()
            fb = man.file_bytes
            bytes_arr = np.array(
                [fb.get(f) for f in files_arr.to_pylist()], dtype=object
            )

        # file skipping from pushed filters: stats ranges + partition dirs
        part_set = set(self.partition_by)
        keep_sets = []
        dir_mask = None
        for f in self._pushed:
            if isinstance(f, In):
                name = f.attribute[0]
                if name in part_set:
                    m = self._partition_dir_mask(files_arr, f)
                    if m is not None:
                        dir_mask = (
                            m if dir_mask is None else pc.and_(dir_mask, m)
                        )
                    continue
                vals = [_norm(v) for v in f.value if v is not None]
                if vals:
                    kept = man.prune_isin(name, vals)
                    if kept is not None:
                        keep_sets.append(set(kept))
                continue
            rng = _range_for(f)
            if rng is None:
                continue
            name, nlo, nhi = rng
            if name in part_set and isinstance(f, EqualTo):
                m = self._partition_dir_mask(files_arr, f)
                if m is not None:
                    dir_mask = m if dir_mask is None else pc.and_(dir_mask, m)
                continue
            kept = man.prune_range(name, nlo, nhi)
            if kept is not None:
                keep_sets.append(set(kept))

        if dir_mask is not None:
            sel = dir_mask.to_numpy(zero_copy_only=False).astype(bool)
        else:
            sel = np.ones(len(files_arr), dtype=bool)
        if self.exclude_dvs and man.dvs:
            sel &= ~(
                pc.is_in(
                    files_arr,
                    value_set=pa.array(sorted(man.dvs), type=pa.string()),
                )
                .to_numpy(zero_copy_only=False)
                .astype(bool)
            )
        if self.files_subset is not None:
            sel &= pc.is_in(
                files_arr,
                value_set=pa.array(
                    sorted(set(self.files_subset)), type=pa.string()
                ),
            ).to_numpy(zero_copy_only=False).astype(bool)
        if keep_sets:
            keep = set.intersection(*keep_sets)
            in_keep = pc.is_in(
                files_arr, value_set=pa.array(sorted(keep), type=pa.string())
            ).to_numpy(zero_copy_only=False).astype(bool)
            sel &= in_keep

        names = np.asarray(files_arr.to_pylist(), dtype=object)[sel]
        # files without a recorded size (legacy shards) get a nominal
        # 32 MB so bin-packing still spreads them
        sz = np.asarray(bytes_arr[sel], dtype="float64")
        sz[np.isnan(sz)] = 32 * 1024 * 1024
        sizes = sz.astype("int64")
        if len(names) == 0:
            return []
        # sort by name: commit-prefixed names under hive dirs group one
        # partition's files into contiguous runs → task-local locality
        order = np.argsort(names)
        names, sizes = names[order], sizes[order]
        total = int(sizes.sum())
        # enough groups to use the cluster, capped so tiny files don't
        # explode the task count; ≥1 file per group
        n_groups = max(
            1,
            min(
                len(names),
                max(
                    self.parallelism_hint,
                    math.ceil(total / max(1, self.target_bytes)),
                ),
            ),
        )
        bounds = np.searchsorted(
            np.cumsum(sizes),
            np.linspace(0, total, n_groups, endpoint=False)[1:],
            side="right",
        )
        groups = [
            tuple(chunk)
            for chunk in np.split(names, bounds)
            if len(chunk)
        ]
        return [_FileGroup(g) for g in groups]

    # -- execution (worker side) ------------------------------------------

    def read(self, partition: _FileGroup):
        """One pyarrow **dataset** scan per hive-partition run of the
        group's files — the multi-file read, schema conform (NULL-fill
        pre-evolution gaps, upcast widened types, drop removed
        columns), and batch assembly all happen C++-side; Python only
        attaches the per-run constant partition columns. ``use_threads``
        off: tasks are already the parallelism unit (32 concurrent
        python workers each spawning an arrow pool would
        oversubscribe).

        With deletion vectors (``dvs``) or position columns
        (``with_positions``) a file is scanned INDIVIDUALLY and
        sequentially so physical row positions are known per batch —
        the DV dead-mask is one bitmap slice + filter per batch
        (O(batch) numpy, no join), and ``__file``/``__pos`` attach as
        constants/arange. Files without a DV in a positions-free read
        keep the multi-file fast path."""
        import itertools

        import numpy as np
        import pyarrow as pa
        import pyarrow.dataset as pds

        from pyspark.sql.pandas.types import to_arrow_schema

        from hudi_glue_spark.table import dv as DVB

        # partitions() returning [] (every file pruned, or an empty
        # files subset) still schedules ONE task whose partition is
        # None — an empty scan, not an error
        if partition is None or not partition.value:
            return

        target = to_arrow_schema(self.schema)
        ddir = M.data_dir(self.root)
        part_cols = set(self.partition_by)
        meta_cols = (
            {POS_FILE_COL, POS_COL} if self.with_positions else set()
        )
        phys = pa.schema(
            [
                f
                for f in target
                if f.name not in part_cols and f.name not in meta_cols
            ]
        )

        def assemble(batch, pvals, rel, pos):
            n = batch.num_rows
            cols = []
            for field in target:
                if field.name == POS_FILE_COL:
                    cols.append(pa.array([rel] * n, type=pa.string()))
                elif field.name == POS_COL:
                    cols.append(pa.array(pos, type=pa.int64()))
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

        # files sort by name, so one partition dir forms a contiguous run
        for pdir, run in itertools.groupby(
            partition.value, key=lambda rel: os.path.dirname(rel)
        ):
            files = list(run)
            pvals: dict[str, str | None] = {}
            for seg in pdir.split("/") if pdir else []:
                col, _, raw = seg.partition("=")
                pvals[col] = (
                    None
                    if raw == "__HIVE_DEFAULT_PARTITION__"
                    else M.hive_unescape(raw)
                )
            plain = [
                rel
                for rel in files
                if not self.with_positions and rel not in self.dvs
            ]
            plain_set = set(plain)
            if plain:
                scan = pds.dataset(
                    [os.path.join(ddir, rel) for rel in plain],
                    format="parquet",
                    schema=phys,
                )
                for batch in scan.to_batches(use_threads=False):
                    yield assemble(batch, pvals, None, None)
            for rel in files:
                if rel in plain_set:
                    continue
                blob = (
                    DVB.read(self.root, self.dvs[rel])
                    if rel in self.dvs
                    else None
                )
                offset = 0
                scan = pds.dataset(
                    [os.path.join(ddir, rel)], format="parquet", schema=phys
                )
                for batch in scan.to_batches(use_threads=False):
                    n = batch.num_rows
                    pos = np.arange(offset, offset + n, dtype=np.int64)
                    if blob is not None:
                        dead = DVB.dead_mask(blob, offset, n)
                        offset += n
                        if dead.any():
                            keep = ~dead
                            batch = batch.filter(pa.array(keep))
                            pos = pos[keep]
                            if batch.num_rows == 0:
                                continue
                    else:
                        offset += n
                    yield assemble(
                        batch,
                        pvals,
                        rel,
                        pos if self.with_positions else None,
                    )


class ManifestSnapshotDataSource(DataSource):
    """``spark.read.format("keyed_manifest")`` — options: ``path``
    (table root), ``at`` (commit id, optional), ``schema_json``
    (committed schema), ``partition_by`` (JSON list)."""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self):
        return StructType.fromJson(json.loads(self.options["schema_json"]))

    def reader(self, schema: StructType) -> DataSourceReader:
        return ManifestSnapshotReader(dict(self.options), schema)


_PKG_ZIP: str | None = None


def _ship_package(spark) -> None:
    """Make ``hudi_glue_spark`` importable in Spark's python workers.

    The DataSource class is pickled BY REFERENCE: the planner worker
    (partitions()/pushFilters) and every read task must import this
    package. When the driver's cwd is the repo that works implicitly;
    for any other launch dir, ship the package source as a zip via the
    standard ``addPyFile`` mechanism (one small zip per process)."""
    global _PKG_ZIP
    import tempfile
    import zipfile

    import hudi_glue_spark

    if _PKG_ZIP is None:
        pkg_root = os.path.dirname(os.path.abspath(hudi_glue_spark.__file__))
        fd, zpath = tempfile.mkstemp(suffix=".zip", prefix="hgs_pkg_")
        os.close(fd)
        with zipfile.ZipFile(zpath, "w") as z:
            for dirpath, _dirs, files in os.walk(pkg_root):
                for fn in files:
                    if fn.endswith(".py"):
                        full = os.path.join(dirpath, fn)
                        z.write(
                            full,
                            os.path.relpath(full, os.path.dirname(pkg_root)),
                        )
        _PKG_ZIP = zpath
    try:
        spark.sparkContext.addPyFile(_PKG_ZIP)
    except Exception:
        # connect-style session (no SparkContext) or duplicate add —
        # fall back to the implicit-path case
        pass


import threading as _threading

# Created at import time — module import is atomic under the GIL, so
# every thread sees the SAME lock. (A lazy `if None: Lock()` here was
# itself racy: two threads could each observe None and mint distinct
# locks, defeating the double-checked lock below.)
_REG_LOCK = _threading.Lock()


def ensure_registered(spark) -> None:
    """Idempotently register the data source on this session.

    Thread-safe: concurrent writers (multi-writer OCC tests, service
    loops) can all take a masked read as their first relation use —
    the session flag alone raced, and Spark 4.1 raises DATA_SOURCE_
    ALREADY_EXISTS on the second register. Double-checked lock plus a
    tolerant catch (another PROCESS may also have registered)."""
    flag = "_hgs_manifest_ds_registered"
    if getattr(spark, flag, False):
        return
    with _REG_LOCK:
        if getattr(spark, flag, False):
            return
        _ship_package(spark)
        try:
            spark.dataSource.register(ManifestSnapshotDataSource)
        except Exception as e:  # noqa: BLE001
            if "already exists" not in str(e).lower():
                raise
        setattr(spark, flag, True)


def read_snapshot(
    spark,
    root: str,
    schema: StructType,
    partition_by: list[str] | None,
    at: str | None = None,
    files: list[str] | None = None,
    apply_dvs: bool = False,
    exclude_dvs: bool = False,
    with_positions: bool = False,
):
    """Build the manifest-relation DataFrame for a table snapshot.

    ``files`` restricts the scan to an explicit live-file subset (the
    pruned-read path when DV masks must apply); ``apply_dvs`` masks
    each file's deletion-vector dead rows worker-side, with the map
    derived from the snapshot's own commit JSON (``at`` must then be a
    pinned commit id — the caller resolves head-ness); ``exclude_dvs``
    plans only the files with NO mask (the hybrid read's clean half);
    ``with_positions`` appends ``__file``/``__pos`` columns (the row
    coordinates DV-writing DML needs)."""
    from pyspark.sql.types import LongType, StringType, StructField

    ensure_registered(spark)
    # Required for pushFilters to be honored; runtime-settable, and the
    # driver's session may not carry engine defaults (same pattern as
    # nanosAsLong in queries.table).
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    try:
        hint = spark.sparkContext.defaultParallelism
    except Exception:  # connect-style sessions: no SparkContext handle
        hint = 32
    if with_positions:
        schema = StructType(
            [
                *schema.fields,
                StructField(POS_FILE_COL, StringType(), False),
                StructField(POS_COL, LongType(), False),
            ]
        )
    rd = (
        spark.read.format(FORMAT_NAME)
        .schema(schema)
        .option("path", root)
        .option("at", at or "")
        .option("schema_json", schema.json())
        .option("partition_by", json.dumps(partition_by or []))
        .option("parallelism_hint", str(hint))
    )
    if files is not None:
        rd = rd.option("files", json.dumps(sorted(files)))
    if apply_dvs:
        rd = rd.option("apply_dvs", "1")
    if exclude_dvs:
        rd = rd.option("exclude_dvs", "1")
    if with_positions:
        rd = rd.option("with_positions", "1")
    return rd.load()
