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
  commits stream nothing, and LAYOUT-ONLY commits (optimize /
  clustering / index — ``_SILENT_OPS``) stream nothing in EITHER
  mode: Hudi's incremental query likewise excludes compaction
  output, and re-emitting a rewrite would re-deliver the whole
  rewritten partition as fresh inserts. Consumers
  needing RETRACTIONS open the stream with ``mode="cdf"`` — see
  :func:`stream_changes` — where deletes/pre-images arrive too.
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
import struct
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
CHANGE_COL = "_change_type"

#: files per executor task (mask-free ones share a pyarrow dataset)
_FILES_PER_TASK = 16

#: ops that change LAYOUT, not logical content — BOTH modes stream
#: nothing for them (a compaction must not read as churn downstream,
#: and in rows mode re-emitting an optimize()'s rewritten files would
#: re-deliver up to the whole table as fresh inserts).
#: drop_columns is schema-only; index ops rewrite/cluster in place.
_SILENT_OPS = frozenset(
    {
        "optimize",
        "change_partitioning",
        "drop_columns",
        "index",
        "record_index",
        "record_index_compact",
        "drop_record_index",
        "column_index",
        "column_index_compact",
        "drop_column_index",
    }
)

#: rewrite ops that may carry a write-time change log in their commit
#: stats (KeyedTable._write_change_log). The gate matters: a rollback
#: restores the TARGET's stats verbatim — a recorded "change_log"
#: there describes the TARGET commit's delta, not the rollback's, so
#: only the op that actually wrote the log may be served from it.
_CHANGE_LOG_OPS = frozenset(
    {
        "upsert",
        "delete",
        "update_where",
        "delete_where",
        "merge_into",
        "insert_overwrite",
    }
)


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


#: exact-CDF gate for CoW rewrites: a rewrite commit touching at most
#: this many files AND this many bytes (sum of the added+removed
#: files' on-disk sizes) streams its EXACT row-level delta — a
#: full-row multiset diff computed in ONE executor task — instead of
#: the coarse whole-file delete/insert pairs. Above either bound the
#: coarse contract stays (it nets correct; an exact diff of a
#: terabyte rewrite would need a shuffle the source can't express).
CDF_EXACT_REWRITE_MAX_FILES = 32
CDF_EXACT_REWRITE_MAX_BYTES = 32 * 1024 * 1024


class _CommitSlice(InputPartition):
    """One task: (commit id, entries). Each entry is a 4-tuple
    ``(kind, rel, a, b)``:

    - ``("add", rel, own_dv|None, None)`` — rows of a file the commit
      added, masked by the commit's OWN dv → inserts (post-images)
    - ``("remove", rel, parent_dv|None, None)`` — the logically-live
      rows of a file the commit removed → deletes (pre-images;
      mode="cdf" only)
    - ``("dvdiff", rel, old_dv|None, new_dv|None)`` — a carried file
      whose mask changed: newly-dead positions → deletes, newly-live
      (rollback resurrection) → inserts (mode="cdf" only)
    - ``("rewrite", adds, removes, None)`` — a SMALL CoW rewrite
      under the exact-CDF gate: ``adds``/``removes`` are tuples of
      ``(rel, dv|None)`` (own dv / parent dv); the task computes the
      full-row multiset diff and emits only truly-changed rows
      (mode="cdf" only; always a slice of its own)
    - ``("chlog", token, None, None)`` — the commit carries a
      WRITE-TIME change log (change_log tables): the exact logical
      delta already sits under ``_changes/<token>/`` as full rows +
      ``_change_type``; the task reads it verbatim and stamps the
      commit id. Any rewrite size, O(delta) I/O (mode="cdf" only)
    """

    def __init__(self, cid: str, entries: tuple):
        self.value = (cid, entries)


class TableChangesStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict, schema: StructType):
        self.root = options["path"]
        self.schema = schema
        self.partition_by: list[str] = json.loads(
            options.get("partition_by") or "[]"
        )
        self.starting = options.get("starting", "earliest")
        self.mode = options.get("mode", "rows")
        # options, not module globals: the planner runs in Spark's
        # Python DS worker process, where a caller's monkeypatch/
        # assignment never lands — only the serialized options do
        self.exact_rewrite_max_files = int(
            options.get(
                "exact_rewrite_max_files", CDF_EXACT_REWRITE_MAX_FILES
            )
        )
        self.exact_rewrite_max_bytes = int(
            options.get(
                "exact_rewrite_max_bytes", CDF_EXACT_REWRITE_MAX_BYTES
            )
        )

    # -- offsets (driver, metadata-only) ----------------------------------
    #
    # Both offset methods are PURE functions of the commit log. This is
    # load-bearing, not style: Spark's Python DS runtime may invoke the
    # planner methods on SEVERAL reader instances/workers over a
    # query's life, so instance state does not reliably persist between
    # calls. A stateful rate limit (max-commits-per-trigger via a
    # remembered anchor) was prototyped and produced non-monotonic
    # offsets and re-delivered batches under exactly that instance
    # churn — until the API exposes the checkpointed offset (or a
    # ReadLimit hook), per-trigger caps are inexpressible here
    # (SURVEY §9d#5).

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
        cdf = self.mode == "cdf"
        for cid in take:
            cur = M.read_manifest(self.root, cid)
            if cur is None:
                # a clean() raced between listing and reading: silently
                # skipping would make the NEXT diff re-emit a whole
                # snapshot (duplicate deltas downstream) — refuse like
                # any other retention breach; the consumer restarts
                raise ValueError(
                    f"commit {cid} aged out of the log mid-plan "
                    f"(clean() raced the stream) — restart from a "
                    f"live commit or 'earliest'"
                )
            if cur.op in _SILENT_OPS:
                # Layout-only: logical content unchanged. Applies in
                # BOTH modes — in rows mode an optimize()/
                # change_partitioning() adds rewritten files, and
                # re-emitting them would re-deliver up to the whole
                # table to every consumer as fresh inserts (Hudi's
                # incremental query likewise excludes clustering/
                # compaction output by record commit time).
                prev = cur
                continue
            cdvs = cur.dvs or {}
            entries: list[tuple] = []
            added = _added_files(self.root, prev, cur)
            added_set = set(added)
            removed: list[str] = []
            pdvs = (prev.dvs or {}) if prev is not None else {}
            if cdf and prev is not None:
                removed = _added_files(self.root, cur, prev)  # inverse
            chlog = (
                ((cur.stats or {}).get("change_log") or {}).get("ref")
                if cdf and cur.op in _CHANGE_LOG_OPS
                else None
            )
            ch_files: list[str] | None = None
            if chlog is not None and prev is not None:
                # list the delta's parquet files NOW: (a) one chlog
                # entry per _FILES_PER_TASK group parallelizes the
                # delta read like every other slice kind — near the
                # coarse-volume cap a logged delta approaches ~1.6×
                # the rewrite size, a straggler as a single task
                # (ADVICE r11); (b) a dir folded away by change-log
                # retention (fold_change_logs) surfaces here as
                # missing, and the commit honestly falls through to
                # the exact-rewrite gate / coarse path below.
                cdir = os.path.join(self.root, "_changes", chlog)
                try:
                    ch_files = sorted(
                        fn
                        for fn in os.listdir(cdir)
                        if fn.endswith(".parquet")
                    )
                except OSError:
                    ch_files = None  # folded: general path below
            if ch_files is not None:
                # write-time change log (change_log tables): the op
                # recorded its EXACT logical delta under
                # _changes/<ref> at commit time — serve it directly,
                # ANY rewrite size, O(delta) read, no diffing. The
                # dvdiff entries below still cover carried-mask
                # changes (rewrite ops don't touch carried masks, but
                # the generic classification stays uniform). An empty
                # delta (op changed nothing) plans no slice at all.
                for i in range(0, len(ch_files), _FILES_PER_TASK):
                    out.append(
                        _CommitSlice(
                            cid,
                            (
                                (
                                    "chlog",
                                    chlog,
                                    tuple(
                                        ch_files[i : i + _FILES_PER_TASK]
                                    ),
                                    None,
                                ),
                            ),
                        )
                    )
            elif (
                cdf
                and added
                and removed
                and self._exact_rewrite_ok(added, removed)
            ):
                # exact row-level CDF for a small CoW rewrite: one
                # task multiset-diffs the two sides; untouched rows
                # (identical on both) emit NOTHING, so a 1-row upsert
                # into a 500k-row partition streams 1 delete + 1
                # insert instead of 1M coarse rows
                out.append(
                    _CommitSlice(
                        cid,
                        (
                            (
                                "rewrite",
                                tuple(
                                    (
                                        rel,
                                        cdvs[rel][0]
                                        if rel in cdvs
                                        else None,
                                    )
                                    for rel in added
                                ),
                                tuple(
                                    (
                                        rel,
                                        pdvs[rel][0]
                                        if rel in pdvs
                                        else None,
                                    )
                                    for rel in removed
                                ),
                                None,
                            ),
                        ),
                    )
                )
            else:
                entries += [
                    (
                        "add",
                        rel,
                        cdvs[rel][0] if rel in cdvs else None,
                        None,
                    )
                    for rel in added
                ]
                entries += [
                    (
                        "remove",
                        rel,
                        pdvs[rel][0] if rel in pdvs else None,
                        None,
                    )
                    for rel in removed
                ]
            if cdf and prev is not None:
                carried_changed = (
                    (set(pdvs) | set(cdvs)) - added_set - set(removed)
                )
                entries += [
                    (
                        "dvdiff",
                        rel,
                        pdvs[rel][0] if rel in pdvs else None,
                        cdvs[rel][0] if rel in cdvs else None,
                    )
                    for rel in sorted(carried_changed)
                    if pdvs.get(rel) != cdvs.get(rel)
                ]
            for i in range(0, len(entries), _FILES_PER_TASK):
                out.append(
                    _CommitSlice(
                        cid, tuple(entries[i : i + _FILES_PER_TASK])
                    )
                )
            prev = cur
        return out

    def _exact_rewrite_ok(
        self, added: list[str], removed: list[str]
    ) -> bool:
        """Gate for the exact row-level CDF on a CoW rewrite commit:
        file-count and on-disk-byte caps (the diff materializes both
        sides in one task). Nested and binary schemas qualify since
        r11 — row keys are per-column canonical tuples, not string
        casts — so embeddings/multimodal tables get exact rewrite
        deltas too. Any stat failure → coarse — the gate is an
        optimization, never load-bearing."""
        names = [*added, *removed]
        if len(names) > self.exact_rewrite_max_files:
            return False
        ddir = M.data_dir(self.root)
        total = 0
        for rel in names:
            try:
                total += os.path.getsize(os.path.join(ddir, rel))
            except OSError:
                return False
            if total > self.exact_rewrite_max_bytes:
                return False
        return True

    def commit(self, end: dict) -> None:  # offsets live in the checkpoint
        pass

    # -- rows (executor) ---------------------------------------------------

    def read(self, partition: _CommitSlice):
        """Same decode discipline as the manifest relation: one C++
        pyarrow dataset per hive-dir run for mask-free adds, per-file
        sequential scan with a bitmap slice per batch where a mask
        applies, schema conform (NULL-fill / upcast) C++-side, and the
        constant ``_commit`` / ``_change_type`` / partition columns
        attached per batch. ``dvdiff`` entries scan a carried file once
        and split each batch into newly-dead rows (deletes) and
        newly-live rows (inserts — rollback resurrections)."""
        import itertools

        import numpy as np
        import pyarrow as pa
        import pyarrow.dataset as pds

        from pyspark.sql.pandas.types import to_arrow_schema

        from hudi_glue_spark.table import dv as DVB

        if partition is None or not partition.value[1]:
            return
        cid, entries = partition.value
        target = to_arrow_schema(self.schema)
        ddir = M.data_dir(self.root)
        part_cols = set(self.partition_by)
        phys = pa.schema(
            [
                f
                for f in target
                if f.name not in part_cols
                and f.name not in (COMMIT_COL, CHANGE_COL)
            ]
        )

        def pvals_of(rel):
            pdir = os.path.dirname(rel)
            pv: dict[str, str | None] = {}
            for seg in pdir.split("/") if pdir else []:
                col, _, raw = seg.partition("=")
                pv[col] = (
                    None
                    if raw == "__HIVE_DEFAULT_PARTITION__"
                    else M.hive_unescape(raw)
                )
            return pv

        def assemble(batch, pvals, change):
            n = batch.num_rows
            cols = []
            for field in target:
                if field.name == COMMIT_COL:
                    cols.append(pa.array([cid] * n, type=pa.string()))
                elif field.name == CHANGE_COL:
                    cols.append(pa.array([change] * n, type=pa.string()))
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

        def masked_scan(rel, dv_name, change):
            """One file's logically-live rows under ``dv_name``."""
            pv = pvals_of(rel)
            blob = DVB.read(self.root, dv_name) if dv_name else None
            offset = 0
            scan = pds.dataset(
                [os.path.join(ddir, rel)], format="parquet", schema=phys
            )
            for batch in scan.to_batches(use_threads=False):
                n = batch.num_rows
                if blob is not None:
                    dead = DVB.dead_mask(blob, offset, n)
                    offset += n
                    if dead.any():
                        batch = batch.filter(pa.array(~dead))
                        if batch.num_rows == 0:
                            continue
                else:
                    offset += n
                yield assemble(batch, pv, change)

        # mask-free adds fast path: one multi-file dataset per dir run
        plain_adds = [
            e[1] for e in entries if e[0] == "add" and e[2] is None
        ]
        for pdir, run in itertools.groupby(
            plain_adds, key=lambda rel: os.path.dirname(rel)
        ):
            grp = list(run)
            pv = pvals_of(grp[0])
            scan = pds.dataset(
                [os.path.join(ddir, rel) for rel in grp],
                format="parquet",
                schema=phys,
            )
            for batch in scan.to_batches(use_threads=False):
                yield assemble(batch, pv, "insert")
        def rewrite_diff(adds, removes):
            """EXACT row-level CDF for a small CoW rewrite: both sides
            materialize in this task (bounded by the planner's byte
            gate), each row becomes a TUPLE of per-column canonical
            values — tuples never concatenate across columns, so no
            separator ambiguity exists (a '\\x01'-joined flat string
            was provably ambiguous for data containing the separator;
            ADVICE r10) — and a multiset diff emits only rows present
            on one side. An UNTOUCHED row of the rewritten partition
            is identical in both file sets and emits nothing; a
            changed row emits its pre-image delete and post-image
            insert. Scalar columns use a vectorized validity-tagged
            string cast (injective per column: 'v'+cast vs 'n');
            nested (list/struct/map) and binary columns — embeddings
            and multimodal payloads — canonicalize per value into
            hashable tuples, with floats keyed by their IEEE bits so
            NaN compares stable and ±0.0 stay distinct."""
            import pyarrow.compute as pc

            def side(side_entries, change):
                batches = [
                    bt
                    for rel, dvn in side_entries
                    for bt in masked_scan(rel, dvn, change)
                ]
                if not batches:
                    return pa.Table.from_batches([], schema=target)
                return pa.Table.from_batches(batches)

            old_t = side(removes, "delete")
            new_t = side(adds, "insert")
            key_cols = [
                n
                for n in target.names
                if n not in (COMMIT_COL, CHANGE_COL)
            ]

            def canon(v):
                # hashable, injective-per-arrow-type canonical form
                # for values of nested/binary columns (to_pylist
                # surfaces: struct→dict, map→[(k,v)...], list→list)
                if isinstance(v, float):
                    return ("f", struct.pack("<d", v))
                if isinstance(v, list):
                    if v and isinstance(v[0], tuple):
                        # map: entries surface in ENTRY order, but map
                        # equality is order-insensitive — sort by
                        # canonical key (keys are unique, so the key
                        # alone decides; ADVICE r11) so a rewrite plan
                        # that reorders entries of an untouched row
                        # can't fabricate a delete+insert pair
                        ents = [(canon(k), canon(x)) for k, x in v]
                        return (
                            "m",
                            tuple(sorted(ents, key=lambda e: e[0])),
                        )
                    return ("l", tuple(canon(x) for x in v))
                if isinstance(v, dict):
                    return (
                        "s",
                        tuple((k, canon(x)) for k, x in v.items()),
                    )
                if isinstance(v, tuple):
                    return ("t", tuple(canon(x) for x in v))
                return v

            def col_key(col):
                t = col.type
                if not (
                    pa.types.is_nested(t)
                    or pa.types.is_binary(t)
                    or pa.types.is_large_binary(t)
                    or pa.types.is_fixed_size_binary(t)
                ):
                    try:
                        s = pc.fill_null(pc.cast(col, pa.string()), "")
                        tag = pc.if_else(
                            pc.is_valid(col),
                            pa.scalar("v"),
                            pa.scalar("n"),
                        )
                        return pc.binary_join_element_wise(
                            tag, s, ""
                        ).to_pylist()
                    except pa.ArrowNotImplementedError:
                        pass  # exotic scalar: canonical path below
                return [canon(v) for v in col.to_pylist()]

            def keys_of(t):
                if t.num_rows == 0:
                    return []
                return list(
                    zip(*(col_key(t.column(n)) for n in key_cols))
                )

            from collections import Counter

            old_k, new_k = keys_of(old_t), keys_of(new_t)
            cnt = Counter(new_k)
            del_mask = []
            for kk in old_k:
                if cnt.get(kk, 0) > 0:
                    cnt[kk] -= 1
                    del_mask.append(False)
                else:
                    del_mask.append(True)
            ins_mask = []
            for kk in new_k:  # counts left = truly-new instances
                if cnt.get(kk, 0) > 0:
                    cnt[kk] -= 1
                    ins_mask.append(True)
                else:
                    ins_mask.append(False)
            if any(del_mask):
                yield from old_t.filter(pa.array(del_mask)).to_batches()
            if any(ins_mask):
                yield from new_t.filter(pa.array(ins_mask)).to_batches()

        for kind, rel, a, b in entries:
            if kind == "chlog":
                # write-time change log: _changes/<rel> holds the
                # commit's exact logical delta as full rows +
                # _change_type, written by the op itself — read it
                # verbatim, stamp the commit id. O(delta) I/O for any
                # rewrite size; no diffing here.
                cdir = os.path.join(self.root, "_changes", rel)
                ch_phys = pa.schema(
                    [f for f in target if f.name != COMMIT_COL]
                )
                scan = pds.dataset(
                    [os.path.join(cdir, fn) for fn in a]
                    if a
                    else cdir,
                    format="parquet",
                    schema=ch_phys,
                )
                for batch in scan.to_batches(use_threads=False):
                    n = batch.num_rows
                    cols = [
                        pa.array([cid] * n, type=pa.string())
                        if field.name == COMMIT_COL
                        else batch.column(field.name)
                        for field in target
                    ]
                    yield pa.RecordBatch.from_arrays(
                        cols, schema=target
                    )
            elif kind == "rewrite":
                yield from rewrite_diff(rel, a)  # rel=adds, a=removes
            elif kind == "add" and a is not None:
                yield from masked_scan(rel, a, "insert")
            elif kind == "remove":
                yield from masked_scan(rel, a, "delete")
            elif kind == "dvdiff":
                pv = pvals_of(rel)
                old = DVB.read(self.root, a) if a else None
                new = DVB.read(self.root, b) if b else None
                offset = 0
                scan = pds.dataset(
                    [os.path.join(ddir, rel)],
                    format="parquet",
                    schema=phys,
                )
                for batch in scan.to_batches(use_threads=False):
                    n = batch.num_rows
                    od = (
                        DVB.dead_mask(old, offset, n)
                        if old is not None
                        else np.zeros(n, dtype=bool)
                    )
                    nd = (
                        DVB.dead_mask(new, offset, n)
                        if new is not None
                        else np.zeros(n, dtype=bool)
                    )
                    offset += n
                    newly_dead = nd & ~od
                    newly_live = od & ~nd
                    if newly_dead.any():
                        yield assemble(
                            batch.filter(pa.array(newly_dead)),
                            pv,
                            "delete",
                        )
                    if newly_live.any():
                        yield assemble(
                            batch.filter(pa.array(newly_live)),
                            pv,
                            "insert",
                        )


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


import threading as _threading

# Import-time lock: atomic under the GIL, so every thread shares it
# (a lazy `if None: Lock()` could mint two distinct locks).
_REG_LOCK = _threading.Lock()


def ensure_registered(spark) -> None:
    """Idempotent, thread-safe registration — same double-checked-lock
    discipline as the manifest relation (Spark 4.1 raises
    DATA_SOURCE_ALREADY_EXISTS on a duplicate register)."""
    from hudi_glue_spark.sources.manifest_relation import _ship_package

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


def stream_changes(
    spark,
    table,
    starting: str = "earliest",
    mode: str = "rows",
    exact_rewrite_max_files: int | None = None,
    exact_rewrite_max_bytes: int | None = None,
):
    """Open the table's commit log as a streaming DataFrame.

    ``mode="rows"`` (default, Hudi incremental parity): committed
    schema + ``_commit``; each micro-batch carries the rows the
    newly-visible commits ADDED. ``mode="cdf"`` (Delta CDF / Hudi
    change-query parity): additionally ``_change_type``
    ('insert'|'delete'), and every commit streams its RETRACTIONS too
    — newly DV-masked positions and removed files arrive as deletes
    (pre-images), added files as inserts (post-images), so a
    downstream aggregate maintains itself by +insert/−delete alone.
    CDF precision: EXACT row-level for MoR/DV commits (an
    update_where_dv streams one delete + one insert per changed row);
    COARSE-but-correct for CoW rewrites (the rewritten partition's old
    rows all delete, new rows all insert — nets to the true delta);
    SILENT for layout-only ops (optimize/clustering/index commits —
    compaction must not read as churn); rollbacks stream the inverse
    delta, including resurrection inserts for unmasked positions."""
    if mode not in ("rows", "cdf"):
        raise ValueError(f"unknown mode {mode!r} (rows|cdf)")
    man = M.read_manifest(table.path)
    if man is None:
        raise FileNotFoundError(f"no commits at {table.path}")
    ensure_registered(spark)
    schema = StructType.fromJson(json.loads(man.schema_json))
    extra = [StructField(COMMIT_COL, StringType(), False)]
    if mode == "cdf":
        extra.append(StructField(CHANGE_COL, StringType(), False))
    out = StructType([*schema.fields, *extra])
    reader = (
        spark.readStream.format(FORMAT_NAME)
        .option("path", table.path)
        .option("schema_json", json.dumps(out.jsonValue()))
        .option(
            "partition_by", json.dumps(list(table.partition_by or []))
        )
        .option("starting", starting)
        .option("mode", mode)
    )
    if exact_rewrite_max_files is not None:
        reader = reader.option(
            "exact_rewrite_max_files", str(exact_rewrite_max_files)
        )
    if exact_rewrite_max_bytes is not None:
        reader = reader.option(
            "exact_rewrite_max_bytes", str(exact_rewrite_max_bytes)
        )
    return reader.load()
