"""Commit-timeline manifests for :class:`KeyedTable`.

The reference delegates versioning to Hudi's ``.hoodie/`` timeline
(commits retained via ``KEEP_LATEST_COMMITS``, glue/HudiJarGlueJob.py:83).
Here a commit is one JSON sidecar under ``_commits/`` listing the table's
live data files; the latest manifest IS the snapshot. Readers trust only
the manifest (never directory listing), which is what makes the
non-transactional file writes safe: files land first, the manifest
rename publishes them atomically (write-manifest-last, SURVEY.md §7
risk register).

Filesystem access is driver-side ``os``/``shutil`` — manifest and file
counts are metadata-scale (thousands), not data-scale, exactly like
Hudi's driver-side timeline handling. Porting to an object store means
swapping this module's primitives for the Hadoop FileSystem API; the
layout and protocol stay the same.
"""

from __future__ import annotations

import json
import os
import tempfile
import time
from dataclasses import dataclass, field


@dataclass
class Manifest:
    commit_id: str
    op: str
    ts: str
    files: list[str]  # live data files, relative to <root>/data/
    schema_json: str  # Spark schema of the table at this commit
    stats: dict = field(default_factory=dict)
    #: per-file column statistics for read-side file skipping:
    #: {rel_file: {col: [min, max]}} (values JSON-normalized — see
    #: keyed_table._stat_value; timestamps as ISO strings, which
    #: compare correctly lexicographically)
    file_stats: dict = field(default_factory=dict)

    def to_json(self) -> str:
        return json.dumps(
            {
                "commit_id": self.commit_id,
                "op": self.op,
                "ts": self.ts,
                "files": self.files,
                "schema_json": self.schema_json,
                "stats": self.stats,
                "file_stats": self.file_stats,
            },
            indent=1,
        )

    @classmethod
    def from_json(cls, raw: str) -> "Manifest":
        d = json.loads(raw)
        return cls(
            commit_id=d["commit_id"],
            op=d["op"],
            ts=d["ts"],
            files=d["files"],
            schema_json=d["schema_json"],
            stats=d.get("stats", {}),
            file_stats=d.get("file_stats", {}),
        )


def commits_dir(root: str) -> str:
    return os.path.join(root, "_commits")


def data_dir(root: str) -> str:
    return os.path.join(root, "data")


def list_commit_ids(root: str) -> list[str]:
    cdir = commits_dir(root)
    if not os.path.isdir(cdir):
        return []
    return sorted(f[:-5] for f in os.listdir(cdir) if f.endswith(".json"))


def next_commit_id(root: str) -> str:
    ids = list_commit_ids(root)
    nxt = (int(ids[-1]) + 1) if ids else 1
    return f"{nxt:08d}"


def read_manifest(root: str, commit_id: str | None = None) -> Manifest | None:
    ids = list_commit_ids(root)
    if not ids:
        return None
    if commit_id is None:
        commit_id = ids[-1]
    elif commit_id not in ids:
        raise ValueError(f"unknown commit {commit_id!r}; have {ids}")
    with open(os.path.join(commits_dir(root), commit_id + ".json")) as f:
        return Manifest.from_json(f.read())


def write_manifest(root: str, manifest: Manifest) -> None:
    """Atomic publish with optimistic concurrency: write to a temp file,
    then ``os.link`` to the final name — link fails with EEXIST if a
    concurrent writer claimed the same commit id, so two writers can
    never both believe they published commit N (the loser retries with
    the next id)."""
    cdir = commits_dir(root)
    os.makedirs(cdir, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=cdir, suffix=".tmp")
    try:
        with os.fdopen(fd, "w") as f:
            f.write(manifest.to_json())
        dest = os.path.join(cdir, manifest.commit_id + ".json")
        try:
            os.link(tmp, dest)
        except FileExistsError as e:
            raise ConcurrentCommitError(
                f"commit {manifest.commit_id} already published at {root}"
            ) from e
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


class ConcurrentCommitError(RuntimeError):
    """Another writer published the same commit id first."""


def utc_now_iso() -> str:
    return time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())


# Hive's path-escaping rules (subset): these chars are %-encoded in
# partition directory names; Spark writes the same layout via partitionBy.
_HIVE_ESCAPE = set('"#%\'*/:=?\\{[]^\x7f') | {chr(c) for c in range(0x20)}


def hive_escape(value: str) -> str:
    return "".join(f"%{ord(c):02X}" if c in _HIVE_ESCAPE else c for c in value)


def hive_unescape(value: str) -> str:
    out, i = [], 0
    while i < len(value):
        if value[i] == "%" and i + 3 <= len(value):
            try:
                out.append(chr(int(value[i + 1 : i + 3], 16)))
                i += 3
                continue
            except ValueError:
                pass
        out.append(value[i])
        i += 1
    return "".join(out)


def hive_dirname(col: str, value) -> str:
    """Directory name Spark/Hive produce for one partition value."""
    if value is None:
        return f"{col}=__HIVE_DEFAULT_PARTITION__"
    if isinstance(value, bool):
        value = str(value).lower()
    return f"{col}={hive_escape(str(value))}"


def partition_of(rel_file: str) -> str | None:
    """Partition directory of a manifest-relative file path, or None."""
    head = os.path.dirname(rel_file)
    return head or None
