"""Persistent name→path catalog (VERDICT r14 "What's missing" #1 /
"Next round" #2): make table NAMES durable across sessions.

Table METADATA was always durable — ``_meta.json`` at the table path,
reopened by :meth:`KeyedTable.load` — but the name→path mapping lived
only in the caller's ``tables`` dict, so a fresh session could not
``sql_read(spark, "SELECT * FROM t", tables)`` without reconstructing
it by hand. The reference makes names durable through Hive/Glue
metastore sync (glue/HudiJarGlueJob.py:80-82 — hive_sync.database +
hive_sync.table); this engine has no metastore, so the catalog IS the
warehouse directory: ``sql_ddl``'s CREATE already defaults LOCATION
to ``<base_dir>/<name>`` (sql_ddl.py), making the directory listing
the authoritative name list. :func:`catalog_open` rebuilds the
``tables`` dict any SQL front-end accepts from that convention — one
``os.listdir`` + one ``_meta.json`` read per table, O(tables) driver
work, no data touched, no Spark job.

Scope/refusals:
- A table CREATEd with an explicit LOCATION outside the warehouse dir
  is NOT discoverable (nothing under ``base_dir`` points at it) — use
  :func:`catalog_attach` to record it, which writes a small
  ``<name>._link.json`` pointer file into the warehouse dir so later
  ``catalog_open`` calls see it too.
- Two directory entries whose names collide case-insensitively are
  refused loudly (the SQL front-ends resolve names case-insensitively,
  so ``T`` and ``t`` would be ambiguous).
- Merging into a caller-provided dict refuses when a discovered name
  is already bound to a DIFFERENT path (silently re-pointing a handle
  the caller is using would be a correctness hazard); the same path
  keeps the caller's handle (with its caches) untouched.
"""

from __future__ import annotations

import json
import os

from hudi_glue_spark.table.keyed_table import KeyedTable

__all__ = ["catalog_open", "catalog_attach", "CatalogError"]

_LINK_SUFFIX = "._link.json"


class CatalogError(ValueError):
    """Warehouse-directory catalog cannot be resolved unambiguously."""


def _discover(base_dir: str) -> dict[str, str]:
    """name → table path for every table the warehouse dir records:
    subdirectories carrying ``_meta.json`` (the CREATE/first-commit
    convention) plus ``<name>._link.json`` pointer files (explicit
    LOCATIONs attached via :func:`catalog_attach`)."""
    if not os.path.isdir(base_dir):
        raise CatalogError(f"warehouse dir {base_dir!r} does not exist")
    found: dict[str, str] = {}
    for entry in sorted(os.listdir(base_dir)):
        full = os.path.join(base_dir, entry)
        if entry.endswith(_LINK_SUFFIX) and os.path.isfile(full):
            name = entry[: -len(_LINK_SUFFIX)]
            with open(full) as f:
                target = json.load(f)["path"]
            if not os.path.isfile(os.path.join(target, "_meta.json")):
                raise CatalogError(
                    f"catalog link {entry!r} points at {target!r}, "
                    f"which holds no table (_meta.json missing) — "
                    f"remove the stale link or restore the table"
                )
            found[name] = target
        elif os.path.isfile(os.path.join(full, "_meta.json")):
            found[entry] = full
    lowered: dict[str, str] = {}
    for name in found:
        prior = lowered.get(name.lower())
        if prior is not None:
            raise CatalogError(
                f"warehouse dir holds case-colliding table names "
                f"{prior!r} and {name!r} — SQL resolution is case-"
                f"insensitive, so the catalog refuses the ambiguity"
            )
        lowered[name.lower()] = name
    return found


def catalog_open(
    base_dir: str,
    tables: dict[str, KeyedTable] | None = None,
) -> dict[str, KeyedTable]:
    """Open the warehouse-directory catalog: return a ``tables`` dict
    (name → reopened :class:`KeyedTable`) usable directly by
    ``sql_read`` / ``sql_dml`` / ``sql_ddl`` — the fresh-session
    entry point that needs NO paths beyond the warehouse root.

    Pass an existing ``tables`` dict to merge into it (the session
    that just CREATEd tables and wants late arrivals discovered):
    names already bound to the SAME path keep the caller's live
    handle; a name bound to a DIFFERENT path is refused."""
    out = dict(tables) if tables is not None else {}
    lowered = {k.lower(): (k, t) for k, t in out.items()}
    for name, path in _discover(base_dir).items():
        held = lowered.get(name.lower())
        if held is not None:
            held_name, held_tbl = held
            if os.path.realpath(held_tbl.path) != os.path.realpath(path):
                raise CatalogError(
                    f"name collision: {held_name!r} is already bound "
                    f"to {held_tbl.path!r} but the warehouse dir "
                    f"records {path!r} — rename one table or open a "
                    f"separate catalog"
                )
            continue  # same table: keep the caller's handle + caches
        out[name] = KeyedTable.load(path)
    return out


def catalog_attach(
    base_dir: str, name: str, table: KeyedTable
) -> None:
    """Record an explicit-LOCATION table in the warehouse dir so
    future :func:`catalog_open` calls discover it by ``name`` — the
    pointer-file stand-in for a metastore entry. Refuses a name the
    directory already resolves (to a different path)."""
    existing = _discover(base_dir) if os.path.isdir(base_dir) else {}
    bound = {k.lower(): (k, v) for k, v in existing.items()}
    hit = bound.get(name.lower())
    if hit is not None:
        if os.path.realpath(hit[1]) == os.path.realpath(table.path):
            return  # idempotent re-attach
        raise CatalogError(
            f"catalog already resolves {hit[0]!r} to {hit[1]!r}; "
            f"cannot attach {name!r} at {table.path!r}"
        )
    os.makedirs(base_dir, exist_ok=True)
    link = os.path.join(base_dir, name + _LINK_SUFFIX)
    tmp = link + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"path": os.path.abspath(table.path)}, f)
    os.replace(tmp, link)
