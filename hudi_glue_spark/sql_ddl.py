"""SQL DDL front-end (VERDICT r13 "Next round" #3 / "What's missing"
#1): ``CREATE TABLE`` / ``CREATE TABLE … AS SELECT`` / ``DROP TABLE``
statements parsed by a RESTRICTED grammar and routed onto the
:class:`KeyedTable` constructor — the missing first statement of a
Hudi/Delta user's session (reference parity: the Glue jobs' table
config dict — table name, record key, precombine field, partition
path — glue/HudiJarGlueJob.py:36-40,80-81, which Hudi's SQL surface
spells ``CREATE TABLE … USING hudi TBLPROPERTIES (primaryKey=…,
preCombineField=…)``).

Same upstream constraint as DML (sql_dml.py): a PySpark-only engine
cannot register a DSv2 TableCatalog, so Catalyst never sees these
statements — they are parsed HERE, once, into constructor calls, and
the created handle is recorded in the caller's ``tables`` dict (the
session catalog stand-in shared with ``sql_dml`` / ``sql_read``).

Supported::

    CREATE TABLE [IF NOT EXISTS] <name> (<col> <type>, ...)
      USING keyed
      [PARTITIONED BY (p [, ...])]
      [LOCATION '<path>']
      TBLPROPERTIES ('primaryKey' = 'k[,k2]',
                     'preCombineField' = 'ts'
                     [, 'policy' = 'event_time_wins'|'arrival_wins']
                     [, 'keyScope' = 'global'|'partition'])

    CREATE TABLE <name> USING keyed [PARTITIONED BY …] [LOCATION …]
      TBLPROPERTIES (…) AS <query>          -- CTAS → bulk_insert

    DROP TABLE [IF EXISTS] <name> [PURGE]   -- PURGE deletes the files

    ALTER TABLE <name> ADD COLUMN[S] (c type, ...)   -- metadata-only
    ALTER TABLE <name> DROP COLUMN[S] c [, ...]      -- metadata-only

Mapping is 1:1 and refuses loudly outside it: ``USING`` anything but
``keyed`` (this engine has ONE table format), unknown TBLPROPERTIES
keys (a typo'd ``primarykey`` must not silently produce an unkeyed
table), a partition column absent from the declared schema, a column
list on CTAS (Spark itself refuses that shape), and any other DDL
verb (ALTER/CREATE VIEW/…) — schema changes go through the API's
evolution methods, not silent reinterpretation.

A plain CREATE commits an EMPTY zero-file snapshot carrying the
declared schema (:meth:`KeyedTable.create_empty` — O(1) metadata, the
CREATE twin of truncate), so ``exists()`` is immediately true, reads
return an empty frame of that schema, and the first ``INSERT INTO``
(sql_dml) lands as a trivially-all-inserts upsert. CTAS routes the
query result through ``bulk_insert(dedupe=True)``.
"""

from __future__ import annotations

import os
import re
import shutil

from pyspark.sql import SparkSession
from pyspark.sql.types import StructType

from hudi_glue_spark.table.keyed_table import KeyedTable

__all__ = ["sql_ddl", "SqlDdlError"]

_IDENT = r"[A-Za-z_][A-Za-z0-9_]*"

#: TBLPROPERTIES keys the grammar maps; anything else is refused.
_PROPS = {
    "primarykey": "key",
    "precombinefield": "precombine",
    "policy": "policy",
    "keyscope": "key_scope",
}


class SqlDdlError(ValueError):
    """Statement outside the restricted DDL grammar."""


def _strip(s: str) -> str:
    return re.sub(r"\s+", " ", s.strip().rstrip(";").strip())


def _split_top(s: str) -> list[str]:
    out, depth, cur, q = [], 0, [], None
    for ch in s:
        if q:
            cur.append(ch)
            if ch == q:
                q = None
            continue
        if ch in "'\"":
            q = ch
            cur.append(ch)
        elif ch == "(":
            depth += 1
            cur.append(ch)
        elif ch == ")":
            depth -= 1
            cur.append(ch)
        elif ch == "," and depth == 0:
            out.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur).strip())
    return [x for x in out if x]


def _parse_props(txt: str) -> dict:
    """'k'='v' pairs → constructor kwargs; unknown keys refused."""
    kw: dict = {}
    for item in _split_top(txt):
        m = re.match(
            r"^\s*['\"]?([A-Za-z_.]+)['\"]?\s*=\s*['\"]?([^'\"]*)['\"]?\s*$",
            item,
        )
        if not m:
            raise SqlDdlError(f"unparseable TBLPROPERTIES item {item!r}")
        k, v = m.group(1), m.group(2).strip()
        dest = _PROPS.get(k.lower().replace("_", ""))
        if dest is None:
            raise SqlDdlError(
                f"unsupported table property {k!r} (supported: "
                f"primaryKey, preCombineField, policy, keyScope)"
            )
        if dest in kw:
            raise SqlDdlError(f"duplicate table property {k!r}")
        kw[dest] = (
            [c.strip() for c in v.split(",")] if dest == "key" else v
        )
    if "key" not in kw:
        raise SqlDdlError("TBLPROPERTIES must set primaryKey")
    if "precombine" not in kw:
        raise SqlDdlError("TBLPROPERTIES must set preCombineField")
    return kw


def _take_parens(s: str) -> tuple[str, str]:
    """``s`` starts at '(' — return (inner text, remainder after the
    MATCHING ')'), respecting nesting and quotes (a regex here would
    stop at the first ')' inside ``decimal(10,2)``)."""
    assert s[0] == "("
    depth, q = 0, None
    for i, ch in enumerate(s):
        if q:
            if ch == q:
                q = None
        elif ch in "'\"":
            q = ch
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                return s[1:i], s[i + 1:].strip()
    raise SqlDdlError(f"unbalanced parentheses near {s[:40]!r}")


_CREATE_HEAD = re.compile(
    rf"^CREATE TABLE (IF NOT EXISTS )?({_IDENT})\s*", re.IGNORECASE
)
_CREATE_MID = re.compile(
    rf"^USING\s+({_IDENT})"
    rf"(?:\s+PARTITIONED BY\s*\(([^)]*)\))?"
    rf"(?:\s+LOCATION\s+'([^']*)')?"
    rf"\s+TBLPROPERTIES\s*",
    re.IGNORECASE,
)


def sql_ddl(
    spark: SparkSession,
    statement: str,
    tables: dict[str, KeyedTable],
    base_dir: str | None = None,
) -> KeyedTable | None:
    """Execute one restricted-grammar DDL statement. CREATE returns
    the new :class:`KeyedTable` (also recorded in ``tables`` under the
    statement's name); DROP returns None. ``base_dir`` roots tables
    whose CREATE omits LOCATION (``<base_dir>/<name>``); omitting both
    is refused. Raises :class:`SqlDdlError` (a ValueError) on anything
    the grammar cannot map 1:1."""
    stmt = _strip(statement)
    head = stmt.split(None, 1)[0].upper() if stmt else ""
    if head == "CREATE":
        return _create(spark, stmt, tables, base_dir)
    if head == "DROP":
        m = re.match(
            rf"^DROP TABLE (IF EXISTS )?({_IDENT})( PURGE)?$",
            stmt,
            re.IGNORECASE,
        )
        if not m:
            raise SqlDdlError(
                "unparseable DROP; supported: DROP TABLE [IF EXISTS] "
                "t [PURGE]"
            )
        if_exists, name, purge = m.groups()
        tbl = tables.pop(name, None) or tables.pop(name.lower(), None)
        if tbl is None:
            if if_exists:
                return None
            raise SqlDdlError(f"unknown table {name!r}")
        if base_dir:
            # retire any warehouse-dir pointer file so a later
            # catalog_open doesn't resurrect (or trip over) the name
            from hudi_glue_spark.catalog import _LINK_SUFFIX

            link = os.path.join(base_dir, name + _LINK_SUFFIX)
            if os.path.isfile(link):
                os.remove(link)
        if purge:
            shutil.rmtree(tbl.path, ignore_errors=True)
        return None
    if head == "ALTER":
        return _alter(stmt, tables)
    raise SqlDdlError(
        f"unsupported DDL {head!r}: sql_ddl handles CREATE TABLE "
        f"[AS SELECT], ALTER TABLE ADD/DROP COLUMN(S), and DROP "
        f"TABLE only"
    )


def _alter(stmt: str, tables: dict[str, KeyedTable]):
    """ALTER TABLE t ADD COLUMN[S] (c type, ...) | DROP COLUMN[S]
    c [, ...] — mapped onto the metadata-only evolution methods
    (add_columns / drop_columns: zero files rewritten at any size).
    RENAME and ALTER COLUMN TYPE are refused: the engine reads old
    files BY NAME (no Iceberg field ids), so either would need a full
    rewrite — an explicit refusal beats a silent one."""
    m = re.match(
        rf"^ALTER TABLE ({_IDENT})\s+(ADD|DROP|RENAME|ALTER)\s+"
        rf"COLUMNS?\s*(.*)$",
        stmt,
        re.IGNORECASE | re.DOTALL,
    )
    if not m:
        raise SqlDdlError(
            "unparseable ALTER; supported: ALTER TABLE t ADD COLUMN[S] "
            "(c type, ...) | DROP COLUMN[S] c [, ...]"
        )
    name, verb, rest = m.groups()
    tbl = tables.get(name) or tables.get(name.lower())
    if tbl is None:
        raise SqlDdlError(f"unknown table {name!r}")
    verb = verb.upper()
    if verb in ("RENAME", "ALTER"):
        raise SqlDdlError(
            f"ALTER TABLE ... {verb} COLUMN is not supported: old "
            f"files are read by column NAME, so a rename/retype needs "
            f"a rewrite — drop and add under a new name, or rewrite "
            f"through a query"
        )
    rest = rest.strip()
    if verb == "ADD":
        inner = rest
        if inner.startswith("("):
            inner, trailing = _take_parens(inner)
            if trailing:
                raise SqlDdlError(
                    f"unexpected text after column list: {trailing!r}"
                )
        cols: dict[str, str] = {}
        for item in _split_top(inner):
            cm = re.match(
                r"^(`[^`]+`|[A-Za-z_][A-Za-z0-9_]*)\s+(.+)$", item
            )
            if not cm:
                raise SqlDdlError(f"unparseable ADD COLUMN item {item!r}")
            cols[cm.group(1).strip("`")] = cm.group(2).strip()
        return tbl.add_columns(cols)
    # DROP COLUMN(S): bare names, optionally parenthesized
    inner = rest
    if inner.startswith("("):
        inner, trailing = _take_parens(inner)
        if trailing:
            raise SqlDdlError(
                f"unexpected text after column list: {trailing!r}"
            )
    names = [c.strip().strip("`") for c in _split_top(inner)]
    if not names or any(not n for n in names):
        raise SqlDdlError("DROP COLUMN needs column name(s)")
    return tbl.drop_columns(names)


def _create(
    spark: SparkSession,
    stmt: str,
    tables: dict[str, KeyedTable],
    base_dir: str | None,
) -> KeyedTable:
    _usage = (
        "unparseable CREATE; supported shape: CREATE TABLE "
        "[IF NOT EXISTS] t (col type, ...) USING keyed "
        "[PARTITIONED BY (p)] [LOCATION 'path'] "
        "TBLPROPERTIES ('primaryKey'='k', 'preCombineField'='ts') "
        "[AS query]"
    )
    m = _CREATE_HEAD.match(stmt)
    if not m:
        raise SqlDdlError(_usage)
    if_not_exists, name = m.groups()
    rest = stmt[m.end():].strip()
    cols_txt = None
    if rest.startswith("("):
        cols_txt, rest = _take_parens(rest)
    m2 = _CREATE_MID.match(rest)
    if not m2 or not rest[m2.end():].lstrip().startswith("("):
        raise SqlDdlError(_usage)
    using, part_txt, location = m2.groups()
    props_txt, rest = _take_parens(rest[m2.end():].lstrip())
    ctas_query = None
    if rest:
        am = re.match(r"^AS\s+(.+)$", rest, re.IGNORECASE | re.DOTALL)
        if not am:
            raise SqlDdlError(_usage)
        ctas_query = am.group(1)
    if using.lower() != "keyed":
        raise SqlDdlError(
            f"USING {using!r}: this engine has one table format — "
            f"USING keyed"
        )
    if cols_txt and ctas_query:
        raise SqlDdlError(
            "CREATE TABLE AS SELECT takes no column list — the "
            "query's schema is the table's (Spark refuses this "
            "shape too)"
        )
    if not cols_txt and not ctas_query:
        raise SqlDdlError(
            "CREATE TABLE needs a column list or AS <query>"
        )
    kw = _parse_props(props_txt)
    if part_txt:
        kw["partition_by"] = [
            c.strip().strip("`") for c in part_txt.split(",")
        ]
    path = location or (
        os.path.join(base_dir, name) if base_dir else None
    )
    if path is None:
        raise SqlDdlError(
            "no LOCATION in the statement and no base_dir passed — "
            "the engine stores tables at explicit paths"
        )
    existing = tables.get(name) or tables.get(name.lower())
    if existing is not None and existing.exists():
        if if_not_exists:
            return existing
        raise SqlDdlError(f"table {name!r} already exists")
    tbl = KeyedTable(path, **kw)
    if tbl.exists():
        if if_not_exists:
            tables[name] = tbl
            return tbl
        raise SqlDdlError(
            f"table data already exists at {path!r}"
        )
    if ctas_query:
        tbl.bulk_insert(spark.sql(ctas_query), dedupe=True)
    else:
        try:
            schema = StructType.fromDDL(cols_txt)
        except Exception as e:  # pragma: no cover - parse detail
            raise SqlDdlError(f"unparseable column list: {e}") from e
        tbl.create_empty(schema)
    tables[name] = tbl
    if location and base_dir:
        # explicit-LOCATION table in a warehouse session: record the
        # pointer file so catalog_open() finds the name later (the
        # metastore-entry stand-in; warehouse-rooted tables need none
        # — their directory IS the entry)
        from hudi_glue_spark.catalog import catalog_attach

        catalog_attach(base_dir, name, tbl)
    return tbl
