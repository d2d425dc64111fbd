"""SQL read front-end with TIME TRAVEL (VERDICT r13 "Next round" #2).

``SELECT … FROM t VERSION AS OF <commit> / TIMESTAMP AS OF <ts>``
routed onto :meth:`KeyedTable.read`'s ``at=`` / ``as_of=`` arguments —
the SQL parity of the API's time travel (Delta's ``VERSION AS OF`` /
Hudi's ``as.of.instant``; reference parity: the snapshot reads in
glue/MockCuratedGlueJob.py:17-24 always read latest, Hudi exposes the
rest through SQL options this front-end re-creates).

A PySpark-only engine cannot hook Catalyst's time-travel syntax — the
``VERSION AS OF`` production resolves through a DSv2 TableCatalog,
which the Python DataSource API does not expose (same upstream gap as
DML, re-checked on pyspark 4.1.2) — so the statement is rewritten
HERE, once, before ``spark.sql``: each managed-table reference
(optionally carrying a time-travel clause) is replaced by a named
DataFrame parameter bound to the right snapshot, and the rewritten
query is executed with ``spark.sql(stmt, **params)`` (the supported
DataFrame-parameter form, public since Spark 3.4). The table's own
name (or the reference's explicit alias) is preserved as the alias,
so qualified column references keep resolving.

Supported table-reference shapes after ``FROM`` / ``JOIN``::

    t
    t [AS] a
    t VERSION   AS OF '<commit-id>'   -- also bare, also ordinal int
    t TIMESTAMP AS OF '<ISO-8601>'    -- wall-clock, via commit_as_of
    (each optionally followed by [AS] alias)

``VERSION AS OF`` accepts a commit id (the engine's native version
handle) or an ORDINAL integer — ``0`` is the first retained commit,
``-1`` the head — mirroring Delta's integer versions for users who
think in ordinals. Unknown versions/timestamps raise the underlying
read()'s error verbatim. Time travel on a table NOT in ``tables``
is refused loudly (this front-end cannot snapshot a table it does
not manage); unmanaged plain references pass through untouched so
ordinary temp views keep working inside the same statement.

Restrictions (refused or documented, never silently misread):
comma-style joins put only the FIRST table through the rewriter —
use explicit JOIN syntax; literal ``{``/``}`` in a statement that
also references a managed table is refused (they would collide with
the parameter formatter).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from hudi_glue_spark.table.keyed_table import KeyedTable

__all__ = ["sql_read", "SqlReadError"]

_IDENT = r"[A-Za-z_][A-Za-z0-9_]*"

#: words that may follow a table reference but can never be its alias
_NOT_ALIAS = frozenset(
    """where group order having limit union intersect except join inner
    left right full cross on using natural semi anti lateral window
    qualify values select offset sort distribute cluster when then else
    end and or not as version timestamp""".split()
)

_KW_ALT = "|".join(sorted(_NOT_ALIAS))

_REF = re.compile(
    # negative lookahead keeps a following keyword (WHERE, JOIN, …)
    # OUT of the alias slot — critical for JOIN: consuming it would
    # skip the next table reference entirely
    rf"\b(FROM|JOIN)\s+({_IDENT})"
    rf"(?:\s+(VERSION|TIMESTAMP)\s+AS\s+OF\s+"
    rf"('[^']*'|\"[^\"]*\"|[A-Za-z0-9_.:+-]+))?"
    rf"(?:\s+(?:AS\s+)?(?!(?:{_KW_ALT})\b)({_IDENT}))?",
    re.IGNORECASE,
)


class SqlReadError(ValueError):
    """Statement outside the restricted read grammar."""


def _snapshot(
    spark: SparkSession, tbl: KeyedTable, kind: str | None, lit: str | None
) -> DataFrame:
    if kind is None:
        return tbl.read(spark)
    v = (lit or "").strip().strip("'\"")
    if kind.upper() == "TIMESTAMP":
        return tbl.read(spark, as_of=v)
    # VERSION: the engine's native handle is the commit id; ordinal
    # integers (Delta-style) resolve through the retained timeline
    cids = tbl.commits()
    if v in cids:
        return tbl.read(spark, at=v)
    if re.fullmatch(r"-?\d+", v):
        i = int(v)
        if -len(cids) <= i < len(cids):
            return tbl.read(spark, at=cids[i])
        raise SqlReadError(
            f"VERSION AS OF {v}: table has {len(cids)} retained "
            f"commit(s) (clean() horizon applies)"
        )
    raise SqlReadError(
        f"VERSION AS OF {v!r}: not a retained commit id or ordinal "
        f"(retained: {cids[:3]}{'…' if len(cids) > 3 else ''})"
    )


def sql_read(
    spark: SparkSession,
    stmt: str,
    tables: dict[str, KeyedTable],
) -> DataFrame:
    """Run a SELECT whose managed-table references may carry
    ``VERSION AS OF`` / ``TIMESTAMP AS OF``; returns the DataFrame.

    Every managed reference — time-traveled or plain — resolves at
    CALL time from the table's manifest (plain references read HEAD),
    so this is also a live read path needing no prior register()."""
    lowered = {k.lower(): t for k, t in tables.items()}
    dh = re.match(
        rf"^\s*DESCRIBE\s+HISTORY\s+({_IDENT})\s*;?\s*$",
        stmt,
        re.IGNORECASE,
    )
    if dh:
        # Delta's DESCRIBE HISTORY → the commit-timeline DataFrame
        # (history() — metadata-only, one row per retained commit)
        tbl = lowered.get(dh.group(1).lower())
        if tbl is None:
            raise SqlReadError(
                f"DESCRIBE HISTORY {dh.group(1)!r}: not a managed "
                f"table (known: {sorted(tables)})"
            )
        return tbl.history(spark)
    params: dict[str, DataFrame] = {}

    def sub(m: re.Match) -> str:
        kw, name, kind, lit, alias = m.groups()
        tbl = lowered.get(name.lower())
        if tbl is None:
            if kind is not None:
                raise SqlReadError(
                    f"time travel on {name!r}: not a managed table "
                    f"(known: {sorted(tables)})"
                )
            return m.group(0)
        p = f"__tt{len(params)}"
        params[p] = _snapshot(spark, tbl, kind, lit)
        return f"{kw} {{{p}}} AS {alias or name}"

    out = _REF.sub(sub, stmt)
    if not params:
        return spark.sql(stmt)
    if "{" in stmt or "}" in stmt:
        raise SqlReadError(
            "literal '{'/'}' cannot appear in a statement that "
            "references a managed table (parameter-formatter collision)"
        )
    return spark.sql(out, **params)
