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

Scoping/safety rules (ADVICE r14, all three verified by tests):

- Quoted string literals are MASKED before the rewriter runs, so a
  literal containing ``... FROM t ...`` is never rewritten (the r14
  behavior silently corrupted such literals into parameter holes).
- ``WITH`` names SHADOW managed tables for the whole statement, per
  standard SQL CTE resolution: ``WITH t AS (…) SELECT … FROM t``
  reads the CTE, never the managed snapshot. Time travel on a
  shadowed name is refused (a CTE has no timeline). A WITH nested in
  a subquery shadows globally here (coarser than SQL's lexical
  scope); the failure mode is an unresolved-relation error from
  Spark, never a silent misread.
- Comma-style and parenthesized join syntax is REFUSED when a
  managed name appears after ``,`` or ``(`` (those positions bypass
  the FROM/JOIN rewriter) — use explicit JOIN syntax. This check is
  textual, so a SELECT-list column that shares a managed table's
  name trips it too; qualify the column (``x.t``) or rename it.
- Literal ``{``/``}`` in a statement that also references a managed
  table is refused (collides with the parameter formatter).

Metadata statements (r15, completing the catalog story): ``SHOW
TABLES`` lists the managed dict (name, location); ``DESCRIBE
[TABLE] t`` returns the schema plus the keyed-table properties;
``DESCRIBE HISTORY t`` returns the commit timeline (Delta parity);
``SHOW PARTITIONS t`` lists live partition dirs off the manifest
(zero data I/O; refused on unpartitioned tables, like Spark);
``SHOW CREATE TABLE t`` renders round-trippable keyed DDL from
the current schema and table config.

CDF through SQL (r15): ``FROM table_changes('t', start[, end])``
(Delta's TVF) binds the commit-range change feed —
``diff_commits(images="both")``, one update_preimage + one
update_postimage row per update. ``start`` is the BASE commit
(changes are everything after it), as a commit id or ordinal int.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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

#: Spark string literals: single/double quoted, backslash escapes and
#: doubled-quote escapes both honored (Spark accepts both forms).
_STR = re.compile(r"'(?:\\.|''|[^'\\])*'|\"(?:\\.|\"\"|[^\"\\])*\"")

#: Delta's CDF table-valued function: FROM table_changes('t', start[, end])
_TVF = re.compile(r"\b(FROM|JOIN)\s+TABLE_CHANGES\s*\(", re.IGNORECASE)


class SqlReadError(ValueError):
    """Statement outside the restricted read grammar."""


def _mask_strings(stmt: str) -> str:
    """Same-LENGTH copy of ``stmt`` with every quoted literal's body
    blanked to spaces (quotes kept, so the time-travel literal shape
    still matches). Positions align 1:1 with the original, letting the
    rewriter take match SPANS from the masked text and SLICES from the
    original — identifiers inside string literals become invisible to
    every structural regex without any reassembly bookkeeping."""

    def blank(m: re.Match) -> str:
        s = m.group(0)
        return s[0] + " " * (len(s) - 2) + s[-1]

    return _STR.sub(blank, stmt)


def _cte_names(masked: str) -> set[str]:
    """Names bound by WITH clauses anywhere in the (masked) statement.
    Walks each ``WITH`` keyword: ``name [(cols)] AS ( … )`` items
    separated by commas, skipping the balanced-paren bodies. Names
    found here shadow managed tables (standard SQL resolution order)."""
    names: set[str] = set()
    for w in re.finditer(r"\bWITH\b", masked, re.IGNORECASE):
        i = w.end()
        rec = re.match(r"\s+RECURSIVE\b", masked[i:], re.IGNORECASE)
        if rec:
            i += rec.end()
        while True:
            mm = re.match(
                rf"\s*({_IDENT})\s*(\([^)]*\))?\s*AS\s*\(",
                masked[i:],
                re.IGNORECASE,
            )
            if not mm:
                break
            names.add(mm.group(1).lower())
            j = i + mm.end() - 1  # the AS-body's opening '('
            depth = 0
            while j < len(masked):
                if masked[j] == "(":
                    depth += 1
                elif masked[j] == ")":
                    depth -= 1
                    if depth == 0:
                        break
                j += 1
            i = j + 1
            comma = re.match(r"\s*,", masked[i:])
            if not comma:
                break
            i += comma.end()
    return names


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
    if re.match(r"^\s*SHOW\s+TABLES\s*;?\s*$", stmt, re.IGNORECASE):
        # the catalog listing (Spark's SHOW TABLES over the managed
        # dict — pairs with catalog_open's warehouse-dir discovery)
        return spark.createDataFrame(
            sorted((n, t.path) for n, t in tables.items()),
            "table_name string, location string",
        )
    dt = re.match(
        rf"^\s*DESC(?:RIBE)?\s+(?:TABLE\s+)?({_IDENT})\s*;?\s*$",
        stmt,
        re.IGNORECASE,
    )
    if dt:
        tbl = lowered.get(dt.group(1).lower())
        if tbl is None:
            raise SqlReadError(
                f"DESCRIBE {dt.group(1)!r}: not a managed table "
                f"(known: {sorted(tables)})"
            )
        rows = [
            (f.name, f.dataType.simpleString())
            for f in tbl.read(spark).schema.fields
        ] + [
            ("# primaryKey", ",".join(tbl.key)),
            ("# preCombineField", tbl.precombine),
            ("# partitionBy", ",".join(tbl.partition_by or [])),
        ]
        return spark.createDataFrame(
            rows, "col_name string, data_type string"
        )
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
    sp = re.match(
        rf"^\s*SHOW\s+PARTITIONS\s+({_IDENT})\s*;?\s*$",
        stmt,
        re.IGNORECASE,
    )
    if sp:
        # Hive/Hudi SHOW PARTITIONS: one `partition` dir string per
        # live partition, straight off the manifest shards
        # (partitions_df) — zero data-file I/O at any table size.
        tbl = lowered.get(sp.group(1).lower())
        if tbl is None:
            raise SqlReadError(
                f"SHOW PARTITIONS {sp.group(1)!r}: not a managed "
                f"table (known: {sorted(tables)})"
            )
        if not tbl.partition_by:
            raise SqlReadError(
                f"SHOW PARTITIONS {sp.group(1)!r}: table is not "
                f"partitioned"
            )
        return (
            tbl.partitions_df(spark)
            .filter(F.col("partition") != F.lit(""))
            .select("partition")
            .orderBy("partition")
        )
    sc = re.match(
        rf"^\s*SHOW\s+CREATE\s+TABLE\s+({_IDENT})\s*;?\s*$",
        stmt,
        re.IGNORECASE,
    )
    if sc:
        # Round-trippable DDL from live metadata: the rendered
        # statement re-creates the table through sql_ddl (CREATE
        # TABLE ... USING keyed), column types from the CURRENT
        # schema (post-evolution), table config from _meta.json.
        tbl = lowered.get(sc.group(1).lower())
        if tbl is None:
            raise SqlReadError(
                f"SHOW CREATE TABLE {sc.group(1)!r}: not a managed "
                f"table (known: {sorted(tables)})"
            )
        cols = ",\n  ".join(
            f"{f.name} {f.dataType.simpleString().upper()}"
            for f in tbl.read(spark).schema.fields
        )
        props = [f"'primaryKey' = '{','.join(tbl.key)}'"]
        if tbl.precombine:
            props.append(f"'preCombineField' = '{tbl.precombine}'")
        if tbl.policy:
            props.append(f"'policy' = '{tbl.policy}'")
        part = (
            f"\nPARTITIONED BY ({', '.join(tbl.partition_by)})"
            if tbl.partition_by
            else ""
        )
        ddl = (
            f"CREATE TABLE {sc.group(1)} (\n  {cols})\n"
            f"USING keyed{part}\n"
            f"LOCATION '{tbl.path}'\n"
            f"TBLPROPERTIES ({', '.join(props)})"
        )
        return spark.createDataFrame([(ddl,)], "createtab_stmt string")

    masked = _mask_strings(stmt)
    shadowed = _cte_names(masked) & set(lowered)
    params: dict[str, DataFrame] = {}
    raw_stmt = stmt  # brace checks run against the USER's text only

    # -- table_changes TVF (Delta CDF parity) --------------------------
    # FROM table_changes('t', <start>[, <end>]) [AS a] → the commit-
    # range change feed (diff_commits, images="both": one
    # update_preimage + one update_postimage row per update, exactly
    # Delta's CDF shape). <start> is the BASE commit — changes are
    # everything AFTER it up to <end>/HEAD — accepted as a commit id
    # or an ordinal int (0 = first retained, -1 = head), same
    # resolution as VERSION AS OF.
    tvf = list(_TVF.finditer(masked))
    if tvf:
        if "{" in stmt or "}" in stmt:
            raise SqlReadError(
                "literal '{'/'}' cannot appear in a statement that "
                "references a managed table (parameter-formatter "
                "collision)"
            )
        s_parts: list[str] = []
        m_parts: list[str] = []
        pos = 0
        for m in tvf:
            op = m.end() - 1  # the '('
            depth, j = 0, op
            while j < len(masked):
                if masked[j] == "(":
                    depth += 1
                elif masked[j] == ")":
                    depth -= 1
                    if depth == 0:
                        break
                j += 1
            if depth != 0:
                raise SqlReadError("table_changes: unbalanced '('")
            # arg spans from the MASKED text, values from the original
            args = []
            k = op + 1
            for seg in masked[op + 1: j].split(","):
                raw = stmt[k: k + len(seg)].strip()
                args.append(raw[1:-1] if raw[:1] in "'\"" else raw)
                k += len(seg) + 1
            if not 2 <= len(args) <= 3:
                raise SqlReadError(
                    "table_changes takes ('table', start[, end]) — "
                    f"got {len(args)} argument(s)"
                )
            tbl = lowered.get(args[0].lower())
            if tbl is None:
                raise SqlReadError(
                    f"table_changes on {args[0]!r}: not a managed "
                    f"table (known: {sorted(tables)})"
                )
            cids = tbl.commits()

            def cid(v: str, what: str) -> str:
                if v in cids:
                    return v
                if re.fullmatch(r"-?\d+", v):
                    i = int(v)
                    if -len(cids) <= i < len(cids):
                        return cids[i]
                    raise SqlReadError(
                        f"table_changes {what} ordinal {i} out of "
                        f"range (0..{len(cids) - 1})"
                    )
                raise SqlReadError(
                    f"table_changes {what}: unknown commit {v!r} "
                    f"(retained: {cids})"
                )

            start = cid(args[1], "start")
            end = cid(args[2], "end") if len(args) == 3 else None
            am = re.match(
                rf"\s*(?:AS\s+)?(?!(?:{_KW_ALT})\b)({_IDENT})",
                masked[j + 1:],
                re.IGNORECASE,
            )
            alias = am.group(1) if am else "table_changes"
            tail = j + 1 + (am.end() if am else 0)
            p = f"__tc{len(params)}"
            params[p] = tbl.diff_commits(
                spark, from_commit=start, to_commit=end, images="both"
            )
            rep = f"{m.group(1)} {{{p}}} AS {alias}"
            s_parts.append(stmt[pos: m.start()])
            s_parts.append(rep)
            m_parts.append(masked[pos: m.start()])
            m_parts.append(rep)
            pos = tail
        s_parts.append(stmt[pos:])
        m_parts.append(masked[pos:])
        stmt = "".join(s_parts)
        masked = "".join(m_parts)

    # Rewrite over the MASKED text, emitting ORIGINAL slices — string
    # literals can't match, but the output keeps their exact content.
    out_parts: list[str] = []
    out_masked_parts: list[str] = []
    pos = 0
    for m in _REF.finditer(masked):
        kw, name, kind, _lit, alias = m.groups()
        key = name.lower()
        tbl = lowered.get(key)
        if key in shadowed:
            if kind is not None:
                raise SqlReadError(
                    f"time travel on {name!r}: the name is bound by a "
                    f"WITH clause in this statement (CTEs shadow "
                    f"managed tables and have no timeline)"
                )
            continue  # CTE wins; leave the reference untouched
        if tbl is None:
            if kind is not None:
                raise SqlReadError(
                    f"time travel on {name!r}: not a managed table "
                    f"(known: {sorted(tables)})"
                )
            continue  # unmanaged plain reference passes through
        lit = stmt[m.start(4): m.end(4)] if m.group(4) is not None else None
        p = f"__tt{len(params)}"
        params[p] = _snapshot(spark, tbl, kind, lit)
        rep = f"{kw} {{{p}}} AS {alias or name}"
        out_parts.append(stmt[pos: m.start()])
        out_parts.append(rep)
        out_masked_parts.append(masked[pos: m.start()])
        out_masked_parts.append(rep)
        pos = m.end()
    out_parts.append(stmt[pos:])
    out_masked_parts.append(masked[pos:])
    out = "".join(out_parts)
    out_masked = "".join(out_masked_parts)

    # Loud refusal for table-reference positions the FROM/JOIN grammar
    # cannot see (VERDICT r14 #6): a managed name right after ',' or
    # '(' is a comma-join / parenthesized-join reference this rewriter
    # would silently skip. (Followed-by '.'/'(' occurrences are
    # qualified columns / calls, not references.)
    visible = set(lowered) - shadowed
    if visible:
        alt = "|".join(re.escape(n) for n in sorted(visible))
        stray = re.search(
            rf"[,(]\s*({alt})\b(?!\s*[.(])", out_masked, re.IGNORECASE
        )
        if stray:
            raise SqlReadError(
                f"managed table {stray.group(1)!r} referenced after "
                f"','/'(' — comma-style and parenthesized joins bypass "
                f"the snapshot rewriter; use explicit JOIN syntax. (A "
                f"SELECT-list column sharing the table's name trips "
                f"this too: qualify or rename it.)"
            )

    if not params:
        return spark.sql(stmt)
    if "{" in raw_stmt or "}" in raw_stmt:
        raise SqlReadError(
            "literal '{'/'}' cannot appear in a statement that "
            "references a managed table (parameter-formatter collision)"
        )
    return spark.sql(out, **params)
