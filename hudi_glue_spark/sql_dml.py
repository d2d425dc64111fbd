"""SQL string front-end for the write path (VERDICT r12 "What's
missing" #1): ``MERGE INTO`` / ``UPDATE`` / ``DELETE FROM`` statements
parsed by a RESTRICTED grammar and routed to the existing
:class:`~hudi_glue_spark.table.KeyedTable` API — ``merge_into``,
``update_where``, ``delete_where``. Reads already have SQL parity
(``register`` / ``register_external``); this closes the common
onboarding path for users coming from Hudi/Delta, where DML is a SQL
statement (reference parity: the Glue jobs configure Hudi's
SQL-adjacent write options, glue/HudiJarGlueJob.py:79-96).

A PySpark-only engine cannot register Catalyst DML statements — Spark
reserves MERGE/UPDATE/DELETE parsing for DSv2 catalogs, which the
Python DataSource API does not expose (re-checked on pyspark 4.1.2)
— so the statement is parsed here, ONCE, into the exact API calls a
Python caller would write. The grammar is deliberately small and
REFUSES LOUDLY anything it cannot map 1:1 onto engine semantics
(non-key ON conditions, unreachable clauses, re-keyed INSERT
values); nothing is silently reinterpreted.

Supported::

    MERGE INTO <t> [AS a] USING <s> [AS b] ON <key equality>
      {WHEN MATCHED [AND <cond>] THEN DELETE
                                      | UPDATE SET * | SET c = expr, ...}*
      [WHEN NOT MATCHED [AND <cond>] THEN INSERT *
                                        | INSERT (cols) VALUES (exprs)]
      [WHEN NOT MATCHED BY SOURCE [AND <cond>] THEN DELETE
                                        | UPDATE SET c = expr, ...]

ANY number of WHEN MATCHED clauses is accepted (r13) — they evaluate
in statement order, first-wins, via ``merge_into(matched_clauses=)``;
only the LAST matched clause may omit its AND condition (an earlier
unconditional clause would make the rest unreachable — refused, same
rule as Delta).
    UPDATE <t> SET col = expr [, ...] [WHERE <pred>]
    DELETE FROM <t> [WHERE <pred>]
    INSERT INTO <t> [(c1, c2, ...)] <SELECT ...| TABLE name | VALUES ...>
    INSERT OVERWRITE [TABLE] <t> <SELECT ...| TABLE name | VALUES ...>
    TRUNCATE [TABLE] <t>
    OPTIMIZE <t> [ZORDER BY (c1, ...)]           -- compaction/clustering
    RESTORE [TABLE] <t> TO VERSION|TIMESTAMP AS OF <x>  -- rollback
    CALL <proc>(table => 't', name => value, ...)   -- table services
                                                    -- + index lifecycle

``INSERT INTO`` on a keyed table is an UPSERT (Hudi's
``hoodie.sql.insert.mode=upsert`` default for pk tables —
duplicate-key appends would break the engine's unique-identity
invariant, so the merge semantics are the honest mapping; the
statement's rows win per the table's precombine policy). ``INSERT
OVERWRITE`` maps to :meth:`insert_overwrite` — partition replace for
the partitions present in the query, whole table when unpartitioned.
The query after the target resolves through ``spark.sql``, so any
SELECT Spark can parse works (sources are temp views / catalog
tables); on an EMPTY table INSERT INTO falls through to the initial
bulk load.

Conditions are arbitrary Spark-SQL boolean expressions; inside MERGE
they may reference the target/source aliases, which are rewritten to
the engine's canonical ``target.`` / ``source.`` names. Matched
clauses pass to the engine's ordered first-wins evaluation verbatim;
the BY SOURCE pair (at most one delete + one update) keeps the SQL
first-wins order via the ``delete ∧ ¬update`` translation, and an
UNCONDITIONAL earlier clause that shadows a later one is refused,
not ignored.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from hudi_glue_spark.table.keyed_table import KeyedTable

__all__ = ["sql_dml", "sql_call"]

_IDENT = r"[A-Za-z_][A-Za-z0-9_.]*"


class SqlDmlError(ValueError):
    """Statement outside the restricted grammar (the message says
    exactly which construct is unsupported and what to call
    instead)."""


def _strip(s: str) -> str:
    return re.sub(r"\s+", " ", s.strip().rstrip(";").strip())


def _split_top(s: str, sep: str = ",") -> list[str]:
    """Split on ``sep`` at paren/quote depth zero."""
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
        elif ch == sep and depth == 0:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    out.append("".join(cur))
    return [p.strip() for p in out if p.strip()]


def _unwrap_parens(s: str) -> str | None:
    """``s`` starts (after whitespace) with '(': return the inner text
    when that paren's MATCH is the final character, else None.
    Quote-aware — a ')' inside a string literal never closes."""
    s = s.strip()
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
                return s[1:i].strip() if i == len(s) - 1 else None
    return None


def _rewrite_alias(cond: str, alias: str, canon: str) -> str:
    """``<alias>.col`` → ``<canon>.col`` (word-bounded, outside
    quotes — condition strings here are short expressions, so a
    simple quote-splitting pass is exact enough to be safe)."""
    parts = re.split(r"('(?:[^']|'')*')", cond)
    pat = re.compile(rf"\b{re.escape(alias)}\s*\.", re.IGNORECASE)
    return "".join(
        p if i % 2 else pat.sub(canon + ".", p)
        for i, p in enumerate(parts)
    )


def _resolve(name: str, tables: dict[str, KeyedTable]) -> KeyedTable:
    if name in tables:
        return tables[name]
    # case-insensitive fallback (SQL identifiers)
    for k, v in tables.items():
        if k.lower() == name.lower():
            return v
    raise SqlDmlError(
        f"unknown table {name!r}; pass it in tables={{...}} "
        f"(known: {sorted(tables)})"
    )


def _parse_merge(
    stmt: str,
    tables: dict[str, KeyedTable],
    sources: dict[str, DataFrame] | None,
    spark: SparkSession,
) -> str:
    m = re.match(
        rf"MERGE INTO ({_IDENT})(?: AS)?(?: ({_IDENT}))? "
        rf"USING ({_IDENT})(?: AS)?(?: ({_IDENT}))? "
        rf"ON (.*?)(?= WHEN )(.*)$",
        stmt,
        re.IGNORECASE,
    )
    if not m:
        raise SqlDmlError(
            "unparseable MERGE; supported shape: MERGE INTO t [AS a] "
            "USING s [AS b] ON <key equality> WHEN ... "
            "(subqueries/USING (...) are not — pass the source as a "
            "DataFrame in sources={...} or a temp view)"
        )
    t_name, t_alias, s_name, s_alias, on, clauses_txt = m.groups()
    tbl = _resolve(t_name, tables)
    src: DataFrame | None = None
    if sources and s_name in sources:
        src = sources[s_name]
    elif sources:
        for k, v in sources.items():
            if k.lower() == s_name.lower():
                src = v
                break
    if src is None:
        src = spark.table(s_name)  # temp view / catalog fallback
    t_alias = t_alias or t_name
    s_alias = s_alias or s_name

    def canon(cond: str) -> str:
        cond = _rewrite_alias(cond, t_alias, "target")
        return _rewrite_alias(cond, s_alias, "source")

    # ON must equate exactly the merge identity — the engine always
    # joins on the record key (+ partition columns under partition
    # scope); any other ON would be silently ignored, so refuse it
    eqs = []
    for conj in re.split(r"\bAND\b", on, flags=re.IGNORECASE):
        em = re.match(
            rf"^\s*({_IDENT})\s*=\s*({_IDENT})\s*$", conj
        )
        if not em:
            raise SqlDmlError(
                f"MERGE ON must be a conjunction of column "
                f"equalities over the record key, got {conj.strip()!r}"
            )
        eqs.append(em.groups())

    def col_of(ref: str, alias: str) -> str | None:
        pre = alias.lower() + "."
        r = ref.lower()
        return ref.split(".", 1)[1] if r.startswith(pre) else (
            ref if "." not in ref else None
        )

    on_cols = set()
    for l, r in eqs:
        lc, rc = col_of(l, t_alias), col_of(r, s_alias)
        if lc is None or rc is None:
            lc, rc = col_of(r, t_alias), col_of(l, s_alias)
        if lc is None or rc is None or lc.lower() != rc.lower():
            raise SqlDmlError(
                f"MERGE ON equality {l} = {r} does not pair the same "
                f"column across target/source"
            )
        on_cols.add(lc.lower())
    ident_sets = {
        frozenset(c.lower() for c in tbl.key),
        frozenset(c.lower() for c in tbl._identity_cols),
    }
    if frozenset(on_cols) not in ident_sets:
        raise SqlDmlError(
            f"MERGE ON columns {sorted(on_cols)} must equal the "
            f"table's record key {tbl.key} (its merge identity); "
            f"other join conditions are not supported"
        )

    clause_re = re.compile(
        r" WHEN (NOT MATCHED BY SOURCE|NOT MATCHED|MATCHED)"
        r"(?: AND (.*?))? THEN "
        r"(DELETE|UPDATE SET (?:\*|.*?)|INSERT (?:\*|\(.*?\) VALUES \(.*?\)))"
        r"(?=( WHEN |$))",
        re.IGNORECASE,
    )
    txt = " " + clauses_txt.strip()
    pos, parsed = 0, []
    for cm in clause_re.finditer(txt):
        if cm.start() != pos:  # gap = garbage between clauses
            break
        parsed.append(cm)
        pos = cm.end()
    if not parsed or pos < len(txt.rstrip()):
        raise SqlDmlError(
            f"unparseable WHEN clause(s) in {clauses_txt!r}"
        )
    def strip_target(col: str) -> str:
        col = col.strip().strip("`")
        low = col.lower()
        for pre in (t_alias.lower() + ".", "target."):
            if low.startswith(pre):
                return col[len(pre):].strip("`")
        if "." in col:
            raise SqlDmlError(
                f"column {col!r} must be bare or target-qualified"
            )
        return col

    def parse_set_list(body: str) -> dict[str, str]:
        out: dict[str, str] = {}
        for item in _split_top(body):
            sm = re.match(r"^(.+?)=(.+)$", item)
            if not sm:
                raise SqlDmlError(f"unparseable SET item {item!r}")
            col = strip_target(sm.group(1))
            if col in out:
                raise SqlDmlError(f"duplicate SET column {col!r}")
            out[col] = canon(sm.group(2).strip())
        if not out:
            raise SqlDmlError("empty UPDATE SET list")
        return out

    ins = None  # (cond_text_or_None, order_index)
    # ordered WHEN MATCHED clauses, passed VERBATIM to the engine's
    # first-wins evaluation (merge_into matched_clauses, r13) —
    # multiple UPDATE/DELETE clauses with distinct conditions are
    # full SQL MERGE, no two-clause translation needed
    m_clauses: list[dict] = []
    ins_vals: dict[str, str] | None = None  # None = INSERT *
    bs_del = None  # None off | "true" | cond text
    bs_set: dict[str, str] | None = None
    bs_upd_cond: str | None = None
    bs_del_idx = bs_upd_idx = None
    for i, cm in enumerate(parsed):
        kind, cond, action = (
            cm.group(1).upper(),
            cm.group(2),
            cm.group(3),
        )
        act = action.upper()
        if kind == "NOT MATCHED BY SOURCE":
            if act == "DELETE":
                if bs_del is not None:
                    raise SqlDmlError(
                        "duplicate WHEN NOT MATCHED BY SOURCE DELETE"
                    )
                bs_del = canon(cond) if cond else "true"
                bs_del_idx = i
            elif act.startswith("UPDATE SET"):
                body = action[len("UPDATE SET"):].strip()
                if body == "*":
                    raise SqlDmlError(
                        "NOT MATCHED BY SOURCE has no source row — "
                        "UPDATE needs an explicit SET list"
                    )
                if bs_set is not None:
                    raise SqlDmlError(
                        "duplicate WHEN NOT MATCHED BY SOURCE UPDATE"
                    )
                bs_set = parse_set_list(body)
                bs_upd_cond = canon(cond) if cond else None
                bs_upd_idx = i
            else:
                raise SqlDmlError(
                    f"NOT MATCHED BY SOURCE supports UPDATE SET "
                    f"col=expr or DELETE, got {action!r}"
                )
        elif kind == "MATCHED":
            if m_clauses and m_clauses[-1]["condition"] is None:
                raise SqlDmlError(
                    "an unconditional WHEN MATCHED clause makes every "
                    "later MATCHED clause unreachable; reorder or add "
                    "a condition (only the LAST matched clause may "
                    "omit AND)"
                )
            if act == "DELETE":
                m_clauses.append(
                    {
                        "action": "delete",
                        "condition": canon(cond) if cond else None,
                    }
                )
            elif act.startswith("UPDATE SET"):
                body = action[len("UPDATE SET"):].strip()
                m_clauses.append(
                    {
                        "action": "update",
                        "condition": canon(cond) if cond else None,
                        # SET * = full source-row replace (set None);
                        # a SET list = partial update
                        "set": (
                            None if body == "*" else parse_set_list(body)
                        ),
                    }
                )
            else:
                raise SqlDmlError(
                    f"WHEN MATCHED supports UPDATE SET */SET col=expr "
                    f"or DELETE, got {action!r}"
                )
        else:
            if ins is not None:
                raise SqlDmlError("duplicate WHEN NOT MATCHED INSERT")
            ins = (cond, i)
            if act != "INSERT *":
                im = re.match(
                    r"INSERT\s*\((.*)\)\s*VALUES\s*\((.*)\)\s*$",
                    action,
                    re.IGNORECASE | re.DOTALL,
                )
                if not im:
                    raise SqlDmlError(
                        f"WHEN NOT MATCHED supports INSERT * or "
                        f"INSERT (cols) VALUES (exprs), got {action!r}"
                    )
                ins_cols = [
                    strip_target(c) for c in _split_top(im.group(1))
                ]
                ins_exprs = _split_top(im.group(2))
                if len(ins_cols) != len(ins_exprs):
                    raise SqlDmlError(
                        f"INSERT lists {len(ins_cols)} columns but "
                        f"{len(ins_exprs)} values"
                    )
                if len(set(ins_cols)) != len(ins_cols):
                    raise SqlDmlError("duplicate INSERT column")
                ins_vals = {
                    c: canon(v.strip())
                    for c, v in zip(ins_cols, ins_exprs)
                }

    # the ORDERED matched clauses go to the engine verbatim — its
    # first-wins evaluation IS SQL's; an empty list means matched
    # rows stay untouched (the insert-only merge)
    # by-source clause order: SQL first-wins translated to the
    # engine's delete-wins by-source pair
    by_source_delete = bs_del
    if (
        bs_del is not None
        and bs_set is not None
        and bs_upd_idx < bs_del_idx
    ):
        if bs_upd_cond is None:
            raise SqlDmlError(
                "WHEN NOT MATCHED BY SOURCE THEN UPDATE without AND "
                "makes the later BY SOURCE DELETE unreachable; "
                "reorder or add a condition"
            )
        by_source_delete = f"(NOT ({bs_upd_cond})) AND ({bs_del})"
    elif (
        bs_del is not None
        and bs_set is not None
        and bs_del_idx < bs_upd_idx
        and bs_del == "true"
    ):
        # mirror of the update-first case: an UNCONDITIONAL delete
        # placed first shadows the later BY SOURCE UPDATE — refuse,
        # not silently drop the update (module contract)
        raise SqlDmlError(
            "WHEN NOT MATCHED BY SOURCE THEN DELETE without AND "
            "makes the later BY SOURCE UPDATE unreachable; "
            "reorder or add a condition"
        )
    return tbl.merge_into(
        src,
        when_not_matched_insert=ins is not None,
        insert_condition=(canon(ins[0]) if ins and ins[0] else None),
        insert_values=ins_vals,
        matched_clauses=m_clauses,
        by_source_delete=by_source_delete,
        by_source_update_set=bs_set,
        by_source_update_condition=bs_upd_cond,
    )


def _parse_update(
    stmt: str, tables: dict[str, KeyedTable], spark: SparkSession
) -> str:
    m = re.match(
        rf"UPDATE ({_IDENT}) SET (.*?)(?: WHERE (.*))?$",
        stmt,
        re.IGNORECASE,
    )
    if not m:
        raise SqlDmlError(
            "unparseable UPDATE; supported shape: "
            "UPDATE t SET col = expr[, ...] [WHERE pred]"
        )
    name, sets_txt, where = m.groups()
    tbl = _resolve(name, tables)
    set_exprs: dict[str, str] = {}
    for item in _split_top(sets_txt):
        sm = re.match(r"^(`[^`]+`|[A-Za-z_][A-Za-z0-9_]*)\s*=\s*(.+)$", item)
        if not sm:
            raise SqlDmlError(f"unparseable SET item {item!r}")
        col = sm.group(1).strip("`")
        if col in set_exprs:
            raise SqlDmlError(f"duplicate SET column {col!r}")
        set_exprs[col] = sm.group(2).strip()
    return tbl.update_where(spark, set_exprs, where or "true")


def _parse_delete(
    stmt: str, tables: dict[str, KeyedTable], spark: SparkSession
) -> str:
    m = re.match(
        rf"DELETE FROM ({_IDENT})(?: WHERE (.*))?$", stmt, re.IGNORECASE
    )
    if not m:
        raise SqlDmlError(
            "unparseable DELETE; supported shape: "
            "DELETE FROM t [WHERE pred]"
        )
    name, where = m.groups()
    tbl = _resolve(name, tables)
    if where is None:
        # Delta-parity optimization: DELETE without WHERE is the
        # whole-table wipe — one metadata-only commit (truncate)
        # instead of scanning and rewriting every partition to
        # produce nothing. Same final state, same CDC events (remove
        # planning), same retention/time-travel behavior. A LITERAL
        # 'WHERE true' keeps the rewrite path (the caller asked for
        # predicate semantics explicitly).
        return tbl.truncate()
    return tbl.delete_where(spark, where)


def _parse_insert(
    stmt: str, tables: dict[str, KeyedTable], spark: SparkSession
) -> str:
    m = re.match(
        rf"INSERT (INTO|OVERWRITE) (?:TABLE )?({_IDENT})\s+(.*)$",
        stmt,
        re.IGNORECASE,
    )
    if not m:
        raise SqlDmlError(
            "unparseable INSERT; supported shapes: INSERT INTO t "
            "<SELECT ...|TABLE name|VALUES ...>, INSERT OVERWRITE "
            "[TABLE] t <query> (no column lists — project in the "
            "SELECT instead)"
        )
    mode, name, query = m.groups()
    tbl = _resolve(name, tables)
    ins_cols: list[str] | None = None
    # A parenthesized QUERY — INSERT INTO t (SELECT …) — is not a
    # column list (ADVICE r14: misreading it as one produced a
    # baffling "column(s) not in table" error). Unwrap it when the
    # opening paren closes at the statement's end; otherwise fall
    # through so the mismatched shape gets the column-list error.
    while re.match(
        r"^\s*\(\s*(?:SELECT|VALUES|TABLE|WITH|FROM|\()",
        query,
        re.IGNORECASE,
    ):
        inner = _unwrap_parens(query)
        if inner is None:
            raise SqlDmlError(
                "INSERT source looks like a parenthesized query but "
                "its parentheses do not wrap the whole source — drop "
                "the outer parentheses (column lists are (c1, c2, …))"
            )
        query = inner
    if query.lstrip().startswith("("):
        # INSERT INTO t (c1, c2, ...) <query>: SQL column-list form —
        # the query's columns map POSITIONALLY onto the listed names;
        # unlisted columns land NULL (the engine then refuses if a
        # structural column is missing, its normal contract)
        lm = re.match(r"^\s*\(([^)]*)\)\s*(.*)$", query, re.DOTALL)
        if not lm:
            raise SqlDmlError("unparseable INSERT column list")
        ins_cols = [c.strip().strip("`") for c in lm.group(1).split(",")]
        query = lm.group(2)
        if not tbl.exists():
            raise SqlDmlError(
                "INSERT with a column list needs an existing table "
                "schema to resolve unlisted columns — CREATE the "
                "table first (sql_ddl) or insert full rows"
            )
    head = query.split(None, 1)[0].upper() if query.strip() else ""
    if head not in ("SELECT", "TABLE", "VALUES", "WITH", "FROM"):
        raise SqlDmlError(
            f"INSERT source must be a query (SELECT/TABLE/VALUES/"
            f"WITH), got {query[:40]!r}"
        )
    batch = spark.sql(query)
    if ins_cols is not None:
        from pyspark.sql import functions as F

        tschema = tbl.read(spark).schema
        tcols = [f.name for f in tschema.fields]
        unknown = set(ins_cols) - set(tcols)
        if unknown:
            raise SqlDmlError(
                f"INSERT column(s) not in table: {sorted(unknown)}"
            )
        if len(set(ins_cols)) != len(ins_cols):
            raise SqlDmlError("duplicate INSERT column")
        if len(batch.columns) != len(ins_cols):
            raise SqlDmlError(
                f"INSERT lists {len(ins_cols)} columns but the query "
                f"produces {len(batch.columns)}"
            )
        structural = (
            set(tbl.key) | {tbl.precombine} | set(tbl.partition_by or [])
        ) - set(tbl.derived_cols or {})
        absent = structural - set(ins_cols)
        if absent:
            raise SqlDmlError(
                f"INSERT column list must include the key/precombine/"
                f"partition column(s) {sorted(absent)} — unlisted "
                f"columns land NULL, and a NULL row identity on a "
                f"keyed table is almost never what you meant"
            )
        listed = set(ins_cols)
        batch = batch.toDF(*ins_cols).select(
            [
                (
                    F.col(f.name).cast(f.dataType)
                    if f.name in listed
                    else F.lit(None).cast(f.dataType)
                ).alias(f.name)
                for f in tschema.fields
            ]
        )
    elif head == "VALUES" and tbl.exists():
        # bare VALUES rows are positional in SQL; spark.sql names them
        # col1..colN — map onto the committed schema's column order
        tcols = tbl.read(spark).columns
        if len(batch.columns) != len(tcols):
            raise SqlDmlError(
                f"INSERT VALUES arity {len(batch.columns)} != table "
                f"arity {len(tcols)} ({tcols})"
            )
        batch = batch.toDF(*tcols)
    if mode.upper() == "OVERWRITE":
        return tbl.insert_overwrite(batch)
    # INTO on a keyed table = upsert (Hudi pk-table INSERT semantics:
    # duplicate-key appends would break the unique-identity
    # invariant); first write on an empty table = the initial load
    if not tbl.exists():
        return tbl.bulk_insert(batch, dedupe=True)
    return tbl.upsert(batch)


def sql_dml(
    spark: SparkSession,
    statement: str,
    tables: dict[str, KeyedTable],
    sources: dict[str, DataFrame] | None = None,
) -> str:
    """Execute one restricted-grammar DML statement against keyed
    tables (module docstring has the grammar). ``tables`` maps
    statement table names to :class:`KeyedTable` instances;
    ``sources`` maps a MERGE's USING name to a DataFrame (falls back
    to ``spark.table(name)`` — a temp view). Returns the new commit
    id. Raises :class:`SqlDmlError` (a ValueError) on anything the
    grammar cannot map 1:1 onto engine semantics."""
    stmt = _strip(statement)
    head = stmt.split(None, 1)[0].upper() if stmt else ""
    if head == "MERGE":
        return _parse_merge(stmt, tables, sources, spark)
    if head == "UPDATE":
        return _parse_update(stmt, tables, spark)
    if head == "DELETE":
        return _parse_delete(stmt, tables, spark)
    if head == "INSERT":
        return _parse_insert(stmt, tables, spark)
    if head == "TRUNCATE":
        m = re.match(
            rf"TRUNCATE (?:TABLE )?({_IDENT})$", stmt, re.IGNORECASE
        )
        if not m:
            raise SqlDmlError(
                "unparseable TRUNCATE; supported: TRUNCATE [TABLE] t"
            )
        return _resolve(m.group(1), tables).truncate()
    if head == "OPTIMIZE":
        # Delta's spelling: OPTIMIZE t → small-file compaction;
        # OPTIMIZE t ZORDER BY (c1, c2) → forced multi-dimensional
        # clustering (run_clustering). WHERE predicates are refused —
        # partition-scoped service runs go through CALL
        # run_compaction/run_clustering with explicit arguments.
        m = re.match(
            rf"OPTIMIZE ({_IDENT})"
            rf"(?:\s+ZORDER\s+BY\s+\(([^)]*)\))?$",
            stmt,
            re.IGNORECASE,
        )
        if not m:
            raise SqlDmlError(
                "unparseable OPTIMIZE; supported: OPTIMIZE t "
                "[ZORDER BY (c1, c2, ...)] — WHERE predicates are not: "
                "use CALL run_compaction/run_clustering(table => 't', "
                "...) for partition-scoped runs"
            )
        tbl = _resolve(m.group(1), tables)
        if m.group(2):
            cols = [c.strip() for c in m.group(2).split(",") if c.strip()]
            return tbl.run_clustering(spark, zorder_by=cols) or ""
        return tbl.optimize(spark) or ""
    if head == "RESTORE":
        # Delta parity: RESTORE TABLE t TO VERSION/TIMESTAMP AS OF x
        # → rollback (a NEW metadata-only commit referencing the
        # target's files; rolled-back history stays time-travelable
        # until clean). VERSION accepts a commit id or an ordinal int
        # (0 = first retained, -1 = head), same as sql_read.
        m = re.match(
            rf"RESTORE (?:TABLE )?({_IDENT})\s+TO\s+"
            rf"(VERSION|TIMESTAMP)\s+AS\s+OF\s+"
            rf"('[^']*'|\"[^\"]*\"|[A-Za-z0-9_.:+-]+)$",
            stmt,
            re.IGNORECASE,
        )
        if not m:
            raise SqlDmlError(
                "unparseable RESTORE; supported: RESTORE [TABLE] t "
                "TO VERSION AS OF <commit|ordinal> | TO TIMESTAMP "
                "AS OF '<ts>'"
            )
        tbl = _resolve(m.group(1), tables)
        v = m.group(3).strip().strip("'\"")
        if m.group(2).upper() == "TIMESTAMP":
            target = tbl.commit_as_of(v)
            if target is None:
                raise SqlDmlError(
                    f"RESTORE: no retained commit at or before {v!r}"
                )
        else:
            cids = tbl.commits()
            if v in cids:
                target = v
            elif re.fullmatch(r"-?\d+", v) and (
                -len(cids) <= int(v) < len(cids)
            ):
                target = cids[int(v)]
            else:
                raise SqlDmlError(
                    f"RESTORE: unknown version {v!r} (retained commit "
                    f"ids or ordinals 0..{len(cids) - 1})"
                )
        return tbl.rollback(to_commit=target)
    if head == "CALL":
        # sql_dml's contract returns a commit id; use sql_call
        # directly for the procedure's own return value
        sql_call(spark, stmt, tables)
        try:
            t = _resolve(
                re.search(r"table\s*(?:=>|=)\s*['\"]?([A-Za-z_][A-Za-z0-9_.]*)",
                          stmt, re.IGNORECASE).group(1),
                tables,
            )
            return t.commits()[-1]
        except Exception:  # noqa: BLE001 — best-effort head report
            return ""
    raise SqlDmlError(
        f"unsupported statement {head!r}: sql_dml handles MERGE INTO "
        f"/ UPDATE / DELETE FROM / INSERT INTO / INSERT OVERWRITE / "
        f"TRUNCATE / OPTIMIZE / RESTORE only (reads go through register()/"
        f"register_external() and plain spark.sql)"
    )


# -- CALL procedures (Hudi-SQL parity: CALL run_clean(table => 't')) -----

#: procedure name (+ Hudi-SQL aliases) → (method, {arg: coercion},
#: needs_spark). `table =>` is always required and resolves through
#: the same dict as every other statement.
_COMMA_LIST = "comma-list"
_PROCS: dict[str, tuple[str, dict, bool]] = {
    "clean": ("clean", {"retain_commits": int,
                        "orphan_grace_s": float}, False),
    "run_clean": ("clean", {"retain_commits": int,
                            "orphan_grace_s": float}, False),
    "optimize": ("optimize", {"target_file_mb": float,
                              "small_file_mb": float,
                              "sort_by": _COMMA_LIST,
                              "zorder_by": _COMMA_LIST}, True),
    "run_compaction": ("optimize", {"target_file_mb": float,
                                    "small_file_mb": float}, True),
    "run_clustering": ("run_clustering", {"target_file_mb": float,
                                          "sort_by": _COMMA_LIST,
                                          "zorder_by": _COMMA_LIST}, True),
    "rollback": ("rollback", {"commit": str}, False),
    "rollback_to_instant": ("rollback", {"commit": str}, False),
    "savepoint": ("savepoint", {"commit": str}, False),
    "create_savepoint": ("savepoint", {"commit": str}, False),
    "release_savepoint": ("release_savepoint", {"commit": str}, False),
    "delete_savepoint": ("release_savepoint", {"commit": str}, False),
    "fold_change_logs": ("fold_change_logs", {"keep_last": int,
                                              "max_bytes": int}, False),
    # index lifecycle (Hudi 1.0 record/secondary-index procedures;
    # missing required args surface as the method's own TypeError)
    "build_record_index": (
        "build_record_index", {"max_records_per_file": int}, True),
    "drop_record_index": ("drop_record_index", {}, False),
    "compact_record_index": (
        "compact_record_index", {"max_records_per_file": int}, True),
    "build_column_index": (
        "build_column_index",
        {"col": str, "max_records_per_file": int}, True),
    "drop_column_index": ("drop_column_index", {"col": str}, False),
    "compact_column_index": (
        "compact_column_index",
        {"col": str, "max_records_per_file": int}, True),
    "build_ivf_index": (
        "build_ivf_index",
        {"vec_col": str, "n_centroids": int, "n_iter": int,
         "sample_n": int}, True),
    "build_lsh_index": (
        "build_lsh_index",
        {"vec_col": str, "dim": int, "n_planes": int, "n_tables": int,
         "seed": int}, True),
    "run_maintenance": ("run_maintenance", {
        "retain_commits": int, "target_file_mb": float,
        "small_file_mb": float, "target_rows_per_file": int,
        "orphan_grace_s": float, "dv_fold_dead_fraction": float,
        "chlog_keep_commits": int, "chlog_max_bytes": int}, True),
}

#: engine parameter name when it differs from the CALL arg name
_PROC_ARG_RENAME = {
    ("rollback", "commit"): "to_commit",
    ("savepoint", "commit"): "commit_id",
    ("release_savepoint", "commit"): "commit_id",
}


def sql_call(
    spark: SparkSession,
    statement: str,
    tables: dict[str, KeyedTable],
):
    """Execute one ``CALL <proc>(name => value, ...)`` table-service
    statement (Hudi's SQL procedures: run_clean, run_compaction,
    rollback_to_instant, create/delete_savepoint — plus this engine's
    own maintenance verbs). Named arguments only (``=>`` per the
    Hudi/Iceberg convention; ``=`` accepted); ``table => '<name>'``
    is required and resolves through ``tables``. Returns whatever the
    underlying method returns (commit id, summary dict, folded-token
    list). Unknown procedures/arguments refuse loudly."""
    stmt = _strip(statement)
    m = re.match(
        rf"^CALL ({_IDENT})\s*\((.*)\)$", stmt, re.IGNORECASE | re.DOTALL
    )
    if not m:
        raise SqlDmlError(
            "unparseable CALL; supported: CALL proc(name => value, "
            f"...) with proc one of {sorted(_PROCS)}"
        )
    proc, inner = m.group(1).lower(), m.group(2)
    if proc not in _PROCS:
        raise SqlDmlError(
            f"unknown procedure {proc!r} (supported: {sorted(_PROCS)})"
        )
    method, allowed, needs_spark = _PROCS[proc]
    kw: dict = {}
    tbl_name = None
    for item in _split_top(inner):
        am = re.match(r"^([A-Za-z_][A-Za-z0-9_]*)\s*(?:=>|=)\s*(.+)$",
                      item, re.DOTALL)
        if not am:
            raise SqlDmlError(
                f"unparseable CALL argument {item!r} (named form "
                f"only: name => value)"
            )
        name, raw = am.group(1).lower(), am.group(2).strip()
        val = raw[1:-1] if raw[:1] in "'\"" and raw[-1:] == raw[:1] else raw
        if name == "table":
            tbl_name = val
            continue
        if name not in allowed:
            raise SqlDmlError(
                f"procedure {proc!r} takes no argument {name!r} "
                f"(supported: table, {sorted(allowed)})"
            )
        if name in kw:
            raise SqlDmlError(f"duplicate CALL argument {name!r}")
        co = allowed[name]
        try:
            kw[name] = (
                [c.strip() for c in val.split(",")]
                if co is _COMMA_LIST
                else co(val)
            )
        except ValueError as e:
            raise SqlDmlError(
                f"CALL argument {name!r}: cannot read {val!r} as "
                f"{getattr(co, '__name__', co)}"
            ) from e
    if tbl_name is None:
        raise SqlDmlError("CALL needs table => '<name>'")
    tbl = _resolve(tbl_name, tables)
    kw = {
        _PROC_ARG_RENAME.get((method, k), k): v for k, v in kw.items()
    }
    fn = getattr(tbl, method)
    return fn(spark, **kw) if needs_spark else fn(**kw)
