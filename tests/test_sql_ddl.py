"""SQL DDL front-end (VERDICT r13 #3): CREATE TABLE routes to the
KeyedTable constructor + an empty declared-schema commit, CTAS to
bulk_insert, DROP unregisters (PURGE deletes) — and everything the
grammar cannot map 1:1 is refused loudly."""

from __future__ import annotations

import datetime
import os

import pytest
from pyspark.sql import Row

from hudi_glue_spark.sql_ddl import SqlDdlError, sql_ddl
from hudi_glue_spark.sql_dml import sql_dml


def ts(h):
    return datetime.datetime(2024, 1, 1, h)


def test_create_insert_read_sql_only(spark, tmp_path):
    """The verdict's 'done' bar: create, load, and read a table
    through SQL statements only."""
    tables = {}
    tbl = sql_ddl(
        spark,
        """CREATE TABLE docs (
             pk BIGINT, part STRING, score DECIMAL(10,2),
             update_ts TIMESTAMP)
           USING keyed
           PARTITIONED BY (part)
           TBLPROPERTIES ('primaryKey' = 'pk',
                          'preCombineField' = 'update_ts')""",
        tables, base_dir=str(tmp_path))
    assert tables["docs"] is tbl
    assert tbl.exists() and tbl.key == ["pk"]
    assert tbl.precombine == "update_ts"
    assert tbl.partition_by == ["part"]
    # empty CREATE: readable, zero rows, DECLARED schema
    empty = tbl.read(spark)
    assert empty.count() == 0
    assert dict(empty.dtypes)["score"] == "decimal(10,2)"
    # SQL-only load + read-back
    sql_dml(
        spark,
        "INSERT INTO docs VALUES "
        "(1, 'a', CAST(1.50 AS DECIMAL(10,2)), TIMESTAMP'2024-01-01'),"
        "(2, 'b', CAST(2.25 AS DECIMAL(10,2)), TIMESTAMP'2024-01-01')",
        tables=tables)
    tbl.register(spark, "docs_v")
    got = {(r["pk"], str(r["score"]))
           for r in spark.sql("SELECT pk, score FROM docs_v").collect()}
    assert got == {(1, "1.50"), (2, "2.25")}


def test_ctas(spark, tmp_path):
    spark.createDataFrame(
        [Row(pk=1, part="a", val=1.0, update_ts=ts(1)),
         Row(pk=1, part="a", val=2.0, update_ts=ts(2)),  # dup key: dedupe
         Row(pk=2, part="b", val=3.0, update_ts=ts(1))]
    ).createOrReplaceTempView("ctas_src")
    tables = {}
    tbl = sql_ddl(
        spark,
        f"""CREATE TABLE ct USING keyed PARTITIONED BY (part)
            LOCATION '{tmp_path / "ct"}'
            TBLPROPERTIES ('primaryKey'='pk', 'preCombineField'='update_ts')
            AS SELECT * FROM ctas_src""",
        tables)
    rows = {(r["pk"], r["val"]) for r in tbl.read(spark).collect()}
    assert rows == {(1, 2.0), (2, 3.0)}  # precombine kept ts(2)


def test_if_not_exists_and_drop(spark, tmp_path):
    tables = {}
    stmt = ("CREATE TABLE t (pk BIGINT, update_ts TIMESTAMP) USING keyed "
            "TBLPROPERTIES ('primaryKey'='pk', 'preCombineField'='update_ts')")
    t1 = sql_ddl(spark, stmt, tables, base_dir=str(tmp_path))
    with pytest.raises(SqlDdlError, match="already exists"):
        sql_ddl(spark, stmt, tables, base_dir=str(tmp_path))
    t2 = sql_ddl(spark, stmt.replace("TABLE t", "TABLE IF NOT EXISTS t"),
                 tables, base_dir=str(tmp_path))
    assert t2 is t1
    sql_ddl(spark, "DROP TABLE t PURGE", tables, base_dir=str(tmp_path))
    assert "t" not in tables and not os.path.exists(t1.path)
    # IF EXISTS on a gone table is a no-op; bare DROP refuses
    sql_ddl(spark, "DROP TABLE IF EXISTS t", tables)
    with pytest.raises(SqlDdlError, match="unknown table"):
        sql_ddl(spark, "DROP TABLE t", tables)


def test_refusals(spark, tmp_path):
    tables = {}
    base = str(tmp_path)
    cases = [
        # wrong format
        ("CREATE TABLE t (pk BIGINT) USING delta "
         "TBLPROPERTIES ('primaryKey'='pk','preCombineField'='pk')",
         "one table format"),
        # unknown property (typo must not silently drop the key)
        ("CREATE TABLE t (pk BIGINT) USING keyed "
         "TBLPROPERTIES ('primarykeyy'='pk','preCombineField'='pk')",
         "unsupported table property"),
        # missing primaryKey
        ("CREATE TABLE t (pk BIGINT) USING keyed "
         "TBLPROPERTIES ('preCombineField'='pk')", "primaryKey"),
        # partition column not in declared schema
        ("CREATE TABLE t (pk BIGINT, update_ts TIMESTAMP) USING keyed "
         "PARTITIONED BY (nope) TBLPROPERTIES "
         "('primaryKey'='pk','preCombineField'='update_ts')",
         "structural"),
        # column list + AS
        ("CREATE TABLE t (pk BIGINT) USING keyed "
         "TBLPROPERTIES ('primaryKey'='pk','preCombineField'='pk') "
         "AS SELECT 1", "no column list"),
        # other DDL verbs
        ("ALTER TABLE t ADD COLUMN x INT", "unknown table"),
        ("GRANT SELECT ON t TO x", "unsupported DDL"),
        ("CREATE VIEW v AS SELECT 1", "unparseable CREATE"),
    ]
    for stmt, msg in cases:
        with pytest.raises((SqlDdlError, ValueError), match=msg):
            sql_ddl(spark, stmt, tables, base_dir=base)
    assert tables == {}
    # no LOCATION anywhere
    with pytest.raises(SqlDdlError, match="base_dir"):
        sql_ddl(spark,
                "CREATE TABLE t (pk BIGINT) USING keyed TBLPROPERTIES "
                "('primaryKey'='pk','preCombineField'='pk')", tables)


def test_nested_type_parens_parse(spark, tmp_path):
    """decimal(10,2) / array<...> inside the column list must not
    truncate the balanced-paren scan."""
    tables = {}
    tbl = sql_ddl(
        spark,
        "CREATE TABLE nt (pk BIGINT, emb ARRAY<FLOAT>, "
        "amt DECIMAL(12,3), update_ts TIMESTAMP) USING keyed "
        "TBLPROPERTIES ('primaryKey'='pk', "
        "'preCombineField'='update_ts')",
        tables, base_dir=str(tmp_path))
    dt = dict(tbl.read(spark).dtypes)
    assert dt["amt"] == "decimal(12,3)" and dt["emb"] == "array<float>"


def test_alter_add_and_drop_columns(spark, tmp_path):
    """ALTER TABLE maps onto the metadata-only evolution methods:
    ADD publishes a schema commit (old files read the new column as
    NULL on BOTH engines), DROP retires the name; RENAME / retype
    refuse."""
    tables = {}
    tbl = sql_ddl(
        spark,
        "CREATE TABLE at (pk BIGINT, part STRING, v DOUBLE, "
        "update_ts TIMESTAMP) USING keyed PARTITIONED BY (part) "
        "TBLPROPERTIES ('primaryKey'='pk', "
        "'preCombineField'='update_ts')",
        tables, base_dir=str(tmp_path))
    sql_dml(spark,
            "INSERT INTO at VALUES (1, 'a', 1.5, TIMESTAMP'2024-01-01')",
            tables=tables)
    files_before = None
    from hudi_glue_spark.table import manifest as M
    files_before = set(M.read_manifest(tbl.path).files)
    sql_ddl(spark, "ALTER TABLE at ADD COLUMNS (score DOUBLE, tag STRING)",
            tables)
    # metadata-only: identical file set
    assert set(M.read_manifest(tbl.path).files) == files_before
    row = tbl.read(spark).collect()[0]
    assert row["score"] is None and row["tag"] is None
    # new column is writable; old rows stay NULL
    sql_dml(spark,
            "INSERT INTO at SELECT 2 pk, 'a' part, 2.5 v, "
            "TIMESTAMP'2024-01-01' update_ts, 9.0 score, 'x' tag",
            tables=tables)
    got = {r["pk"]: r["score"] for r in tbl.read(spark).collect()}
    assert got == {1: None, 2: 9.0}
    # DROP retires; re-ADD refuses
    sql_ddl(spark, "ALTER TABLE at DROP COLUMN tag", tables)
    assert "tag" not in tbl.read(spark).columns
    with pytest.raises(ValueError, match="re-add"):
        sql_ddl(spark, "ALTER TABLE at ADD COLUMN (tag STRING)", tables)
    # refusals
    with pytest.raises(SqlDdlError, match="not supported"):
        sql_ddl(spark, "ALTER TABLE at RENAME COLUMN v TO w", tables)
    with pytest.raises(ValueError, match="already exist"):
        sql_ddl(spark, "ALTER TABLE at ADD COLUMN (v DOUBLE)", tables)
    with pytest.raises(ValueError, match="key/precombine/partition"):
        sql_ddl(spark, "ALTER TABLE at DROP COLUMN pk", tables)


def test_add_columns_manifest_engine_nulls(spark, tmp_path):
    """The manifest (pyarrow) read engine must fill a post-add column
    with NULL for pre-add files, same as the native engine."""
    from hudi_glue_spark.table import KeyedTable
    import datetime

    t = KeyedTable(str(tmp_path / "t"), key="pk", precombine="update_ts")
    t.bulk_insert(spark.createDataFrame(
        [Row(pk=1, v=1.0, update_ts=ts(1))]))
    t.add_columns({"score": "double"})
    native = t.read(spark, engine="native").collect()
    man = t.read(spark, engine="manifest").collect()
    assert [r.asDict() for r in native] == [r.asDict() for r in man]
    assert native[0]["score"] is None
