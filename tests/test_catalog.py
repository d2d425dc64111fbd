"""Warehouse-directory catalog (VERDICT r14 "Next round" #2): a FRESH
session must be able to resolve table names from the warehouse dir
alone — no carried handles, no paths — and collisions must refuse."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Row

from hudi_glue_spark.catalog import CatalogError, catalog_attach, catalog_open
from hudi_glue_spark.sql_ddl import sql_ddl
from hudi_glue_spark.sql_dml import sql_dml
from hudi_glue_spark.sql_read import sql_read
from hudi_glue_spark.table import KeyedTable


def ts(h):
    import datetime

    return datetime.datetime(2024, 1, 1, h)


@pytest.fixture
def warehouse(spark, tmp_path):
    base = str(tmp_path / "wh")
    tables: dict = {}
    sql_ddl(
        spark,
        "CREATE TABLE alpha (pk BIGINT, val DOUBLE, update_ts TIMESTAMP) "
        "USING keyed TBLPROPERTIES ('primaryKey'='pk', "
        "'preCombineField'='update_ts')",
        tables,
        base_dir=base,
    )
    tables["alpha"].upsert(spark.createDataFrame(
        [Row(pk=1, val=10.0, update_ts=ts(1)),
         Row(pk=2, val=20.0, update_ts=ts(1))]))
    return base, tables


def test_reopen_by_name_reads_and_writes(spark, warehouse):
    base, session1 = warehouse
    fresh = catalog_open(base)  # no paths, no carried handles
    assert set(fresh) == {"alpha"}
    assert fresh["alpha"] is not session1["alpha"]
    assert fresh["alpha"].key == ["pk"]
    got = sql_read(spark, "SELECT pk, val FROM alpha", tables=fresh)
    assert {(r["pk"], r["val"]) for r in got.collect()} == {
        (1, 10.0), (2, 20.0)}
    # the reopened handle can WRITE through sql_dml too
    spark.createDataFrame([Row(pk=3, val=30.0, update_ts=ts(2))]) \
         .createOrReplaceTempView("cat_t_src")
    sql_dml(spark, "INSERT INTO alpha SELECT * FROM cat_t_src",
            tables=fresh)
    assert fresh["alpha"].read(spark).count() == 3


def test_merge_keeps_held_handle_and_refuses_repoint(
    spark, warehouse, tmp_path
):
    base, session1 = warehouse
    held = session1["alpha"]
    merged = catalog_open(base, tables=session1)
    assert merged["alpha"] is held  # same path: caller's handle kept
    # a held name bound to a DIFFERENT path refuses
    rogue = KeyedTable(str(tmp_path / "elsewhere"), key="pk",
                       precombine="update_ts")
    with pytest.raises(CatalogError, match="name collision"):
        catalog_open(base, tables={"ALPHA": rogue})


def test_case_collision_in_directory_refused(spark, warehouse):
    base, tables = warehouse
    sql_ddl(
        spark,
        "CREATE TABLE Alpha (pk BIGINT, update_ts TIMESTAMP) "
        "USING keyed TBLPROPERTIES ('primaryKey'='pk', "
        "'preCombineField'='update_ts')",
        {},
        base_dir=base,
    )
    with pytest.raises(CatalogError, match="case-colliding"):
        catalog_open(base)


def test_attach_explicit_location(spark, warehouse, tmp_path):
    base, _ = warehouse
    ext = KeyedTable(str(tmp_path / "outside"), key="pk",
                     precombine="update_ts")
    ext.bulk_insert(spark.createDataFrame(
        [Row(pk=9, val=90.0, update_ts=ts(1))]))
    catalog_attach(base, "ext_t", ext)
    catalog_attach(base, "ext_t", ext)  # idempotent
    fresh = catalog_open(base)
    assert set(fresh) == {"alpha", "ext_t"}
    assert fresh["ext_t"].read(spark).count() == 1
    # attaching a DIFFERENT table under a resolving name refuses
    other = KeyedTable(str(tmp_path / "other"), key="pk",
                       precombine="update_ts")
    with pytest.raises(CatalogError, match="already resolves"):
        catalog_attach(base, "ALPHA", other)
    # a stale link (table gone) refuses loudly at open
    import shutil

    shutil.rmtree(ext.path)
    with pytest.raises(CatalogError, match="stale link"):
        catalog_open(base)


def test_ddl_explicit_location_auto_attached(spark, warehouse, tmp_path):
    # sql_ddl CREATE with LOCATION + base_dir records the pointer file
    base, _ = warehouse
    loc = str(tmp_path / "explicit_loc")
    tables: dict = {}
    sql_ddl(
        spark,
        f"CREATE TABLE exp_t (pk BIGINT, update_ts TIMESTAMP) "
        f"USING keyed LOCATION '{loc}' "
        f"TBLPROPERTIES ('primaryKey'='pk', "
        f"'preCombineField'='update_ts')",
        tables,
        base_dir=base,
    )
    assert set(catalog_open(base)) == {"alpha", "exp_t"}
    # DROP retires the pointer so the catalog forgets the name
    sql_ddl(spark, "DROP TABLE exp_t PURGE", tables, base_dir=base)
    assert set(catalog_open(base)) == {"alpha"}


def test_show_tables_and_describe(spark, warehouse):
    base, _ = warehouse
    fresh = catalog_open(base)
    shown = sql_read(spark, "SHOW TABLES", tables=fresh).collect()
    assert [(r["table_name"], r["location"]) for r in shown] == [
        ("alpha", fresh["alpha"].path)]
    desc = {r["col_name"]: r["data_type"] for r in sql_read(
        spark, "DESCRIBE TABLE alpha", tables=fresh).collect()}
    assert desc["pk"] == "bigint"
    assert desc["# primaryKey"] == "pk"
    assert desc["# preCombineField"] == "update_ts"
    from hudi_glue_spark.sql_read import SqlReadError

    with pytest.raises(SqlReadError, match="not a managed table"):
        sql_read(spark, "DESCRIBE nope", tables=fresh)


def test_missing_warehouse_refused(tmp_path):
    with pytest.raises(CatalogError, match="does not exist"):
        catalog_open(str(tmp_path / "nope"))


def test_non_table_dirs_ignored(spark, warehouse, tmp_path):
    base, _ = warehouse
    os.makedirs(os.path.join(base, "random_junk"))
    with open(os.path.join(base, "notes.txt"), "w") as f:
        f.write("not a table")
    assert set(catalog_open(base)) == {"alpha"}
