"""Manifest-backed snapshot relation (sources/manifest_relation.py).

Proves the Python-DataSource full-read path is byte-equivalent to the
native explicit-path scan across the table features that touch it:
partition-value reconstruction, schema evolution, time travel, orphan
invisibility (no ``_manifests``-bypassing listing), and pushed-filter
file pruning.
"""

from __future__ import annotations

import datetime
import json
import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from hudi_glue_spark.sources import manifest_relation as MR
from hudi_glue_spark.table import KeyedTable
from hudi_glue_spark.table import manifest as M


def ts(day: int, hour: int = 12) -> datetime.datetime:
    return datetime.datetime(2026, 1, day, hour, 0, 0)


def rows_set(df):
    return {tuple(r) for r in df.collect()}


@pytest.fixture
def tbl(spark, tmp_path):
    t = KeyedTable(
        str(tmp_path / "tbl"),
        key="pk",
        precombine="update_ts",
        partition_by="part",
        stats_cols=["update_ts", "val"],
    )
    t.bulk_insert(
        spark.createDataFrame(
            [
                Row(pk=1, part="a", val=10, update_ts=ts(1)),
                Row(pk=2, part="a", val=20, update_ts=ts(1)),
                Row(pk=3, part="b", val=30, update_ts=ts(1)),
                Row(pk=4, part="b", val=40, update_ts=ts(2)),
            ]
        )
    )
    t.upsert(
        spark.createDataFrame(
            [
                Row(pk=2, part="a", val=21, update_ts=ts(3)),
                Row(pk=5, part="c", val=50, update_ts=ts(3)),
            ]
        )
    )
    return t


def test_manifest_engine_matches_native(spark, tbl):
    nat = tbl.read(spark, engine="native")
    man = tbl.read(spark, engine="manifest")
    assert man.schema == nat.schema
    assert rows_set(man) == rows_set(nat)


def test_manifest_engine_time_travel(spark, tbl):
    first = tbl.commits()[0]
    nat = tbl.read(spark, at=first, engine="native")
    man = tbl.read(spark, at=first, engine="manifest")
    assert rows_set(man) == rows_set(nat)
    assert man.count() == 4  # pre-upsert snapshot


def test_manifest_engine_schema_evolution_null_fill(spark, tbl):
    # add a column AFTER the first files were written: old files lack
    # it physically, the relation must NULL-fill per committed schema
    tbl.upsert(
        spark.createDataFrame(
            [Row(pk=6, part="a", val=60, update_ts=ts(4), note="n6")]
        )
    )
    nat = tbl.read(spark, engine="native")
    man = tbl.read(spark, engine="manifest")
    assert man.schema == nat.schema
    assert rows_set(man) == rows_set(nat)
    got = {r.pk: r.note for r in man.collect()}
    assert got[6] == "n6" and got[1] is None


def test_manifest_engine_orphan_invisible(spark, tbl):
    """An orphan parquet dropped into the data dir must stay invisible:
    the relation serves its file list from ``_manifests`` only — any
    data-dir listing would leak the orphan's rows."""
    ddir = M.data_dir(tbl.path)
    orphan_dir = os.path.join(ddir, "part=a")
    victim = tbl.read(spark, engine="native").filter("pk = 1").limit(1)
    victim.write.mode("append").parquet("file://" + orphan_dir)
    man = tbl.read(spark, engine="manifest")
    assert man.filter("pk = 1").count() == 1  # not duplicated by orphan
    assert "keyed_manifest" in man._jdf.queryExecution().toString()


def test_manifest_engine_null_and_int_partitions(spark, tmp_path):
    t = KeyedTable(
        str(tmp_path / "tbl2"),
        key="pk",
        precombine="u",
        partition_by="day",
    )
    t.bulk_insert(
        spark.createDataFrame(
            [
                Row(pk=1, day=5, u=1),
                Row(pk=2, day=6, u=1),
                Row(pk=3, day=None, u=1),
            ]
        )
    )
    nat = t.read(spark, engine="native")
    man = t.read(spark, engine="manifest")
    assert man.schema == nat.schema
    assert rows_set(man) == rows_set(nat)
    assert man.filter("day IS NULL").count() == 1
    assert man.filter("day = 5").count() == 1


def _planned_files(tbl, filters, spark=None):
    """Instantiate the reader directly and count files its partitions()
    would scan after pushFilters — white-box pruning check."""
    schema_json = M.read_manifest(tbl.path).schema_json
    from pyspark.sql.types import StructType

    reader = MR.ManifestSnapshotReader(
        {
            "path": tbl.path,
            "at": "",
            "schema_json": schema_json,
            "partition_by": json.dumps(tbl.partition_by or []),
            "parallelism_hint": "1",
        },
        StructType.fromJson(json.loads(schema_json)),
    )
    remaining = reader.pushFilters(filters)
    assert list(remaining) == list(filters)  # all re-applied by Spark
    parts = reader.partitions()
    return sorted(f for p in parts for f in p.value)


def test_pushed_filters_prune_files(spark, tbl):
    from pyspark.sql.datasource import EqualTo, GreaterThanOrEqual, In

    all_files = _planned_files(tbl, [])
    assert all_files == sorted(M.read_manifest(tbl.path).files)

    # stats-range pruning on a stats_col: val=50 lives only in part=c
    pruned = _planned_files(tbl, [EqualTo(("val",), 50)])
    assert pruned == tbl.files_in_range("val", 50, 50)
    assert len(pruned) < len(all_files)

    # one-sided range
    ge = _planned_files(tbl, [GreaterThanOrEqual(("update_ts",), ts(3))])
    assert set(ge) == set(
        tbl.files_in_range("update_ts", ts(3), datetime.datetime.max)
    )
    assert len(ge) < len(all_files)

    # partition-dir pruning (no stats needed on the partition column)
    part_a = _planned_files(tbl, [EqualTo(("part",), "a")])
    assert all("part=a/" in f for f in part_a)
    part_in = _planned_files(tbl, [In(("part",), ("a", "c"))])
    assert all(("part=a/" in f or "part=c/" in f) for f in part_in)
    assert len(part_in) < len(all_files)

    # unknown filter shapes prune nothing, never error
    from pyspark.sql.datasource import StringStartsWith

    assert _planned_files(tbl, [StringStartsWith(("part",), "x")]) == all_files


def test_filtered_read_matches_native(spark, tbl):
    cond = "val >= 21 AND part = 'a'"
    nat = tbl.read(spark, engine="native").filter(cond)
    man = tbl.read(spark, engine="manifest").filter(cond)
    assert rows_set(man) == rows_set(nat)


def test_auto_threshold_routes(spark, tbl, monkeypatch):
    import hudi_glue_spark.table.keyed_table as KT

    monkeypatch.setattr(KT, "MANIFEST_READ_MIN_FILES", 1)
    df = tbl.read(spark)
    assert "keyed_manifest" in df._jdf.queryExecution().toString()
    assert rows_set(df) == rows_set(tbl.read(spark, engine="native"))
    monkeypatch.setattr(KT, "MANIFEST_READ_MIN_FILES", 10**9)
    df2 = tbl.read(spark)
    assert "keyed_manifest" not in df2._jdf.queryExecution().toString()


def test_read_columns_projection_both_engines(spark, tbl):
    """read(columns=...) is a physical projection on the manifest
    engine (the pyarrow scan decodes only those columns) and a
    Catalyst-pruned select on the native engine — same rows, same
    subset schema, partition column includable or omittable."""
    for cols in (["pk", "val"], ["pk", "part"], ["val"]):
        nat = tbl.read(spark, engine="native", columns=cols)
        man = tbl.read(spark, engine="manifest", columns=cols)
        assert man.columns == nat.columns
        assert man.columns == [
            c for c in ["pk", "part", "val", "update_ts"] if c in cols
        ]
        assert rows_set(man) == rows_set(nat)
    with pytest.raises(ValueError, match="not in committed schema"):
        tbl.read(spark, columns=["pk", "nope"])


def test_pushdown_pruning_all_files_yields_empty(spark, tbl):
    """A pushed filter that prunes EVERY file (value outside every
    file's stats range) must yield an empty scan, not a task error —
    Spark schedules one None-partition task when partitions() returns
    an empty list."""
    df = tbl.read(spark, engine="manifest")
    assert df.filter(F.col("pk") == -999_999).count() == 0
