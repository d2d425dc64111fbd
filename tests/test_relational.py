"""Unit tests for the reference-surface relational operators."""

from __future__ import annotations

import datetime

from pyspark.sql import Row
from pyspark.sql import functions as F

from hudi_glue_spark.operators.relational import (
    conditional_rewrite,
    drop_columns,
    filter_eq,
    is_non_empty,
)
from hudi_glue_spark.functions.scalar import (
    hive_partition_value,
    stable_surrogate_key,
    surrogate_key,
    ts_from_string,
)


def _df(spark):
    return spark.createDataFrame(
        [Row(a=1, b="x"), Row(a=2, b="y"), Row(a=1, b="z")]
    )


def test_filter_eq(spark):
    assert filter_eq(_df(spark), "a", 1).count() == 2


def test_conditional_rewrite_null_fallthrough(spark):
    # Reference semantics: when() with no otherwise → NULL for non-matches
    # (glue/NYTaxiDataPrep.py:37).
    out = conditional_rewrite(_df(spark), "a", F.col("a") == 1, F.lit(0))
    vals = sorted([r.a for r in out.collect()], key=lambda v: (v is None, v))
    assert vals == [0, 0, None]


def test_drop_columns_identity_and_real(spark):
    df = _df(spark)
    assert drop_columns(df, []).columns == df.columns  # reference passes []
    assert drop_columns(df, ["b"]).columns == ["a"]


def test_is_non_empty(spark):
    df = _df(spark)
    assert is_non_empty(df)
    assert not is_non_empty(df.filter(F.lit(False)))


def test_surrogate_key_unique(spark):
    df = _df(spark).withColumn("pk_col", surrogate_key())
    vals = [r.pk_col for r in df.collect()]
    assert len(set(vals)) == 3


def test_stable_surrogate_key_deterministic(spark):
    df = _df(spark)
    a = {(r.b, r.pk_col) for r in stable_surrogate_key(df, ["b"]).collect()}
    b = {(r.b, r.pk_col) for r in stable_surrogate_key(df.repartition(3), ["b"]).collect()}
    assert a == b == {("x", 1), ("y", 2), ("z", 3)}


def test_ts_from_string(spark):
    row = spark.range(1).select(ts_from_string("2020-01-15 10:30:00").alias("t")).first()
    assert row.t == datetime.datetime(2020, 1, 15, 10, 30)


def test_hive_partition_value(spark):
    out = _df(spark).select(hive_partition_value("a").alias("p")).distinct().collect()
    assert {r.p for r in out} == {"a=1", "a=2"}
