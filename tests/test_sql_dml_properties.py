"""Property tests for sql_dml's refuse-or-correct contract on INSERT.

ADVICE r14 caught the INSERT parser misreading a parenthesized query
as a column list — exactly the statement-shape class this fuzz
covers: for ANY column-list permutation/subset and value ordering,
INSERT must either land the values on the right columns (model-
checked against a dict) or refuse with SqlDmlError; it must never
write a row with silently-permuted or defaulted-away values."""

from __future__ import annotations

import datetime

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row

from hudi_glue_spark.sql_dml import SqlDmlError, sql_dml
from hudi_glue_spark.table import KeyedTable

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)

_ALL = ["pk", "part", "val", "update_ts"]
_TS = datetime.datetime(2024, 1, 1)


@settings(**_SETTINGS)
@given(
    cols=st.permutations(_ALL).flatmap(
        lambda p: st.integers(min_value=1, max_value=4).map(lambda n: p[:n])
    ),
    pk=st.integers(min_value=10, max_value=99),
    val=st.floats(
        min_value=-1e6, max_value=1e6, allow_nan=False, width=64
    ),
)
def test_insert_column_list_lands_or_refuses(
    spark, tmp_path_factory, cols, pk, val
):
    root = str(tmp_path_factory.mktemp("dmlprop") / "t")
    t = KeyedTable(root, key="pk", precombine="update_ts",
                   partition_by="part")
    t.bulk_insert(spark.createDataFrame(
        [Row(pk=1, part="a", val=1.0, update_ts=_TS)]))
    vals = {
        "pk": pk, "part": "z", "val": val,
        "update_ts": _TS + datetime.timedelta(hours=1),
    }
    def lit(c):
        v = vals[c]
        if c == "update_ts":
            return f"TIMESTAMP '{v}'"
        return repr(v) if c != "part" else f"'{v}'"
    stmt = (
        f"INSERT INTO t ({', '.join(cols)}) "
        f"VALUES ({', '.join(lit(c) for c in cols)})"
    )
    try:
        sql_dml(spark, stmt, tables={"t": t})
    except SqlDmlError:
        # the grammar refuses lists omitting identity columns
        # (key/partition/precombine) — NULL identities are the hazard
        assert not {"pk", "part", "update_ts"} <= set(cols)
        return
    # accepted → every named column landed on ITS OWN value
    assert {"pk", "part", "update_ts"} <= set(cols)
    got = [
        r.asDict()
        for r in t.read(spark).filter(f"pk = {pk}").collect()
    ]
    assert len(got) == 1
    for c in cols:
        assert got[0][c] == vals[c], (c, stmt)
    if "val" not in cols:
        assert got[0]["val"] is None  # unnamed column is NULL, per SQL
