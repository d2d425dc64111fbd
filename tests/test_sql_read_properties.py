"""Property tests for sql_read's no-silent-misread contract.

The front-end's promise is not "parses everything" — it is that a
statement either (a) resolves exactly as standard SQL would, or (b)
raises SqlReadError / a Spark analysis error. These properties fuzz
the three scoping rules ADVICE r14 showed can silently corrupt
results when wrong: string-literal masking, CTE shadowing, and
time-travel version resolution.
"""

from __future__ import annotations

import datetime

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row

from hudi_glue_spark.sql_read import SqlReadError, sql_read
from hudi_glue_spark.table import KeyedTable

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)

#: literal fragments chosen to collide with every structural regex the
#: rewriter runs: table refs, time travel, comma-join refusal, CTEs
_NASTY = [
    "FROM t", "JOIN t x", ", t", "(t", "FROM t VERSION AS OF 0",
    "WITH t AS", " t ", "from T where", "JOIN   t", "t, side",
]
_FILLER = st.text(
    alphabet="abc XY.=<>-0123456789", min_size=0, max_size=8
)
_LITERAL = st.builds(
    lambda pre, mid, post: pre + mid + post,
    _FILLER, st.sampled_from(_NASTY), _FILLER,
)


@pytest.fixture(scope="module")
def prop_tbl(spark, tmp_path_factory):
    t = KeyedTable(
        str(tmp_path_factory.mktemp("sqlprop") / "t"),
        key="pk",
        precombine="v",
    )
    ts = datetime.datetime(2024, 1, 1)
    t.bulk_insert(spark.createDataFrame(
        [Row(pk=1, val=10.0, v=ts), Row(pk=2, val=20.0, v=ts)]))
    t.upsert(spark.createDataFrame([Row(pk=3, val=30.0, v=ts)]))
    t.upsert(spark.createDataFrame([Row(pk=1, val=11.0, v=ts)]))
    return t


@settings(**_SETTINGS)
@given(lit=_LITERAL)
def test_string_literals_never_rewritten(spark, prop_tbl, lit):
    """ANY literal — including ones spelling table refs, time travel,
    or comma joins over the managed name — must round-trip byte-for-
    byte through the rewriter, or the statement must refuse loudly.
    A changed value (the r14 failure mode) is the one outcome that
    must never happen."""
    esc = lit.replace("'", "''")
    try:
        rows = sql_read(
            spark,
            f"SELECT pk, '{esc}' AS s FROM t WHERE pk = 2",
            tables={"t": prop_tbl},
        ).collect()
    except SqlReadError:
        return  # loud refusal is allowed; silent corruption is not
    assert [(r["pk"], r["s"]) for r in rows] == [(2, lit)]


@settings(**_SETTINGS)
@given(
    n=st.integers(min_value=-1000, max_value=1000),
    collide=st.booleans(),
)
def test_cte_always_shadows(spark, prop_tbl, n, collide):
    """A WITH-bound name must resolve to the CTE whether or not it
    collides with a managed table — never to the snapshot."""
    name = "t" if collide else "w"
    rows = sql_read(
        spark,
        f"WITH {name} AS (SELECT {n} AS a) SELECT * FROM {name}",
        tables={"t": prop_tbl},
    ).collect()
    assert [r["a"] for r in rows] == [n]


@settings(**_SETTINGS)
@given(data=st.data())
def test_version_ordinal_matches_api(spark, prop_tbl, data):
    """VERSION AS OF <ordinal> must equal read(at=commits()[ordinal])
    for every in-range ordinal (positive and negative); out-of-range
    ordinals must refuse, not clamp."""
    cids = prop_tbl.commits()
    i = data.draw(
        st.integers(min_value=-len(cids) - 3, max_value=len(cids) + 2)
    )
    stmt = f"SELECT pk, val FROM t VERSION AS OF {i}"
    if -len(cids) <= i < len(cids):
        got = {
            (r["pk"], r["val"])
            for r in sql_read(spark, stmt, tables={"t": prop_tbl}).collect()
        }
        want = {
            (r["pk"], r["val"])
            for r in prop_tbl.read(spark, at=cids[i])
            .select("pk", "val").collect()
        }
        assert got == want
    else:
        with pytest.raises(SqlReadError):
            sql_read(spark, stmt, tables={"t": prop_tbl})
