"""SQL time-travel reads + live registration (VERDICT r13 #2).

``sql_read`` must route VERSION AS OF / TIMESTAMP AS OF onto the
exact ``read(at=/as_of=)`` snapshots, preserve alias resolution, and
refuse what it cannot serve; ``register(live=True)`` must make a view
track HEAD across commits without re-register."""

from __future__ import annotations

import datetime
import time

import pytest
from pyspark.sql import Row

from hudi_glue_spark.sql_read import SqlReadError, sql_read
from hudi_glue_spark.table import KeyedTable


def ts(h):
    return datetime.datetime(2024, 1, 1, h)


@pytest.fixture
def tbl(spark, tmp_path):
    t = KeyedTable(str(tmp_path / "t"), key="pk", precombine="update_ts",
                   partition_by="part")
    t.bulk_insert(spark.createDataFrame(
        [Row(pk=1, part="a", val=10.0, update_ts=ts(1)),
         Row(pk=2, part="b", val=20.0, update_ts=ts(1))]))
    t.upsert(spark.createDataFrame(
        [Row(pk=1, part="a", val=11.0, update_ts=ts(2)),
         Row(pk=3, part="b", val=30.0, update_ts=ts(2))]))
    return t


def _vals(df):
    return {(r["pk"], r["val"]) for r in df.collect()}


def test_version_as_of_commit_id(spark, tbl):
    c0, c1 = tbl.commits()
    old = sql_read(
        spark, f"SELECT pk, val FROM t VERSION AS OF '{c0}'",
        tables={"t": tbl})
    assert _vals(old) == {(1, 10.0), (2, 20.0)}
    head = sql_read(spark, "SELECT pk, val FROM t", tables={"t": tbl})
    assert _vals(head) == {(1, 11.0), (2, 20.0), (3, 30.0)}
    # SQL path == API path, column for column
    api = tbl.read(spark, at=c0).select("pk", "val")
    assert _vals(old) == _vals(api)


def test_version_as_of_ordinal(spark, tbl):
    assert _vals(sql_read(
        spark, "SELECT pk, val FROM t VERSION AS OF 0",
        tables={"t": tbl})) == {(1, 10.0), (2, 20.0)}
    assert _vals(sql_read(
        spark, "SELECT pk, val FROM t VERSION AS OF -1",
        tables={"t": tbl})) == {(1, 11.0), (2, 20.0), (3, 30.0)}
    with pytest.raises(SqlReadError, match="retained"):
        sql_read(spark, "SELECT * FROM t VERSION AS OF 99",
                 tables={"t": tbl})
    with pytest.raises(SqlReadError, match="not a retained"):
        sql_read(spark, "SELECT * FROM t VERSION AS OF nope",
                 tables={"t": tbl})


def test_timestamp_as_of(spark, tbl):
    from hudi_glue_spark.table import manifest as M

    c0 = tbl.commits()[0]
    ts0 = M.read_manifest(tbl.path, c0).ts
    got = sql_read(
        spark, f"SELECT pk, val FROM t TIMESTAMP AS OF '{ts0}'",
        tables={"t": tbl})
    assert _vals(got) == _vals(tbl.read(spark, as_of=ts0)
                               .select("pk", "val"))
    with pytest.raises(ValueError, match="no commit at or before"):
        sql_read(spark,
                 "SELECT * FROM t TIMESTAMP AS OF '2000-01-01T00:00:00Z'",
                 tables={"t": tbl})


def test_alias_and_join_and_aggregates(spark, tbl):
    c0 = tbl.commits()[0]
    # old snapshot self-joined against head: alias resolution must
    # survive the rewrite on BOTH references
    out = sql_read(
        spark,
        f"""SELECT h.pk AS pk, h.val - o.val AS delta
            FROM t AS h JOIN t VERSION AS OF '{c0}' AS o
              ON h.pk = o.pk
            WHERE h.val > 0 ORDER BY pk""",
        tables={"t": tbl})
    assert [(r["pk"], r["delta"]) for r in out.collect()] == [
        (1, 1.0), (2, 0.0)]
    # bare reference + trailing keyword (no alias) keeps working
    n = sql_read(spark,
                 "SELECT count(*) AS n FROM t WHERE val > 15",
                 tables={"t": tbl}).collect()[0]["n"]
    assert n == 2


def test_unmanaged_view_passthrough_and_refusals(spark, tbl):
    spark.createDataFrame([Row(pk=1, tag="x")]) \
         .createOrReplaceTempView("side")
    out = sql_read(
        spark,
        "SELECT t.pk, side.tag FROM t JOIN side ON t.pk = side.pk",
        tables={"t": tbl})
    assert [(r["pk"], r["tag"]) for r in out.collect()] == [(1, "x")]
    with pytest.raises(SqlReadError, match="not a managed table"):
        sql_read(spark, "SELECT * FROM side VERSION AS OF 0",
                 tables={"t": tbl})
    with pytest.raises(SqlReadError, match="formatter collision"):
        sql_read(spark, "SELECT '{x}' FROM t", tables={"t": tbl})


def test_string_literal_not_rewritten(spark, tbl):
    # ADVICE r14 (medium): a quoted literal containing "FROM t" must
    # survive the rewrite byte-for-byte — the r14 rewriter replaced it
    # with a parameter hole, silently changing the comparison result.
    out = sql_read(
        spark,
        "SELECT pk FROM t WHERE 'x FROM t y' = 'x FROM t y'",
        tables={"t": tbl})
    assert out.count() == 3
    # double-quoted and escaped forms too
    out2 = sql_read(
        spark,
        "SELECT pk, 'join t later' AS note FROM t WHERE pk = 1",
        tables={"t": tbl})
    assert out2.collect()[0]["note"] == "join t later"


def test_cte_shadows_managed_table(spark, tbl):
    # ADVICE r14 (medium): standard SQL resolves the CTE first.
    out = sql_read(
        spark,
        "WITH t AS (SELECT 99 AS a) SELECT * FROM t",
        tables={"t": tbl})
    assert [r["a"] for r in out.collect()] == [99]
    # multi-CTE list: the second name shadows too
    out2 = sql_read(
        spark,
        "WITH x AS (SELECT 1 AS a), t AS (SELECT 2 AS a) "
        "SELECT t.a + x.a AS s FROM t JOIN x",
        tables={"t": tbl})
    assert [r["s"] for r in out2.collect()] == [3]
    # a CTE that does NOT collide leaves the managed read intact
    out3 = sql_read(
        spark,
        "WITH top AS (SELECT 1 AS want) "
        "SELECT count(*) AS n FROM t JOIN top ON t.pk = top.want",
        tables={"t": tbl})
    assert out3.collect()[0]["n"] == 1
    # time travel on a shadowed name is meaningless → loud refusal
    with pytest.raises(SqlReadError, match="WITH clause"):
        sql_read(
            spark,
            "WITH t AS (SELECT 1 AS a) SELECT * FROM t VERSION AS OF 0",
            tables={"t": tbl})


def test_comma_join_refused(spark, tbl):
    # VERDICT r14 #6: managed name after ','/'(' bypasses the
    # rewriter → loud up-front refusal with explicit-JOIN guidance.
    spark.createDataFrame([Row(pk=1)]).createOrReplaceTempView("side2")
    with pytest.raises(SqlReadError, match="explicit JOIN"):
        sql_read(spark, "SELECT * FROM side2, t", tables={"t": tbl})
    with pytest.raises(SqlReadError, match="explicit JOIN"):
        sql_read(spark, "SELECT * FROM (t JOIN side2 ON t.pk = side2.pk)",
                 tables={"t": tbl})
    # ...but a comma-join inside a string literal is fine
    out = sql_read(spark, "SELECT pk, 'from side2, t' AS s FROM t",
                   tables={"t": tbl})
    assert out.count() == 3
    # and a subquery FROM over the managed table still rewrites
    out2 = sql_read(
        spark,
        "SELECT count(*) AS n FROM (SELECT * FROM t WHERE val > 15) q",
        tables={"t": tbl})
    assert out2.collect()[0]["n"] == 2


def test_register_live_tracks_head(spark, tbl):
    tbl.register(spark, "live_t")
    assert spark.sql("SELECT count(*) c FROM live_t") \
                .collect()[0]["c"] == 3
    # a commit AFTER registration is visible WITHOUT re-register
    tbl.upsert(spark.createDataFrame(
        [Row(pk=9, part="a", val=90.0, update_ts=ts(3))]))
    assert spark.sql("SELECT count(*) c FROM live_t") \
                .collect()[0]["c"] == 4
    # delete too (DV/CoW path both route through _commit)
    tbl.delete_where(spark, "pk = 9")
    assert spark.sql("SELECT count(*) c FROM live_t") \
                .collect()[0]["c"] == 3
    tbl.unregister(spark, "live_t")
    assert "live_t" not in [v.name for v in spark.catalog.listTables()]


def test_register_name_takeover_not_stolen_back(spark, tbl, tmp_path):
    # ADVICE r14 (low): after tableB.register() takes a view name,
    # tableA's next commit must CEDE the name, not re-point it back.
    other = KeyedTable(str(tmp_path / "other"), key="pk",
                       precombine="update_ts")
    other.bulk_insert(spark.createDataFrame(
        [Row(pk=100, val=1.0, update_ts=ts(1))]))
    tbl.register(spark, "shared_v")
    other.register(spark, "shared_v")  # takeover
    q = "SELECT count(*) AS c FROM shared_v"
    assert spark.sql(q).collect()[0]["c"] == 1
    # a commit through the OLD owner leaves the view with the new one
    tbl.upsert(spark.createDataFrame(
        [Row(pk=7, part="a", val=70.0, update_ts=ts(3))]))
    assert spark.sql(q).collect()[0]["c"] == 1
    assert "shared_v" not in tbl._live_views  # ceded, not retried
    # ...and the NEW owner's live refresh still tracks its head
    other.upsert(spark.createDataFrame(
        [Row(pk=101, val=2.0, update_ts=ts(3))]))
    assert spark.sql(q).collect()[0]["c"] == 2
    other.unregister(spark, "shared_v")


def test_live_refresh_survives_transient_error(spark, tbl, monkeypatch):
    # ADVICE r14 (low): a transient refresh failure must NOT drop the
    # registration forever — the view heals on the next commit.
    from pyspark.sql import DataFrame

    tbl.register(spark, "flaky_v")
    orig = DataFrame.createOrReplaceTempView
    state = {"fail": 1}

    def flaky(self, name):
        if name == "flaky_v" and state["fail"]:
            state["fail"] = 0
            raise RuntimeError("transient catalog hiccup")
        return orig(self, name)

    monkeypatch.setattr(DataFrame, "createOrReplaceTempView", flaky)
    tbl.upsert(spark.createDataFrame(
        [Row(pk=8, part="a", val=80.0, update_ts=ts(3))]))
    # refresh failed once; tracking retained (session is alive)
    assert "flaky_v" in tbl._live_views
    tbl.upsert(spark.createDataFrame(
        [Row(pk=9, part="a", val=90.0, update_ts=ts(4))]))
    assert spark.sql("SELECT count(*) AS c FROM flaky_v") \
                .collect()[0]["c"] == 5
    tbl.unregister(spark, "flaky_v")


def test_register_pinned_snapshot(spark, tbl):
    tbl.register(spark, "pin_t", live=False)
    tbl.upsert(spark.createDataFrame(
        [Row(pk=9, part="a", val=90.0, update_ts=ts(3))]))
    # pinned registration keeps the AS OF view
    assert spark.sql("SELECT count(*) c FROM pin_t") \
                .collect()[0]["c"] == 3
    tbl.unregister(spark, "pin_t")


def test_describe_history(spark, tbl):
    hist = sql_read(spark, "DESCRIBE HISTORY t", tables={"t": tbl})
    rows = hist.collect()
    assert [r["op"] for r in rows] == ["bulk_insert", "upsert"]
    assert rows[-1]["commit_id"] == tbl.commits()[-1]
    with pytest.raises(SqlReadError, match="not a managed"):
        sql_read(spark, "DESCRIBE HISTORY nope", tables={"t": tbl})


def test_show_partitions(spark, tbl):
    # manifest-only partition listing, Hive dir format, sorted
    out = sql_read(spark, "SHOW PARTITIONS t", tables={"t": tbl})
    assert out.columns == ["partition"]
    assert [r["partition"] for r in out.collect()] == [
        "part=a", "part=b"
    ]
    with pytest.raises(SqlReadError, match="not a managed"):
        sql_read(spark, "SHOW PARTITIONS nope", tables={"t": tbl})


def test_show_partitions_unpartitioned_refused(spark, tmp_path):
    t = KeyedTable(str(tmp_path / "u"), key="pk", precombine="update_ts")
    t.bulk_insert(spark.createDataFrame(
        [Row(pk=1, val=1.0, update_ts=ts(1))]))
    with pytest.raises(SqlReadError, match="not partitioned"):
        sql_read(spark, "SHOW PARTITIONS u", tables={"u": t})


def test_show_create_table_round_trips(spark, tbl, tmp_path):
    """The rendered DDL must RE-CREATE an equivalent table through
    sql_ddl (swapping name + location), key/precombine/partitioning
    and current column types intact."""
    from hudi_glue_spark.sql_ddl import sql_ddl

    out = sql_read(spark, "SHOW CREATE TABLE t", tables={"t": tbl})
    assert out.columns == ["createtab_stmt"]
    ddl = out.collect()[0]["createtab_stmt"]
    assert "USING keyed" in ddl and "PARTITIONED BY (part)" in ddl
    assert "'primaryKey' = 'pk'" in ddl
    clone_loc = str(tmp_path / "clone")
    ddl2 = ddl.replace("CREATE TABLE t", "CREATE TABLE t2").replace(
        f"LOCATION '{tbl.path}'", f"LOCATION '{clone_loc}'"
    )
    session: dict = {}
    sql_ddl(spark, ddl2, session)
    t2 = session["t2"]
    assert t2.key == tbl.key
    assert t2.precombine == tbl.precombine
    assert t2.partition_by == tbl.partition_by


def test_table_changes_tvf(spark, tbl):
    """Delta's CDF TVF through sql_read: commit-id and ordinal starts,
    both-images update shape, aggregation over the feed, refusals."""
    c0, _c1 = tbl.commits()
    out = sql_read(
        spark,
        f"SELECT pk, val, _change_type FROM table_changes('t', '{c0}')",
        tables={"t": tbl})
    got = {(r["pk"], r["val"], r["_change_type"]) for r in out.collect()}
    assert got == {
        (1, 10.0, "update_preimage"),
        (1, 11.0, "update_postimage"),
        (3, 30.0, "insert"),
    }
    # ordinal start + alias + aggregate over the feed
    agg = sql_read(
        spark,
        "SELECT count(*) AS n FROM table_changes('t', 0) c "
        "WHERE c._change_type = 'insert'",
        tables={"t": tbl})
    assert agg.collect()[0]["n"] == 1
    # explicit end pins the range
    pinned = sql_read(
        spark,
        "SELECT count(*) AS n FROM table_changes('t', 0, -1)",
        tables={"t": tbl})
    assert pinned.collect()[0]["n"] == 3
    with pytest.raises(SqlReadError, match="not a managed"):
        sql_read(spark, "SELECT * FROM table_changes('nope', 0)",
                 tables={"t": tbl})
    with pytest.raises(SqlReadError, match="out of range"):
        sql_read(spark, "SELECT * FROM table_changes('t', 99)",
                 tables={"t": tbl})
    with pytest.raises(SqlReadError, match="unknown commit"):
        sql_read(spark, "SELECT * FROM table_changes('t', 'bogus')",
                 tables={"t": tbl})
    # a TVF read can JOIN the managed snapshot in the same statement
    joined = sql_read(
        spark,
        "SELECT count(*) AS n FROM table_changes('t', 0) c "
        "JOIN t ON c.pk = t.pk",
        tables={"t": tbl})
    assert joined.collect()[0]["n"] == 3
