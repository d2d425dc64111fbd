"""Property-based check of KeyedTable upsert semantics.

A pure-Python dictionary model defines the truth: apply batches of
(key, partition, value, precombine) records under a late-data policy,
then compare the KeyedTable's final on-disk state row-for-row. Randomized
batches explore the corners a scenario test can't enumerate — duplicate
keys within a batch, precombine ties, keys moving partitions, deletes of
absent keys.
"""

from __future__ import annotations

import datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row

from hudi_glue_spark.table import KeyedTable, ingest
from hudi_glue_spark.table.keyed_table import ARRIVAL_WINS, EVENT_TIME_WINS

# Small domains force collisions: few keys, two partitions, coarse time.
_RECORD = st.tuples(
    st.integers(0, 5),                 # pk
    st.sampled_from(["a", "b"]),       # partition
    st.integers(0, 99),                # value payload
    st.integers(0, 3),                 # precombine day offset
)
_BATCH = st.lists(_RECORD, min_size=1, max_size=6)
_SCENARIO = st.lists(_BATCH, min_size=1, max_size=4)


def _ts(day: int) -> datetime.datetime:
    return datetime.datetime(2026, 1, 1 + day)


def _model_apply(state: dict, batch: list, policy: str) -> None:
    """The spec: precombine-dedup within batch, then per-key merge."""
    best: dict[int, tuple] = {}
    for pk, part, val, pre in batch:
        cur = best.get(pk)
        # within-batch: max precombine wins; ties keep either (the engine
        # tie-breaks by row hash) — make ties impossible to model-check
        # by collapsing equal-precombine dups to the max VALUE, and feed
        # the engine tie-free batches (see _dedup_ties).
        if cur is None or (pre, val) > (cur[3], cur[2]):
            best[pk] = (pk, part, val, pre)
    for pk, rec in best.items():
        old = state.get(pk)
        if old is None:
            state[pk] = rec
        elif policy == ARRIVAL_WINS or rec[3] >= old[3]:
            state[pk] = rec
    # EVENT_TIME_WINS with older precombine: old row stays


def _dedup_ties(batch: list) -> list:
    """Remove same-(pk, precombine) duplicates with different payloads so
    the model doesn't depend on the engine's hash tie-break."""
    seen: dict[tuple, tuple] = {}
    for rec in batch:
        k = (rec[0], rec[3])
        if k not in seen or rec > seen[k]:
            seen[k] = rec
    return list(seen.values())


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(scenario=_SCENARIO, policy=st.sampled_from([EVENT_TIME_WINS, ARRIVAL_WINS]))
def test_upsert_matches_model(spark, tmp_path_factory, scenario, policy):
    scenario = [_dedup_ties(b) for b in scenario]
    root = str(tmp_path_factory.mktemp("prop") / "t")
    tbl = KeyedTable(
        root, key="pk", precombine="update_ts", partition_by="part", policy=policy
    )
    state: dict[int, tuple] = {}
    for batch in scenario:
        df = spark.createDataFrame(
            [Row(pk=pk, part=part, val=val, update_ts=_ts(pre))
             for pk, part, val, pre in batch]
        )
        ingest(tbl, df)
        _model_apply(state, batch, policy)

    got = {
        r["pk"]: (r["pk"], r["part"], r["val"], r["update_ts"])
        for r in tbl.read(spark).collect()
    }
    want = {
        pk: (pk, part, val, _ts(pre))
        for pk, (pk2, part, val, pre) in state.items()
    }
    assert got == want


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    initial=_BATCH,
    src=_BATCH,
    del_threshold=st.integers(0, 99),
    insert=st.booleans(),
)
def test_merge_into_matches_model(
    spark, tmp_path_factory, initial, src, del_threshold, insert
):
    """merge_into vs a dictionary model: matched rows with target value
    >= threshold delete, others update; unmatched insert iff enabled."""
    initial = _dedup_ties(initial)
    src = _dedup_ties(src)
    root = str(tmp_path_factory.mktemp("mprop") / "t")
    tbl = KeyedTable(root, key="pk", precombine="update_ts", partition_by="part")
    tbl.bulk_insert(
        spark.createDataFrame(
            [Row(pk=pk, part=part, val=val, update_ts=_ts(pre))
             for pk, part, val, pre in initial]
        ),
        dedupe=True,
    )
    state: dict[int, tuple] = {}
    _model_apply(state, initial, EVENT_TIME_WINS)

    # model the merge: source deduped per key (max precombine)
    best: dict[int, tuple] = {}
    for rec in src:
        cur = best.get(rec[0])
        if cur is None or (rec[3], rec[2]) > (cur[3], cur[2]):
            best[rec[0]] = rec
    for pk, rec in best.items():
        if pk in state:
            if state[pk][2] >= del_threshold:
                del state[pk]
            else:
                state[pk] = rec
        elif insert:
            state[pk] = rec

    tbl.merge_into(
        spark.createDataFrame(
            [Row(pk=pk, part=part, val=val, update_ts=_ts(pre))
             for pk, part, val, pre in src]
        ),
        delete_condition=f"target.val >= {del_threshold}",
        when_not_matched_insert=insert,
    )
    got = {
        r["pk"]: (r["pk"], r["part"], r["val"], r["update_ts"])
        for r in tbl.read(spark).collect()
    }
    want = {pk: (pk, part, val, _ts(pre))
            for pk, (_pk, part, val, pre) in state.items()}
    assert got == want


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    initial=_BATCH,
    src=_BATCH,
    bs_threshold=st.integers(0, 99),
)
def test_merge_partial_by_source_matches_model(
    spark, tmp_path_factory, initial, src, bs_threshold
):
    """r13 property: one merge combining a PARTIAL update (``val =
    t.val + s.val``; part/tag/update_ts keep the target), a shaped
    INSERT VALUES list (``val*2``; unlisted ``tag`` NULL), and a
    conditional NOT-MATCHED-BY-SOURCE delete (``t.val >= thr``) —
    against a dictionary model. The ``tag`` column exists purely to
    catch a row-replace bug masquerading as a partial update."""
    initial = _dedup_ties(initial)
    src = _dedup_ties(src)
    root = str(tmp_path_factory.mktemp("bsprop") / "t")
    tbl = KeyedTable(root, key="pk", precombine="update_ts",
                     partition_by="part")
    tbl.bulk_insert(
        spark.createDataFrame(
            [Row(pk=pk, part=part, val=val, tag=f"t{pk}",
                 update_ts=_ts(pre))
             for pk, part, val, pre in initial]
        ),
        dedupe=True,
    )
    state: dict[int, tuple] = {}  # pk -> (part, val, tag, pre)
    best0: dict[int, tuple] = {}
    for pk, part, val, pre in initial:
        cur = best0.get(pk)
        if cur is None or (pre, val) > (cur[3], cur[1]):
            best0[pk] = (part, val, f"t{pk}", pre)
    state.update(best0)

    best: dict[int, tuple] = {}
    for pk, part, val, pre in src:
        cur = best.get(pk)
        if cur is None or (pre, val) > (cur[3], cur[1]):
            best[pk] = (part, val, None, pre)
    for pk in list(state):
        if pk in best:  # matched: partial update, rest keeps target
            part, val, tag, pre = state[pk]
            state[pk] = (part, val + best[pk][1], tag, pre)
        elif state[pk][1] >= bs_threshold:  # by-source delete
            del state[pk]
    for pk, (part, val, _tag, pre) in best.items():
        if pk not in state:
            state[pk] = (part, val * 2, None, pre)

    tbl.merge_into(
        spark.createDataFrame(
            [Row(pk=pk, part=part, val=val, update_ts=_ts(pre))
             for pk, part, val, pre in src]
        ),
        update_set={"val": "target.val + source.val"},
        insert_values={
            "pk": "source.pk",
            "part": "source.part",
            "val": "source.val * 2",
            "update_ts": "source.update_ts",
        },
        by_source_delete=f"target.val >= {bs_threshold}",
    )
    got = {
        r["pk"]: (r["part"], r["val"], r["tag"], r["update_ts"])
        for r in tbl.read(spark).collect()
    }
    want = {pk: (part, val, tag, _ts(pre))
            for pk, (part, val, tag, pre) in state.items()}
    assert got == want


# --- change-log composition equivalence (r11) --------------------------

_OPSEQ = st.lists(
    st.one_of(
        st.tuples(st.just("upsert"), _BATCH),
        st.tuples(
            st.just("delete"),
            st.lists(st.integers(0, 5), min_size=1, max_size=3),
        ),
        st.tuples(st.just("update_where"), st.integers(0, 5)),
        # r12: DV commits interleave with chlog CoW ops — the
        # composition synthesizes their event frames (_dv_event_frame)
        st.tuples(
            st.just("dv_delete"),
            st.lists(st.integers(0, 5), min_size=1, max_size=2),
        ),
        st.tuples(st.just("dv_upsert"), st.integers(0, 7), st.integers(0, 9)),
    ),
    min_size=1,
    max_size=4,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(ops=_OPSEQ)
def test_diff_chlog_fast_equals_snapshot_diff(
    spark, tmp_path_factory, ops
):
    """r11 property: on a change_log table, ANY sequence of CoW ops
    yields a composed diff (``_diff_chlog_fast``) identical to the
    full-outer snapshot diff — inserts/updates/deletes, net-outs,
    chained updates, monotone precombine so every upsert row wins."""
    root = str(tmp_path_factory.mktemp("chlog_prop") / "t")
    tbl = KeyedTable(
        root, key="pk", precombine="update_ts", partition_by="part",
        policy=ARRIVAL_WINS, change_log=True,
    )
    base = [(pk, "a" if pk % 2 else "b", -1, 0) for pk in range(4)]
    c0 = tbl.bulk_insert(
        spark.createDataFrame(
            [Row(pk=pk, part=part, val=val, update_ts=_ts(pre))
             for pk, part, val, pre in base]
        )
    )
    day = 1
    for op in ops:
        kind, arg = op[0], op[1]
        if kind == "upsert":
            batch = _dedup_ties(arg)
            tbl.upsert(
                spark.createDataFrame(
                    [Row(pk=pk, part=part, val=val, update_ts=_ts(day))
                     for pk, part, val, _pre in batch]
                )
            )
        elif kind == "delete":
            tbl.delete(
                spark.createDataFrame([Row(pk=pk) for pk in set(arg)])
            )
        elif kind == "dv_delete":
            tbl.delete_dv(
                spark.createDataFrame([Row(pk=pk) for pk in set(arg)])
            )
        elif kind == "dv_upsert":
            tbl.upsert_dv(
                spark.createDataFrame(
                    [Row(pk=arg, part="a" if arg % 2 else "b",
                         val=op[2] + 200, update_ts=_ts(day))]
                )
            )
        else:
            tbl.update_where(
                spark, {"val": "val + 100"}, f"pk = {arg}"
            )
        day = min(day + 1, 3)
    from hudi_glue_spark.table import manifest as M

    head = tbl.commits()[-1]
    # an op whose delta reached the coarse-volume cap (e.g. a delete
    # wiping a partition: rows_written 0) records NO ref by policy —
    # composition is only promised when every commit logged; DV
    # commits never log (their event frame is SYNTHESIZED, r12) so
    # they always compose
    logged = all(
        m.op in ("delete_dv", "upsert_dv")
        or ((m.stats or {}).get("change_log") or {}).get("ref")
        for m in (
            M.read_manifest(tbl.path, c) for c in tbl.commits()[1:]
        )
        if m.op in ("delete_dv", "upsert_dv")
        or (m.stats or {}).get("rows_written") is not None
    )
    for images in ("post", "both"):
        fast = tbl._diff_chlog_fast(spark, c0, head, images)
        if logged:
            assert fast is not None  # every commit recorded its delta
        # whichever path diff_commits routes through must equal the
        # from-scratch snapshot diff
        routed = tbl.diff_commits(spark, c0, head, images=images)
        general = tbl._classify_diff(
            tbl.read(spark, at=c0), tbl.read(spark, at=head), images
        )
        got = sorted(map(tuple, routed.collect()), key=str)
        want = sorted(map(tuple, general.collect()), key=str)
        assert got == want, (images, got, want)
        if fast is not None:
            assert sorted(map(tuple, fast.collect()), key=str) == want


_MAP_OPSEQ = st.lists(
    st.one_of(
        st.tuples(st.just("set_map"), st.integers(0, 5), st.integers(0, 9)),
        st.tuples(
            st.just("delete"),
            st.lists(st.integers(0, 5), min_size=1, max_size=2),
        ),
        st.tuples(st.just("upsert"), st.integers(0, 7), st.integers(0, 9)),
    ),
    min_size=1,
    max_size=4,
)


def _canon_row(r):
    """Map fields surface as dicts (order-carrying, unorderable):
    canonicalize to sorted item tuples so rows compare and sort by
    VALUE, the way map equality is defined."""
    return tuple(
        tuple(sorted(v.items())) if isinstance(v, dict) else v
        for v in tuple(r)
    )


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(ops=_MAP_OPSEQ)
def test_diff_chlog_fast_equals_snapshot_diff_with_maps(
    spark, tmp_path_factory, ops
):
    """r12 property: the composition equivalence holds on a schema
    with a TOP-LEVEL MAP column — the delta job compares sorted
    map_entries twins and stores real maps; the classifier compares
    maps canonically; composed == snapshot for any op sequence that
    inserts, rewrites, and deletes map-bearing rows."""
    root = str(tmp_path_factory.mktemp("chlog_prop_map") / "t")
    tbl = KeyedTable(
        root, key="pk", precombine="update_ts", partition_by="part",
        policy=ARRIVAL_WINS, change_log=True,
    )
    c0 = tbl.bulk_insert(
        spark.createDataFrame(
            [(pk, "a" if pk % 2 else "b", pk, {"k": pk, "z": pk % 2},
              _ts(0)) for pk in range(4)],
            "pk long, part string, val long, attrs map<string,long>, "
            "update_ts timestamp",
        ),
        dedupe=False,  # exercise the no-dedup path (the nested-map
        # property test below runs with dedupe ON via the canonical
        # tie-break hash)
    )
    day = 1
    for op in ops:
        if op[0] == "set_map":
            _, pk, v = op
            tbl.update_where(
                spark,
                {"attrs": f"map('k', cast({v} as long))"},
                f"pk = {pk}",
            )
        elif op[0] == "delete":
            tbl.delete(
                spark.createDataFrame(
                    [(pk,) for pk in set(op[1])], "pk long"
                )
            )
        else:
            _, pk, v = op
            tbl.upsert(
                spark.createDataFrame(
                    [(pk, "a" if pk % 2 else "b", v + 100,
                      {"n": v}, _ts(day))],
                    "pk long, part string, val long, "
                    "attrs map<string,long>, update_ts timestamp",
                )
            )
        day += 1
    head = tbl.commits()[-1]
    from hudi_glue_spark.table import manifest as M

    logged = all(
        ((M.read_manifest(tbl.path, c).stats or {})
         .get("change_log") or {}).get("ref")
        for c in tbl.commits()[1:]
        if (M.read_manifest(tbl.path, c).stats or {}).get(
            "rows_written"
        ) is not None
    )
    for images in ("post", "both"):
        fast = tbl._diff_chlog_fast(spark, c0, head, images)
        if logged:
            assert fast is not None
        routed = tbl.diff_commits(spark, c0, head, images=images)
        general = tbl._classify_diff(
            tbl.read(spark, at=c0), tbl.read(spark, at=head), images
        )
        got = sorted(map(_canon_row, routed.collect()), key=str)
        want = sorted(map(_canon_row, general.collect()), key=str)
        assert got == want, (images, got, want)
        if fast is not None:
            assert (
                sorted(map(_canon_row, fast.collect()), key=str) == want
            )

_NESTED_OPSEQ = st.lists(
    st.one_of(
        st.tuples(st.just("set_nested"), st.integers(0, 5), st.integers(0, 9)),
        st.tuples(
            st.just("delete"),
            st.lists(st.integers(0, 5), min_size=1, max_size=2),
        ),
        st.tuples(st.just("upsert"), st.integers(0, 7), st.integers(0, 9)),
        st.tuples(st.just("flip"), st.integers(0, 5)),
    ),
    min_size=1,
    max_size=4,
)


def _canon_any(v):
    """Recursive value canon: dict (map) → sorted item tuples, Row
    (struct) → field tuple, list → tuple — nested maps sort at every
    depth so rows compare by VALUE."""
    if isinstance(v, dict):
        return tuple(sorted((k, _canon_any(x)) for k, x in v.items()))
    if isinstance(v, Row):
        return tuple(_canon_any(x) for x in v)
    if isinstance(v, (list, tuple)):
        return tuple(_canon_any(x) for x in v)
    return v


def _canon_nested_row(r):
    return tuple(_canon_any(v) for v in tuple(r))


_NESTED_SCHEMA = (
    "pk long, part string, val long, "
    "meta struct<m:map<string,long>,s:string>, "
    "tags array<map<string,long>>, update_ts timestamp"
)


def _nested_row(pk, v, day):
    return (
        pk,
        "a" if pk % 2 else "b",
        v,
        {"m": {"k": v, "z": pk}, "s": str(pk)},
        [{"t": v}],
        _ts(day),
    )


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(ops=_NESTED_OPSEQ)
def test_diff_chlog_fast_equals_snapshot_diff_nested_maps(
    spark, tmp_path_factory, ops
):
    """r12 nested-map lift (§9j#4): the composition equivalence holds
    when maps live INSIDE struct and array columns — the delta job and
    the classifier canonicalize recursively (_canon_expr), the stored
    delta rebuilds real maps at every depth (_uncanon_expr), and an
    entry-order-only rewrite ("flip") logs no spurious delta. The
    table also runs with dedupe ON: _precombine's tie-break hashes
    nested maps through the same canonical twin."""
    root = str(tmp_path_factory.mktemp("chlog_prop_nested") / "t")
    tbl = KeyedTable(
        root, key="pk", precombine="update_ts", partition_by="part",
        policy=ARRIVAL_WINS, change_log=True,
    )
    c0 = tbl.bulk_insert(
        spark.createDataFrame(
            [_nested_row(pk, pk, 0) for pk in range(4)], _NESTED_SCHEMA
        ),
    )
    day = 1
    for op in ops:
        if op[0] == "set_nested":
            _, pk, v = op
            tbl.update_where(
                spark,
                {
                    "meta": (
                        "named_struct('m', map('k', cast({v} as long)),"
                        " 's', meta.s)"
                    ).format(v=v),
                    "tags": f"array(map('t', cast({v} as long)))",
                },
                f"pk = {pk}",
            )
        elif op[0] == "delete":
            tbl.delete(
                spark.createDataFrame(
                    [(pk,) for pk in set(op[1])], "pk long"
                )
            )
        elif op[0] == "flip":
            # rewrite the row's maps with entry order REVERSED but the
            # same logical value: meta.m = {'z':..,'k':..} — canonical
            # twins must see no change in the map columns
            _, pk = op
            tbl.update_where(
                spark,
                {"meta": "named_struct('m', map_from_entries(reverse("
                         "sort_array(map_entries(meta.m)))), 's', meta.s)"},
                f"pk = {pk}",
            )
        else:
            _, pk, v = op
            tbl.upsert(
                spark.createDataFrame(
                    [_nested_row(pk, v + 100, day)], _NESTED_SCHEMA
                )
            )
        day += 1
    head = tbl.commits()[-1]
    from hudi_glue_spark.table import manifest as M

    # a partition-wiping delete hits the coarse-volume cap
    # (rows_written 0) and records NO log by policy — composition is
    # only promised when every commit logged, same tolerance as the
    # other composition property tests
    logged = all(
        ((M.read_manifest(tbl.path, c).stats or {})
         .get("change_log") or {}).get("ref")
        for c in tbl.commits()[1:]
        if (M.read_manifest(tbl.path, c).stats or {}).get(
            "rows_written"
        ) is not None
    )
    for images in ("post", "both"):
        fast = tbl._diff_chlog_fast(spark, c0, head, images)
        if logged:
            assert fast is not None
        routed = tbl.diff_commits(spark, c0, head, images=images)
        general = tbl._classify_diff(
            tbl.read(spark, at=c0), tbl.read(spark, at=head), images
        )
        got = sorted(map(_canon_nested_row, routed.collect()), key=str)
        want = sorted(map(_canon_nested_row, general.collect()), key=str)
        assert got == want, (images, got, want)
        if fast is not None:
            assert (
                sorted(map(_canon_nested_row, fast.collect()), key=str)
                == want
            )


def test_entry_order_flip_logs_empty_delta(spark, tmp_path_factory):
    """A rewrite that only REORDERS map entries of untouched rows logs
    an EMPTY delta (the canonical twins are identical), so the CDF
    stream and the composed diff see zero change — no fabricated
    delete+insert pairs (r12 nested lift; same guarantee the stream's
    Python canon gives the exact-rewrite gate)."""
    import os

    from hudi_glue_spark.table import manifest as M

    root = str(tmp_path_factory.mktemp("chlog_flip") / "t")
    tbl = KeyedTable(
        root, key="pk", precombine="update_ts",
        policy=ARRIVAL_WINS, change_log=True,
    )
    c0 = tbl.bulk_insert(
        spark.createDataFrame(
            [_nested_row(pk, pk, 0) for pk in range(6)], _NESTED_SCHEMA
        ),
    )
    tbl.update_where(
        spark,
        {"meta": "named_struct('m', map_from_entries(reverse("
                 "sort_array(map_entries(meta.m)))), 's', meta.s)"},
        "pk >= 0",
    )
    head = tbl.commits()[-1]
    ref = ((M.read_manifest(root, head).stats or {})
           .get("change_log") or {}).get("ref")
    assert ref, "the rewrite commit must record a log"
    delta = spark.read.parquet(os.path.join(root, "_changes", ref))
    assert delta.count() == 0, "order-only flip must log an empty delta"
    assert tbl.diff_commits(spark, c0, head).count() == 0


# --- partition key scope: identity = (partition, key) (r12) ------------

_SCOPED_OPSEQ = st.lists(
    st.one_of(
        st.tuples(st.just("upsert"), _BATCH),
        st.tuples(
            st.just("delete_scoped"),
            st.lists(
                st.tuples(st.integers(0, 5), st.sampled_from(["a", "b"])),
                min_size=1, max_size=3,
            ),
        ),
        st.tuples(
            st.just("delete_bare"),
            st.lists(st.integers(0, 5), min_size=1, max_size=2),
        ),
    ),
    min_size=1,
    max_size=4,
)


def _dedup_ties_scoped(batch: list) -> list:
    """Tie-free per (pk, part, precombine) so the model needn't know
    the engine's hash tie-break."""
    seen: dict[tuple, tuple] = {}
    for rec in batch:
        k = (rec[0], rec[1], rec[3])
        if k not in seen or rec > seen[k]:
            seen[k] = rec
    return list(seen.values())


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    ops=_SCOPED_OPSEQ,
    policy=st.sampled_from([EVENT_TIME_WINS, ARRIVAL_WINS]),
)
def test_partition_scope_matches_model(spark, tmp_path_factory, ops, policy):
    """r12 identity property: under key_scope='partition' the table
    behaves as a dictionary keyed by (partition, key) — the same pk in
    two partitions is two independent rows through upserts, scoped
    deletes (frame carries partition), and bare-key deletes (pk goes
    everywhere), under both late-data policies."""
    root = str(tmp_path_factory.mktemp("scoped_prop") / "t")
    tbl = KeyedTable(
        root, key="pk", precombine="update_ts", partition_by="part",
        key_scope="partition", policy=policy,
    )
    state: dict[tuple, tuple] = {}

    def model_upsert(batch):
        best: dict[tuple, tuple] = {}
        for pk, part, val, pre in batch:
            k = (pk, part)
            cur = best.get(k)
            if cur is None or (pre, val) > (cur[3], cur[2]):
                best[k] = (pk, part, val, pre)
        for k, rec in best.items():
            old = state.get(k)
            if old is None or policy == ARRIVAL_WINS or rec[3] >= old[3]:
                state[k] = rec

    first = True
    for op in ops:
        if op[0] == "upsert":
            batch = _dedup_ties_scoped(op[1])
            df = spark.createDataFrame(
                [Row(pk=pk, part=part, val=val, update_ts=_ts(pre))
                 for pk, part, val, pre in batch]
            )
            ingest(tbl, df)
            model_upsert(batch)
            first = False
        elif op[0] == "delete_scoped":
            if first:
                continue  # need a table before deleting
            pairs = sorted(set(op[1]))
            tbl.delete(
                spark.createDataFrame(
                    [Row(pk=pk, part=part) for pk, part in pairs]
                )
            )
            for k in pairs:
                state.pop(k, None)
        else:
            if first:
                continue
            pks = sorted(set(op[1]))
            tbl.delete(
                spark.createDataFrame([Row(pk=pk) for pk in pks])
            )
            for k in [k for k in state if k[0] in set(pks)]:
                del state[k]
    if first:
        return  # scenario never created the table
    got = {
        (r["pk"], r["part"]): (r["pk"], r["part"], r["val"], r["update_ts"])
        for r in tbl.read(spark).collect()
    }
    want = {
        k: (pk, part, val, _ts(pre))
        for k, (pk, part, val, pre) in state.items()
    }
    assert got == want
