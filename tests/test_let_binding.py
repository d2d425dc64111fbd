"""Focused tests for the r15 let-binding optimization (`let_`) and the
operators rewritten on top of it, plus the restructured
connected_components.

The optimization changed HOW these expressions evaluate (bind an array
expression once as a lambda variable instead of re-evaluating it per
element) but must not change WHAT they compute — each test pins the
values against an independent pure-Python reference.
"""

from __future__ import annotations

import hashlib
import random
import re
from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql import functions as F

from hudi_glue_spark.functions.scalar import let_
from hudi_glue_spark.functions.vector import quantize_int8
from hudi_glue_spark.operators import dedup as D
from hudi_glue_spark.operators.text import max_word_freq_ratio

# -- pure-Python references ---------------------------------------------------


def _words(text: str) -> list[str]:
    return [w for w in re.split(r"\s+", text) if w != ""]


def _shingles(text: str, n: int) -> list[str]:
    ws = _words(text)
    grams = [" ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)]
    seen, out = set(), []
    for g in grams:  # array_distinct keeps first-occurrence order
        if g not in seen:
            seen.add(g)
            out.append(g)
    return out


def _gram_hash(gram: str) -> int:
    return int(hashlib.md5(gram.encode()).hexdigest()[:15], 16)


def _winnowing(text: str, n: int, window: int) -> list[int]:
    ws = _words(text)
    grams = [_gram_hash(" ".join(ws[i : i + n])) for i in range(len(ws) - n + 1)]
    if not grams:
        return []
    if len(grams) < window:
        picked = grams
    else:
        picked = [
            min(grams[j : j + window]) for j in range(len(grams) - window + 1)
        ]
    return sorted(set(picked))


def _max_word_freq_ratio(text: str) -> float:
    ws = _words(text)
    if not ws:
        return 0.0
    counts: dict[str, int] = {}
    for w in ws:
        counts[w] = counts.get(w, 0) + 1
    return max(counts.values()) / len(ws)


def _quantize(vec: list[float]) -> tuple[float, list[int]]:
    scale = max(abs(x) for x in vec) / 127.0
    if scale <= 0:
        return scale, [0] * len(vec)
    q = [
        int(Decimal(x / scale).quantize(Decimal("1"), rounding=ROUND_HALF_UP))
        for x in vec
    ]
    return scale, q


DOCS = [
    "",  # empty → 0 tokens
    "one",  # shorter than n
    "a b",  # still shorter than n=3
    "a b c",  # exactly one 3-gram, fewer grams than window
    "the cat sat on the mat the cat sat on the mat",  # repetition
    "  leading   and \t trailing   whitespace  ",
    "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12",
    " ".join(f"tok{i % 7}" for i in range(40)),  # long with dup grams
]


# -- let_ itself ---------------------------------------------------------------


def test_let_binding_value_identity(spark):
    """let_(expr, body) must equal body(expr) for arrays, structs and
    scalars, including NULL-bearing inputs."""
    df = spark.createDataFrame(
        [([1, 2, 3],), ([],), (None,)], "arr array<int>"
    )
    got = df.select(
        let_(F.col("arr"), lambda a: F.size(a) + F.coalesce(
            F.try_element_at(a, F.lit(1)), F.lit(0)
        )).alias("bound"),
        (F.size(F.col("arr")) + F.coalesce(
            F.try_element_at(F.col("arr"), F.lit(1)), F.lit(0)
        )).alias("unbound"),
    ).collect()
    for r in got:
        assert r.bound == r.unbound

    # struct-typed binding
    df2 = spark.createDataFrame([(3, 4)], "x int, y int")
    r = df2.select(
        let_(
            F.struct(F.col("x").alias("x"), F.col("y").alias("y")),
            lambda s: s["x"] * s["y"],
        ).alias("v")
    ).first()
    assert r.v == 12

    # scalar binding
    r = df2.select(let_(F.col("x") + 1, lambda v: v * v).alias("v")).first()
    assert r.v == 16


# -- rewritten operators vs Python references ---------------------------------


def test_shingles_matches_reference(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(DOCS)], "i int, t string")
    got = {r.i: list(r.s) for r in df.select("i", D.shingles("t", 3).alias("s")).collect()}
    for i, t in enumerate(DOCS):
        assert got[i] == _shingles(t, 3), f"doc {i!r}"


def test_winnowing_matches_reference(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(DOCS)], "i int, t string")
    got = {
        r.i: list(r.f)
        for r in df.select(
            "i", D.winnowing_fingerprints("t", n=3, window=4).alias("f")
        ).collect()
    }
    for i, t in enumerate(DOCS):
        assert got[i] == _winnowing(t, 3, 4), f"doc {i!r}"


def test_max_word_freq_ratio_matches_reference(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(DOCS)], "i int, t string")
    got = {
        r.i: r.v
        for r in df.select("i", max_word_freq_ratio("t").alias("v")).collect()
    }
    for i, t in enumerate(DOCS):
        assert abs(got[i] - _max_word_freq_ratio(t)) < 1e-12, f"doc {i!r}"


def test_quantize_int8_matches_reference(spark):
    rng = random.Random(7)
    vecs = [
        [rng.uniform(-5, 5) for _ in range(16)],
        [0.0] * 8,  # zero vector → scale 0, all-zero q
        [1e-30] * 4,  # tiny but nonzero scale
        [-127.0, 127.0, 0.5, -0.5],
    ]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "i int, vec array<double>"
    )
    got = {
        r.i: (r.q.scale, list(r.q.q))
        for r in df.select("i", quantize_int8("vec").alias("q")).collect()
    }
    for i, v in enumerate(vecs):
        scale, q = _quantize(v)
        assert abs(got[i][0] - scale) < 1e-18, f"vec {i} scale"
        assert got[i][1] == q, f"vec {i} q"


# -- restructured connected_components ----------------------------------------


def _union_find_components(pairs: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # component label = min node id in the component
    comp_min: dict[int, int] = {}
    for node in list(parent):
        r = find(node)
        comp_min[r] = min(comp_min.get(r, r), node)
    return {node: comp_min[find(node)] for node in parent}


def test_connected_components_random_graph_matches_union_find(spark):
    rng = random.Random(42)
    nodes = list(range(1, 80))
    pairs = [
        (rng.choice(nodes), rng.choice(nodes)) for _ in range(120)
    ]  # includes self-pairs and long accidental chains
    df = spark.createDataFrame(pairs, "a_id long, b_id long")
    got = {
        r.node: r.comp for r in D.connected_components(df).collect()
    }
    want = _union_find_components(pairs)
    assert got == want


def test_connected_components_chain_converges_in_few_rounds(spark):
    # a 12-node path graph: worst case for min-label propagation
    pairs = [(i, i + 1) for i in range(1, 12)]
    df = spark.createDataFrame(pairs, "a_id long, b_id long")
    got = {r.node: r.comp for r in D.connected_components(df).collect()}
    assert got == {i: 1 for i in range(1, 13)}


# -- vectorized bloom key canonicalization -------------------------------------


def test_key_strings_table_matches_key_string():
    """The Arrow fast path must be byte-identical to the per-row
    canonicalization for fast-pathed types, and fall back (still
    identical) for everything else — a mismatch is a bloom false
    negative, i.e. silently dropped rows."""
    import datetime
    import decimal

    import pyarrow as pa

    from hudi_glue_spark.table import bloom as B

    # fast-pathed: ints (all widths), bools, strings, with nulls
    cols = {
        "i64": pa.array([1, -7, None, 2**62, 0], pa.int64()),
        "i32": pa.array([5, None, -1, 7, 9], pa.int32()),
        "b": pa.array([True, False, None, True, False]),
        "s": pa.array(["a", "", None, "x|y", "\0weird"], pa.string()),
    }
    t = pa.table(cols)
    want = [
        B.key_string(vals)
        for vals in zip(*[t.column(n).to_pylist() for n in t.column_names])
    ]
    assert B.key_strings_table(t) == want

    # single column
    t1 = pa.table({"s": cols["s"]})
    assert B.key_strings_table(t1) == [
        B.key_string((v,)) for v in cols["s"].to_pylist()
    ]

    # large_string goes through the cast branch
    tl = pa.table({"s": pa.array(["p", None, "q"], pa.large_string())})
    assert B.key_strings_table(tl) == [
        B.key_string((v,)) for v in ["p", None, "q"]
    ]

    # non-fast-path types (timestamp, decimal, float) → legacy fallback
    tf = pa.table(
        {
            "ts": pa.array(
                [datetime.datetime(2021, 1, 1, 12, 30), None],
                pa.timestamp("us"),
            ),
            "d": pa.array(
                [decimal.Decimal("5.00"), decimal.Decimal("1.25")],
                pa.decimal128(10, 2),
            ),
            "f": pa.array([5.0, 2.5], pa.float64()),
        }
    )
    want = [
        B.key_string(vals)
        for vals in zip(*[tf.column(n).to_pylist() for n in tf.column_names])
    ]
    assert B.key_strings_table(tf) == want
