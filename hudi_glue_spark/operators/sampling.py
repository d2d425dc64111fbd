"""Reproducible sampling and dataset splitting.

Training pipelines need samples and train/val/test splits that are
DETERMINISTIC (same row → same split, forever, on any engine and any
partitioning), not ``df.sample()``'s partition-dependent RNG. The
primitive here is a content hash of the row key mapped to [0, 10000):
md5-based so the DuckDB oracle reproduces every assignment bit-for-bit,
salt-able so different experiments draw independent samples.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKETS = 10_000


def hash_bucket(key: Column | str, salt: str = "") -> Column:
    """Deterministic bucket in [0, 10000): md5 of (salt + key), first 15
    hex digits as an integer, mod 10000. Engine-portable (md5 + string
    ops only) and independent of partitioning/row order."""
    c = F.col(key) if isinstance(key, str) else key
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), c.cast("string"))), 1, 15), 16, 10
    ).cast("long")
    return F.pmod(h, F.lit(_BUCKETS))


def hash_bucket_sql(key: str, salt: str = "") -> str:
    """DuckDB twin of :func:`hash_bucket`."""
    return (
        f"CAST(('0x' || substr(md5('{salt}' || CAST({key} AS VARCHAR)), 1, 15)) "
        f"AS BIGINT) % {_BUCKETS}"
    )


def deterministic_sample(
    df: DataFrame, key: str, fraction: float, salt: str = ""
) -> DataFrame:
    """Keep ~``fraction`` of rows, chosen by key hash — reproducible
    across runs, engines, and repartitioning, and consistent across
    tables sharing the key (joinable samples)."""
    return df.filter(hash_bucket(key, salt) < int(fraction * _BUCKETS))


def resample_by_weights(
    df: DataFrame,
    key: str,
    domain_col: str,
    weights: dict[str, float],
    default: float = 1.0,
    salt: str = "",
) -> DataFrame:
    """Domain mixing: keep each row with its domain's probability
    (``weights[domain]``, else ``default``) — the down-sample side of
    pretraining mixture tuning ("web 30%, code 100%, …"). Membership is
    the key hash, so re-running (or re-weighting upward) only ever ADDS
    rows for a domain, never reshuffles which rows survive. Pure
    projection + filter: no shuffle at any corpus size."""
    b = hash_bucket(key, salt)
    thr = F.lit(int(default * _BUCKETS))
    for dom, w in weights.items():
        thr = F.when(F.col(domain_col) == dom, int(w * _BUCKETS)).otherwise(thr)
    return df.filter(b < thr)


def resample_by_weights_sql(
    key: str, domain_col: str, weights: dict[str, float], default: float = 1.0,
    salt: str = "",
) -> str:
    """DuckDB twin of :func:`resample_by_weights` (a WHERE clause)."""
    b = hash_bucket_sql(key, salt)
    cases = " ".join(
        f"WHEN {domain_col} = '{d}' THEN {int(w * _BUCKETS)}"
        for d, w in weights.items()
    )
    return f"({b}) < (CASE {cases} ELSE {int(default * _BUCKETS)} END)"


def split_column(
    key: Column | str,
    fractions: dict[str, float],
    salt: str = "",
) -> Column:
    """Assign each row a split label by hash range, e.g.
    ``{"train": 0.8, "val": 0.1, "test": 0.1}`` — stable membership:
    growing one split never reshuffles rows between the others."""
    b = hash_bucket(key, salt)
    expr = None
    acc = 0.0
    for name, frac in fractions.items():
        acc += frac
        cond = b < int(round(acc * _BUCKETS))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return expr.otherwise(F.lit(None))


def split_column_sql(key: str, fractions: dict[str, float], salt: str = "") -> str:
    """DuckDB twin of :func:`split_column`."""
    b = hash_bucket_sql(key, salt)
    acc = 0.0
    cases = []
    for name, frac in fractions.items():
        acc += frac
        cases.append(f"WHEN ({b}) < {int(round(acc * _BUCKETS))} THEN '{name}'")
    return "CASE " + " ".join(cases) + " ELSE NULL END"


def stratified_exact_split(
    df: DataFrame,
    key: str,
    group: str,
    fractions: dict[str, float],
) -> DataFrame:
    """EXACT-proportion per-group split: within each ``group``, rows are
    ranked by md5 of the key (deterministic shuffle order, tie-broken by
    the key itself) and cut at floor(cum_frac · n) boundaries — so every
    group lands within one row of its target proportions, unlike the
    hash-Bernoulli :func:`split_column` whose per-group counts are only
    proportional in expectation. The training-mixture use case: small
    domains must still yield a non-degenerate val/test slice.

    One window over one group-keyed shuffle; membership depends only on
    (key, group, fractions) — rerunnable, engine-portable, no RNG."""
    from pyspark.sql.window import Window

    k = F.col(key)
    w = Window.partitionBy(group).orderBy(F.md5(k.cast("string")), k)
    rn = F.row_number().over(w).cast("long")
    n = F.count(F.lit(1)).over(Window.partitionBy(group)).cast("long")
    expr = None
    acc = 0.0
    names = list(fractions)
    for name in names[:-1]:
        acc += fractions[name]
        cond = rn <= F.floor(F.lit(acc) * n)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    split = F.lit(names[-1]) if expr is None else expr.otherwise(names[-1])
    return df.withColumn("split", split)


def stratified_exact_split_sql(
    key: str, group: str, fractions: dict[str, float]
) -> str:
    """DuckDB twin of :func:`stratified_exact_split`'s split expression
    (expects window aliases ``rn`` and ``n`` in scope)."""
    names = list(fractions)
    acc = 0.0
    cases = []
    for name in names[:-1]:
        acc += fractions[name]
        cases.append(f"WHEN rn <= floor({acc} * n) THEN '{name}'")
    return "CASE " + " ".join(cases) + f" ELSE '{names[-1]}' END"
