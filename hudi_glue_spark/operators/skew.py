"""Skew-mitigation aggregation patterns.

AQE's skew-join splitting handles skewed JOINS (enabled in
session.DEFAULT_CONF); these helpers cover the aggregation-side cases
AQE does not: a distinct-count whose per-key value sets are too large
for one task. The two-phase split is exact, not approximate — the same
value always lands in the same salt bucket, so partial distinct counts
add up to the true distinct count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: list[str] | str,
    how: str = "inner",
    n_salts: int = 16,
) -> DataFrame:
    """Equi-join resilient to a hot key WITHOUT relying on AQE: the
    skewed side gets a random-in-[0,n) salt, the small side is exploded
    ``n_salts``× (one copy per salt value), and the join key becomes
    (key, salt) — a single hot key's rows spread over ``n_salts`` tasks.

    Exact for inner/left joins keyed on ``on``: every skewed row meets
    each matching small row exactly once (the small row copy with its
    salt). Cost: the small side is replicated n_salts× — use only when
    ``small`` is dimension-sized but too big (or too skew-prone) to
    broadcast outright. The salt is derived from the SKEWED side's full
    row hash, so the result is deterministic for deterministic input."""
    if isinstance(on, str):
        on = [on]
    salt_s = F.pmod(F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(n_salts))
    s = skewed.withColumn("__salt", salt_s)
    m = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    # shuffle_hash hint: the contract is "too big (or too skew-prone)
    # to broadcast", so the replicated side must never become a
    # broadcast build (post-explode size estimates are unreliable, and
    # a broadcast would defeat the salting anyway). A shuffled hash
    # join on (key, salt) IS the de-skewed shuffle this helper exists
    # to produce, and it streams the skewed probe side without sorting
    # it.
    out = s.join(m.hint("shuffle_hash"), on=[*on, "__salt"], how=how)
    return out.drop("__salt")


def salted_count_distinct(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    alias: str,
    n_salts: int = 16,
) -> DataFrame:
    """Exact COUNT(DISTINCT value) per key, in two shuffles of bounded
    task size: phase 1 distinct-counts within (key, hash(value) mod
    n_salts) — a hot key's values spread over ``n_salts`` tasks — and
    phase 2 sums the partials. Correct because salting by the VALUE
    hash partitions each key's value set (no double counting)."""
    salt = F.pmod(F.xxhash64(F.col(value_col)), F.lit(n_salts))
    partial = df.groupBy(*keys, salt.alias("__salt")).agg(
        F.countDistinct(value_col).alias("__partial")
    )
    return partial.groupBy(*keys).agg(
        F.sum("__partial").cast("long").alias(alias)
    )
