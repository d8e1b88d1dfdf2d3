"""Skew mitigation operators: salted aggregation and salted join.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime, but two cases still want explicit salting at 100 TB:

- **Low-cardinality heavy aggregation**: a groupBy on a handful of keys
  (e.g. 5 event types over 10^11 rows) hashes everything to ≤5 reducers no
  matter how many shuffle partitions exist. Pre-aggregating on
  (key, salt) fans the partial work across ``n_salts × n_keys`` reducers;
  the final combine over n_salts rows per key is trivial. Valid for any
  algebraic aggregate (sum/count/min/max — reassociable).
- **Skewed sort-merge join keys**: one hot key swamps a single join task.
  Salting the big side with a deterministic pseudo-random salt and
  exploding the small side ``n_salts`` ways splits the hot key across
  tasks. Equi-join semantics are unchanged (every (key, salt) pair of the
  big side finds exactly its one small-side replica).

Both transforms are **result-identical** to their unsalted forms (the
salted aggregate keeps integer partials so float summation order cannot
differ), which is what makes them DuckDB-oracle-checkable.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

SALT = "__salt"


def _salt_col(df: DataFrame, n_salts: int) -> Column:
    """Deterministic per-row salt: hash of the whole row mod n_salts.

    xxhash64 over all columns — stable across runs/partitionings (no
    rand()), uniform enough to spread a hot key.
    """
    return F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts))


def salted_sum_count(
    df: DataFrame,
    keys: Sequence[str],
    int_sum_cols: dict[str, Column],
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage salted aggregation for integer-valued sums + row counts.

    ``int_sum_cols`` maps output name → integer column expression (integer
    partials re-aggregate exactly; for money use functions.exact.cents).
    Stage 1 groups by (keys..., salt) — n_salts × |keys| reducers instead
    of |keys|; stage 2 combines the ≤ n_salts partials per key.
    """
    salted = df.withColumn(SALT, _salt_col(df, n_salts))
    partial = salted.groupBy(*keys, SALT).agg(
        *[F.sum(expr).alias(f"__p_{name}") for name, expr in int_sum_cols.items()],
        F.count(F.lit(1)).alias("__p_n"),
    )
    return partial.groupBy(*keys).agg(
        *[F.sum(f"__p_{name}").alias(name) for name in int_sum_cols],
        F.sum("__p_n").alias("n_rows"),
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the hot-key split: big side salted, small side
    replicated n_salts ways. Result-identical to ``big.join(small, on)``
    for the join types where every output row is anchored to exactly one
    big-side row (inner/left/semi/anti). Right/full outer would emit each
    UNMATCHED small-side row once per salt replica — rejected explicitly
    rather than silently multiplied.

    Use when the small side is too big to broadcast and the key histogram
    is spiky; otherwise prefer broadcast (no shuffle at all) or AQE's
    runtime skew split.
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi",
               "leftsemi", "semi", "left_anti", "leftanti", "anti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join does not support how={how!r}: unmatched "
            "small-side rows would be duplicated once per salt replica "
            "(use the plain join for right/full outer)"
        )
    big_s = big.withColumn(SALT, _salt_col(big, n_salts))
    small_s = small.withColumn(
        SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return big_s.join(small_s, on=[on, SALT], how=how).drop(SALT)
