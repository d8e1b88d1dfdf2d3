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

import math
from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

SALT = "__salt"

#: Sentinel for :func:`salted_join`'s ``hot_keys``: salt EVERY key (the
#: flat pre-round-15 behavior — small side replicated ``n_salts`` ways
#: unconditionally). Useful as a pedagogical baseline and in tests; at
#: scale prefer the default adaptive mode, which pays replication only
#: where the key histogram says skew exists.
SALT_ALL = "all"


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


def probe_hot_keys(
    df: DataFrame,
    on: str,
    *,
    sample_rows: int = 200_000,
    skew_factor: float = 2.0,
    max_hot_keys: int = 64,
    seed: int = 42,
) -> list:
    """Sample-probed hot-key histogram for the big side of an equi-join.

    A key is HOT when its row share would overload a single reducer:
    sampled share ≥ ``skew_factor / spark.sql.shuffle.partitions`` (a key
    at exactly 1/partitions share lands an average reducer's fair load on
    ONE reducer; ``skew_factor``× that is where stragglers start). The
    share criterion is scale-invariant — the same corpus at 10× the rows
    probes the same hot set — and the probe itself is bounded: one
    column-pruned count, one seeded Bernoulli sample aggregated map-side
    (≤ ~``sample_rows`` rows through the shuffle), and a driver collect
    capped at ``max_hot_keys`` rows (hottest first; ties broken by key for
    determinism). A sampled count of 1 is never evidence of skew, so the
    count floor is 2 even when the share threshold rounds lower.

    Misclassification is SAFE in both directions for
    :func:`salted_join` — salting a cold key or missing a lukewarm one
    changes the plan's balance, never its result — which is what lets a
    sampling probe (partitioning-dependent Bernoulli draw) feed an
    oracle-checked operator.
    """
    spark = df.sparkSession
    try:
        n_red = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    except Exception:
        n_red = 200
    share_threshold = skew_factor / max(n_red, 1)
    total = df.count()
    if total == 0:
        return []
    fraction = min(1.0, sample_rows / total)
    keys = df.select(on)
    sample = keys.sample(fraction=fraction, seed=seed) if fraction < 1.0 else keys
    expected = max(int(total * fraction), 1)
    min_count = max(int(math.ceil(share_threshold * expected)), 2)
    hot = (
        sample.where(F.col(on).isNotNull())
        .groupBy(on)
        .agg(F.count(F.lit(1)).alias("__c"))
        .where(F.col("__c") >= min_count)
        .orderBy(F.desc("__c"), F.col(on))
        .limit(max_hot_keys)
        .collect()
    )
    return [r[0] for r in hot]


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 16,
    how: str = "inner",
    hot_keys: Sequence | str | None = None,
) -> DataFrame:
    """Equi-join with an ADAPTIVE hot-key split (round-15; the flat ×16
    small-side replication is the ``hot_keys=SALT_ALL`` legacy dial).

    ``hot_keys`` selects the salting scope:

    - ``None`` (default): probe the big side's key histogram
      (:func:`probe_hot_keys`) and salt ONLY the detected hot keys. A
      uniform corpus probes empty and degrades to the PLAIN equi-join —
      zero replication, zero extra join columns — so skew-safety costs
      nothing where there is no skew (the round-14 occupancy-adaptive
      span-salting discipline applied to the generic join).
    - an explicit key sequence: salt exactly those keys (no probe pass;
      the caller already knows the histogram — e.g. from a maintained
      sketch).
    - :data:`SALT_ALL`: salt every key — small side exploded
      ``n_salts`` ways unconditionally.

    When a hot set is in play both sides stay ONE join: the big side
    salts hot rows with a deterministic row hash (cold rows ride salt 0),
    the small side explodes a CONDITIONAL replica array (``n_salts``
    replicas for hot keys, a single salt-0 replica otherwise), so
    replication cost is ``n_salts × |hot keys|`` extra small-side rows —
    not ``n_salts × |small|``. Result-identical to ``big.join(small,
    on)`` in ALL modes for the join types where every output row is
    anchored to exactly one big-side row (inner/left/semi/anti); right/
    full outer would emit each UNMATCHED small-side row once per salt
    replica — rejected explicitly rather than silently multiplied. NULL
    big-side keys take salt 0 and never match, exactly like the plain
    join.

    Use when the small side is too big to broadcast and the key histogram
    is spiky; otherwise prefer broadcast (no shuffle at all) or AQE's
    runtime skew split (which cannot help when the skewed stage feeds a
    downstream key-partitioning requirement).
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi",
               "leftsemi", "semi", "left_anti", "leftanti", "anti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join does not support how={how!r}: unmatched "
            "small-side rows would be duplicated once per salt replica "
            "(use the plain join for right/full outer)"
        )
    if hot_keys is None:
        hot_keys = probe_hot_keys(big, on)
    if isinstance(hot_keys, str):
        if hot_keys != SALT_ALL:
            raise ValueError(
                f"hot_keys must be a key sequence, None, or SALT_ALL; "
                f"got {hot_keys!r}"
            )
        big_salt = _salt_col(big, n_salts).cast("int")
        small_replicas = F.sequence(F.lit(0), F.lit(n_salts - 1))
    else:
        hot_keys = list(hot_keys)
        if not hot_keys:
            return big.join(small, on=on, how=how)
        big_salt = (
            F.when(F.col(on).isin(hot_keys), _salt_col(big, n_salts))
            .otherwise(F.lit(0))
            .cast("int")
        )
        small_replicas = (
            F.when(
                F.col(on).isin(hot_keys),
                F.sequence(F.lit(0), F.lit(n_salts - 1)),
            )
            .otherwise(F.array(F.lit(0)))
        )
    big_s = big.withColumn(SALT, big_salt)
    small_s = small.withColumn(SALT, F.explode(small_replicas))
    return big_s.join(small_s, on=[on, SALT], how=how).drop(SALT)
