"""Deterministic, engine-portable sampling and dataset splits.

``df.sample``/``sampleBy`` draw from a partition-seeded RNG, so the chosen
rows change with partitioning/cluster size — unacceptable for train/val/
test splits that must be reproducible forever and consistent across every
job that touches the corpus. Instead: bucket each row by a cryptographic
hash of its STABLE ID (md5 hex prefix mod N). Properties:

- deterministic on any engine, partitioning, or cluster size;
- portable: DuckDB/Postgres/Spark compute the identical bucket, so splits
  made here agree with splits made anywhere else (oracle-checked);
- stable under corpus growth: a doc's split never changes when other docs
  are added/removed — the property that prevents train/test leakage
  across dataset versions.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def hash_bucket(id_col: Column | str, n_buckets: int = 100) -> Column:
    """Deterministic bucket in [0, n_buckets): md5(id) hex-prefix mod N.

    First 8 hex chars = 32 bits — uniform and far below int64, identical
    arithmetic in every engine.
    """
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return (
        F.conv(F.substring(F.md5(c.cast("string")), 1, 8), 16, 10).cast("long")
        % n_buckets
    )


def deterministic_sample(
    df: DataFrame, id_col: str, fraction: float, n_buckets: int = 100
) -> DataFrame:
    """Keep ~``fraction`` of rows, chosen by stable id hash (never by RNG)."""
    keep = int(round(fraction * n_buckets))
    return df.filter(hash_bucket(id_col, n_buckets) < keep)


def train_val_test_split(
    df: DataFrame,
    id_col: str,
    train_pct: int = 80,
    val_pct: int = 10,
) -> DataFrame:
    """Attach a ``split`` column ∈ {train, val, test} by stable id hash.

    Percentages are integer bucket counts out of 100; test gets the rest.
    """
    if train_pct < 0 or val_pct < 0 or train_pct + val_pct > 100:
        raise ValueError(
            f"invalid split: train_pct={train_pct}, val_pct={val_pct} — "
            "need 0 <= train, 0 <= val, train + val <= 100 (test gets the "
            "remainder); out-of-range values silently empty a split"
        )
    b = hash_bucket(id_col, 100)
    return df.withColumn(
        "split",
        F.when(b < train_pct, F.lit("train"))
        .when(b < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test")),
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict,
    id_col: str,
    n_buckets: int = 100,
) -> DataFrame:
    """Deterministic stratified sampling: keep ``fractions[stratum]`` of
    each stratum's rows, chosen by stable id hash — never by RNG.

    The balanced-dataset builder (e.g. downsample low-quality deciles,
    keep all of the top one): unlike ``df.sampleBy`` (partition-seeded
    RNG — different rows on every cluster size), the selection is a pure
    function of (id, stratum fractions), so it is reproducible on any
    engine/partitioning and stable under corpus growth, and the same
    doc is never train-leaked into a differently-sampled rebuild. Strata
    absent from ``fractions`` are DROPPED (explicit allowlist — the
    curation use case; pass 1.0 to keep a stratum whole).

    One codegen hash + one broadcast-sized CASE per row: scan-speed, no
    shuffle, no RNG state.
    """
    b = hash_bucket(id_col, n_buckets)
    keep = None
    for stratum, frac in fractions.items():
        if not 0.0 <= frac <= 1.0:
            raise ValueError(f"fraction for {stratum!r} must be in [0,1], got {frac}")
        cond = (F.col(strata_col) == F.lit(stratum)) & (
            b < int(round(frac * n_buckets))
        )
        keep = cond if keep is None else (keep | cond)
    if keep is None:
        raise ValueError("fractions is empty — every row would be dropped")
    return df.filter(keep)


def select_to_token_budget(
    df: DataFrame,
    budget: int,
    token_col: str,
    priority_col: str,
    id_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Greedy token-budget selection: keep the maximal prefix of rows,
    ordered by (priority desc, id asc), whose cumulative ``token_col``
    total stays ≤ ``budget`` — the "best N tokens of the corpus" builder
    that turns a scored corpus into a fixed-size training mix.

    Scale design — the naive form is a global window
    (``sum().over(Window.orderBy(...))``), which Spark executes as ONE
    task holding the whole corpus. Instead, the classic two-phase scan:

    1. ``repartitionByRange`` on the order key — a range shuffle (the same
       exchange a global sort would need anyway);
    2. per-partition token sums → running offsets via a window over the
       PARTITION-COUNT-sized summary (bounded by cluster width, not data —
       the single-task window here is over ~hundreds of rows);
    3. broadcast offsets back, within-partition cumulative window
       (parallel across partitions), keep rows with offset + local-cumsum
       ≤ budget.

    The result is exactly the global-window answer (asserted in tests) on
    any partition-boundary placement: (priority, id) is a strict total
    order, so every boundary split yields the same global prefix.
    """
    order = [F.desc(priority_col), F.asc(id_col)]
    ranged = (
        df.repartitionByRange(num_partitions, *order)
        if num_partitions
        else df.repartitionByRange(*order)
    )
    part = ranged.withColumn("__pid", F.spark_partition_id())
    sums = part.groupBy("__pid").agg(
        F.sum(F.col(token_col)).alias("__part_tokens")
    )
    offsets = sums.withColumn(
        "__offset",
        F.coalesce(
            F.sum("__part_tokens").over(
                Window.orderBy("__pid").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
            F.lit(0),
        ),
    ).select("__pid", "__offset")
    local = Window.partitionBy("__pid").orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        part.join(F.broadcast(offsets), "__pid")
        .withColumn(
            "cum_tokens", F.col("__offset") + F.sum(F.col(token_col)).over(local)
        )
        .filter(F.col("cum_tokens") <= budget)
        .drop("__pid", "__offset")
    )
