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
from pyspark.sql import Column, DataFrame


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
