"""Standardization stage: rename → UTC-normalize → enrich → cast → project.

Spark re-expression of the reference's ``standardize_data``
(standardizer.py:9-260, operators P1-P4 + J1 in SURVEY.md §2.4/§2.6). The
whole stage is a single narrow plan plus one broadcast hash join against the
10-row indices dimension — shuffle-free at any scale.

Divergence from the reference, on purpose (SURVEY.md §1.2): string NaN is
kept as SQL NULL instead of the pandas ``astype(str)`` artifacts ``"nan"`` /
``""`` (standardizer.py:204-205) — the DB layer of the reference already
stored NULLs, so NULL is the at-rest semantics.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..schemas import (
    NUMERIC_QUOTE_COLUMNS,
    RAW_TO_STANDARD,
    STANDARD_COLUMNS,
)


def rename_raw_columns(df: DataFrame) -> DataFrame:
    """P1 — yfinance capitalized names → engine names (standardizer.py:77-111).

    Like the reference, the map is filtered to columns actually present
    (schema drift tolerated), but the time and ticker keys are mandatory.
    """
    missing = {"timestamp", "ticker"} - set(df.columns)
    if missing:
        raise ValueError(f"raw frame missing key column(s): {sorted(missing)}")
    present = {k: v for k, v in RAW_TO_STANDARD.items() if k in df.columns}
    return df.withColumnsRenamed(present)


def normalize_utc(
    df: DataFrame, source_column: str = "timestamp", assume_tz: str = "UTC"
) -> DataFrame:
    """P2 — produce ``timestamp_utc`` (standardizer.py:124-142).

    With the session timezone pinned to UTC, tz-aware inputs are already UTC
    instants. Naive inputs (the reference's daily bars,
    standardizer.py:133-136) are localized from ``assume_tz``; the default
    UTC makes ``to_utc_timestamp`` the identity, matching tz_localize("UTC").
    """
    ts = F.col(source_column).cast("timestamp")
    if assume_tz != "UTC":
        ts = F.to_utc_timestamp(ts, assume_tz)
    return df.withColumn("timestamp_utc", ts).drop(source_column)


def cast_quote_types(df: DataFrame) -> DataFrame:
    """P3 — coercing casts (standardizer.py:188-221).

    Non-ANSI ``cast`` = ``pd.to_numeric(errors="coerce")``: unparseable
    values become NULL. Volume goes to LongType — Spark's natively nullable
    integer replaces the reference's Int64/float64 dance
    (standardizer.py:211-221).
    """
    numeric = {
        c: F.col(c).cast("double") for c in NUMERIC_QUOTE_COLUMNS if c in df.columns
    }
    out = df.withColumns(numeric)
    if "volume" in df.columns:
        out = out.withColumn("volume", F.col("volume").cast("long"))
    return out


def enrich_with_indices(df: DataFrame, indices: DataFrame) -> DataFrame:
    """J1 — left equi-join against the indices dimension
    (standardizer.py:150-186), with ``currency`` exposed as
    ``original_currency`` (standardizer.py:163).

    The dimension is tiny (10 rows; at production scale still ≤ thousands of
    instruments) ⇒ explicit ``broadcast`` pins a broadcast hash join: no
    shuffle of the fact side, no fan-out risk since ``ticker`` is the dim's
    unique key. The reference's post-join row-count invariant
    (standardizer.py:172-176) is enforced by tests against the key-uniqueness
    contract instead of a runtime count (which would be an extra job per run).
    """
    dim = indices
    if "original_currency" not in dim.columns and "currency" in dim.columns:
        dim = dim.withColumnRenamed("currency", "original_currency")
    dim = dim.select("ticker", "name", "country", "exchange", "original_currency")
    return df.join(F.broadcast(dim), on="ticker", how="left")


def standardize(
    raw_long: DataFrame, indices: DataFrame, assume_tz: str = "UTC"
) -> DataFrame:
    """Full standardize stage over a long-encoded raw frame: P1→P2→J1→P3→P4.

    Mirrors the reference stage order (standardizer.py:9-260) as one lazy
    plan; Catalyst fuses the projections into a single whole-stage-codegen
    span over the scan, with the only exchange being the broadcast.
    """
    df = rename_raw_columns(raw_long)
    df = normalize_utc(df, assume_tz=assume_tz)
    df = enrich_with_indices(df, indices)
    df = cast_quote_types(df)
    present = [c for c in STANDARD_COLUMNS if c in df.columns]  # P4
    return df.select(*present)
