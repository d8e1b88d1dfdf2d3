"""Currency conversion (SURVEY.md §2: J2, F1, F2, P5, P6, D1, plus the as-of
generalization of README.md:381).

The reference attaches FX rates with a per-row Python dict lookup
(currency_converter.py:156-168) — semantically a left equi-join of quotes
against a rates relation on (currency, date) with a same-currency identity
default. Here that is exactly what it becomes: one broadcast hash join plus
``when/otherwise`` — no Python in the hot path, no shuffle of the fact side.

Scale notes:
- The rates dimension is |currencies| × |dates| rows (thousands/decade) —
  always broadcastable.
- ``distinct_rate_keys`` is the reference's manual distinct-pushdown
  (currency_converter.py:149-154) kept as an operator for rate *acquisition*
  (fetch only missing keys); the conversion join itself never needs it.
- For sparse rate tables (weekends/holidays), ``as_of_fill`` densifies with a
  running ``last(rate) ignoreNulls`` window per currency — the Spark
  re-expression of frankfurter's "last prior rate" behavior (README.md:381).
  The window shuffles only the tiny rates relation, never the quotes.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from ..schemas import USD_COLUMNS


def distinct_rate_keys(df: DataFrame, target: str = "USD") -> DataFrame:
    """D1/F2 — distinct (currency, date) pairs that need a rate
    (currency_converter.py:149-159): non-null, non-target currencies only."""
    return (
        df.filter(
            F.col("original_currency").isNotNull()
            & (F.col("original_currency") != target)
        )
        .select(
            F.col("original_currency").alias("base_currency"),
            F.to_date("timestamp_utc").alias("rate_date"),
        )
        .distinct()
    )


def attach_rates(
    quotes: DataFrame, rates: DataFrame, target: str = "USD"
) -> DataFrame:
    """J2 + F1 — broadcast left join on (currency, date) with identity rate
    for same-currency rows (currency_converter.py:32-33,156-168).

    Missing (currency, date) pairs keep a NULL rate, which then propagates
    NULL into every ``_usd`` column (currency_converter.py:170-181).
    """
    dim = (
        rates.filter(F.col("target_currency") == target)
        .select("base_currency", "rate_date", "rate")
    )
    q = quotes.withColumn("rate_date", F.to_date("timestamp_utc"))  # P5
    joined = q.join(
        F.broadcast(dim),
        on=[
            q["original_currency"] == dim["base_currency"],
            q["rate_date"] == dim["rate_date"],
        ],
        how="left",
    ).drop(dim["rate_date"]).drop("base_currency")
    return joined.withColumn(
        "exchange_rate",
        F.when(F.col("original_currency") == F.lit(target), F.lit(1.0)).otherwise(
            F.col("rate")
        ),
    ).drop("rate")


def convert_to_target_currency(
    quotes: DataFrame,
    rates: DataFrame,
    target: str = "USD",
    price_columns: list[str] | None = None,
) -> DataFrame:
    """P6 — ``{col}_usd = col * exchange_rate`` for the five price columns
    (currency_converter.py:111,176-181); NULL rate ⇒ NULL result (identical
    null propagation in Spark multiplication). Helper columns dropped (P7).
    """
    cols = price_columns or USD_COLUMNS
    df = attach_rates(quotes, rates, target=target)
    suffix = f"_{target.lower()}"
    df = df.withColumns(
        {f"{c}{suffix}": F.col(c) * F.col("exchange_rate") for c in cols if c in df.columns}
    )
    return df.drop("rate_date", "exchange_rate")


def as_of_fill(
    rates: DataFrame, calendar_dates: DataFrame, target: str = "USD"
) -> DataFrame:
    """Densify a sparse rates table: for every (currency, calendar date),
    carry forward the last known prior rate — backward as-of join semantics.

    ``calendar_dates`` is a one-column (``rate_date``) relation of the dates
    to cover. Implementation: cross the currency domain with the calendar
    (both tiny), left-join observed rates, then gap-fill with
    ``last(rate, ignoreNulls=True)`` over an unbounded-preceding window per
    currency. Only dimension-sized data ever shuffles.
    """
    currencies = rates.select("base_currency", "target_currency").distinct()
    grid = currencies.join(calendar_dates, how="cross")
    observed = rates.select(
        "base_currency", "target_currency", "rate_date", "rate"
    )
    dense = grid.join(
        observed, on=["base_currency", "target_currency", "rate_date"], how="left"
    )
    w = (
        Window.partitionBy("base_currency", "target_currency")
        .orderBy("rate_date")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return dense.withColumn(
        "rate", F.last("rate", ignorenulls=True).over(w)
    ).filter(F.col("rate").isNotNull())
