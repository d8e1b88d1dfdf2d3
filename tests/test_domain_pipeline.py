"""Reference-derived invariant tests for the market-data pipeline
(SURVEY.md §5 strategy: identity conversion, null-rate ⇒ null _usd, upsert
idempotency, join fan-out = 0, UTC normalization)."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F
import pytest

from global_market_index_etl_spark.operators.fx import (
    as_of_fill,
    attach_rates,
    convert_to_target_currency,
    distinct_rate_keys,
)
from global_market_index_etl_spark.operators.reshape import unpivot
from global_market_index_etl_spark.operators.standardize import standardize
from global_market_index_etl_spark.operators.upsert import fk_violations, upsert
from global_market_index_etl_spark.pipeline import load_batch, run_batch
from global_market_index_etl_spark.schemas import FX_RATES, STANDARD_COLUMNS
from global_market_index_etl_spark.sources.fixtures import (
    fx_rates_df,
    indices_df,
    raw_bars_df,
)


@pytest.fixture(scope="module")
def std(spark):
    return standardize(raw_bars_df(spark), indices_df(spark))


def test_standardize_schema_and_projection(std):
    # P4: exact declared column order (standardizer.py:222-235)
    assert std.columns == STANDARD_COLUMNS
    types = dict(std.dtypes)
    assert types["volume"] == "bigint"
    assert all(types[c] == "double" for c in ["open", "high", "low", "close"])


def test_enrich_join_no_fanout(spark, std):
    # standardizer.py:172-176 invariant: dim join must not multiply rows
    raw = raw_bars_df(spark)
    assert std.count() == raw.count()


def test_enrich_values(std):
    row = std.filter(F.col("ticker") == "^GDAXI").select(
        "name", "country", "original_currency"
    ).first()
    assert row == ("DAX Performance Index", "Germany", "EUR")


def test_identity_conversion(spark, std):
    # the reference's only hard assert (currency_converter.py:262-264):
    # USD rows convert with rate 1.0 ⇒ open_usd == open exactly
    conv = convert_to_target_currency(std, fx_rates_df(spark))
    usd = conv.filter(
        (F.col("original_currency") == "USD") & F.col("open").isNotNull()
    )
    assert usd.filter(F.col("open_usd") != F.col("open")).count() == 0


def test_missing_rate_propagates_null(spark, std):
    # currency_converter.py:170-181 / README.md:381: no rate ⇒ NULL _usd
    with_rates = attach_rates(std, fx_rates_df(spark))
    missing = with_rates.filter(
        F.col("exchange_rate").isNull() & F.col("close").isNotNull()
    )
    assert missing.count() > 0  # fixture drops pairs on purpose
    conv = convert_to_target_currency(std, fx_rates_df(spark))
    bad = conv.filter(
        F.col("close").isNotNull()
        & F.col("close_usd").isNotNull()
        & (F.col("original_currency") != "USD")
    ).join(
        with_rates.filter(F.col("exchange_rate").isNull()).select(
            "ticker", "timestamp_utc"
        ),
        ["ticker", "timestamp_utc"],
        "inner",
    )
    assert bad.count() == 0


def test_null_price_propagates_null_usd(spark, std):
    conv = convert_to_target_currency(std, fx_rates_df(spark))
    assert (
        conv.filter(F.col("open").isNull() & F.col("open_usd").isNotNull()).count()
        == 0
    )


def test_upsert_idempotent(spark, std):
    conv = convert_to_target_currency(std, fx_rates_df(spark)).withColumn(
        "batch_ts", F.lit("2023-10-26 00:00:00").cast("timestamp")
    )
    keys = ["ticker", "timestamp_utc"]
    once = load_batch(None, conv, keys, "batch_ts")
    twice = upsert(once, conv, keys, "batch_ts")
    assert once.count() == twice.count()
    assert once.exceptAll(twice).count() == 0  # re-running a batch is a no-op


def test_upsert_last_write_wins(spark):
    base = spark.createDataFrame(
        [("A", 1, 10.0, 1), ("B", 1, 20.0, 1)], "k string, t int, v double, b int"
    )
    upd = spark.createDataFrame(
        [("A", 1, 99.0, 2), ("C", 1, 30.0, 2)], "k string, t int, v double, b int"
    )
    out = {r.k: r.v for r in upsert(base, upd, ["k", "t"], "b").collect()}
    assert out == {"A": 99.0, "B": 20.0, "C": 30.0}


def test_fk_violations_detects_orphans(spark, std):
    orphan = std.withColumn("ticker", F.lit("^FAKE"))
    assert fk_violations(orphan, indices_df(spark), "ticker").count() > 0
    assert fk_violations(std, indices_df(spark), "ticker").count() == 0
    with pytest.raises(ValueError, match="FK violation"):
        load_batch(None, orphan.limit(5), indices=indices_df(spark))


def test_utc_normalization_naive_localized(spark):
    # standardizer.py:133-136: naive daily bars treated as UTC instants
    raw = raw_bars_df(spark, hours=2)
    std_df = standardize(raw, indices_df(spark), assume_tz="UTC")
    got = std_df.select(F.min("timestamp_utc")).first()[0]
    assert got == dt.datetime(2023, 10, 24, 8, 0)


def test_unpivot_roundtrip_counts(spark):
    raw = raw_bars_df(spark, hours=4)
    long = unpivot(
        raw,
        ["timestamp", "ticker"],
        ["Open", "High", "Low", "Close"],
        "field",
        "px",
    )
    assert long.count() == raw.count() * 4
    assert set(long.columns) == {"timestamp", "ticker", "field", "px"}


def test_distinct_rate_keys_excludes_target_and_null(spark, std):
    keys = distinct_rate_keys(std).collect()
    assert all(r.base_currency != "USD" for r in keys)
    currencies = {r.base_currency for r in keys}
    assert currencies == {"EUR", "GBP", "CNY", "JPY", "INR"}


def test_as_of_fill_carries_forward(spark):
    rates = spark.createDataFrame(
        [
            ("EUR", "USD", dt.date(2023, 10, 20), 1.05),
            ("EUR", "USD", dt.date(2023, 10, 23), 1.07),
        ],
        FX_RATES,
    )
    cal = spark.createDataFrame(
        [(dt.date(2023, 10, 20 + i),) for i in range(5)], "rate_date date"
    )
    dense = {r.rate_date: r.rate for r in as_of_fill(rates, cal).collect()}
    # weekend (21st, 22nd) carries the 20th's rate; 24th carries the 23rd's
    assert dense[dt.date(2023, 10, 21)] == 1.05
    assert dense[dt.date(2023, 10, 22)] == 1.05
    assert dense[dt.date(2023, 10, 24)] == 1.07


def test_run_batch_end_to_end(spark):
    out = run_batch(raw_bars_df(spark), indices_df(spark), fx_rates_df(spark))
    assert out.count() == raw_bars_df(spark).count()
    assert "close_usd" in out.columns
    # non-USD row with a known rate actually converted
    eur = out.filter(
        (F.col("original_currency") == "EUR")
        & F.col("close").isNotNull()
        & F.col("close_usd").isNotNull()
    ).first()
    assert eur is not None and eur.close_usd != eur.close
