"""Declared schemas for the engine's four relations (SURVEY.md §1.3).

The reference hard-codes its expected schemas as literal lists/dicts
(yf_collector.py:74-92, standardizer.py:77-235, postgres_writer.py:42-101);
here each relation gets one ``StructType`` declared once and enforced at
``createDataFrame`` / read time.

Money is DoubleType on purpose — the reference stores DOUBLE PRECISION
(postgres_writer.py:79-84), so exact-value parity requires binary floats,
not decimals.
"""

from __future__ import annotations

from pyspark.sql.types import (
    DateType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# R1 — raw bars, long encoding of the reference's wide MultiIndex frame
# (yf_collector.py:20-23). Source-exchange tz already collapsed to an
# instant; naive daily bars are localized as UTC (standardizer.py:133-136).
RAW_BARS = StructType(
    [
        StructField("timestamp", TimestampType(), False),
        StructField("ticker", StringType(), False),
        StructField("Open", DoubleType(), True),
        StructField("High", DoubleType(), True),
        StructField("Low", DoubleType(), True),
        StructField("Close", DoubleType(), True),
        StructField("Adj Close", DoubleType(), True),
        StructField("Volume", DoubleType(), True),
    ]
)

# R2/R4 — standardized long fact (standardizer.py:222-235) + the five _usd
# columns (currency_converter.py:111,176-181; postgres_writer.py:94-101).
QUOTES = StructType(
    [
        StructField("timestamp_utc", TimestampType(), False),
        StructField("ticker", StringType(), False),
        StructField("name", StringType(), True),
        StructField("country", StringType(), True),
        StructField("original_currency", StringType(), True),
        StructField("exchange", StringType(), True),
        StructField("open", DoubleType(), True),
        StructField("high", DoubleType(), True),
        StructField("low", DoubleType(), True),
        StructField("close", DoubleType(), True),
        StructField("adjusted_close", DoubleType(), True),
        StructField("volume", LongType(), True),
    ]
)

USD_COLUMNS = ["open", "high", "low", "close", "adjusted_close"]

# R3 — indices dimension (postgres_writer.py:42-50; indices.json:1-82)
INDICES = StructType(
    [
        StructField("ticker", StringType(), False),
        StructField("name", StringType(), False),
        StructField("country", StringType(), True),
        StructField("exchange", StringType(), True),
        StructField("original_currency", StringType(), False),
    ]
)

# FX rate map materialized as a relation (currency_converter.py:13-14) —
# {(base, target, date) -> rate} becomes a 4-column broadcastable dimension.
FX_RATES = StructType(
    [
        StructField("base_currency", StringType(), False),
        StructField("target_currency", StringType(), False),
        StructField("rate_date", DateType(), False),
        StructField("rate", DoubleType(), False),
    ]
)

# The 10-row seed dimension — same data as the reference's
# src/config/indices.json:1-82 (ticker, name, country, exchange, currency).
INDICES_SEED: list[tuple[str, str, str, str, str]] = [
    ("^DJI", "Dow Jones Industrial Average", "USA", "DJI", "USD"),
    ("^GSPC", "S&P 500", "USA", "SNP", "USD"),
    ("^IXIC", "Nasdaq Composite", "USA", "NMS", "USD"),
    ("^GDAXI", "DAX Performance Index", "Germany", "GER", "EUR"),
    ("^FCHI", "CAC 40", "France", "PAR", "EUR"),
    ("^FTSE", "FTSE 100", "UK", "LSE", "GBP"),
    ("000001.SS", "Shanghai Composite Index", "China", "SHH", "CNY"),
    ("^N225", "Nikkei 225", "Japan", "NIM", "JPY"),
    ("^NSEI", "Nifty 50", "India", "NSI", "INR"),
    ("URTH", "MSCI World Index", "World", "PCX", "USD"),
]

# Rename map applied by the standardizer (standardizer.py:77-86).
RAW_TO_STANDARD = {
    "Open": "open",
    "High": "high",
    "Low": "low",
    "Close": "close",
    "Adj Close": "adjusted_close",
    "Volume": "volume",
}

NUMERIC_QUOTE_COLUMNS = ["open", "high", "low", "close", "adjusted_close"]

# Final projection order (standardizer.py:222-235).
STANDARD_COLUMNS = [
    "timestamp_utc",
    "ticker",
    "name",
    "country",
    "original_currency",
    "exchange",
    "open",
    "high",
    "low",
    "close",
    "adjusted_close",
    "volume",
]
