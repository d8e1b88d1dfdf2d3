"""S1 — the reference's batch market-data scan as a Spark 4 Python
DataSource (SURVEY.md §2.1: yf_collector.py:11-99 → "Python Data Source
partitioned by ticker").

The reference fetches all tickers in one driver-side ``yf.download`` call
(yf_collector.py:50-59). The Spark-native design inverts that: one input
partition PER TICKER, so a 1000-executor cluster fetches 1000 tickers
concurrently and a slow/failed ticker retries as one task instead of
poisoning the whole batch. Schema, column names, and types match the
standardized long layout (SURVEY.md §1.3 RAW/QUOTES).

The HTTP call itself is stubbed with a deterministic synthetic OHLCV walk
(seeded LCG per ticker) because this container has no network — the
partition planning, option handling, schema contract, and per-partition
iterator protocol are the real, tested surface. Swap ``_synthetic_bars``
for a ``yfinance``/HTTP fetch to go live; the task boundary is already
per-ticker.
"""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

BAR_SCHEMA = (
    "ticker string, timestamp_utc timestamp, open double, high double, "
    "low double, close double, adjusted_close double, volume bigint"
)

DEFAULT_TICKERS = "^GSPC,^IXIC,^DJI,^FTSE,^GDAXI,^FCHI,^N225,^HSI,^AXJO,^BSESN"


class TickerPartition(InputPartition):
    """One fetch unit = one ticker (the reference's per-ticker thread pool,
    promoted to a Spark task)."""

    def __init__(self, ticker: str):
        self.ticker = ticker


class MarketBarsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.tickers = [
            t.strip()
            for t in options.get("tickers", DEFAULT_TICKERS).split(",")
            if t.strip()
        ]
        self.bars = int(options.get("bars", "48"))  # 2d of 60m (settings.py:53-54)
        self.interval_minutes = int(options.get("interval_minutes", "60"))
        self.seed = int(options.get("seed", "42"))
        self.start = options.get("start", "2024-01-01T00:00:00")

    def partitions(self):
        return [TickerPartition(t) for t in self.tickers]

    def read(self, partition: TickerPartition):
        # Deterministic synthetic walk — stands in for the per-ticker HTTP
        # fetch. LCG seeded by (seed, ticker) so every run/cluster agrees.
        t = partition.ticker
        state = self.seed
        for ch in t:
            state = (state * 31 + ord(ch)) & 0x7FFFFFFF

        def nxt() -> float:
            nonlocal state
            state = (1103515245 * state + 12345) % (1 << 31)
            return state / float(1 << 31)

        base = 100.0 * (1.0 + nxt() * 50.0)
        ts = datetime.fromisoformat(self.start).replace(tzinfo=timezone.utc)
        step = timedelta(minutes=self.interval_minutes)
        price = base
        for _ in range(self.bars):
            drift = (nxt() - 0.5) * 0.02 * price
            o = price
            c = price + drift
            hi = max(o, c) * (1.0 + nxt() * 0.005)
            lo = min(o, c) * (1.0 - nxt() * 0.005)
            vol = int(nxt() * 1_000_000)
            yield (t, ts, o, hi, lo, c, c, vol)
            price = c
            ts = ts + step


class MarketBarsSource(DataSource):
    """``spark.read.format("market_bars")`` after
    ``spark.dataSource.register(MarketBarsSource)``."""

    @classmethod
    def name(cls) -> str:
        return "market_bars"

    def schema(self) -> str:
        return BAR_SCHEMA

    def reader(self, schema) -> MarketBarsReader:
        return MarketBarsReader(self.options)


def register(spark) -> None:
    """Idempotent registration of the source with a session."""
    spark.dataSource.register(MarketBarsSource)


def read_market_bars(spark, **options):
    """Convenience loader: returns the bars DataFrame, one partition/ticker."""
    register(spark)
    reader = spark.read.format("market_bars")
    for k, v in options.items():
        reader = reader.option(k, str(v))
    return reader.load()
