"""Reference-faithful in-memory fixtures for unit tests (FIXTURES.md).

Deterministic generators for the domain relations the reference pipeline
moves through: wide raw bars (R1), the indices dimension (R3), and a sparse
FX-rates dimension. Used only by tests — the driver's parquet tables are the
inputs for declared queries and benchmarks.

The value generator is a small LCG so fixtures are reproducible without
seeding global RNG state.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession

from ..schemas import FX_RATES, INDICES, INDICES_SEED, RAW_BARS


def _lcg(seed: int):
    state = seed & 0x7FFFFFFF
    while True:
        state = (1103515245 * state + 12345) % (1 << 31)
        yield state / float(1 << 31)


def indices_df(spark: SparkSession) -> DataFrame:
    """The 10-row dimension mirroring the reference's indices.json:1-82."""
    return spark.createDataFrame(INDICES_SEED, INDICES)


def raw_bars_df(
    spark: SparkSession,
    *,
    tickers: list[str] | None = None,
    start: dt.datetime = dt.datetime(2023, 10, 24, 8, 0, tzinfo=dt.timezone.utc),
    hours: int = 16,
    seed: int = 42,
    nan_every: int = 13,
) -> DataFrame:
    """~2 days of 60-minute bars per ticker (settings.py:53-54 shape),
    long-encoded, with periodic NaN price rows (closed markets) and null
    volumes for index tickers (reference README.md:383)."""
    tickers = tickers or [t for t, *_ in INDICES_SEED]
    rng = _lcg(seed)
    rows = []
    for ti, ticker in enumerate(tickers):
        base = 100.0 * (ti + 1)
        for h in range(hours):
            ts = start + dt.timedelta(hours=h)
            if (ti * hours + h) % nan_every == 0:
                rows.append((ts, ticker, None, None, None, None, None, None))
                continue
            o = base * (0.95 + 0.1 * next(rng))
            hi = o * (1.0 + 0.02 * next(rng))
            lo = o * (1.0 - 0.02 * next(rng))
            c = lo + (hi - lo) * next(rng)
            vol = None if ti % 3 == 0 else float(int(1e6 * next(rng)))
            rows.append((ts, ticker, o, hi, lo, c, c, vol))
    return spark.createDataFrame(rows, RAW_BARS)


def fx_rate_rows(
    dates: list[dt.date] | None = None,
    seed: int = 7,
    drop_every: int = 5,
) -> list[tuple]:
    """Pure-python row builder behind :func:`fx_rates_df` — also used to
    inline the identical values into DuckDB oracle SQL (the generator is
    deterministic and engine-free, so repr round-trip keeps the doubles
    bit-exact on both sides)."""
    dates = dates or [dt.date(2023, 10, 24), dt.date(2023, 10, 25)]
    currencies = sorted({c for *_, c in INDICES_SEED if c != "USD"})
    rng = _lcg(seed)
    rows: list[tuple] = []
    i = 0
    for cur in currencies:
        level = 0.1 + 2.0 * next(rng)
        for d in dates:
            i += 1
            if i % drop_every == 0:
                continue  # simulate a missing rate
            rows.append((cur, "USD", d, level * (0.98 + 0.04 * next(rng))))
    return rows


def fx_rates_df(
    spark: SparkSession,
    *,
    dates: list[dt.date] | None = None,
    seed: int = 7,
    drop_every: int = 5,
) -> DataFrame:
    """Sparse FX dimension: one row per (non-USD currency, date), with every
    ``drop_every``-th pair omitted to exercise missing-rate → NULL ``_usd``
    semantics (currency_converter.py:170-181, README.md:381)."""
    return spark.createDataFrame(
        fx_rate_rows(dates=dates, seed=seed, drop_every=drop_every), FX_RATES
    )
