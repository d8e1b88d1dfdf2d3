"""Stream-stream interval join via the bucketization rewrite.

Structured Streaming's symmetric hash join needs an EQUALITY key — a pure
range predicate between two streams is unsupported (there is no streaming
nested-loop). The batch rewrite in operators/rangejoin.py supplies exactly
that key: quantize event time into fixed buckets, map each point to one
bucket, explode each interval to the buckets it covers (both stateless,
streaming-safe), and the range join becomes a streaming equi-join on the
bucket id with the exact time-range residual.

The residual doubles as the state-cleanup contract: both inputs are
watermarked and the join condition bounds the two event-time columns
against each other (``p_ts ∈ [i_ts, i_ts + window)``), so the engine can
evict buffered rows once the watermark passes — state is bounded by
(arrival rate × (watermark + window)), independent of stream length.

Batch/stream parity: on the same input rows this produces exactly the
pairs of ``interval_join_bucketed`` (asserted in tests), whether the two
sides arrive in one micro-batch or interleaved across many — the
symmetric join buffers each side's rows until the watermark proves no
future match can exist.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

__all__ = ["stream_interval_join_bucketed"]


def stream_interval_join_bucketed(
    points: DataFrame,
    intervals: DataFrame,
    *,
    point_ts_col: str,
    interval_ts_col: str,
    window_seconds: int,
    bucket_seconds: int | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """Join streaming points to streaming interval-openers within a window.

    ``points``/``intervals`` are streaming DataFrames; ``point_ts_col`` and
    ``interval_ts_col`` are their (distinctly named) event-time timestamp
    columns. A point matches an interval when
    ``interval_ts <= point_ts < interval_ts + window_seconds``.
    """
    if window_seconds <= 0:
        raise ValueError(f"window_seconds must be positive, got {window_seconds}")
    if point_ts_col == interval_ts_col:
        raise ValueError(
            "point_ts_col and interval_ts_col must be distinct column names"
        )
    shared = set(points.columns) & set(intervals.columns)
    if shared:
        raise ValueError(f"column names must not overlap across sides: {shared}")
    reserved = {"__pb", "__ib"} & (set(points.columns) | set(intervals.columns))
    if reserved:  # withColumn would silently overwrite user data
        raise ValueError(
            f"column names collide with reserved internal names: "
            f"{sorted(reserved)}"
        )
    bw = int(bucket_seconds or window_seconds)

    p = points.withWatermark(point_ts_col, watermark).withColumn(
        "__pb", F.expr(f"CAST(`{point_ts_col}` AS BIGINT) div {bw}")
    )
    # Upper bucket uses `+ window` WITHOUT the half-open `- 1` of the
    # integer batch rewrite (rangejoin.py works on exact LONGs): CAST
    # (timestamp AS BIGINT) truncates fractional seconds, so an interval
    # opening at a sub-second offset covers real time up to
    # floor(i_ts) + window + frac — with `- 1` a point in that last
    # fractional second lands one bucket past the exploded range and is
    # silently dropped (round-11 advice). Over-covering by at most one
    # bucket is free: the exact residual below removes false positives.
    i = intervals.withWatermark(interval_ts_col, watermark).withColumn(
        "__ib",
        F.explode(
            F.sequence(
                F.expr(f"CAST(`{interval_ts_col}` AS BIGINT) div {bw}"),
                F.expr(
                    f"(CAST(`{interval_ts_col}` AS BIGINT)"
                    f" + {int(window_seconds)}) div {bw}"
                ),
            )
        ),
    )
    cond = F.expr(
        f"__pb = __ib AND `{point_ts_col}` >= `{interval_ts_col}` "
        f"AND `{point_ts_col}` < `{interval_ts_col}`"
        f" + INTERVAL {int(window_seconds)} SECOND"
    )
    return p.join(i, cond, "inner").drop("__pb", "__ib")
