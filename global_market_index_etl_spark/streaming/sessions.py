"""Streaming gap sessionization with native session windows.

The batch sessionizer (plans/analytics.w_sessionize) numbers sessions with
two window passes; a continuous pipeline cannot do that — the stream never
ends, so "running sum over all of a user's history" is unbounded state.
Structured Streaming's ``session_window`` is the bounded-state form: the
engine merges events into per-key sessions as they arrive and EMITS a
session only once the watermark proves no more events can join it, so
state is (open sessions × keys active within the watermark horizon), not
stream length.

Boundary semantics match the batch operator: ``session_window(gap)``
merges an event arriving at exactly ``last_ts + gap`` into the running
session (inclusive bound), the same behavior as w_sessionize's "break
only when the gap EXCEEDS the threshold" rule — pinned by a test, since
an off-by-inclusive here would silently split sessions at round gaps.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..functions.exact import exact_money_sum

__all__ = ["sessionize_stream"]


def sessionize_stream(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
    gap: str = "6 hours",
    watermark: str = "1 day",
) -> DataFrame:
    """Per-key gap sessions over a streaming (or batch) event DataFrame.

    Returns ``(key, session_start, session_end, n_events, total_value)``
    where session_start/end are the min/max EVENT times in the session
    (not the padded window close, which extends ``gap`` past the last
    event).  On a batch DataFrame the same expression runs as an ordinary
    aggregation — the batch twin used by the parity tests.
    """
    df = events.withColumn("__ts", F.col(ts_col).cast("timestamp"))
    if df.isStreaming:
        df = df.withWatermark("__ts", watermark)
    return (
        df.groupBy(F.col(key_col), F.session_window("__ts", gap))
        .agg(
            F.min("__ts").alias("session_start"),
            F.max("__ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            exact_money_sum(F.col(value_col)).alias("total_value"),
        )
        .drop("session_window")
    )
