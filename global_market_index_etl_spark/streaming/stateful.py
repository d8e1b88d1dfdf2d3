"""Custom stateful streaming operators (applyInPandasWithState).

The reference has no streaming state at all (SURVEY.md §2.11); this module
supplies the missing tier for continuous pipelines: arbitrary per-key state
maintained by the engine's checkpoint, updated with Arrow-batched pandas
code. The canonical example here is a cumulative per-key accumulator whose
state survives across triggers AND across separate ``availableNow`` runs
(cron ticks) via the checkpoint — the stateful generalization of the
reference's "re-fetch a window and upsert" incremental pattern.

At scale: state is hash-partitioned by key across executors and stored in
the state store (RocksDB-backed in production configs); each micro-batch
touches only the keys present in that batch.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_COUNTS_OUTPUT = "user_id long, n_events long, total_value double"
RUNNING_COUNTS_STATE = "n long, total double"


def _update_running_counts(
    key: tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Accumulate (count, value-sum) per key across ALL batches ever seen."""
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].fillna(0.0).sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
    )


def running_user_totals(
    events_stream: DataFrame,
    key_col: str = "user_id",
) -> DataFrame:
    """Per-key cumulative event count + value sum with engine-managed state.

    Input must be a STREAMING DataFrame with (``key_col``, ``value``)
    columns. Each output row is the key's new cumulative total as of the
    current micro-batch; downstream sinks upsert on the key to keep the
    latest. State persists in the checkpoint — a later ``availableNow``
    run (next cron tick) resumes the totals, which tests assert.
    """
    return events_stream.groupBy(key_col).applyInPandasWithState(
        _update_running_counts,
        outputStructType=RUNNING_COUNTS_OUTPUT,
        stateStructType=RUNNING_COUNTS_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
