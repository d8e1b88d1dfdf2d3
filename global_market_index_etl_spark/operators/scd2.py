"""Type-2 slowly-changing-dimension history from a changelog.

The reference's dimension upsert (src/storage/postgres_writer.py:214-266,
re-expressed in operators/upsert.py) is type-1: the latest row wins and
history is lost.  A warehouse feeding time-aware queries (as-of joins,
training-data snapshots) needs the type-2 form: every attribute change
becomes a versioned row with a validity interval.

``scd2_from_changelog`` builds the full SCD2 history from an event-ordered
changelog in two window passes over ONE hash shuffle on the business key:

1. CHANGE COMPRESSION — a row survives only if any tracked attribute
   differs from the previous row of the same key (null-safe), or it is the
   key's first row.  Runs of identical values collapse to one version, so
   replaying the same feed twice yields the identical history (idempotent).
2. VALIDITY INTERVALS — ``valid_from`` is the surviving row's own sequence
   value; ``valid_to`` is the NEXT surviving version's ``valid_from``
   (null = open / current).  ``lead`` over the same (key, order) window —
   Catalyst plans a single Exchange because both windows and nothing else
   share the partition key.

Determinism: the caller supplies a total order (``order_cols`` must break
ties, e.g. (event_time, event_id)); given that, the surviving set and the
intervals are unique regardless of partitioning.

Scale: cost is one shuffle of the changelog on the business key plus two
sort-based window passes — linear, no joins, no driver state.  100 TB of
changelog with a skewed hot key is the only hazard; mitigate upstream by
pre-compressing per partition (the operator is idempotent, so a map-side
first pass is safe).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

__all__ = ["scd2_from_changelog"]


def scd2_from_changelog(
    changes: DataFrame,
    *,
    key_cols: list[str],
    order_cols: list[str],
    attr_cols: list[str],
) -> DataFrame:
    """Collapse a keyed changelog into SCD2 rows with validity intervals.

    Returns ``key_cols + attr_cols`` plus ``valid_from`` (first element of
    ``order_cols`` for the version), ``valid_to`` (next version's
    ``valid_from``, null when open) and ``is_current``.
    """
    if not order_cols:
        raise ValueError("order_cols must define a total order per key")
    w = Window.partitionBy(*key_cols).orderBy(*[F.col(c) for c in order_cols])

    changed: Column = F.lit(False)
    for c in attr_cols:
        prev = F.lag(F.col(c)).over(w)
        changed = changed | ~F.col(c).eqNullSafe(prev)
    first = F.lag(F.col(order_cols[0])).over(w).isNull()

    versions = changes.withColumn("__keep", first | changed).filter(
        F.col("__keep")
    )
    # lead over the SAME (key, order) window — the filter preserves the
    # order columns, so no extra shuffle is introduced
    w2 = Window.partitionBy(*key_cols).orderBy(
        *[F.col(c) for c in order_cols]
    )
    valid_from = F.col(order_cols[0])
    valid_to = F.lead(valid_from).over(w2)
    return versions.select(
        *key_cols,
        *attr_cols,
        valid_from.alias("valid_from"),
        valid_to.alias("valid_to"),
        valid_to.isNull().alias("is_current"),
    )
