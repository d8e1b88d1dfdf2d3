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

__all__ = [
    "scd2_from_changelog",
    "scd2_apply_changes",
    "scd2_compress",
    "scd2_resolve_log",
]


def scd2_from_changelog(
    changes: DataFrame,
    *,
    key_cols: list[str],
    order_cols: list[str],
    attr_cols: list[str],
    compress: bool = True,
) -> DataFrame:
    """Collapse a keyed changelog into SCD2 rows with validity intervals.

    Returns ``key_cols + attr_cols`` plus ``valid_from`` (first element of
    ``order_cols`` for the version), ``valid_to`` (next version's
    ``valid_from``, null when open) and ``is_current``.

    ``compress=False`` keeps EVERY changelog row as a version (adjacent
    equal attributes are not collapsed).  Compression is LOSSY with
    respect to future out-of-order inserts: a collapsed row can become
    significant again when a later-arriving change lands between its
    former neighbors, so incremental maintenance
    (:func:`scd2_apply_changes`) stores the uncompressed form and treats
    the compressed history as a derived view.
    """
    if not order_cols:
        raise ValueError("order_cols must define a total order per key")
    w = Window.partitionBy(*key_cols).orderBy(*[F.col(c) for c in order_cols])

    if compress:
        changed: Column = F.lit(False)
        for c in attr_cols:
            prev = F.lag(F.col(c)).over(w)
            changed = changed | ~F.col(c).eqNullSafe(prev)
        # First row of the key = row_number 1 — NOT lag(order).isNull(),
        # which conflates "no previous row" with "previous row's order value
        # is NULL": a NULL-ordered changelog row would mark its successor as
        # a spurious version start (round-7 advice fix). Same window, so no
        # extra Exchange.
        first = F.row_number().over(w) == 1
        versions = changes.withColumn("__keep", first | changed).filter(
            F.col("__keep")
        )
    else:
        versions = changes
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


def scd2_apply_changes(
    history: DataFrame,
    changes: DataFrame,
    *,
    key_cols: list[str],
    seq_col: str,
    attr_cols: list[str],
) -> DataFrame:
    """Merge a new changelog batch into an UNCOMPRESSED SCD2 history.

    The incremental form of :func:`scd2_from_changelog`: only the keys
    present in the batch are reprocessed — their existing version rows
    convert back to a changelog (``valid_from`` is the sequence value) and
    re-derive together with the new rows; every other key's history passes
    through an anti-join untouched.  Cost ∝ |batch| + |touched keys'
    history|, not |table| — over the bucketed storage layer the semi/anti
    joins prune to the touched buckets, the same discipline as
    merge_into_parquet (operators/storage.py).

    GRANULARITY CONTRACT — the maintained history is the ``compress=False``
    form (one version row per changelog row).  Compressed histories are
    LOSSY: a collapsed row can become significant again when a later batch
    inserts a change between its former neighbors (a@10, a@40 collapse to
    a@10; a late b@20 then needs a@40 back — unrecoverable).  Keeping
    every ``(key, seq)`` identity makes the apply correct under ARBITRARY
    out-of-order, interleaved, at-least-once delivery: new rows only
    INSERT versions or UPDATE neighbors' ``valid_to`` — stored identities
    never vanish, which is also exactly the contract keyed MERGE storage
    can express.  Replays dedup by ``(key, seq)``.  The compressed
    business view is :func:`scd2_compress` over the maintained table.
    """
    cols = [*key_cols, *attr_cols, seq_col]
    affected = changes.select(*key_cols).distinct()
    touched_log = (
        history.join(affected, key_cols, "left_semi")
        .select(*key_cols, *attr_cols, F.col("valid_from").alias(seq_col))
    )
    log = scd2_resolve_log(
        touched_log,
        changes.select(*cols),
        key_cols=key_cols,
        seq_col=seq_col,
        attr_cols=attr_cols,
    )
    merged = scd2_from_changelog(
        log,
        key_cols=key_cols,
        order_cols=[seq_col],
        attr_cols=attr_cols,
        compress=False,
    )
    untouched = history.join(affected, key_cols, "left_anti")
    return untouched.unionByName(merged)


def scd2_resolve_log(
    history_log: DataFrame,
    batch: DataFrame,
    *,
    key_cols: list[str],
    seq_col: str,
    attr_cols: list[str],
) -> DataFrame:
    """Union a stored changelog with a new batch, one row per ``(key, seq)``,
    with a DETERMINISTIC survivor.

    ``dropDuplicates`` kept an ARBITRARY row when a batch row shared
    ``(key, seq)`` with a stored version but carried different attributes
    (a correction, or a corrupted at-least-once redelivery) — the history
    then differed across runs/partitionings (round-7 advice fix).  Here the
    batch row wins (it is the correction), and any remaining tie among
    batch-internal conflicting duplicates breaks on the attribute values
    themselves, so the result is a pure function of the input sets.

    One ``groupBy (key, seq)`` with ``max_by`` over an ordering struct —
    partial aggregation absorbs replay storms map-side, unlike a window
    ``row_number``, and the changelog arrives at the downstream SCD2
    window pre-deduplicated exactly as before.
    """
    # the internal tag/struct columns must not silently OVERWRITE user data
    # (withColumn replaces same-named columns) — same guard as rangejoin.py
    reserved = {"__src", "__attrs"} & {*key_cols, *attr_cols, seq_col}
    if reserved:
        raise ValueError(
            f"column names collide with reserved internal names: "
            f"{sorted(reserved)}"
        )
    attr_struct = F.struct(*[F.col(c) for c in attr_cols])
    rank_struct = F.struct(F.col("__src"), *[F.col(c) for c in attr_cols])
    tagged = history_log.withColumn("__src", F.lit(0)).unionByName(
        batch.withColumn("__src", F.lit(1))
    )
    resolved = tagged.groupBy(*key_cols, seq_col).agg(
        F.max_by(attr_struct, rank_struct).alias("__attrs")
    )
    return resolved.select(
        *key_cols,
        *[F.col("__attrs").getField(c).alias(c) for c in attr_cols],
        seq_col,
    )


def scd2_compress(
    history: DataFrame,
    *,
    key_cols: list[str],
    attr_cols: list[str],
) -> DataFrame:
    """Compressed business view of an uncompressed SCD2 history.

    Collapses runs of adjacent equal attributes into single versions —
    exact by construction, because the uncompressed table IS the full
    changelog (``valid_from`` ≡ sequence)."""
    return scd2_from_changelog(
        history.select(
            *key_cols, *attr_cols, F.col("valid_from").alias("__seq")
        ),
        key_cols=key_cols,
        order_cols=["__seq"],
        attr_cols=attr_cols,
        compress=True,
    )
