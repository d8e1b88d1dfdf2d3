"""Streaming count-min sketch maintenance — corpus heavy hitters that
update every ingestion tick.

The batch sketch (operators/terms.py:count_min_cells) is ADDITIVE: the
cells of two disjoint corpora sum to the cells of their union, exactly.
That makes streaming maintenance the easy case of the incremental-index
pattern (streaming/incremental.py): each ``availableNow`` tick writes its
batch's cells as a ``batch=<id>`` delta (≤ depth × width rows — the
sketch's fixed size is the whole point), and the queryable state is a
merge-on-read ``groupBy(row, cell) sum`` over the deltas.

Idempotence under at-least-once ``foreachBatch`` delivery comes from the
same two properties the MinHash index relies on:

- a replayed batch OVERWRITES its own ``batch=<id>`` directory with
  byte-identical content (the sketch construction is deterministic), so
  checkpoint-restart double-counts nothing;
- the state directory is keyed by the CHECKPOINT's batch ids — rebuilding
  from scratch means a fresh state dir + fresh checkpoint, exactly like
  the persisted dedup indexes (a fresh checkpoint over an old state dir
  would re-number batches and is rejected nowhere cheaper than in docs).

At 100 TB the per-tick cost is the batch scan plus a depth×width-bounded
shuffle; the state never grows with the vocabulary — the property the
exact heavy-hitter pass (terms.top_terms_global) cannot give.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.terms import bloom_registers, count_min_cells, hll_registers

__all__ = [
    "streaming_count_min",
    "read_count_min_state",
    "streaming_hll",
    "read_hll_state",
    "streaming_quantile_histogram",
    "read_quantile_state",
    "streaming_bloom",
    "read_bloom_state",
]


def _committed_batch_dirs(spark: SparkSession, state_path: str) -> list[str]:
    """``batch=<id>`` delta directories carrying Spark's ``_SUCCESS``
    marker. A tick that crashed mid-write leaves a partial dir with no
    marker; merging its partial rows would transiently violate the
    sketch contract (count-min could UNDERestimate; HLL registers could
    under-read a max), so unmarked dirs are excluded until the
    checkpoint replay overwrites them."""
    jvm = spark._jvm
    root = jvm.org.apache.hadoop.fs.Path(state_path)
    fs = root.getFileSystem(spark._jsc.hadoopConfiguration())
    committed: list[str] = []
    if fs.exists(root):
        for st in fs.listStatus(root):
            name = st.getPath().getName()
            if (
                st.isDirectory()
                and name.startswith("batch=")
                and fs.exists(
                    jvm.org.apache.hadoop.fs.Path(st.getPath(), "_SUCCESS")
                )
            ):
                committed.append(st.getPath().toString())
    return committed


def streaming_count_min(
    docs_stream: DataFrame,
    *,
    state_path: str,
    checkpoint: str,
    text_col: str = "text",
    depth: int = 4,
    width: int = 1024,
):
    """Maintain a count-min sketch from a streaming document source;
    one ``availableNow`` tick. Returns the started StreamingQuery."""

    def handle(batch: DataFrame, batch_id: int) -> None:
        cells = count_min_cells(
            batch, text_col=text_col, depth=depth, width=width
        )
        (
            cells.write.mode("overwrite").parquet(
                f"{state_path}/batch={batch_id}"
            )
        )

    return (
        docs_stream.writeStream.trigger(availableNow=True)
        .option("checkpointLocation", checkpoint)
        .foreachBatch(handle)
        .start()
    )


def read_count_min_state(spark: SparkSession, state_path: str) -> DataFrame:
    """Merged ``(row, cell, cnt)`` view over every COMMITTED tick delta —
    usable directly with :func:`operators.terms.count_min_estimate`.

    Committed = the delta directory carries Spark's ``_SUCCESS`` marker. A
    tick that crashed mid-write leaves a partial ``batch=<id>`` dir with
    no marker; summing its partial counts would transiently UNDERestimate
    — the one direction the CMS contract forbids — so unmarked dirs are
    excluded until the checkpoint replay overwrites them (round-8 review
    fix)."""
    committed = _committed_batch_dirs(spark, state_path)
    if not committed:
        return spark.createDataFrame(
            [], "row int, cell bigint, cnt bigint, depth int, width int"
        )
    deltas = spark.read.option("basePath", state_path).parquet(
        *sorted(committed)
    )
    # depth/width ride through the merge as grouping keys: deltas written
    # with different dimensions would survive as distinct rows, which
    # count_min_estimate's dimension check then REJECTS instead of
    # silently probing wrong cells (round-8 review fix — persisted state
    # is never dimensionless). State written BEFORE dimension stamping
    # has no depth/width columns; grouping on them would crash with an
    # unresolved-column AnalysisException mid-merge, so detect it up
    # front and fail with the migration story instead (round-9 review
    # fix): the sketch is cheap to rebuild, and guessing dimensions here
    # would reintroduce exactly the wrong-cell underestimate the
    # stamping exists to prevent.
    if "depth" not in deltas.columns or "width" not in deltas.columns:
        raise ValueError(
            f"count-min state at {state_path} predates dimension "
            "stamping (deltas lack depth/width columns) — rebuild the "
            "sketch with a fresh state dir + checkpoint, or backfill "
            "literal depth/width columns onto every batch=* delta"
        )
    return (
        deltas
        .groupBy("row", "cell", "depth", "width")
        .agg(F.sum("cnt").alias("cnt"))
        .select("row", "cell", "cnt", "depth", "width")
    )


def streaming_hll(
    keys_stream: DataFrame,
    *,
    state_path: str,
    checkpoint: str,
    key_col: str,
    p: int = 10,
    group_cols: list[str] | None = None,
):
    """Maintain portable HyperLogLog registers from a streaming key
    source; one ``availableNow`` tick. Returns the started
    StreamingQuery.

    The register table (operators/terms.hll_registers) is MAX-mergeable:
    registers of two disjoint corpora elementwise-max to the registers
    of their union, exactly — the same easy case of the incremental-
    index pattern as the additive count-min above, with ``max`` in
    place of ``sum``. Each tick writes its batch's ≤ groups × 2^p
    register rows as a ``batch=<id>`` delta; idempotence under
    at-least-once ``foreachBatch`` delivery holds because a replayed
    batch OVERWRITES its own directory with byte-identical content
    (hll_registers is a pure function of the batch) and max-merge is
    insensitive to the rewrite. State never grows with key cardinality
    — distinct users per key at 100 TB without a distinct shuffle of
    the user space, maintained per ingestion tick."""

    def handle(batch: DataFrame, batch_id: int) -> None:
        regs = hll_registers(batch, key_col, p=p, group_cols=group_cols)
        regs.write.mode("overwrite").parquet(f"{state_path}/batch={batch_id}")

    return (
        keys_stream.writeStream.trigger(availableNow=True)
        .option("checkpointLocation", checkpoint)
        .foreachBatch(handle)
        .start()
    )


def read_hll_state(
    spark: SparkSession, state_path: str, *, empty_schema: str | None = None
) -> DataFrame:
    """Merged register view over every COMMITTED tick delta — usable
    directly with :func:`operators.terms.hll_estimate`.

    ``p`` rides through the merge as a grouping key: deltas written at
    different precisions survive as distinct rows, which hll_estimate
    then REJECTS instead of silently mis-scaling (the count-min
    dimension discipline). Uncommitted (marker-less) partial deltas are
    excluded — a partial register set would under-read maxima.

    The register schema is DYNAMIC (the stream's ``group_cols`` ride
    along), so a state dir with no committed delta yet cannot infer it
    from data: pass ``empty_schema`` (e.g. ``"event_type string, bucket
    bigint, max_rho int, p int"``) for grouped streams whose consumers
    must survive the not-yet-committed window — without it the empty
    read falls back to the UNGROUPED triple and a grouped
    ``hll_estimate``/``hll_merge`` over it would fail on the missing
    group columns."""
    committed = _committed_batch_dirs(spark, state_path)
    if not committed:
        return spark.createDataFrame(
            [], empty_schema or "bucket bigint, max_rho int, p int"
        )
    # Schema-drift guard (round-12 advice): a plain multi-path parquet
    # read takes its schema from one file set — a stream reconfigured
    # with different group_cols against the SAME state_path would have
    # its other deltas' group columns silently dropped/nulled. Compare
    # per-delta column sets (driver-side footer reads, bounded by tick
    # count) and fail loud on drift, matching the p-mismatch discipline.
    per_delta = {}
    for d in sorted(committed):
        cols = tuple(
            sorted(c for c in spark.read.parquet(d).columns if c != "batch")
        )
        per_delta.setdefault(cols, os.path.basename(d.rstrip("/")))
    if len(per_delta) > 1:
        raise ValueError(
            f"HLL state at {state_path} mixes register schemas across "
            f"deltas ({ {v: list(k) for k, v in per_delta.items()} }) — "
            "the stream was reconfigured with different group_cols "
            "against one state_path; use a fresh state directory per "
            "configuration"
        )
    deltas = spark.read.option("basePath", state_path).parquet(
        *sorted(committed)
    )
    # basePath reads surface batch=<id> as an inferred PARTITION column;
    # the register schema is dynamic (group_cols ride along), so drop it
    # explicitly or the delta id would join the merge keys and defeat the
    # cross-tick max (count-min dodges this with its fixed column list)
    if "batch" in deltas.columns:
        deltas = deltas.drop("batch")
    if "p" not in deltas.columns or "max_rho" not in deltas.columns:
        raise ValueError(
            f"HLL state at {state_path} lacks p/max_rho columns — not a "
            "hll_registers delta directory"
        )
    keys = [c for c in deltas.columns if c != "max_rho"]
    return (
        deltas.groupBy(*keys)
        .agg(F.max("max_rho").alias("max_rho"))
        .select(*deltas.columns)
    )


def streaming_bloom(
    keys_stream: DataFrame,
    *,
    state_path: str,
    checkpoint: str,
    key_col: str,
    m_bits: int = 1 << 20,
    k_hashes: int = 3,
    group_cols: list[str] | None = None,
):
    """Maintain portable Bloom-filter registers
    (operators/terms.bloom_registers) from a streaming key source; one
    ``availableNow`` tick. Returns the started StreamingQuery.

    The packed-word table is OR-mergeable (registers of two disjoint
    corpora ``bit_or`` to the registers of their union, exactly), so the
    maintenance is the same easy case of the incremental-index pattern
    as count-min/HLL — with ``bit_or`` in place of sum/max. Each tick
    writes its batch's ≤ m_bits/32 occupied words as a ``batch=<id>``
    delta; a replayed batch OVERWRITES its own directory with
    byte-identical content (bloom_registers is a pure function of the
    batch) and OR-merge is insensitive to the rewrite. The 100-TB
    shape: an ingestion-time "seen before?" / decontamination filter
    maintained per tick at fixed size — probes via bloom_contains never
    touch the ingested fingerprint history itself."""

    def handle(batch: DataFrame, batch_id: int) -> None:
        regs = bloom_registers(
            batch,
            key_col,
            m_bits=m_bits,
            k_hashes=k_hashes,
            group_cols=group_cols,
        )
        regs.write.mode("overwrite").parquet(f"{state_path}/batch={batch_id}")

    return (
        keys_stream.writeStream.trigger(availableNow=True)
        .option("checkpointLocation", checkpoint)
        .foreachBatch(handle)
        .start()
    )


def read_bloom_state(
    spark: SparkSession, state_path: str, *, empty_schema: str | None = None
) -> DataFrame:
    """Merged packed-word view over every COMMITTED tick delta — usable
    directly with :func:`operators.terms.bloom_contains`.

    The HLL read discipline applies verbatim: uncommitted (marker-less)
    partial deltas are excluded — partial bits would under-read
    membership, i.e. a transient FALSE NEGATIVE, the one direction the
    Bloom contract forbids. Per-delta schemas are compared and
    group-column drift fails loud; ``m_bits``/``k_hashes`` ride through
    the merge as grouping keys so mixed-dimension deltas survive as
    distinct rows for bloom_contains' in-plan guard to REJECT;
    ``empty_schema`` covers grouped consumers reading before the first
    commit."""
    committed = _committed_batch_dirs(spark, state_path)
    if not committed:
        return spark.createDataFrame(
            [],
            empty_schema
            or "word_idx bigint, bits bigint, m_bits int, k_hashes int",
        )
    per_delta = {}
    for d in sorted(committed):
        cols = tuple(
            sorted(c for c in spark.read.parquet(d).columns if c != "batch")
        )
        per_delta.setdefault(cols, os.path.basename(d.rstrip("/")))
    if len(per_delta) > 1:
        raise ValueError(
            f"bloom state at {state_path} mixes register schemas across "
            f"deltas ({ {v: list(k) for k, v in per_delta.items()} }) — "
            "the stream was reconfigured with different group_cols "
            "against one state_path; use a fresh state directory per "
            "configuration"
        )
    deltas = spark.read.option("basePath", state_path).parquet(
        *sorted(committed)
    )
    if "batch" in deltas.columns:
        deltas = deltas.drop("batch")
    if "m_bits" not in deltas.columns or "k_hashes" not in deltas.columns:
        raise ValueError(
            f"bloom state at {state_path} lacks m_bits/k_hashes columns "
            "— not a bloom_registers delta directory"
        )
    keys = [c for c in deltas.columns if c != "bits"]
    return (
        deltas.groupBy(*keys)
        .agg(F.bit_or("bits").alias("bits"))
        .select(*deltas.columns)
    )


def streaming_quantile_histogram(
    values_stream: DataFrame,
    *,
    state_path: str,
    checkpoint: str,
    value_col: str,
    bits: int = 6,
    scale_bits: int = 20,
    group_cols: list[str] | None = None,
):
    """Maintain a portable quantile histogram
    (operators/terms.quantile_buckets) from a streaming value source;
    one ``availableNow`` tick. Returns the started StreamingQuery.

    The histogram is ADDITIVE like count-min (bucket counts of two
    disjoint corpora sum to the counts of their union, exactly), so the
    maintenance is the same easy case of the incremental-index pattern:
    each tick writes its batch's ≤ groups × buckets rows as a
    ``batch=<id>`` delta, a replayed batch OVERWRITES its own directory
    with byte-identical content (quantile_buckets is a pure function of
    the batch), and the queryable state is the merge-on-read sum. State
    never grows with row count or value cardinality — p50/p99 per key
    maintained per ingestion tick at 100 TB without ever re-scanning
    history."""
    from ..operators.terms import quantile_buckets

    def handle(batch: DataFrame, batch_id: int) -> None:
        hist = quantile_buckets(
            batch,
            value_col,
            group_cols=group_cols,
            bits=bits,
            scale_bits=scale_bits,
        )
        hist.write.mode("overwrite").parquet(f"{state_path}/batch={batch_id}")

    return (
        values_stream.writeStream.trigger(availableNow=True)
        .option("checkpointLocation", checkpoint)
        .foreachBatch(handle)
        .start()
    )


def read_quantile_state(
    spark: SparkSession, state_path: str, *, empty_schema: str | None = None
) -> DataFrame:
    """Merged histogram view over every COMMITTED tick delta — usable
    directly with :func:`operators.terms.quantile_estimate`.

    The HLL read discipline applies verbatim: uncommitted (marker-less)
    partial deltas are excluded (partial counts would misplace quantile
    mass), per-delta schemas are compared and group-column drift fails
    loud, ``bits``/``scale_bits`` ride through the merge as grouping
    keys so mixed-grid deltas survive as distinct rows for
    quantile_estimate to REJECT, and ``empty_schema`` covers grouped
    consumers reading before the first commit."""
    committed = _committed_batch_dirs(spark, state_path)
    if not committed:
        return spark.createDataFrame(
            [],
            empty_schema
            or "bucket bigint, cnt bigint, bits int, scale_bits int",
        )
    per_delta = {}
    for d in sorted(committed):
        cols = tuple(
            sorted(c for c in spark.read.parquet(d).columns if c != "batch")
        )
        per_delta.setdefault(cols, os.path.basename(d.rstrip("/")))
    if len(per_delta) > 1:
        raise ValueError(
            f"quantile state at {state_path} mixes histogram schemas "
            f"across deltas ({ {v: list(k) for k, v in per_delta.items()} }) "
            "— the stream was reconfigured with different group_cols "
            "against one state_path; use a fresh state directory per "
            "configuration"
        )
    deltas = spark.read.option("basePath", state_path).parquet(
        *sorted(committed)
    )
    if "batch" in deltas.columns:
        deltas = deltas.drop("batch")
    if "bits" not in deltas.columns or "scale_bits" not in deltas.columns:
        raise ValueError(
            f"quantile state at {state_path} lacks bits/scale_bits "
            "columns — not a quantile_buckets delta directory"
        )
    keys = [c for c in deltas.columns if c != "cnt"]
    return (
        deltas.groupBy(*keys)
        .agg(F.sum("cnt").alias("cnt"))
        .select(*deltas.columns)
    )
