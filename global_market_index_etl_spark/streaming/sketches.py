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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.terms import count_min_cells

__all__ = ["streaming_count_min", "read_count_min_state"]


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
    jvm = spark._jvm
    root = jvm.org.apache.hadoop.fs.Path(state_path)
    fs = root.getFileSystem(spark._jsc.hadoopConfiguration())
    committed = []
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
