"""Streaming count-min maintenance: tick deltas sum to the batch sketch,
replays are no-ops, and estimates from streamed state keep the CMS bound."""

from __future__ import annotations

import pyspark.sql.functions as F

from global_market_index_etl_spark.operators.terms import (
    count_min_cells,
    count_min_estimate,
)
from global_market_index_etl_spark.streaming.sketches import (
    read_count_min_state,
    streaming_count_min,
)

from .conftest import SF_SMALL

SCHEMA = "doc_id long, text string"


def _tick(spark, src, checkpoint, state, **kw):
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = streaming_count_min(
        stream, state_path=state, checkpoint=checkpoint, **kw
    )
    q.awaitTermination(120)


def test_streamed_state_equals_batch_sketch(spark, tmp_path):
    docs = (
        spark.read.parquet(f"{SF_SMALL}/documents.parquet")
        .select("doc_id", "text")
    )
    b1 = docs.filter("doc_id % 2 = 0")
    b2 = docs.filter("doc_id % 2 = 1")
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    state = str(tmp_path / "state")

    b1.coalesce(1).write.mode("append").parquet(src)
    _tick(spark, src, ckpt, state, depth=4, width=64)
    b2.coalesce(1).write.mode("append").parquet(src)
    _tick(spark, src, ckpt, state, depth=4, width=64)

    streamed = sorted(
        map(tuple, read_count_min_state(spark, state).collect())
    )
    batch = sorted(
        map(tuple, count_min_cells(docs, depth=4, width=64).collect())
    )
    assert streamed == batch

    # a re-run with the SAME checkpoint and no new files is a no-op
    _tick(spark, src, ckpt, state, depth=4, width=64)
    again = sorted(map(tuple, read_count_min_state(spark, state).collect()))
    assert again == batch


def test_streamed_estimates_keep_cms_bound(spark, tmp_path):
    from collections import Counter

    docs = (
        spark.read.parquet(f"{SF_SMALL}/documents.parquet")
        .select("doc_id", "text")
    )
    src = str(tmp_path / "src")
    docs.coalesce(1).write.mode("append").parquet(src)
    state = str(tmp_path / "state")
    _tick(
        spark, src, str(tmp_path / "ckpt"), state, depth=4, width=4096
    )

    exact = Counter()
    for r in docs.select("text").collect():
        exact.update(w for w in (r.text or "").lower().split() if w)
    top = [t for t, _ in exact.most_common(10)]
    est = {
        r.term: r.cms_estimate
        for r in count_min_estimate(
            read_count_min_state(spark, state),
            spark.createDataFrame([(t,) for t in top], "term string"),
            depth=4,
            width=4096,
        ).collect()
    }
    for t in top:
        assert est[t] >= exact[t]


def test_partial_uncommitted_delta_is_excluded(spark, tmp_path):
    """A crashed tick's partial delta (no _SUCCESS marker) must not leak
    into the merged state — partial counts would UNDERestimate, the one
    direction CMS forbids."""
    import glob
    import os
    import shutil

    docs = (
        spark.read.parquet(f"{SF_SMALL}/documents.parquet")
        .select("doc_id", "text")
    )
    src = str(tmp_path / "src")
    docs.coalesce(1).write.mode("append").parquet(src)
    state = str(tmp_path / "state")
    _tick(spark, src, str(tmp_path / "ckpt"), state, depth=4, width=64)
    committed = sorted(
        map(tuple, read_count_min_state(spark, state).collect())
    )

    # simulate a crash: copy a real delta, strip its _SUCCESS marker
    partial = os.path.join(state, "batch=99")
    shutil.copytree(os.path.join(state, "batch=0"), partial)
    os.remove(os.path.join(partial, "_SUCCESS"))
    again = sorted(map(tuple, read_count_min_state(spark, state).collect()))
    assert again == committed  # the unmarked delta is invisible

    # a committed replacement IS visible
    open(os.path.join(partial, "_SUCCESS"), "w").close()
    doubled = {
        (r, c): n
        for r, c, n, _, _ in map(
            tuple, read_count_min_state(spark, state).collect()
        )
    }
    assert doubled == {(r, c): 2 * n for r, c, n, _, _ in committed}


def test_streamed_estimate_infers_dims_and_rejects_mismatch(spark, tmp_path):
    """Persisted state is never dimensionless (round-8 review fix): the
    estimate reads depth/width off the cells, and a probe with the wrong
    dimensions raises instead of silently probing wrong cells."""
    import pytest

    docs = (
        spark.read.parquet(f"{SF_SMALL}/documents.parquet")
        .select("doc_id", "text")
    )
    src = str(tmp_path / "src")
    docs.coalesce(1).write.mode("append").parquet(src)
    state = str(tmp_path / "state")
    _tick(spark, src, str(tmp_path / "ckpt"), state, depth=4, width=64)

    q = spark.createDataFrame([("the",)], "term string")
    merged = read_count_min_state(spark, state)
    inferred = count_min_estimate(merged, q).first()
    explicit = count_min_estimate(merged, q, depth=4, width=64).first()
    assert inferred == explicit and inferred.cms_estimate > 0
    with pytest.raises(ValueError, match="width"):
        count_min_estimate(merged, q, depth=4, width=128)
    with pytest.raises(ValueError, match="depth"):
        count_min_estimate(merged, q, depth=8, width=64)


def test_legacy_dimensionless_state_fails_with_migration_story(
    spark, tmp_path
):
    """State persisted BEFORE dimension stamping (deltas with only
    row/cell/cnt columns) must fail the merge with an actionable
    migration error, not an unresolved-column AnalysisException mid-plan
    (round-9 review fix)."""
    import pytest

    state = str(tmp_path / "state")
    legacy = spark.createDataFrame(
        [(0, 3, 7), (1, 9, 2)], "row int, cell bigint, cnt bigint"
    )
    legacy.coalesce(1).write.mode("overwrite").parquet(f"{state}/batch=0")
    with pytest.raises(ValueError, match="dimension stamping"):
        read_count_min_state(spark, state)


def test_streamed_hll_state_equals_batch_registers(spark, tmp_path):
    """Two availableNow ticks of streaming_hll must leave exactly the
    registers hll_registers computes over the full corpus (max-merge
    additivity), a replay with the same checkpoint is a no-op, and the
    merged state feeds hll_estimate directly."""
    from global_market_index_etl_spark.operators.terms import (
        hll_estimate,
        hll_registers,
    )
    from global_market_index_etl_spark.streaming.sketches import (
        read_hll_state,
        streaming_hll,
    )

    ev = spark.read.parquet(f"{SF_SMALL}/events.parquet").select(
        "event_id", "user_id", "event_type"
    )
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    state = str(tmp_path / "state")
    schema = "event_id long, user_id long, event_type string"

    def tick():
        stream = spark.readStream.schema(schema).parquet(src)
        q = streaming_hll(
            stream,
            state_path=state,
            checkpoint=ckpt,
            key_col="user_id",
            p=8,
            group_cols=["event_type"],
        )
        q.awaitTermination(120)

    ev.filter("event_id % 2 = 0").coalesce(1).write.mode("append").parquet(src)
    tick()
    ev.filter("event_id % 2 = 1").coalesce(1).write.mode("append").parquet(src)
    tick()

    streamed = sorted(map(tuple, read_hll_state(spark, state).collect()))
    batch = sorted(
        map(
            tuple,
            hll_registers(
                ev, "user_id", p=8, group_cols=["event_type"]
            ).collect(),
        )
    )
    assert streamed == batch

    tick()  # no new files: replay is a no-op
    again = sorted(map(tuple, read_hll_state(spark, state).collect()))
    assert again == batch

    est = {
        r.event_type: r.approx_distinct
        for r in hll_estimate(
            read_hll_state(spark, state), group_cols=["event_type"]
        ).collect()
    }
    exact = {
        r.event_type: r.n
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for et, x in exact.items():
        assert abs(est[et] - x) <= max(4 * 0.065 * x, 3), (et, est[et], x)


def test_hll_state_rejects_foreign_layout_and_empty_reads_empty(
    spark, tmp_path
):
    """read_hll_state on a directory without register deltas returns the
    empty canonical schema; a committed delta lacking p/max_rho raises
    with the layout story instead of merging garbage."""
    import pytest as _pytest

    from global_market_index_etl_spark.streaming.sketches import (
        read_hll_state,
    )

    state = str(tmp_path / "state")
    empty = read_hll_state(spark, state)
    assert empty.count() == 0
    assert set(empty.columns) == {"bucket", "max_rho", "p"}
    # grouped streams pass empty_schema so a not-yet-committed state dir
    # still feeds grouped estimates/merges (the schema is dynamic and
    # cannot be inferred from zero deltas)
    from global_market_index_etl_spark.operators.terms import hll_estimate

    grouped_empty = read_hll_state(
        spark,
        state,
        empty_schema="event_type string, bucket bigint, max_rho int, p int",
    )
    assert grouped_empty.count() == 0
    est = hll_estimate(grouped_empty, group_cols=["event_type"], p=8)
    assert est.count() == 0  # no groups yet — empty, not an AnalysisException

    spark.createDataFrame([(1, 2)], "a int, b int").write.parquet(
        f"{state}/batch=0"
    )
    with _pytest.raises(ValueError, match="lacks p/max_rho"):
        read_hll_state(spark, state)


def test_hll_state_rejects_group_col_schema_drift(spark, tmp_path):
    """Round-12 advice: a stream reconfigured with different group_cols
    against the SAME state_path must be rejected at read time, not have
    one configuration's group columns silently dropped/nulled by the
    single-schema parquet read."""
    import pytest as _pytest

    from global_market_index_etl_spark.streaming.sketches import (
        read_hll_state,
        streaming_hll,
    )

    ev = spark.read.parquet(f"{SF_SMALL}/events.parquet").select(
        "event_id", "user_id", "event_type"
    )
    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    schema = "event_id long, user_id long, event_type string"

    def tick(ckpt, group_cols):
        stream = spark.readStream.schema(schema).parquet(src)
        q = streaming_hll(
            stream,
            state_path=state,
            checkpoint=str(tmp_path / ckpt),
            key_col="user_id",
            p=8,
            group_cols=group_cols,
        )
        q.awaitTermination(120)

    # two GROUPED ticks leave batch=0 and batch=1 deltas carrying the
    # event_type group column
    ev.filter("event_id % 2 = 0").coalesce(1).write.mode("append").parquet(src)
    tick("ckpt_a", ["event_type"])
    ev.filter("event_id % 2 = 1").coalesce(1).write.mode("append").parquet(src)
    tick("ckpt_a", ["event_type"])
    # reconfigure: UNGROUPED maintainer with a FRESH checkpoint replays
    # everything as its batch=0 (overwriting that delta with the new
    # schema) but leaves the grouped batch=1 delta in place — the state
    # dir now mixes register schemas
    tick("ckpt_b", None)

    with _pytest.raises(ValueError, match="mixes register schemas"):
        read_hll_state(spark, state)


# --------------------------------------------------------------------- #
# streaming quantile histogram (round 13)
# --------------------------------------------------------------------- #


def _qtick(spark, src, checkpoint, state, **kw):
    stream = spark.readStream.schema(
        "event_type string, value double"
    ).parquet(src)
    from global_market_index_etl_spark.streaming.sketches import (
        streaming_quantile_histogram,
    )

    q = streaming_quantile_histogram(
        stream, state_path=state, checkpoint=checkpoint, **kw
    )
    q.awaitTermination(120)


def test_streamed_quantile_state_equals_batch_histogram(spark, tmp_path):
    """Two ticks merge to the batch histogram exactly (additive counts),
    replay is a no-op, and estimates off the streamed state keep the
    relative-error guarantee vs exact percentiles."""
    import math

    from global_market_index_etl_spark.operators.terms import (
        quantile_buckets,
        quantile_estimate,
    )
    from global_market_index_etl_spark.streaming.sketches import (
        read_quantile_state,
    )

    events = spark.read.parquet(f"{SF_SMALL}/events.parquet").select(
        "event_type", "value"
    )
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    state = str(tmp_path / "state")
    kw = dict(value_col="value", group_cols=["event_type"], bits=6)

    events.filter("value < 50").coalesce(1).write.mode("append").parquet(src)
    _qtick(spark, src, ckpt, state, **kw)
    events.filter("value >= 50 or value IS NULL").coalesce(1).write.mode(
        "append"
    ).parquet(src)
    _qtick(spark, src, ckpt, state, **kw)

    streamed = sorted(
        map(tuple, read_quantile_state(spark, state).collect())
    )
    batch = sorted(
        map(
            tuple,
            quantile_buckets(
                events, "value", group_cols=["event_type"], bits=6
            ).collect(),
        )
    )
    assert streamed == batch

    _qtick(spark, src, ckpt, state, **kw)  # replay: no new files, no-op
    assert (
        sorted(map(tuple, read_quantile_state(spark, state).collect()))
        == batch
    )

    est = {
        (r.event_type, r.p): r.approx_value
        for r in quantile_estimate(
            read_quantile_state(spark, state),
            [0.5, 0.99],
            group_cols=["event_type"],
        ).collect()
    }
    vals = {}
    for r in events.where("value IS NOT NULL").collect():
        vals.setdefault(r.event_type, []).append(r.value)
    for et, vs in vals.items():
        vs.sort()
        for p in (0.5, 0.99):
            exact = vs[max(0, math.ceil(p * len(vs)) - 1)]
            got = est[(et, p)]
            assert abs(got - exact) <= abs(exact) * 2 ** -7 + 2 ** -19


def test_quantile_state_rejects_drift_and_reads_empty(spark, tmp_path):
    """Group-column drift against one state path fails loud; an empty
    state dir reads the (optionally grouped) empty frame."""
    import pytest as _pytest

    from global_market_index_etl_spark.streaming.sketches import (
        read_quantile_state,
    )

    state = str(tmp_path / "state")
    empty = read_quantile_state(
        spark,
        state,
        empty_schema=(
            "event_type string, bucket bigint, cnt bigint, "
            "bits int, scale_bits int"
        ),
    )
    assert empty.count() == 0 and "event_type" in empty.columns

    events = spark.read.parquet(f"{SF_SMALL}/events.parquet").select(
        "event_id", "event_type", "value"
    )
    src = str(tmp_path / "s1")
    # two GROUPED ticks leave batch=0 and batch=1 deltas with event_type
    events.filter("event_id % 2 = 0").limit(40).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    _qtick(
        spark, src, str(tmp_path / "c1"), state,
        value_col="value", group_cols=["event_type"],
    )
    events.filter("event_id % 2 = 1").limit(40).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    _qtick(
        spark, src, str(tmp_path / "c1"), state,
        value_col="value", group_cols=["event_type"],
    )
    # reconfigured UNGROUPED maintainer with a FRESH checkpoint replays
    # everything as its batch=0, leaving the grouped batch=1 in place —
    # the state dir now mixes histogram schemas
    _qtick(
        spark, src, str(tmp_path / "c2"), state,
        value_col="value", group_cols=None,
    )
    with _pytest.raises(ValueError, match="mixes histogram schemas"):
        read_quantile_state(spark, state)


def test_streamed_bloom_state_equals_batch_registers(spark, tmp_path):
    """Two availableNow ticks of streaming_bloom must leave exactly the
    packed words bloom_registers computes over the full corpus (bit_or
    additivity), a replay with the same checkpoint is a no-op, and the
    merged state feeds bloom_contains directly with the no-false-negative
    contract intact — the ingestion-time "seen before?" filter."""
    from global_market_index_etl_spark.operators.terms import (
        bloom_contains,
        bloom_registers,
    )
    from global_market_index_etl_spark.streaming.sketches import (
        read_bloom_state,
        streaming_bloom,
    )

    docs = (
        spark.read.parquet(f"{SF_SMALL}/documents.parquet")
        .select("doc_id", F.md5("text").alias("fp"))
    )
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    state = str(tmp_path / "state")
    schema = "doc_id long, fp string"

    def tick():
        stream = spark.readStream.schema(schema).parquet(src)
        q = streaming_bloom(
            stream,
            state_path=state,
            checkpoint=ckpt,
            key_col="fp",
            m_bits=4096,
            k_hashes=3,
        )
        q.awaitTermination(120)

    docs.filter("doc_id % 2 = 0").coalesce(1).write.mode("append").parquet(src)
    tick()
    docs.filter("doc_id % 2 = 1").coalesce(1).write.mode("append").parquet(src)
    tick()

    streamed = sorted(map(tuple, read_bloom_state(spark, state).collect()))
    batch = sorted(
        map(
            tuple,
            bloom_registers(docs, "fp", m_bits=4096, k_hashes=3).collect(),
        )
    )
    assert streamed == batch

    tick()  # no new files: replay is a no-op
    again = sorted(map(tuple, read_bloom_state(spark, state).collect()))
    assert again == batch

    # every ingested fingerprint probes TRUE against the maintained state
    probed = bloom_contains(
        read_bloom_state(spark, state),
        docs,
        "fp",
        id_cols=["doc_id"],
        m_bits=4096,
        k_hashes=3,
    )
    assert probed.filter("NOT bloom_hit").count() == 0


def test_bloom_state_rejects_foreign_layout_and_empty_reads_empty(
    spark, tmp_path
):
    """read_bloom_state on a directory without register deltas returns
    the empty canonical schema; a committed delta lacking
    m_bits/k_hashes raises with the layout story instead of merging
    garbage (the HLL read discipline verbatim)."""
    import pytest as _pytest

    from global_market_index_etl_spark.streaming.sketches import (
        read_bloom_state,
    )

    state = str(tmp_path / "state")
    empty = read_bloom_state(spark, state)
    assert empty.count() == 0
    assert set(empty.columns) == {"word_idx", "bits", "m_bits", "k_hashes"}

    spark.createDataFrame([(1, 2)], "a int, b int").write.parquet(
        f"{state}/batch=0"
    )
    with _pytest.raises(ValueError, match="lacks m_bits/k_hashes"):
        read_bloom_state(spark, state)
