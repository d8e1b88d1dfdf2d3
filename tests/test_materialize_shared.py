"""materialize_shared + the reliable-checkpoint dial (round-11 advice/verdict).

Round-11 advice flagged that duplicate_span_suite (and the curation
pipelines) call materialize() per invocation — repeated bench reps /
driver checks stack a fresh never-unpersisted copy of the same subtree
per call. materialize_shared memoizes per (session, logical plan), so
arbitrarily many invocations hold exactly ONE persisted table. Verdict
item 4 asks for the checkpoint_dir dial on every materialize site.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from global_market_index_etl_spark.operators.util import (
    materialize,
    materialize_shared,
    truncate_lineage,
)

from .conftest import SF_SMALL


def _n_persistent_rdds(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def _docs(spark):
    return spark.read.parquet(f"{SF_SMALL}/documents.parquet")


def test_materialize_shared_returns_one_table_for_identical_plans(spark):
    base = _docs(spark).select("doc_id", F.length("text").alias("n"))
    first = materialize_shared(base)
    n_after_first = _n_persistent_rdds(spark)
    # a structurally identical but FRESHLY BUILT plan must hit the cache
    again = materialize_shared(
        _docs(spark).select("doc_id", F.length("text").alias("n"))
    )
    assert again is first, "identical plan did not reuse the cached table"
    assert _n_persistent_rdds(spark) == n_after_first, (
        "repeat materialize_shared persisted a second copy"
    )
    assert first.count() == base.count()


def test_materialize_shared_distinguishes_different_plans(spark):
    a = materialize_shared(_docs(spark).select("doc_id"))
    b = materialize_shared(_docs(spark).select("doc_id", "lang"))
    assert a is not b
    assert set(b.columns) == {"doc_id", "lang"}


def test_span_suite_repeat_invocations_do_not_stack_persists(spark):
    """The advice's exact scenario: calling duplicate_span_suite N times
    (bench reps, repeated driver checks) must not accumulate N persisted
    copies of the (window, doc) reduction."""
    from global_market_index_etl_spark.operators.spans import (
        duplicate_span_suite,
    )

    docs = _docs(spark)
    first = duplicate_span_suite(docs, k=8)
    first.count()
    n = _n_persistent_rdds(spark)
    second = duplicate_span_suite(docs, k=8)
    second.count()
    assert _n_persistent_rdds(spark) == n, (
        "second duplicate_span_suite invocation stacked another persisted "
        "copy of the shared reduction"
    )


def test_span_suite_checkpoint_dir_dial(spark, tmp_path):
    """The newly-wired reliable-checkpoint dial on the span suite: values
    identical to the default persist path, checkpoint data actually lands
    under the directory (executor-loss-safe at cluster scale)."""
    from global_market_index_etl_spark.operators.spans import (
        duplicate_span_suite,
    )

    docs = _docs(spark).limit(200)
    ckpt = str(tmp_path / "span_ckpt")
    default = sorted(
        map(tuple, duplicate_span_suite(docs, k=8).collect())
    )
    reliable = sorted(
        map(
            tuple,
            duplicate_span_suite(docs, k=8, checkpoint_dir=ckpt).collect(),
        )
    )
    assert default == reliable
    written = [
        os.path.join(r, f) for r, _, fs in os.walk(ckpt) for f in fs
    ]
    assert written, "reliable checkpoint wrote nothing under checkpoint_dir"


def test_materialize_checkpoint_dir_dial(spark, tmp_path):
    ckpt = str(tmp_path / "mat_ckpt")
    df = materialize(_docs(spark).select("doc_id"), checkpoint_dir=ckpt)
    assert df.count() > 0
    written = [
        os.path.join(r, f) for r, _, fs in os.walk(ckpt) for f in fs
    ]
    assert written


def test_reliable_checkpoint_is_always_eager(spark, tmp_path):
    """eager=False must NOT leave a reliable checkpoint pending: a lazy
    one could materialize after another caller re-points the process-
    global checkpoint directory and land in the wrong place (round-11
    advice). The data must be on disk when the call returns, before any
    action on the result."""
    ckpt = str(tmp_path / "eager_ckpt")
    truncate_lineage(
        _docs(spark).select("doc_id"), checkpoint_dir=ckpt, eager=False
    )
    written = [
        os.path.join(r, f) for r, _, fs in os.walk(ckpt) for f in fs
    ]
    assert written, (
        "reliable checkpoint was deferred — the lazy-repoint race is open"
    )


def test_sequential_callers_may_use_distinct_checkpoint_dirs(spark, tmp_path):
    """Re-pointing between fully-materialized checkpoints is safe (each
    checkpoint records its own absolute path) and must keep working —
    different operators legitimately pass their own directories."""
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    df_a = truncate_lineage(_docs(spark).select("doc_id"), checkpoint_dir=a)
    df_b = truncate_lineage(_docs(spark).select("lang"), checkpoint_dir=b)
    # both remain readable after the global dir moved on
    assert df_a.count() > 0 and df_b.count() > 0
    for d in (a, b):
        assert any(fs for _, _, fs in os.walk(d)), f"no checkpoint under {d}"


def test_shared_cache_lru_eviction_unpersists(spark, monkeypatch):
    """The cache is BOUNDED: beyond the cap, least-recently-used entries
    are unpersisted and dropped, so switching datasets releases the old
    dataset's blocks instead of pinning them for the process lifetime
    (the sf0.1 → sf1 bench-degradation lesson, round 12)."""
    from global_market_index_etl_spark.operators import util

    monkeypatch.setattr(util, "_SHARED_CACHE_MAX", 3)
    base = _docs(spark)
    before = _n_persistent_rdds(spark)
    dfs = [
        materialize_shared(base.select("doc_id", F.lit(i).alias("tag")))
        for i in range(6)
    ]
    # at most 3 of the 6 remain persisted; the rest were unpersisted
    assert _n_persistent_rdds(spark) <= before + 3
    # evicted plans still compute correctly (just no longer cached), and
    # a repeat call re-materializes rather than erroring
    assert dfs[0].count() == base.count()
    again = materialize_shared(base.select("doc_id", F.lit(0).alias("tag")))
    assert again.count() == base.count()


def test_shared_cache_concurrent_callers_one_persist(spark):
    """Two threads racing the SAME subtree must converge on one persisted
    table (the module lock makes lookup + materialize atomic) — the
    concurrent-branch-stage scenario materialize()'s eager count exists
    for, now across callers."""
    import threading

    results = []
    before = _n_persistent_rdds(spark)

    def worker():
        results.append(
            materialize_shared(
                _docs(spark).select("doc_id", F.lit("race").alias("tag"))
            )
        )

    threads = [threading.Thread(target=worker) for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(results) == 4
    assert all(r is results[0] for r in results), (
        "racing callers got different materialized tables"
    )
    assert _n_persistent_rdds(spark) <= before + 1


def test_shared_cache_different_plans_not_serialized(spark, monkeypatch):
    """Concurrent callers materializing DIFFERENT subtrees must not queue
    behind one long materialize (round-12 advice): the eager count runs
    outside the cache lock, so a fast plan completes while a slow one is
    still in flight."""
    import threading
    import time

    from global_market_index_etl_spark.operators import util

    slow_started = threading.Event()
    fast_finished = threading.Event()

    def gated(df, checkpoint_dir=None):
        # stub: no Spark job — isolates the locking behavior under test.
        if "slow_tag" in df.columns:
            slow_started.set()
            # the slow materialize only returns once the fast caller has
            # completed: under lock-held-across-materialize semantics the
            # fast caller could never complete first → 15 s timeout.
            fast_finished.wait(15)
        return df

    monkeypatch.setattr(util, "materialize", gated)
    base = _docs(spark)

    def slow_worker():
        util.materialize_shared(
            base.select("doc_id", F.lit(1).alias("slow_tag"))
        )

    def fast_worker():
        slow_started.wait(10)
        util.materialize_shared(
            base.select("doc_id", F.lit(2).alias("fast_tag"))
        )
        fast_finished.set()

    t0 = time.monotonic()
    ts = threading.Thread(target=slow_worker)
    tf = threading.Thread(target=fast_worker)
    ts.start()
    tf.start()
    tf.join(timeout=30)
    ts.join(timeout=30)
    assert fast_finished.is_set(), "fast caller never finished"
    # the fast caller's only Spark-free path is blocked solely by the
    # cache lock; if it had to wait out the slow job's 15 s gate, the
    # old serialized behavior is back.
    assert time.monotonic() - t0 < 12.0, (
        "different-plan caller appears serialized behind the slow "
        "materialize"
    )


def test_shared_cache_owner_failure_lets_waiters_retry(spark, monkeypatch):
    """If the owning caller's materialize fails, the placeholder is
    removed and a waiting same-plan caller retries (and succeeds) instead
    of receiving the failure or hanging."""
    import threading

    from global_market_index_etl_spark.operators import util

    real = util.materialize
    calls = []
    first_entered = threading.Event()
    release_first = threading.Event()

    def flaky(df, checkpoint_dir=None):
        calls.append(1)
        if len(calls) == 1:
            first_entered.set()
            release_first.wait(10)
            raise RuntimeError("planted first-call failure")
        return real(df, checkpoint_dir=checkpoint_dir)

    monkeypatch.setattr(util, "materialize", flaky)
    base = _docs(spark)
    plan = base.select("doc_id", F.lit("flaky").alias("tag"))
    errors, results = [], []

    def owner():
        try:
            util.materialize_shared(plan)
        except RuntimeError as e:
            errors.append(e)

    def waiter():
        first_entered.wait(10)
        release_first.set()
        results.append(util.materialize_shared(plan))

    to_ = threading.Thread(target=owner)
    tw = threading.Thread(target=waiter)
    to_.start()
    tw.start()
    to_.join(timeout=30)
    tw.join(timeout=30)
    assert len(errors) == 1, "owner should see its own failure"
    assert len(results) == 1 and results[0].count() == base.count(), (
        "waiter should retry and succeed after owner failure"
    )
