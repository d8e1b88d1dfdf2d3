#!/usr/bin/env python
"""Benchmark harness — runs the engine's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line:

    {"metric": "headline_suite_wall", "value": <total_sec>, "unit": "sec",
     "queries": {"<name>": sec, ...}, "sf": <sf>}

Each query is materialized through the `noop` sink — full execution of the
physical plan (scan→shuffle→agg) with no driver-side collect cost, i.e. the
number a cluster job would see. A small warm-up query first absorbs one-time
JVM/codegen startup so per-query numbers measure the plan, not the JIT.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from global_market_index_etl_spark.plans import REGISTRY  # noqa: E402
from global_market_index_etl_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: the queries a user of the reference would actually run
# (ETL-shaped joins/aggregates, its documented query surface) plus the
# training-data operators — weighted toward plans that stress shuffle/join
# strategy rather than trivial scans.
HEADLINE = [
    "flagship_regional_revenue",
    "tpch_q1_pricing_summary",
    "tpch_q3_top_revenue_orders",
    "tpch_q17_small_qty_revenue",
    "tpch_q20_dominant_suppliers",
    "tpch_q22_idle_capital",
    "r2_pivot_event_matrix",
    "w_sessionize",
    "ts_resample_daily",
    "text_repetition",
    "q1_top5_recent",
    "q4_per_key_topn",
    "j1_enrich_broadcast",
    "j2_rate_lookup_join",
    "d3_upsert_lww",
    "w_window_suite",
    "g_rollup_cube",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "curation_pipeline",
    "text_metrics",
    "ann_cosine_topk",
    "fx_asof_rate_fill",
    "skew_salted_pipeline",
    "stream_windowed_counts",
    "mm_decode_features",
    "ann_ivf_topk",
    "e1_pipeline_market_bars",
    "k2_upsert_roundtrip",
]


def _sf_from_dir(path: str) -> float:
    base = os.path.basename(path.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


WARMUP_SF_DIR = "/root/testdata/sf0.001"
# Repetitions per timed query; the reported number is the MEDIAN, so a
# one-off GC pause / host-contention blip cannot masquerade as a plan
# regression (the r2 phantom: one cold 13.7 s e1 run vs 2.5 s steady state).
REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))


def main() -> None:
    spark = get_spark(app_name="gmie-bench")
    # Warm-up: run EVERY headline plan once at the smallest SF — same
    # schemas ⇒ same generated code ⇒ codegen cache, Python-worker pools,
    # and the Python DataSource runner (e1's ~8-10 s first-read init) are
    # all hot before anything is timed, as on a long-lived cluster.
    # Failures are NOT swallowed silently: a query that cannot warm up will
    # post a visibly cold (or error) timed number, so say why on stderr.
    for name in HEADLINE:
        try:
            REGISTRY[name].spark(spark, WARMUP_SF_DIR).write.format(
                "noop"
            ).mode("overwrite").save()
        except Exception as e:
            print(
                f"bench: WARM-UP FAILED for {name}: "
                f"{type(e).__name__}: {e}"[:300],
                file=sys.stderr,
            )

    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in HEADLINE:
        qd = REGISTRY[name]
        reps: list[float] = []
        for _ in range(max(1, REPS)):
            t0 = time.perf_counter()
            try:
                qd.spark(spark, SF_DIR).write.format("noop").mode(
                    "overwrite"
                ).save()
                reps.append(time.perf_counter() - t0)
            except Exception as e:  # one broken query must not sink the suite
                errors[name] = f"{type(e).__name__}: {e}"[:200]
                break
        if reps:
            timings[name] = round(sorted(reps)[len(reps) // 2], 3)

    result = {
        "metric": "headline_suite_wall",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": _sf_from_dir(SF_DIR),
        "reps": REPS,
        "stat": "median_per_query",
    }
    if errors:
        result["errors"] = errors
    print(json.dumps(result))


if __name__ == "__main__":
    main()
