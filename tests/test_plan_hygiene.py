"""Plan-shape guards over EVERY declared query — the properties that decide
whether a plan survives a 100× scale-up, asserted mechanically so a future
edit cannot silently regress them.

- No CartesianProduct / BroadcastNestedLoopJoin outside the explicit
  all-pairs allowlist (the exact similarity kernels, whose join condition
  is deliberately non-equi; their scale paths are the LSH/IVF variants).
- Parquet scans must prune columns: no scan may read every column of the
  wide tables unless the query's semantics genuinely need them.
"""

from __future__ import annotations

import re

import pytest

from global_market_index_etl_spark.plans import REGISTRY

from .conftest import SF_SMALL

# exact all-pairs kernel: the non-equi probes×corpus join is the documented
# design (probe side broadcast); the bucketed variants (ann_lsh_topk,
# ann_ivf_topk, emb_neardup_cosine, dedup_*) are the scale path and must
# stay equi-join — they get NO exemption here
ALLPAIRS_OK = {"ann_cosine_topk"}

# full-width reads that are semantically required (SELECT * shapes)
FULL_WIDTH_OK = {
    "q2_day_slice",  # returns the full event row slice
    "p3_cast_json",
    "e1_pipeline_market_bars",
    "mm_decode_features",
    "skew_salted_pipeline",  # whole-row hash salt
    "k2_upsert_roundtrip",  # reads back its own 3-column table
}

LINEITEM_WIDTH = 11  # columns in the fixture lineitem table


def _formatted_plan(df) -> str:
    spark = df.sparkSession
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_no_accidental_cross_join(spark, name):
    plan = _formatted_plan(REGISTRY[name].spark(spark, SF_SMALL))
    if name in ALLPAIRS_OK:
        return
    assert "CartesianProduct" not in plan, name
    # BNLJ is fine only for tiny broadcast inputs (calendar grids etc.);
    # flag it on the big tables
    if "BroadcastNestedLoopJoin" in plan:
        assert not re.search(
            r"BroadcastNestedLoopJoin[\s\S]{0,2000}?Scan parquet[^\n]*(lineitem|events|documents|embeddings)",
            plan,
        ), f"{name}: non-equi join against a fact table"


@pytest.mark.parametrize(
    "name",
    sorted(
        n
        for n, q in REGISTRY.items()
        if n not in FULL_WIDTH_OK
    ),
)
def test_scans_prune_columns(spark, name):
    plan = _formatted_plan(REGISTRY[name].spark(spark, SF_SMALL))
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        ncols = len(m.group(1).split(",")) if m.group(1) else 0
        assert ncols < LINEITEM_WIDTH, (
            f"{name}: scan reads {ncols} columns — projection not pruned"
        )
