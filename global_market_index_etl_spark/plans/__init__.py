from .registry import REGISTRY, QueryDef, query

# importing the modules populates REGISTRY
from . import parity  # noqa: E402,F401
from . import analytics  # noqa: E402,F401
from . import textdata  # noqa: E402,F401

# --- driver correctness window management -------------------------------
#
# The driver runs the oracle comparison for the FIRST 50 queries in the
# order ``queries()`` yields them.  Registration order alone let the
# registry grow past 50 and pushed the newest queries outside the checked
# window (round-5 verdict defect #1).  ``ordered_registry`` therefore
# emits an explicit priority order:
#
#   1. PRIORITY_FIRST — queries that have never had (or most recently
#      earned) a driver CORRECTNESS row: newest and riskiest first.
#   2. everything else in registration order.
#   3. ROTATE_LAST — long-green parity rows whose operators are also
#      exercised inside other in-window queries; these recycle out of the
#      window first when the registry outgrows it.
#
# Invariant (tested): PRIORITY_FIRST ∪ middle must fit in the 50-row
# window, so every never-checked query earns a hard driver signal.

DRIVER_WINDOW = 50

# Newest / least-driver-validated first.
PRIORITY_FIRST = [
    # new in round 6
    "dedup_semantic",
    "tpch_q10_returned_customers",
    "tpch_q12_priority_buckets",
    "tpch_q14_promo_revenue",
    "tpch_q18_large_orders",
    "tpch_q19_disjunctive_revenue",
    "tpch_q7_nation_trade_flow",
    "tpch_q16_supplier_diversity",
    # never driver-checked before round 6
    "text_repetition",
    "dedup_containment_clusters",
    # green in r3/r4 but outside the r5 window
    "curation_pipeline",
    "dedup_cluster_survivors",
    "samp_train_split",
    "decon_eval_overlap",
    "mm_decode_features",
    "ann_ivf_topk",
]

# Long-green (r1-r5) parity rows, most-redundant last; each operator here
# is also covered by another in-window query (see COVERAGE.md):
# j1's broadcast enrich runs inside flagship/q3/q10; j3's anti join inside
# tpch_q22's NOT EXISTS and decon_eval_overlap; d2's keyed window dedup
# inside d3/k2; w_running_total's unbounded-frame sum inside
# w_window_suite's frame set.
ROTATE_LAST = [
    "j1_enrich_broadcast",
    "j3_anti_fk_check",
    "d2_dedup_latest",
    "w_running_total",
    "k4_changed_rows",
    "r1_unpivot_measures",
    "a3_key_ranges",
    "w_rank_in_group",
    "set_ops_high_value",
    "d1_distinct_pairs",
    "f5_in_list_filter",
    "q2_day_slice",
    "p3_cast_json",
    "p_string_funcs",
    "p_date_funcs",
    "q3_catalog",
]


def ordered_registry() -> dict[str, QueryDef]:
    """REGISTRY re-ordered for the driver's 50-query correctness window."""
    first = [n for n in PRIORITY_FIRST if n in REGISTRY]
    last = [n for n in ROTATE_LAST if n in REGISTRY]
    pinned = set(first) | set(last)
    middle = [n for n in REGISTRY if n not in pinned]
    return {n: REGISTRY[n] for n in first + middle + last}


__all__ = ["REGISTRY", "QueryDef", "query", "ordered_registry", "DRIVER_WINDOW"]
