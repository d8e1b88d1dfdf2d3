from .registry import REGISTRY, QueryDef, query

# importing the modules populates REGISTRY
from . import parity  # noqa: E402,F401
from . import analytics  # noqa: E402,F401
from . import textdata  # noqa: E402,F401

import glob as _glob
import json as _json
import os as _os
import re as _re

# --- driver correctness window management -------------------------------
#
# The driver runs the oracle comparison for the FIRST 50 queries in the
# order ``queries()`` yields them.  Registration order alone let the
# registry grow past 50 and pushed the newest queries outside the checked
# window (round-5 verdict defect #1).  A static rotate-out list fixed that
# mechanically but had no way BACK IN: once rotated, a query never earned
# a fresh driver row again (round-6 verdict item #2).
#
# ``ordered_registry`` therefore emits a staleness-driven order:
#
#   1. PRIORITY_FIRST — queries that are new or materially changed this
#      round: riskiest first, always inside the window.
#   2. everything else, STALEST first — sorted ascending by the latest
#      round in which the driver recorded a CORRECTNESS row for the query
#      (parsed from the repo's own CORRECTNESS_r*.json history; a query
#      with no row ever sorts before everything), tie-broken by
#      registration order for determinism.
#
# The queries that fall outside the window are exactly the ones checked
# most recently; next round they are the stalest and rotate back in.  As
# long as the registry stays under 2× the window, every query gets a
# fresh driver row at least every other round — no manual curation, the
# schedule derives from the recorded history itself.  (Invariant tested in
# tests/test_driver_window.py.)

DRIVER_WINDOW = 50

# New or materially changed in the current round — always in-window.
# Queries that already have a recent driver row but whose PLAN materially
# changed this round — staleness alone would rotate them out, so they are
# pinned.  Brand-new queries need no pin: a query with no recorded row ever
# sorts at staleness 0, ahead of everything, and lands in-window by itself.
# Keeping this list to genuinely-changed queries maximizes the staleness
# slots per round (window − len(PRIORITY_FIRST)) that drain the backlog.
PRIORITY_FIRST = [
    # round 12: stream_interval_join's bucketization changed MATERIALLY
    # (the interval explode's upper bound dropped the half-open `- 1` so
    # sub-second interval opens stop losing last-fractional-second
    # matches — round-11 advice); it was checked r11 under the old plan,
    # so staleness alone would rotate it out. The r11 pins went
    # hash-green and drain by staleness. The new rows
    # (dedup_incremental_embedding, stream_index_suite) need no
    # pin: never-checked queries sort at staleness 0. The
    # materialize_shared switch (span suite, curation pipelines) reuses
    # one persisted copy of the SAME subtree across invocations — no
    # plan or value change, no pin.
    "stream_interval_join",
    # round 12 continuation: w_session_window_native's ORACLE changed
    # materially (whole-second lag → microsecond-exact epoch_us, the
    # sf0.1 soak divergence class); last checked r11 under the old
    # oracle and staleness alone rotates it out this round. w_sessionize
    # (same fix) is already in-window by staleness.
    "w_session_window_native",
    # (ann_lsh_topk's round-12 material-change pin was retired when the
    # row fused into ann_probe_suite — a never-checked name sorts at
    # staleness 0 and lands in-window by itself.)
]

_ROOT = _os.path.dirname(
    _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
)


def last_driver_round(root: str = _ROOT) -> dict[str, int]:
    """Query name → latest round with a recorded driver CORRECTNESS row."""
    seen: dict[str, int] = {}
    for path in _glob.glob(_os.path.join(root, "CORRECTNESS_r*.json")):
        m = _re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path, encoding="utf-8") as fh:
                rows = _json.load(fh)
        except (OSError, ValueError):
            continue
        if isinstance(rows, dict):
            for name in rows:
                seen[name] = max(seen.get(name, 0), rnd)
    return seen


def ordered_registry() -> dict[str, QueryDef]:
    """REGISTRY re-ordered for the driver's 50-query correctness window."""
    first = [n for n in PRIORITY_FIRST if n in REGISTRY]
    pinned = set(first)
    checked = last_driver_round()
    rest = [n for n in REGISTRY if n not in pinned]
    reg_index = {n: i for i, n in enumerate(REGISTRY)}
    rest.sort(key=lambda n: (checked.get(n, 0), reg_index[n]))
    return {n: REGISTRY[n] for n in first + rest}


__all__ = [
    "REGISTRY",
    "QueryDef",
    "query",
    "ordered_registry",
    "last_driver_round",
    "DRIVER_WINDOW",
    "PRIORITY_FIRST",
]
