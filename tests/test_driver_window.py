"""The driver checks only the first DRIVER_WINDOW queries that
``__spark_entry__.queries()`` yields.  Round-5 verdict defect #1: registry
growth silently pushed the newest queries outside that window.  Round-6
verdict item #2: a static rotate-out list never let rotated queries regain
a driver row.  The ordering is now staleness-driven (stalest checked
first); these guards make the contract mechanical.
"""

from __future__ import annotations

from global_market_index_etl_spark.plans import (
    DRIVER_WINDOW,
    PRIORITY_FIRST,
    REGISTRY,
    last_driver_round,
    ordered_registry,
)


def test_ordered_registry_is_a_permutation():
    assert set(ordered_registry()) == set(REGISTRY)
    assert len(ordered_registry()) == len(REGISTRY)


def test_priority_first_names_exist():
    missing = [n for n in PRIORITY_FIRST if n not in REGISTRY]
    assert not missing, f"PRIORITY_FIRST references unknown queries: {missing}"


def test_priority_queries_lead_the_window():
    order = list(ordered_registry())
    head = order[: len([n for n in PRIORITY_FIRST if n in REGISTRY])]
    assert head == [n for n in PRIORITY_FIRST if n in REGISTRY]
    assert len(head) < DRIVER_WINDOW


def test_never_checked_queries_are_inside_window():
    """A query with no CORRECTNESS row in any recorded round must be in the
    checked window (right after the priority block)."""
    checked = last_driver_round()
    window = list(ordered_registry())[:DRIVER_WINDOW]
    never = [n for n in REGISTRY if n not in checked]
    outside = [n for n in never if n not in window]
    assert not outside, (
        f"never-driver-checked queries outside the {DRIVER_WINDOW}-row "
        f"window: {outside}"
    )


def test_rotation_brings_stale_queries_back():
    """Every query outside the window must have been checked at least as
    recently as every non-priority query inside it — i.e. what rotates out
    is exactly the freshest-checked set, so staleness monotonically drains.

    Consequence (the round-6 'done' bar): with the registry under 2× the
    window, a query rotated out in round N is among the stalest in round
    N+1 and regains a driver row.
    """
    checked = last_driver_round()
    order = list(ordered_registry())
    inside = [n for n in order[:DRIVER_WINDOW] if n not in PRIORITY_FIRST]
    outside = order[DRIVER_WINDOW:]
    if not outside:
        return
    max_inside = max(checked.get(n, 0) for n in inside)
    min_outside = min(checked.get(n, 0) for n in outside)
    assert min_outside >= max_inside, (
        "a stale query was rotated out while a fresher one stayed in: "
        f"min outside round {min_outside} < max inside round {max_inside}"
    )
    assert len(REGISTRY) <= 2 * DRIVER_WINDOW - len(PRIORITY_FIRST), (
        "registry has outgrown the every-other-round rotation guarantee — "
        "widen the window or split the registry"
    )


def test_previously_rotated_queries_regain_rows_this_round():
    """≥8 of the queries whose last driver row predates the latest recorded
    round must sit inside the upcoming window (the round-6 'done' bar)."""
    checked = last_driver_round()
    if not checked:
        return
    latest = max(checked.values())
    stale = {n for n in REGISTRY if checked.get(n, 0) < latest}
    window = set(list(ordered_registry())[:DRIVER_WINDOW])
    regained = stale & window
    assert len(regained) >= min(8, len(stale)), (
        f"only {sorted(regained)} stale queries regain a driver row"
    )


def test_every_registry_row_covered_by_last_or_next_window():
    """Round-12 verdict item 3: fusion renames silently burned window
    slots, letting six rows fall TWO rounds stale (checked in neither r11
    nor r12). Invariant: every registry row either has a driver row from
    the LATEST recorded round or sits inside the upcoming window — i.e.
    (last window ∪ next planned window) covers the registry."""
    checked = last_driver_round()
    if not checked:
        return
    latest = max(checked.values())
    covered_last = {n for n, r in checked.items() if r == latest}
    window = set(list(ordered_registry())[:DRIVER_WINDOW])
    uncovered = sorted(
        n for n in REGISTRY if n not in covered_last and n not in window
    )
    assert not uncovered, (
        f"rows checked before round {latest} AND outside the upcoming "
        f"window — they will be ≥2 rounds stale: {uncovered}"
    )


def test_must_check_rows_outrank_renamed_new_rows(monkeypatch):
    """Simulated rename-induced gap (the r12 failure shape): rows already
    one round stale MUST outrank a batch of never-checked names (fusion
    renames), or the renames push them to two rounds stale. The ordering
    is exercised against a synthetic history, not the real files."""
    import global_market_index_etl_spark.plans as plans

    names = [n for n in REGISTRY if n not in plans.PRIORITY_FIRST]
    assert len(names) >= 20, "test assumes a populated registry"
    stale_rows = names[:6]        # last checked 3 rounds ago — must-check
    renamed_rows = names[6:13]    # fused/renamed: never checked
    fresh_rows = names[13:]       # checked last round
    fake = {}
    for n in stale_rows:
        fake[n] = 10
    for n in fresh_rows:
        fake[n] = 12
    monkeypatch.setattr(
        plans, "last_driver_round", lambda root=None: fake
    )
    order = [
        n for n in plans.ordered_registry()
        if n not in plans.PRIORITY_FIRST
    ]
    assert set(order[: len(stale_rows)]) == set(stale_rows), (
        "must-check (≥2-rounds-stale) rows no longer lead the window — "
        "a rename burst would push them a further round stale"
    )
    assert set(order[len(stale_rows): len(stale_rows) + len(renamed_rows)]
               ) == set(renamed_rows), (
        "never-checked rows must follow the must-check group, ahead of "
        "fresh rows"
    )
