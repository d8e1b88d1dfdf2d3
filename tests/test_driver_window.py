"""The driver checks only the first DRIVER_WINDOW queries that
``__spark_entry__.queries()`` yields.  Round-5 verdict defect #1: registry
growth silently pushed the newest queries outside that window.  These
guards make the ordering contract mechanical.
"""

from __future__ import annotations

from global_market_index_etl_spark.plans import (
    DRIVER_WINDOW,
    PRIORITY_FIRST,
    REGISTRY,
    ROTATE_LAST,
    ordered_registry,
)


def test_ordered_registry_is_a_permutation():
    assert set(ordered_registry()) == set(REGISTRY)
    assert len(ordered_registry()) == len(REGISTRY)


def test_priority_first_names_exist():
    missing = [n for n in PRIORITY_FIRST if n not in REGISTRY]
    assert not missing, f"PRIORITY_FIRST references unknown queries: {missing}"
    missing = [n for n in ROTATE_LAST if n not in REGISTRY]
    assert not missing, f"ROTATE_LAST references unknown queries: {missing}"
    assert not set(PRIORITY_FIRST) & set(ROTATE_LAST)


def test_only_rotate_last_falls_outside_window():
    """Every query beyond the driver window must be an explicitly rotated
    long-green parity row — never a new or priority query."""
    order = list(ordered_registry())
    beyond = order[DRIVER_WINDOW:]
    stray = [n for n in beyond if n not in ROTATE_LAST]
    assert not stray, (
        f"queries outside the {DRIVER_WINDOW}-row driver window that are not "
        f"in ROTATE_LAST: {stray} — extend ROTATE_LAST with long-green rows "
        f"or the driver will never check these"
    )


def test_priority_queries_lead_the_window():
    order = list(ordered_registry())
    head = order[: len(PRIORITY_FIRST)]
    assert head == [n for n in PRIORITY_FIRST if n in REGISTRY]
