"""Catalog-ordering policy: the correctness harness checks a prefix of
``catalog()``, so the order IS the coverage guarantee. Pin it."""

from __future__ import annotations

import forklift_spark.queries as q

FAMILIES = {
    "analytics", "etl", "dedup", "similarity", "text", "stats",
    "timeseries", "multimodal", "connectors", "web", "graph",
    "selection",
}


def _families(names):
    cat = q.catalog()
    return {cat[n].__module__.rsplit(".", 1)[-1] for n in names}


def test_window_is_curated_and_oracle_backed():
    cat = list(q.catalog())
    window = [n for fam in q._WINDOW_FAMILIES.values() for n in fam]
    assert len(window) == 50
    assert set(cat[:50]) == set(window)
    ors = q.oracles()
    assert all(n in ors for n in cat[:50])


def test_every_prefix_has_family_spread():
    """Round-robin emission inside the window: the first cycle touches
    every family the window CONTAINS (r6 policy: the window holds only
    never-driver-checked queries, so families whose catalog is already
    fully driver-verified are legitimately absent), and the catalog
    reaches all 12 families shortly after the window + deferred block."""
    cat = list(q.catalog())
    win_fams = _families(cat[:50])
    assert win_fams <= FAMILIES
    # the first round-robin cycle covers every window family
    assert _families(cat[:len(win_fams)]) == win_fams
    # full family spread resumes right after the window + deferred tail
    assert _families(cat[:80]) == FAMILIES


def test_rows_only_queries_sort_last():
    cat = list(q.catalog())
    ors = q.oracles()
    strengths = [n in ors for n in cat]
    first_weak = strengths.index(False) if False in strengths else len(cat)
    assert all(not s for s in strengths[first_weak:]), (
        "rows-only queries must all trail oracle-backed ones"
    )


def test_catalog_is_complete_and_unique():
    cat = list(q.catalog())
    assert len(cat) == len(set(cat))
    assert set(cat) == set(q._REGISTRY)
