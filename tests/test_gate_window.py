"""Driver-gate window arithmetic (VERDICT r4 item 4).

The driver's correctness gate checks only the FIRST 50 entries of
``queries()``; ``operators.__init__`` orders the merge so entries due a
driver-green pass this round (``_GATE_FIRST``) land inside the window
and permanently-uncheckable entries (``_GATE_LAST``, no ``oracle_sql``
twin by design) sit at the very tail. Round 4 verified this arithmetic
by hand-counted notes; this suite encodes it so any future entry
addition that silently pushes a due entry past slot 50, or lets a
no-oracle entry burn a checkable slot, goes red.
"""

from __future__ import annotations

from smart_city_data_pipeline_spark.operators import (
    _GATE_FIRST,
    _GATE_LAST,
    all_oracles,
    all_queries,
)

DRIVER_WINDOW = 50


def test_gate_lists_are_disjoint_and_duplicate_free():
    assert len(_GATE_FIRST) == len(set(_GATE_FIRST)), "duplicate in _GATE_FIRST"
    assert len(_GATE_LAST) == len(set(_GATE_LAST)), "duplicate in _GATE_LAST"
    assert not set(_GATE_FIRST) & set(_GATE_LAST), "entry in both gate lists"


def test_gate_lists_contain_only_known_keys():
    keys = set(all_queries())
    assert set(_GATE_FIRST) <= keys, set(_GATE_FIRST) - keys
    assert set(_GATE_LAST) <= keys, set(_GATE_LAST) - keys


def test_every_due_entry_fits_inside_the_driver_window():
    """_GATE_FIRST is the set of entries that MUST be driver-checked
    this round; if it ever outgrows the window the rotation is broken
    (a due entry would silently fall to the judge-only pass)."""
    assert len(_GATE_FIRST) <= DRIVER_WINDOW
    window = list(all_queries())[:DRIVER_WINDOW]
    assert window[: len(_GATE_FIRST)] == _GATE_FIRST


def test_no_oracle_entries_are_parked_at_the_tail():
    """Entries without an oracle twin can never hash-match — each one
    inside the window wastes a checkable slot (r4's ann_ivf_kmeans
    lesson). They must ALL be in _GATE_LAST, and _GATE_LAST must hold
    ONLY such entries so a hash-checkable query is never parked."""
    keys = list(all_queries())
    no_oracle = {k for k in keys if k not in all_oracles()}
    assert no_oracle == set(_GATE_LAST), (
        f"no-oracle entries {sorted(no_oracle)} != _GATE_LAST {sorted(_GATE_LAST)}"
    )
    assert keys[-len(_GATE_LAST) :] == _GATE_LAST


def test_window_is_fully_packed_with_checkable_entries():
    """With more oracle entries than slots, every window slot must be
    hash-checkable — a no-oracle entry inside the window is a wasted
    slot whenever a checkable entry sits outside it."""
    keys = list(all_queries())
    window = keys[:DRIVER_WINDOW]
    oracles = all_oracles()
    n_checkable = sum(1 for k in keys if k in oracles)
    if n_checkable >= DRIVER_WINDOW:
        assert all(k in oracles for k in window)


def test_oracle_ordering_matches_query_ordering():
    """The driver zips queries() and oracle_sql() independently; their
    shared keys must appear in the same relative order."""
    q = [k for k in all_queries() if k in all_oracles()]
    o = list(all_oracles())
    assert q == o
