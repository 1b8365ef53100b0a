"""BASELINE_BUDGET.json invariants: every registry key is budgeted,
every budget key is in the registry, and the family table is exactly
the per-key sums (the re-freeze protocol's mechanical check)."""

from __future__ import annotations

import json
import os


def _budget():
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "BASELINE_BUDGET.json")) as f:
        return json.load(f)


def test_every_registry_key_is_budgeted():
    from smart_city_data_pipeline_spark.operators import all_queries

    reg = set(all_queries())
    b = _budget()
    assert set(b["queries"]) == reg
    assert set(b["family_of"]) >= set(b["queries"])


def test_family_table_is_exact_per_key_sums():
    b = _budget()
    want: dict = {}
    for k, v in b["queries"].items():
        f = b["family_of"][k]
        n, t = want.get(f, (0, 0.0))
        want[f] = (n + 1, t + v)
    got = {f: (d["n"], d["total_sec"]) for f, d in b["families"].items()}
    assert set(got) == set(want)
    for f, (n, t) in want.items():
        assert got[f][0] == n, f
        assert abs(got[f][1] - t) < 0.005, (f, got[f][1], t)
