"""Scan every oracle-paired operator's optimized logical plan for
Sum/Average aggregates over raw DOUBLE/FLOAT inputs — the
aggregation-order-dependent float-sum class that made
markov_entropy_rate the round-10 driver-gate red.

Usage: python tools/floatsum_scan.py [sf_dir] [key ...]
Prints one line per offending aggregate: key, node kind, expression.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def iter_plan_nodes(plan):
    stack = [plan]
    while stack:
        node = stack.pop()
        yield node
        ch = node.children()
        for i in range(ch.size()):
            stack.append(ch.apply(i))


def iter_exprs(expr):
    stack = [expr]
    while stack:
        e = stack.pop()
        yield e
        ch = e.children()
        for i in range(ch.size()):
            stack.append(ch.apply(i))


def double_sum_hits(df) -> list[str]:
    """Describe Sum/Average aggregate functions whose input is
    DoubleType/FloatType in the optimized logical plan (Aggregate and
    Window nodes both)."""
    hits = []
    plan = df._jdf.queryExecution().optimizedPlan()
    for node in iter_plan_nodes(plan):
        name = node.getClass().getSimpleName()
        if name == "Aggregate":
            seqs = [node.aggregateExpressions()]
            kind = "Aggregate"
        elif name == "Window":
            seqs = [node.windowExpressions()]
            kind = "Window"
        else:
            continue
        for seq in seqs:
            for i in range(seq.size()):
                for e in iter_exprs(seq.apply(i)):
                    if e.getClass().getSimpleName() in ("Sum", "Average"):
                        child = e.children().apply(0)
                        dt = child.dataType().simpleString()
                        if dt in ("double", "float"):
                            hits.append(
                                f"{kind}: {e.getClass().getSimpleName()}"
                                f"({child.sql()[:120]})"
                            )
    return hits


def main():
    import __spark_entry__ as e
    from smart_city_data_pipeline_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    keys = sys.argv[2:] or list(e.queries())
    spark = get_spark()
    qs = e.queries()
    bad = 0
    for k in keys:
        try:
            hits = double_sum_hits(qs[k](spark, sf_dir))
        except Exception as exc:  # noqa: BLE001
            print(f"[ERR] {k}: {exc}")
            bad += 1
            continue
        for h in hits:
            print(f"[HIT] {k}: {h}")
            bad += 1
    print(f"{bad} hits")


if __name__ == "__main__":
    main()
