"""Pure-python algorithm-identity references for the stats operators.

The oracle parity gate proves Spark ≡ DuckDB, but for operators where
BOTH sides implement the same closed form, these tests pin the closed
form itself against an independent classical implementation:

- isotonic minimax ``fit_i = max_{j<=i} min_{k>=i} mean(y[j..k])``
  vs the textbook pool-adjacent-violators algorithm;
- the Wasserstein ECDF-area formula vs the quantile-function
  integral definition.
"""

from __future__ import annotations

from fractions import Fraction

import hypothesis.strategies as st
from hypothesis import given, settings


def _pava(y: list[Fraction]) -> list[Fraction]:
    """Textbook PAVA: pool adjacent violators until monotone."""
    blocks = [[v, 1] for v in y]  # [sum, count]
    i = 0
    while i < len(blocks) - 1:
        a, b = blocks[i], blocks[i + 1]
        if a[0] * b[1] > b[0] * a[1]:  # mean(a) > mean(b): pool
            blocks[i] = [a[0] + b[0], a[1] + b[1]]
            del blocks[i + 1]
            if i > 0:
                i -= 1
        else:
            i += 1
    out = []
    for s, c in blocks:
        out.extend([Fraction(s, c)] * c)
    return out


def _minimax(y: list[Fraction]) -> list[Fraction]:
    """The closed form the operator/oracle pair implements."""
    n = len(y)
    pre = [Fraction(0)]
    for v in y:
        pre.append(pre[-1] + v)

    def mean(j, k):
        return Fraction(pre[k + 1] - pre[j], k - j + 1)

    return [
        max(min(mean(j, k) for k in range(i, n)) for j in range(i + 1))
        for i in range(n)
    ]


@settings(max_examples=60, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=1000), min_size=2, max_size=18))
def test_minimax_equals_pava(ys):
    y = [Fraction(v) for v in ys]
    assert _minimax(y) == _pava(y)


def _w1_ecdf_area(a: list[int], b: list[int]) -> Fraction:
    """The operator's formula: sum over the merged value grid of
    gap_width * |cum_a*nb - cum_b*na| / (na*nb)."""
    na, nb = len(a), len(b)
    vals = sorted(set(a) | set(b))
    total = Fraction(0)
    for v, nxt in zip(vals, vals[1:]):
        ca = sum(1 for x in a if x <= v)
        cb = sum(1 for x in b if x <= v)
        total += (nxt - v) * abs(ca * nb - cb * na)
    return Fraction(total, na * nb)


def _w1_quantile_integral(a: list[int], b: list[int]) -> Fraction:
    """Definition: W1 = integral over u of |Fa^-1(u) - Fb^-1(u)|,
    computed exactly by merging the two samples' quantile levels."""
    a, b = sorted(a), sorted(b)
    na, nb = len(a), len(b)
    cuts = sorted(
        {Fraction(i, na) for i in range(na + 1)}
        | {Fraction(i, nb) for i in range(nb + 1)}
    )
    total = Fraction(0)
    for lo, hi in zip(cuts, cuts[1:]):
        mid = (lo + hi) / 2
        qa = a[min(na - 1, int(mid * na))]
        qb = b[min(nb - 1, int(mid * nb))]
        total += (hi - lo) * abs(qa - qb)
    return total


@settings(max_examples=60, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=500), min_size=1, max_size=15),
    st.lists(st.integers(min_value=0, max_value=500), min_size=1, max_size=15),
)
def test_w1_area_equals_quantile_integral(a, b):
    assert _w1_ecdf_area(a, b) == _w1_quantile_integral(a, b)
