"""Property-based tests for operators/mining.py against brute-force
models — the algebra behind part_skyline_pareto and
alloc_largest_remainder, checked independent of the fixture tables.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def _brute_skyline(points):
    """Textbook O(n²) dominance: (minimize p, maximize s)."""
    out = []
    for i, (pi, si) in enumerate(points):
        dominated = any(
            (pq <= pi and sq >= si and (pq < pi or sq > si))
            for j, (pq, sq) in enumerate(points)
            if j != i
        )
        if not dominated:
            out.append((pi, si))
    return sorted(out)


def _model_hamilton(weights, budget):
    """Sequential largest-remainder model over (key, weight) pairs."""
    total = sum(w for _, w in weights)
    base = {k: budget * w // total for k, w in weights}
    # rank by (remainder DESC, key ASC) — mirror the operator's tie-break
    ranked = sorted(weights, key=lambda kw: (-((budget * kw[1]) % total), kw[0]))
    deficit = budget - sum(base.values())
    for k, _ in ranked[:deficit]:
        base[k] += 1
    return base


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=50),  # minimize dim (price)
            st.integers(min_value=1, max_value=6),  # bounded maximize dim
        ),
        min_size=1,
        max_size=30,
    )
)
def test_skyline_matches_bruteforce(spark, pts):
    from postrack_spark.operators.mining import skyline_min_max_bounded

    df = spark.createDataFrame(
        [(i, p, s) for i, (p, s) in enumerate(pts)], "id int, p int, s int"
    )
    got = sorted(
        (r["p"], r["s"]) for r in skyline_min_max_bounded(df, "p", "s").collect()
    )
    assert got == _brute_skyline(pts)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=12)
    .filter(lambda ws: sum(ws) > 0),
    st.integers(min_value=1, max_value=997),
)
def test_hamilton_allocation_properties(spark, ws, budget):
    from postrack_spark.operators.mining import largest_remainder_allocation

    weights = [(i, w) for i, w in enumerate(ws)]
    df = spark.createDataFrame(weights, "k int, w long")
    got = {
        r["k"]: r["alloc"]
        for r in largest_remainder_allocation(df, "k", "w", budget).collect()
    }
    total = sum(ws)
    # 1. exact budget conservation
    assert sum(got.values()) == budget
    # 2. Hamilton quota property: floor <= alloc <= floor + 1
    for k, w in weights:
        fl = budget * w // total
        assert fl <= got[k] <= fl + 1, (k, w, got[k], fl)
    # 3. matches the sequential largest-remainder model exactly
    assert got == _model_hamilton(weights, budget)
