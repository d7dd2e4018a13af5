"""Property-based tests (hypothesis) for the round-7 ML/analytics
operators, cross-checked against Python brute-force references.
Each strategy generates SMALL frames (Spark round-trips per example
are the cost driver) but adversarial shapes: duplicates, ties,
degenerate groups, boundary radii."""

from hypothesis import given, settings
from hypothesis import strategies as st

from agnes_spark.operators.sampling import assign_folds
from agnes_spark.operators.skyline import pareto_frontier_2d
from agnes_spark.operators.spatial import radius_pairs_grid
from agnes_spark.operators.stats import trimmed_mean

POINTS_2D = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=40),
        st.integers(min_value=0, max_value=40),
    ),
    min_size=1,
    max_size=30,
)


@settings(max_examples=15, deadline=None)
@given(POINTS_2D)
def test_pareto_frontier_property(spark, pts):
    rows = [(p, s, i) for i, (p, s) in enumerate(pts)]
    df = spark.createDataFrame(rows, "price long, size long, id long")
    got = sorted(
        (r.price, r.size, r.id)
        for r in pareto_frontier_2d(df, "price", "size", bucket_width=7).collect()
    )
    want = sorted(
        (p, s, i)
        for p, s, i in rows
        if not any(
            p2 <= p and s2 >= s and (p2 < p or s2 > s) for p2, s2, _ in rows
        )
    )
    assert got == want
    assert len(got) >= 1  # a frontier always exists


@settings(max_examples=15, deadline=None)
@given(POINTS_2D, st.integers(min_value=1, max_value=12))
def test_radius_pairs_property(spark, pts, radius):
    rows = [(i, x, y) for i, (x, y) in enumerate(pts)]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    got = sorted(
        (r.id_a, r.id_b, r.dist2)
        for r in radius_pairs_grid(df, "id", "x", "y", radius).collect()
    )
    want = sorted(
        (a, b, (xa - xb) ** 2 + (ya - yb) ** 2)
        for a, xa, ya in rows
        for b, xb, yb in rows
        if a < b and (xa - xb) ** 2 + (ya - yb) ** 2 <= radius * radius
    )
    assert got == want


@settings(max_examples=15, deadline=None)
@given(
    st.lists(st.integers(min_value=-1000, max_value=1000), min_size=3, max_size=60),
    st.sampled_from([5, 10, 25]),
)
def test_trimmed_mean_property(spark, vals, pct):
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    row = trimmed_mean(df, "v", trim_pct=pct).collect()[0]
    n = len(vals)
    lo = n * pct // 100
    kept = sorted(vals)[lo : n - lo]
    assert row.n_total == n and row.n_kept == len(kept)
    assert abs(row.mean - sum(kept) / len(kept)) < 1e-9


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=10_000_000),
        min_size=1,
        max_size=50,
        unique=True,
    ),
    st.integers(min_value=2, max_value=7),
)
def test_assign_folds_pure_arithmetic(spark, keys, k):
    df = spark.createDataFrame([(v,) for v in keys], "key long")
    got = {r.key: r.fold for r in assign_folds(df, "key", k=k).collect()}
    for key in keys:
        assert got[key] == ((key % 2147483648) * 40503 + 7) % k
