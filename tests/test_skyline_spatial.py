"""Skyline and grid spatial-join operators (operators/skyline.py,
operators/spatial.py) plus the deterministic fold splitter —
semantics checked against brute-force on small frames."""

import itertools

from agnes_spark.operators.sampling import assign_folds
from agnes_spark.operators.skyline import pareto_frontier_2d
from agnes_spark.operators.spatial import radius_pairs_grid


def _brute_frontier(rows):
    out = []
    for p, s, i in rows:
        dominated = any(
            (p2 <= p and s2 >= s and (p2 < p or s2 > s))
            for p2, s2, _ in rows
        )
        if not dominated:
            out.append((p, s, i))
    return sorted(out)


def test_pareto_frontier_matches_bruteforce(spark):
    rows = [
        (100, 5, 1),
        (100, 9, 2),  # dominates id=1 (same price, bigger)
        (150, 9, 3),  # dominated by id=2 (pricier, same size)
        (200, 12, 4),
        (200, 12, 5),  # exact duplicate of id=4: both on frontier
        (50, 1, 6),
        (5000, 13, 7),  # far bucket, still on frontier
        (4999, 12, 8),  # dominated by id=4 (cheaper, same size)
    ]
    df = spark.createDataFrame(rows, "price long, size long, id long")
    got = sorted(
        (r.price, r.size, r.id)
        for r in pareto_frontier_2d(df, "price", "size", bucket_width=1000).collect()
    )
    assert got == _brute_frontier(rows)
    assert (100, 9, 2) in got and (200, 12, 4) in got and (200, 12, 5) in got


def test_pareto_frontier_bucket_width_invariance(spark):
    rows = [(i * 37 % 500, (i * 91 + 13) % 40, i) for i in range(200)]
    df = spark.createDataFrame(rows, "price long, size long, id long")
    a = sorted(
        map(tuple, pareto_frontier_2d(df, "price", "size", 7).collect())
    )
    b = sorted(
        map(tuple, pareto_frontier_2d(df, "price", "size", 1000).collect())
    )
    assert a == b == _brute_frontier(rows)


def _brute_pairs(pts, r):
    out = []
    for (ia, xa, ya), (ib, xb, yb) in itertools.combinations(pts, 2):
        d2 = (xa - xb) ** 2 + (ya - yb) ** 2
        if d2 <= r * r:
            out.append((min(ia, ib), max(ia, ib), d2))
    return sorted(out)


def test_radius_pairs_matches_bruteforce(spark):
    pts = [(i, (i * i * 3 + 17 * i) % 97, (i * i * 5 + 7 * i + 3) % 89) for i in range(60)]
    df = spark.createDataFrame(pts, "id long, x long, y long")
    got = sorted(
        (r.id_a, r.id_b, r.dist2)
        for r in radius_pairs_grid(df, "id", "x", "y", 10).collect()
    )
    assert got == _brute_pairs(pts, 10)
    assert len(got) > 0  # non-vacuous
    # no duplicate pairs from the half-plane cell walk
    assert len({(a, b) for a, b, _ in got}) == len(got)


def test_radius_pairs_boundary_inclusive(spark):
    # distance exactly r is INCLUDED; r+epsilon is not
    pts = [(1, 0, 0), (2, 10, 0), (3, 10, 1)]
    df = spark.createDataFrame(pts, "id long, x long, y long")
    got = {(r.id_a, r.id_b): r.dist2 for r in radius_pairs_grid(df, "id", "x", "y", 10).collect()}
    assert got[(1, 2)] == 100
    assert (1, 3) not in got  # dist2=101 > 100
    assert got[(2, 3)] == 1


def test_assign_folds_deterministic_and_balanced(spark):
    df = spark.range(0, 1000).withColumnRenamed("id", "k")
    out = assign_folds(df, "k", k=5)
    counts = {r.fold: r.n for r in out.groupBy("fold").count().withColumnRenamed("count", "n").collect()}
    assert set(counts) == {0, 1, 2, 3, 4}
    assert all(abs(v - 200) <= 1 for v in counts.values())
    # pure arithmetic: python reproduces the assignment
    rows = {r.k: r.fold for r in out.collect()}
    for k in (0, 1, 7, 999):
        assert rows[k] == ((k % 2147483648) * 40503 + 7) % 5


def _brute_dbscan(pts, r, min_pts):
    import itertools as it

    nbrs = {i: set() for i, _, _ in pts}
    for (ia, xa, ya), (ib, xb, yb) in it.combinations(pts, 2):
        if (xa - xb) ** 2 + (ya - yb) ** 2 <= r * r:
            nbrs[ia].add(ib)
            nbrs[ib].add(ia)
    core = {i for i, ns in nbrs.items() if len(ns) >= min_pts}
    # min-label connected components over core-core edges
    lab = {c: c for c in core}
    changed = True
    while changed:
        changed = False
        for c in core:
            for n in nbrs[c]:
                if n in core and lab[n] < lab[c]:
                    lab[c] = lab[n]
                    changed = True
    out = {c: (1, lab[c]) for c in core}
    for i, ns in nbrs.items():
        if i not in core:
            cs = [lab[n] for n in ns if n in core]
            if cs:
                out[i] = (0, min(cs))
    return out


def test_dbscan_grid_matches_bruteforce(spark):
    from agnes_spark.operators.spatial import dbscan_grid

    pts = [(i, (i * i * 3 + 17 * i) % 60, (i * i * 5 + 7 * i + 3) % 55) for i in range(80)]
    df = spark.createDataFrame(pts, "id long, x long, y long")
    got = {
        r.id: (r.is_core, r.cluster_id)
        for r in dbscan_grid(df, "id", "x", "y", radius=8, min_pts=3).collect()
    }
    want = _brute_dbscan(pts, 8, 3)
    assert got == want
    assert any(v[0] == 1 for v in got.values())  # some cores
    assert any(v[0] == 0 for v in got.values())  # some borders
    assert len(got) < len(pts)  # some noise omitted
