"""Distributed skyline: brute-force parity, duplicates/ties, groups."""

import random

from pyspark.sql import functions as F

from fonduer_spark.functions.skyline import skyline_min_max


def _brute(points):
    """Reference skyline: minimize x, maximize y over DISTINCT points."""
    pts = set(points)
    return sorted(
        p for p in pts
        if not any(
            q[0] <= p[0] and q[1] >= p[1] and (q[0] < p[0] or q[1] > p[1])
            for q in pts if q != p))


def test_skyline_known_frontier(spark):
    # frontier: (1,1) dominated by (1,3); (2,2) dominated by (1,3);
    # (2,5) and (1,3) survive; (3,5) dominated by (2,5).
    df = spark.createDataFrame(
        [(1, 1), (1, 3), (2, 2), (2, 5), (3, 5)], "x int, y int")
    got = sorted((r.x, r.y) for r in
                 skyline_min_max(df, "x", "y").collect())
    assert got == [(1, 3), (2, 5)]


def test_skyline_brute_force_parity_random(spark):
    rng = random.Random(7)
    pts = [(rng.randint(0, 30), rng.randint(0, 30)) for _ in range(400)]
    df = spark.createDataFrame(pts, "x int, y int").repartition(8)
    got = sorted((r.x, r.y) for r in
                 skyline_min_max(df, "x", "y").collect())
    assert got == _brute(pts)


def test_skyline_full_frontier_worst_case(spark):
    # for minimize-x / maximize-y the y = x diagonal is the worst case:
    # EVERY distinct point is on the frontier (paying more always buys
    # strictly more) — the two-phase prune must not drop any of them.
    pts = [(i, i) for i in range(101)] + [(50, 10), (60, 5)]
    df = spark.createDataFrame(pts, "x int, y int").repartition(16)
    got = sorted((r.x, r.y) for r in
                 skyline_min_max(df, "x", "y").collect())
    assert got == [(i, i) for i in range(101)]


def test_skyline_duplicates_and_nulls(spark):
    df = spark.createDataFrame(
        [(1, 3), (1, 3), (2, 5), (None, 9), (0, None)],
        "x int, y int")
    got = sorted((r.x, r.y) for r in
                 skyline_min_max(df, "x", "y").collect())
    # duplicates collapse; NULL rows dropped (incomparable)
    assert got == [(1, 3), (2, 5)]


def test_skyline_grouped_independent_frontiers(spark):
    rng = random.Random(11)
    rows = [("g%d" % (i % 3), rng.randint(0, 20), rng.randint(0, 20))
            for i in range(300)]
    df = spark.createDataFrame(rows, "g string, x int, y int").repartition(8)
    got = {}
    for r in skyline_min_max(df, "x", "y", by=["g"]).collect():
        got.setdefault(r.g, []).append((r.x, r.y))
    for g in ("g0", "g1", "g2"):
        want = _brute([(x, y) for gg, x, y in rows if gg == g])
        assert sorted(got[g]) == want, g
