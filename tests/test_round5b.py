"""Round-5 hardening: property tests and plan audits for the
degree-ordered wedge machinery and the planted-skew bench fixture."""

import random

import pytest
from pyspark.sql import functions as F

try:
    from hypothesis import given, settings, strategies as st

    HAVE_HYP = True
except ImportError:  # pragma: no cover
    HAVE_HYP = False


def _rand_edges(seed, n, p):
    rnd = random.Random(seed)
    return [
        (a, b)
        for a in range(n)
        for b in range(n)
        if a != b and rnd.random() < p
    ]


@pytest.mark.skipif(not HAVE_HYP, reason="hypothesis not installed")
@settings(max_examples=8, deadline=None)
@given(seed=st.integers(0, 10_000))
def test_degree_oriented_invariants(spark, seed):
    """Structural invariants of degree_ranked_oriented on random graphs:

    1. bijectivity — every undirected edge appears exactly once as
       (lo, hi), with {lo, hi} == the original endpoint pair;
    2. orientation — rank(lo) < rank(hi) under (degree, id) on each row;
    3. the √(2m) bound — max out-degree h satisfies h² ≤ 2m EXACTLY
       (each of v's h higher-rank neighbors has degree ≥ deg(v) ≥ h,
       so Σ deg ≥ h²): the invariant the O(m^1.5) wedge bound rests on.
    """
    from linkgraph.algos.triangles import degree_ranked_oriented

    edges = _rand_edges(seed, 15, 0.3)
    if not edges:
        return
    df = spark.createDataFrame(edges, "src long, dst long")
    rows = degree_ranked_oriented(df).collect()

    und = {tuple(sorted(e)) for e in edges}
    got_pairs = sorted(tuple(sorted((r.lo, r.hi))) for r in rows)
    assert got_pairs == sorted(und)  # exactly once each

    deg = {}
    for a, b in und:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    for r in rows:
        assert (r.dlo, r.lo) == (deg[r.lo], r.lo)
        assert (r.dhi, r.hi) == (deg[r.hi], r.hi)
        assert (r.dlo, r.lo) < (r.dhi, r.hi)

    out = {}
    for r in rows:
        out[r.lo] = out.get(r.lo, 0) + 1
    h = max(out.values())
    assert h * h <= 2 * len(und)


def test_wedge_plans_no_cartesian_no_smj(spark):
    """Plan audit: the degree-ordered triangle and vertex-priority
    4-cycle plans contain no CartesianProduct / BroadcastNestedLoopJoin /
    SortMergeJoin (same guard style as the round-4d audits)."""
    from linkgraph.algos.motifs import four_cycle_count  # noqa: F401
    from linkgraph.algos.triangles import triangles
    from linkgraph import datagen

    e = datagen.rmat_edges(spark, 3000, 9, partitions=8)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = triangles(e)._jdf.queryExecution().explainString(mode)
    for bad in ("CartesianProduct", "BroadcastNestedLoopJoin", "SortMergeJoin"):
        assert bad not in plan, f"{bad} in triangles plan"

    # four_cycle_count is terminal (returns int) — audit its wedge stage
    from linkgraph.algos.triangles import degree_ranked_oriented, _rank_lt

    o = degree_ranked_oriented(e)
    cs = o.select(
        F.col("lo").alias("x"), F.col("hi").alias("u"), F.col("dhi").alias("du")
    )
    sym = o.select(
        F.col("lo").alias("x"), F.col("hi").alias("w"), F.col("dhi").alias("dw")
    ).union(
        o.select(
            F.col("hi").alias("x"), F.col("lo").alias("w"), F.col("dlo").alias("dw")
        )
    )
    wedges = (
        cs.join(sym.hint("shuffle_hash"), "x")
        .filter(_rank_lt(F.col("dw"), F.col("w"), F.col("du"), F.col("u")))
        .groupBy("u", "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    plan4 = wedges._jdf.queryExecution().explainString(mode)
    for bad in ("CartesianProduct", "BroadcastNestedLoopJoin", "SortMergeJoin"):
        assert bad not in plan4, f"{bad} in 4-cycle wedge plan"


def test_skew_bench_fixture_pinned(spark):
    """The planted-skew bench fixture is deterministic: edge count,
    triangle count, and hub degree are pinned so a silent generator change
    (which would invalidate cross-round skew_* comparisons) fails here."""
    import sys, os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench
    from linkgraph.algos.triangles import triangle_count

    e, m = bench.skew_edges(spark, 8)
    assert m == 293_192
    hub_deg = (
        e.select(F.explode(F.array("src", "dst")).alias("v"))
        .filter(F.col("v") == 0)
        .count()
    )
    assert hub_deg >= 10_000  # planted hub intact (plus R-MAT background)
    assert triangle_count(e) == 253_549
    e.unpersist()
