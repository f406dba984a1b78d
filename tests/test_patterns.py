"""Generic pattern compiler vs brute-force oracle and specialized counters."""

import pytest

from linkgraph import datagen, oracles
from linkgraph.algos import motifs, patterns, triangles

V = 30
EDGES = datagen.expected_edges(V)


def test_automorphism_counts():
    assert patterns.automorphisms(patterns.PATTERNS["triangle"]) == 6
    assert patterns.automorphisms(patterns.PATTERNS["three_chain"]) == 2
    assert patterns.automorphisms(patterns.PATTERNS["four_chain"]) == 2
    assert patterns.automorphisms(patterns.PATTERNS["four_cycle"]) == 8
    assert patterns.automorphisms(patterns.PATTERNS["four_clique"]) == 24
    assert patterns.automorphisms(patterns.PATTERNS["five_house"]) == 2
    assert patterns.automorphisms(patterns.PATTERNS["five_star"]) == 24
    assert patterns.automorphisms(patterns.PATTERNS["tailed_triangle"]) == 2


def test_plan_closure_first():
    steps = patterns.plan_pattern(patterns.PATTERNS["five_house"])
    kinds = [k for k, _, _ in steps]
    # the roof triangle must close before the walls extend
    assert kinds.index("close") == 2


@pytest.mark.parametrize("name", sorted(patterns.PATTERNS))
def test_pattern_count_matches_bruteforce(spark, edges30, name):
    got = patterns.pattern_count(edges30, patterns.PATTERNS[name])
    assert got == oracles.pattern_count_oracle(EDGES, patterns.PATTERNS[name])


def test_pattern_count_matches_specialized(spark, edges30):
    p = patterns.PATTERNS
    assert patterns.pattern_count(edges30, p["triangle"]) == triangles.triangle_count(edges30)
    assert patterns.pattern_count(edges30, p["three_chain"]) == motifs.three_chain_count(edges30)
    assert patterns.pattern_count(edges30, p["four_chain"]) == motifs.four_chain_count(edges30)
    assert patterns.pattern_count(edges30, p["four_clique"]) == motifs.four_clique_count(edges30)
    assert patterns.pattern_count(edges30, p["five_house"]) == motifs.five_house_count(edges30)


def test_pattern_validation():
    with pytest.raises(ValueError):
        patterns.plan_pattern([(0, 0)])
    with pytest.raises(ValueError):
        patterns.plan_pattern([(0, 1), (2, 3)])  # disconnected
    with pytest.raises(ValueError):
        patterns.automorphisms([(0, 2)])  # gap in vertex ids


def test_powerlaw_alpha_formula(spark):
    """suite.q_powerlaw_alpha on a written fixture dir matches the
    Clauset-MLE formula computed sequentially with the same per-element
    e6 quantization."""
    import decimal
    import math

    from linkgraph import suite

    # write a lineitem table whose derived graph A equals... simpler:
    # compute directly from the derived graph of the real sf0.001 dir
    sf = "/root/testdata/sf0.001"
    got = suite.q_powerlaw_alpha(spark, sf).collect()[0]

    rows = suite.edges_a(spark, sf).collect()
    indeg = {}
    for r in rows:
        indeg[r["dst"]] = indeg.get(r["dst"], 0) + 1
    q = [int(decimal.Decimal(math.log(d / 1.5) * 1e6).quantize(
        0, rounding=decimal.ROUND_HALF_UP)) for d in indeg.values() if d >= 2]
    n, s = len(q), sum(q)
    alpha = 1_000_000 + int(decimal.Decimal(n * 1e12 / s).quantize(
        0, rounding=decimal.ROUND_HALF_UP))
    assert (got["n"], got["sum_ln_e6"], got["alpha_e6"]) == (n, s, alpha)
    # MLE is >1 by construction (every term positive); the derived hash
    # graph is near-uniform-degree so alpha is small, not scale-free
    assert got["alpha_e6"] > 1_000_000


def test_degree_percentiles_exact(spark):
    """Histogram-CDF percentiles equal brute-force sorted-position picks."""
    import math

    from linkgraph import suite

    sf = "/root/testdata/sf0.001"
    got = suite.q_degree_percentiles(spark, sf).collect()[0]

    und = {(r["src"], r["dst"]) for r in suite.edges_a(spark, sf).collect()}
    und |= {(b, a) for a, b in und}
    deg = {}
    for a, _ in und:
        deg[a] = deg.get(a, 0) + 1
    ds = sorted(deg.values())
    n = len(ds)
    want = {q: ds[math.ceil(q * n) - 1] for q in (0.5, 0.9, 0.99)}
    assert (got["n"], got["p50"], got["p90"], got["p99"]) == (
        n, want[0.5], want[0.9], want[0.99])
