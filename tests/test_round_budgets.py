"""Round-budget guards for the unrolled SQL twins (ADVICE r01 item 4).

Several DuckDB oracles unroll an iterative fixpoint a FIXED number of
rounds (k-core 24, k-truss 20, matching 14, Luby 8, stress/betweenness
BFS 12).  The Spark side always runs to fixpoint, so a dataset needing
more rounds than the unrolled budget would make the ORACLE under-iterate
and the parity gate fail with an opaque hash mismatch.  These tests pin
the coupling: for every tested scale factor, measured depth + margin must
fit the budget — a new dataset that violates it fails HERE with a clear
message instead.
"""

from __future__ import annotations

from collections import deque

import pytest

from linkgraph import suite

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
MARGIN = 2


def _edges_b_rows(spark, sf_dir):
    return [(r["src"], r["dst"]) for r in suite.edges_b(spark, sf_dir).collect()]


def _adj(rows):
    adj: dict[int, set[int]] = {}
    for a, b in rows:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    return adj


def _kcore_peel_depth(rows, k):
    adj = {v: set(ns) for v, ns in _adj(rows).items()}
    depth = 0
    while True:
        drop = [v for v, ns in adj.items() if len(ns) < k]
        if not drop:
            return depth
        depth += 1
        for v in drop:
            for w in adj[v]:
                adj[w].discard(v)
            del adj[v]


def _max_ecc(rows, sources):
    adj = _adj(rows)
    worst = 0
    for s in sources:
        if s not in adj:
            continue
        dist = {s: 0}
        q = deque([s])
        while q:
            v = q.popleft()
            for w in adj[v]:
                if w not in dist:
                    dist[w] = dist[v] + 1
                    q.append(w)
        worst = max(worst, max(dist.values()))
    return worst


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_kcore_budget(spark, sf_dir):
    depth = _kcore_peel_depth(_edges_b_rows(spark, sf_dir), 3)
    assert depth + MARGIN <= 24, (
        f"k-core peel depth {depth} at {sf_dir} too close to the 24-round "
        f"unrolled KCORE3_SQL budget — raise _kcore_sql rounds"
    )


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_stress_betweenness_bfs_budget(spark, sf_dir):
    ecc = _max_ecc(_edges_b_rows(spark, sf_dir), suite.STRESS_SOURCES)
    assert ecc + MARGIN <= suite.STRESS_LEVELS, (
        f"max source eccentricity {ecc} at {sf_dir} too close to the "
        f"{suite.STRESS_LEVELS}-level STRESS/BETWEENNESS SQL budget"
    )


def test_exact_diagnostic_source_guard():
    """O(V·E) all-sources diagnostics refuse oversized graphs with a
    pointer to the HyperBall sketch (VERDICT r01 'what's wrong' #6)."""
    suite._guard_exact_all_sources(suite.EXACT_DIAG_MAX_SOURCES, "x")
    with pytest.raises(ValueError, match="HyperBall"):
        suite._guard_exact_all_sources(suite.EXACT_DIAG_MAX_SOURCES + 1,
                                       "effective_diameter")


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_ktruss_matching_luby_budgets(spark, sf_dir):
    from linkgraph.algos.ktruss import ktruss_edges
    from linkgraph.algos.matching import maximal_matching
    from linkgraph.algos.mis import maximal_independent_set

    eb = suite.edges_b(spark, sf_dir).persist()
    try:
        _, mt = ktruss_edges(eb, k=5, partitions=8)
        assert len(mt) + MARGIN <= 20, (
            f"k-truss ran {len(mt)} rounds at {sf_dir}; KTRUSS5_SQL "
            f"unrolls only 20"
        )
        _, mm = maximal_matching(eb, partitions=8)
        assert len(mm) + MARGIN <= 14, (
            f"matching ran {len(mm)} rounds at {sf_dir}; MATCHING_SQL "
            f"unrolls only 14"
        )
        _, ml = maximal_independent_set(eb, partitions=8)
        assert len(ml) + MARGIN <= 8, (
            f"Luby MIS ran {len(ml)} rounds at {sf_dir}; LUBY_SQL "
            f"unrolls only 8"
        )
    finally:
        eb.unpersist()
