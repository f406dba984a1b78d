"""Generic small-pattern counting: a declarative pattern -> join-chain plan.

The Spark analogue of the reference's ONLY declarative query surface:
``SamplerGenerator`` takes an arbitrary small pattern (edge list over
vertices 0..k-1), dedups its vertex permutations by automorphism, and
derives an estimator (/root/reference/src/SamplerGenerator.cpp:262-464;
automorphism dedup at :312-363, isomorphism test at :225-242).  Apps
Triangle2 / FiveStar / FiveHouse / FourClique2 are one-liners over it
(/root/reference/applications/Triangle2.cpp:18-24).

Here the same declarative input compiles to an EXACT distributed count:

  * ``automorphisms`` — |Aut(pattern)| by factorial enumeration driver-side
    (patterns have <= ~6 vertices; this is the reference's own approach).
  * ``plan_pattern`` — greedy closure-first join order: grow a connected
    vertex cover one extension edge at a time, and the moment both
    endpoints of a remaining pattern edge are bound, check it with a
    LEFT SEMI join (EXISTS) *before* extending further.  Cycle-closing
    predicates therefore run at the earliest possible join depth, keeping
    intermediates near the final result size (the hand-tuned five-house
    plan in motifs.py falls out automatically).
  * ``pattern_count`` — executes the plan as chained equi-joins over the
    symmetric edge view; injective-homomorphism count / |Aut|.
  * ``pattern_count_sql`` — the SAME plan rendered as ANSI SQL (JOIN/ON +
    EXISTS + pairwise distinctness) for the DuckDB parity oracle.

Scale notes: every join keys on a single vertex column of the symmetric
edge view (persisted once); Spark's map-side partial agg absorbs the final
count; AQE handles skewed hub vertices for the extension joins.
"""

from __future__ import annotations

from itertools import permutations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .triangles import _oriented

Edge = tuple[int, int]


def _norm(pattern: list[Edge]) -> list[Edge]:
    es = sorted({(min(u, v), max(u, v)) for u, v in pattern})
    if any(u == v for u, v in es):
        raise ValueError("pattern must have no self-loops")
    k = max(max(u, v) for u, v in es) + 1
    verts = {x for e in es for x in e}
    if verts != set(range(k)):
        raise ValueError("pattern vertices must be 0..k-1 with no gaps")
    return es


def automorphisms(pattern: list[Edge]) -> int:
    """|Aut(pattern)| — permutations of vertices preserving the edge set
    (reference: /root/reference/src/SamplerGenerator.cpp:225-242)."""
    es = set(_norm(pattern))
    k = max(max(u, v) for u, v in es) + 1
    n = 0
    for p in permutations(range(k)):
        if all((min(p[u], p[v]), max(p[u], p[v])) in es for u, v in es):
            n += 1
    return n


def plan_pattern(pattern: list[Edge]) -> list[tuple[str, int, int]]:
    """Join order as steps ('root'|'extend'|'close', u, v).

    'root' binds (u, v); 'extend' has u already bound and binds v;
    'close' has both bound.  Closure edges are emitted eagerly; the next
    extension picks the new vertex with the most edges into the bound set
    (most immediate closures), tie-broken by vertex index.
    """
    es = _norm(pattern)
    deg: dict[int, int] = {}
    for u, v in es:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    # root edge: between the two highest-degree vertices available
    root = max(es, key=lambda e: (deg[e[0]] + deg[e[1]],
                                  max(deg[e[0]], deg[e[1]]), (-e[0], -e[1])))
    u0, v0 = (root if deg[root[0]] >= deg[root[1]] else (root[1], root[0]))
    steps: list[tuple[str, int, int]] = [("root", u0, v0)]
    bound = {u0, v0}
    remaining = [e for e in es if e != root]
    while remaining:
        closures = [e for e in remaining if e[0] in bound and e[1] in bound]
        if closures:
            e = min(closures)
            steps.append(("close", e[0], e[1]))
            remaining.remove(e)
            continue
        ext = [e for e in remaining if (e[0] in bound) != (e[1] in bound)]
        if not ext:
            raise ValueError("pattern must be connected")

        def gain(e: Edge) -> tuple[int, int, int]:
            new = e[1] if e[0] in bound else e[0]
            into = sum(1 for a, b in remaining
                       if (a == new and b in bound) or (b == new and a in bound))
            return (into, deg[new], -new)

        e = max(ext, key=gain)
        u, new = (e[0], e[1]) if e[0] in bound else (e[1], e[0])
        steps.append(("extend", u, new))
        bound.add(new)
        remaining.remove(e)
    return steps


def pattern_count(edges: DataFrame, pattern: list[Edge]) -> int:
    """Exact occurrences of ``pattern`` in the undirected simple graph of
    ``edges`` = injective homomorphisms / |Aut|."""
    aut = automorphisms(pattern)
    steps = plan_pattern(pattern)
    o = _oriented(edges)
    sym = o.select(F.col("a").alias("u"), F.col("b").alias("v"))
    sym = sym.union(sym.select(F.col("v").alias("u"), F.col("u").alias("v"))).persist()
    try:
        kind, u0, v0 = steps[0]
        cur = sym.select(F.col("u").alias(f"v{u0}"), F.col("v").alias(f"v{v0}"))
        bound = [u0, v0]
        for kind, a, b in steps[1:]:
            if kind == "close":
                probe = sym.select(F.col("u").alias(f"v{a}"), F.col("v").alias(f"v{b}"))
                cur = cur.join(probe, [f"v{a}", f"v{b}"], "left_semi")
            else:  # extend: a bound, b new
                step_df = sym.select(F.col("u").alias(f"v{a}"), F.col("v").alias(f"v{b}"))
                cur = cur.join(step_df, f"v{a}")
                for x in bound:
                    if x != a:
                        cur = cur.filter(F.col(f"v{b}") != F.col(f"v{x}"))
                bound.append(b)
        homs = cur.count()
    finally:
        sym.unpersist()
    assert homs % aut == 0, (homs, aut)
    return homs // aut


def pattern_count_sql(pattern: list[Edge], und_cte: str, alias: str) -> str:
    """ANSI-SQL rendering of the same plan (DuckDB parity oracle): chained
    JOIN/ON for extensions, EXISTS for closures, pairwise <> distinctness."""
    aut = automorphisms(pattern)
    steps = plan_pattern(pattern)
    kind, u0, v0 = steps[0]
    from_sql = f"{und_cte} e0"
    sel = {u0: "e0.src", v0: "e0.dst"}
    joins: list[str] = []
    wheres: list[str] = []
    bound = [u0, v0]
    i = 1
    for kind, a, b in steps[1:]:
        if kind == "close":
            wheres.append(
                f"EXISTS (SELECT 1 FROM {und_cte} x WHERE x.src = {sel[a]} "
                f"AND x.dst = {sel[b]})"
            )
        else:
            joins.append(f"JOIN {und_cte} e{i} ON e{i}.src = {sel[a]}")
            sel[b] = f"e{i}.dst"
            for x in bound:
                if x != a:
                    wheres.append(f"{sel[b]} <> {sel[x]}")
            bound.append(b)
            i += 1
    where_sql = ("WHERE " + "\n  AND ".join(wheres)) if wheres else ""
    return (
        f"SELECT CAST(count(*) / {aut} AS BIGINT) AS {alias}\n"
        f"FROM {from_sql}\n" + "\n".join(joins) + ("\n" if joins else "") + where_sql
    )


# named patterns (vertex ids per the reference's application headers)
PATTERNS: dict[str, list[Edge]] = {
    "triangle": [(0, 1), (0, 2), (1, 2)],
    "three_chain": [(0, 1), (1, 2)],
    "four_chain": [(0, 1), (1, 2), (2, 3)],
    "four_cycle": [(0, 1), (1, 2), (2, 3), (3, 0)],
    "four_clique": [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)],
    "tailed_triangle": [(0, 1), (0, 2), (1, 2), (2, 3)],
    # /root/reference/applications/FiveHouse.cpp:18-27
    "five_house": [(0, 1), (0, 2), (1, 2), (1, 3), (2, 4), (3, 4)],
    "five_star": [(0, 1), (0, 2), (0, 3), (0, 4)],
}
