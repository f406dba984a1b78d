"""k-truss decomposition of the undirected link graph.

The k-truss is the maximal subgraph in which every edge participates in at
least k-2 triangles — the edge-level analogue of the k-core and the
standard cohesive-subgraph operator for web/community graphs (Cohen 2008).

Iterative support peeling as DataFrame joins:

  1. orient edges (a < b), the same degeneracy-free orientation as the
     engine's exact triangle counter (triangles._oriented);
  2. per round, count each edge's triangle support with the oriented
     two-path + closing-edge join (wedge join on the shared low endpoint,
     closure semi-join on (b, c)), then project every found triangle back
     onto its three edges and take one grouped count;
  3. drop edges with support < k-2; repeat until the edge set is stable.

The edge set only shrinks, so round cost is monotonically decreasing; the
support join is the engine's triangle plan (shuffle-hash, no sort-merge),
and the per-round state is the edge list hash-partitioned on ``a``.
Termination: at most E rounds, in practice a handful (each round removes
at least one edge or stops).

Oracle: unrolled peel SQL (MATERIALIZED per round — each round is
referenced by the next) in suite.py plus a brute-force pytest oracle.

New capability relative to the reference (which counts triangles but has
no truss/peeling operator; /root/reference/naive_implementation/
TriangleCounting.cpp:44-70 is the exact-count analogue).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _ckpt(df: DataFrame, P: int, *keys: str) -> DataFrame:
    return df.repartition(P, *keys).localCheckpoint(eager=True)


def _support(e: DataFrame) -> DataFrame:
    """Per-edge triangle support over oriented edges (a < b).

    Triangles (a<b<c) found as wedge (a,b)+(a,c), b<c, closed by (b,c);
    each triangle is projected onto its three member edges, one grouped
    count gives support.
    """
    w = (
        e.alias("e1")
        .join(e.alias("e2"), F.col("e1.a") == F.col("e2.a"))
        .filter(F.col("e1.b") < F.col("e2.b"))
        .select(
            F.col("e1.a").alias("x"),
            F.col("e1.b").alias("y"),
            F.col("e2.b").alias("z"),
        )
    )
    tri = w.join(
        e.select(F.col("a").alias("y"), F.col("b").alias("z")).hint("shuffle_hash"),
        ["y", "z"],
        "left_semi",
    )
    per_edge = (
        tri.select(F.col("x").alias("a"), F.col("y").alias("b"))
        .union(tri.select(F.col("x").alias("a"), F.col("z").alias("b")))
        .union(tri.select(F.col("y").alias("a"), F.col("z").alias("b")))
    )
    return per_edge.groupBy("a", "b").agg(F.count(F.lit(1)).alias("supp"))


def ktruss_edges(
    edges: DataFrame,
    k: int,
    max_rounds: int = 50,
    partitions: int | None = None,
) -> tuple[DataFrame, list[dict]]:
    """Edges (a, b) of the k-truss; returns (edge DataFrame, metrics)."""
    spark = edges.sparkSession
    P = int(partitions or spark.conf.get("spark.sql.shuffle.partitions"))

    e = _ckpt(
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .dropDuplicates(["a", "b"]),
        P,
        "a",
    )
    n = e.count()
    metrics: list[dict] = []
    for rnd in range(max_rounds):
        t0 = time.time()
        keep = _support(e).filter(F.col("supp") >= k - 2).select("a", "b")
        e2 = _ckpt(e.join(keep.hint("shuffle_hash"), ["a", "b"], "left_semi"), P, "a")
        n2 = e2.count()
        metrics.append(
            {"round": rnd, "edges": n2, "removed": n - n2, "seconds": time.time() - t0}
        )
        e, done = e2, n2 == n
        n = n2
        if done or n == 0:
            break
    return e, metrics
