"""Breadth-first hop distances (single- or multi-source) over the link graph.

Frontier-expansion BFS as iterative DataFrame joins: the discovered state
``(id, dist)`` stays hash-partitioned on id; each superstep joins only the
*frontier* (vertices discovered last round) against the edge table, then
anti-joins the already-discovered set — so per-superstep work is
O(edges touched by the frontier), not O(E).  Lineage is truncated every
superstep (``localCheckpoint``), mirroring the engine's PageRank/CC loops.

Scale notes: the frontier join shuffles on ``src`` and the dedup/anti-join
on ``id`` — both pinned at ``partitions``; at web scale the frontier is
the small side early on (broadcast-able) and the state join is the classic
BFS-as-semijoin plan.  New link-graph capability (the reference has no
path queries); oracle: pure-Python BFS in tests + a bounded recursive-CTE
SQL twin for the driver gate.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bfs_distances(
    edges: DataFrame,
    sources: DataFrame,
    directed: bool = False,
    max_iter: int = 100,
    partitions: int | None = None,
) -> tuple[DataFrame, list[dict]]:
    """Hop distance from the nearest source; returns (dist(id, dist), metrics).

    ``sources``: DataFrame with one ``id`` column.  Unreached vertices are
    absent from the result (dist would be +inf).
    """
    spark = edges.sparkSession
    P = int(partitions or spark.conf.get("spark.sql.shuffle.partitions"))

    e = edges.select("src", "dst")
    if not directed:
        e = e.union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    e = (
        e.filter(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
        .repartition(P, "src")
        .persist()
    )
    e.count()  # pin the pinned-partitioning edge table once, reuse every superstep

    state = (
        sources.select("id").distinct()
        .select("id", F.lit(0).cast("int").alias("dist"))
        .repartition(P, "id")
        .localCheckpoint(eager=True)
    )
    frontier = state
    metrics: list[dict] = []

    for it in range(1, max_iter + 1):
        t0 = time.time()
        # frontier ⋈ edges: only edges incident to newly-found vertices;
        # dropDuplicates before the anti-join keeps the shuffle minimal
        nxt = (
            e.join(
                frontier.select(F.col("id").alias("src")).hint("shuffle_hash"), "src"
            )
            .select(F.col("dst").alias("id"))
            .dropDuplicates(["id"])
            .join(state.hint("shuffle_hash"), "id", "left_anti")
            .select("id", F.lit(it).cast("int").alias("dist"))
            .repartition(P, "id")
            .localCheckpoint(eager=True)
        )
        found = nxt.count()
        metrics.append({"iteration": it, "frontier": found, "seconds": time.time() - t0})
        if found == 0:
            break
        state = state.union(nxt).repartition(P, "id").localCheckpoint(eager=True)
        frontier = nxt

    e.unpersist()
    return state, metrics
