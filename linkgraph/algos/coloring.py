"""Distributed graph coloring via Jones–Plassmann with deterministic
hash priorities.

Each superstep, every still-uncolored vertex whose priority is a strict
local minimum among its uncolored neighbors takes the smallest color not
already used by its colored neighbors (the "mex").  Priorities are the
engine's standard injective arithmetic hash ``p(v) = (v·A + B) mod M``
(M = 2^31-1 prime, A coprime) — no RNG, bit-reproducible in any engine,
same scheme as Luby MIS (algos/mis.py) and the hash random walks.

Round structure per superstep (all JVM-side, whole-stage codegen):
  1. grouped min of neighbor priorities over the *active* adjacency
     (map-side combinable) → winners by one left join + filter;
  2. winners' used-color sets: one join of the *full* adjacency against
     the colored state, then ``collect_set`` per winner;
  3. mex entirely with array builtins:
     ``array_min(array_except(sequence(0, size(used)), used))`` —
     ``sequence(0, k)`` has k+1 candidates vs k used colors, so the
     except is never empty and no Python UDF is needed;
  4. winners leave the active set (anti-join); active adjacency is
     re-restricted by two semi-joins.

All state (active set, colors, adjacency) stays hash-partitioned on the
vertex id, so each round is one shuffle for the neighbor-min plus
co-partitioned joins.  Round depth is O(log V) w.h.p. on bounded-degree
graphs and bounded by the longest decreasing priority path in general —
on dense cores (cliques) JP is inherently sequential, so callers cap
``max_rounds`` and treat the output as a partial coloring of the
lowest-priority periphery (the suite query does exactly this with an
unrolled SQL twin; pytest runs to fixpoint on a small graph).

Reference parity: the reference colors vertices only as a by-product of
its SCC pass (sampling/Graph.cpp forward-coloring); a standalone
distance-1 coloring is part of the standard link-graph toolkit this
engine targets (scheduling crawl partitions so no two adjacent hosts
share a slot).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PRI_A = 1_000_003
PRI_B = 12345
PRI_M = (1 << 31) - 1


def _ckpt(df: DataFrame, P: int, *keys: str) -> DataFrame:
    return df.repartition(P, *keys).localCheckpoint(eager=True)


def jones_plassmann_coloring(
    edges: DataFrame,
    max_rounds: int = 200,
    partitions: int | None = None,
) -> tuple[DataFrame, list[dict]]:
    """Color the undirected view of ``edges``.

    Returns ``(colors(id, color), metrics)``.  ``colors`` covers every
    vertex processed within ``max_rounds`` supersteps (all vertices iff
    the loop reached fixpoint — check ``metrics[-1]["active"] == 0``).
    Adjacent vertices always receive distinct colors; the palette size
    is at most max-degree + 1 (greedy bound).
    """
    spark = edges.sparkSession
    P = int(partitions or spark.conf.get("spark.sql.shuffle.partitions"))

    und = (
        edges.select("src", "dst")
        .union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .filter(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
    )
    pri = lambda c: (F.col(c) * PRI_A + PRI_B) % PRI_M  # noqa: E731

    # full adjacency (never shrinks: colored neighbors feed the mex)
    full = _ckpt(und, P, "src")
    active = _ckpt(full.select(F.col("src").alias("id")).distinct(), P, "id")
    ae = full  # active-only adjacency (shrinks each round)
    colors = spark.createDataFrame([], "id long, color int")
    metrics: list[dict] = []

    for rnd in range(max_rounds):
        t0 = time.time()
        nbr_min = (
            ae.groupBy(F.col("src").alias("id"))
            .agg(F.min((F.col("dst") * PRI_A + PRI_B) % PRI_M).alias("nmin"))
        )
        winners = _ckpt(
            active.join(nbr_min.hint("shuffle_hash"), "id", "left")
            .filter(F.col("nmin").isNull() | (pri("id") < F.col("nmin")))
            .select("id"),
            P, "id",
        )
        # smallest color unused by already-colored neighbors (mex)
        used = (
            full.join(winners.withColumnRenamed("id", "src").hint("shuffle_hash"),
                      "src", "left_semi")
            .join(colors.withColumnRenamed("id", "dst").hint("shuffle_hash"),
                  "dst")
            .groupBy(F.col("src").alias("id"))
            .agg(F.collect_set("color").alias("used"))
        )
        newc = (
            winners.join(used.hint("shuffle_hash"), "id", "left")
            .select(
                "id",
                F.when(F.col("used").isNull(), F.lit(0))
                .otherwise(F.array_min(F.array_except(
                    F.sequence(F.lit(0), F.size("used")), F.col("used"))))
                .cast("int").alias("color"),
            )
        )
        colors = _ckpt(colors.union(newc), P, "id")
        active = _ckpt(active.join(winners.hint("shuffle_hash"), "id", "left_anti"),
                       P, "id")
        n_active = active.count()
        metrics.append(
            {"round": rnd, "winners": winners.count(), "active": n_active,
             "seconds": time.time() - t0}
        )
        if n_active == 0:
            break
        ae = _ckpt(
            ae.join(active.withColumnRenamed("id", "src").hint("shuffle_hash"),
                    "src", "left_semi")
            .join(active.withColumnRenamed("id", "dst").hint("shuffle_hash"),
                  "dst", "left_semi"),
            P, "src",
        )

    return colors, metrics
