"""Synchronous Louvain-style modularity-gain clustering (one level).

Classic Louvain's local-move phase is inherently sequential (vertices move
one at a time, visiting order changes the result).  For a distributed,
deterministic engine we run the standard *synchronous* variant: every
round, every vertex simultaneously joins the candidate community with the
highest modularity gain, ties broken by the smallest community label —
the same gain formula, evaluated against the previous round's communities
(this is the local-move scheme of distributed Louvain implementations,
e.g. Spark-native GraphX ports; quality is measured separately by the
engine's modularity query).

The gain of moving v into community C (with v removed from its own),
ΔQ ∝ k_{v,C}/m − deg_v·Σtot(C∖v)/(2m²), is compared via the scaled
INTEGER score  2m·k_{v,C} − deg_v·(Σtot(C) − deg_v·[C = cur(v)])  — all
BIGINT, no float accumulation, so a SQL twin reproduces every round
bit-for-bit (the engine's deterministic-tie-break discipline, same as
label propagation).

Scale: one round = three hash joins over the pinned edge table (labels
onto dst for k_{v,C}; degree and community-total lookups) and two grouped
sums; the argmax is a grouped max over a struct (score, −label) — no
window sort.  State is one (id, label) row per vertex, lineage truncated
per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .gcommon import norm_edges


def louvain_sync(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    num_rounds: int = 4,
    partitions: int | None = None,
) -> DataFrame:
    """Run ``num_rounds`` synchronous modularity-gain label updates over the
    undirected simple graph; returns (id, label).  Starts from singleton
    communities (label = id)."""
    spark = edges.sparkSession
    P = int(partitions or spark.conf.get("spark.sql.shuffle.partitions"))

    e = norm_edges(edges, P, directed=False)  # symmetric: 2m rows
    m2 = e.count()  # = 2m
    deg = e.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("deg")
    ).repartition(P, "id").persist()
    deg.count()

    if vertices is None:
        vertices = deg.select("id")
    labels = (
        vertices.select("id", F.col("id").alias("label"))
        .repartition(P, "id")
        .localCheckpoint(eager=True)
    )

    for _ in range(num_rounds):
        # Σtot(C): total degree of each community (vertices with no edges
        # contribute 0 and always stay singleton)
        tot = (
            labels.join(deg.hint("shuffle_hash"), "id")
            .groupBy("label")
            .agg(F.sum("deg").alias("tot"))
        )
        # k_{v,C}: edges from v into community C, via the dst's label
        kvc = (
            e.join(
                labels.select(F.col("id").alias("dst"),
                              F.col("label").alias("clab")).hint("shuffle_hash"),
                "dst",
            )
            .groupBy(F.col("src").alias("id"), "clab")
            .agg(F.count(F.lit(1)).alias("kvc"))
        )
        # the current community is always a candidate (k may be 0 there)
        cand = kvc.unionByName(
            labels.select("id", F.col("label").alias("clab"),
                          F.lit(0).cast("long").alias("kvc"))
        ).groupBy("id", "clab").agg(F.sum("kvc").alias("kvc"))
        scored = (
            cand.join(labels.withColumnRenamed("label", "cur").hint("shuffle_hash"),
                      "id")
            .join(deg.hint("shuffle_hash"), "id", "left")
            # left: an isolated vertex's singleton community never appears
            # in tot (no degree-carrying members) — Σtot is 0 there
            .join(tot.withColumnRenamed("label", "clab").hint("shuffle_hash"),
                  "clab", "left")
            .select(
                "id", "clab",
                (
                    F.lit(m2) * F.col("kvc")
                    - F.coalesce(F.col("deg"), F.lit(0))
                    * (
                        F.coalesce(F.col("tot"), F.lit(0))
                        - F.when(F.col("clab") == F.col("cur"),
                                 F.coalesce(F.col("deg"), F.lit(0)))
                        .otherwise(F.lit(0))
                    )
                ).alias("score"),
            )
        )
        labels = (
            scored.groupBy("id")
            .agg(
                (-F.max(F.struct(F.col("score"), (-F.col("clab")).alias("nl")))
                 .getField("nl")).alias("label")
            )
            .repartition(P, "id")
            .localCheckpoint(eager=True)
        )

    e.unpersist()
    deg.unpersist()
    return labels
