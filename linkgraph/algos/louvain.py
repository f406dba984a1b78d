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


def louvain_multilevel(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    rounds_level1: int = 4,
    rounds_level2: int = 4,
    partitions: int | None = None,
) -> DataFrame:
    """Two-level Louvain: synchronous local-move phase, community-contraction
    (quotient graph with integer edge weights), then a second synchronous
    local-move phase on the weighted coarse graph; returns the original
    vertices with their final (level-2) community label.

    This is the full Louvain lifecycle (Blondel et al.'08) in its
    deterministic synchronous form: the contraction keeps self-loop weight
    inside the coarse vertex's weighted degree (so Σtot and 2m are
    preserved exactly — m2 of the quotient graph equals m2 of the input),
    while the gain's k_{v,C} sums only cross-community coarse edges (the
    self-loop term is choice-invariant).  All quantities stay BIGINT —
    weights are edge multiplicities — so every round is bit-equal across
    engines (same integer-score discipline as ``louvain_sync``).

    Scale: the contraction is two hash joins + one grouped count; the
    coarse graph is typically orders of magnitude smaller than E (web
    graphs: ~100x), so level-2 rounds run on a contracted table.  State is
    one row per coarse vertex, lineage truncated per round.
    """
    spark = edges.sparkSession
    P = int(partitions or spark.conf.get("spark.sql.shuffle.partitions"))

    labels0 = louvain_sync(edges, vertices=vertices,
                           num_rounds=rounds_level1, partitions=P)
    labels0 = labels0.repartition(P, "id").persist()
    labels0.count()

    e = norm_edges(edges, P, directed=False)  # symmetric, 2m rows
    # quotient graph: symmetric weighted coarse edges incl. self-loops
    ce = (
        e.join(labels0.select(F.col("id").alias("src"),
                              F.col("label").alias("ls")).hint("shuffle_hash"),
               "src")
        .join(labels0.select(F.col("id").alias("dst"),
                             F.col("label").alias("ld")).hint("shuffle_hash"),
              "dst")
        .groupBy(F.col("ls").alias("s"), F.col("ld").alias("d"))
        .agg(F.count(F.lit(1)).alias("w"))
        .repartition(P, "s")
        .persist()
    )
    m2 = ce.agg(F.sum("w")).collect()[0][0] or 0
    cdeg = (
        ce.groupBy(F.col("s").alias("id"))
        .agg(F.sum("w").alias("deg"))
        .repartition(P, "id")
        .persist()
    )
    cverts = labels0.select(F.col("label").alias("id")).distinct()
    clabels = (
        cverts.select("id", F.col("id").alias("label"))
        .repartition(P, "id")
        .localCheckpoint(eager=True)
    )
    cross = ce.filter(F.col("s") != F.col("d"))
    for _ in range(rounds_level2):
        tot = (
            clabels.join(cdeg.hint("shuffle_hash"), "id")
            .groupBy("label")
            .agg(F.sum("deg").alias("tot"))
        )
        kvc = (
            cross.join(
                clabels.select(F.col("id").alias("d"),
                               F.col("label").alias("clab")).hint("shuffle_hash"),
                "d",
            )
            .groupBy(F.col("s").alias("id"), "clab")
            .agg(F.sum("w").alias("kvc"))
        )
        cand = kvc.unionByName(
            clabels.select("id", F.col("label").alias("clab"),
                           F.lit(0).cast("long").alias("kvc"))
        ).groupBy("id", "clab").agg(F.sum("kvc").alias("kvc"))
        scored = (
            cand.join(clabels.withColumnRenamed("label", "cur").hint("shuffle_hash"),
                      "id")
            .join(cdeg.hint("shuffle_hash"), "id", "left")
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
        clabels = (
            scored.groupBy("id")
            .agg(
                (-F.max(F.struct(F.col("score"), (-F.col("clab")).alias("nl")))
                 .getField("nl")).alias("label")
            )
            .repartition(P, "id")
            .localCheckpoint(eager=True)
        )

    out = (
        labels0.join(
            clabels.select(F.col("id").alias("label"),
                           F.col("label").alias("flabel")).hint("shuffle_hash"),
            "label",
        )
        .select("id", F.col("flabel").alias("label"))
    )
    out = out.repartition(P, "id").localCheckpoint(eager=True)
    e.unpersist()
    ce.unpersist()
    cdeg.unpersist()
    labels0.unpersist()
    return out
