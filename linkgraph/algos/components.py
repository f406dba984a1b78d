"""Connected components via iterative min-label propagation (north rule).

Undirected view of the edge table; every vertex starts labeled with its own
id; each superstep takes the min over {own label} ∪ {neighbor labels};
terminates when no label changes.  Converges in O(diameter) supersteps;
each superstep joins the V-row label state against pinned CSR-style
adjacency blocks (pagerank.adjacency_blocks: hubs split/salted, join keys
~V rows not E) and takes one map-side-combined grouped min.

Exactness gate: labels equal the BFS oracle exactly (label = min vertex id
in the component) — the analogue of the reference's exact counters in
/root/reference/naive_implementation/.
"""

from __future__ import annotations

import gc
import time

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from ..ckpt import CheckpointManager
from .pagerank import adjacency_blocks


def connected_components(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    max_iter: int = 100,
    partitions: int | None = None,
    checkpoint_dir: str | None = None,
) -> tuple[DataFrame, list[dict]]:
    """Returns (labels(id, component), per-iteration metrics)."""
    spark = edges.sparkSession
    P = int(partitions or spark.conf.get("spark.sql.shuffle.partitions"))

    if vertices is None:
        vertices = (
            edges.select(F.col("src").alias("id"))
            .union(edges.select(F.col("dst").alias("id")))
            .distinct()
        )
    v = vertices.select("id").repartition(P, "id").persist()

    sym = (
        edges.select("src", "dst")
        .union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .filter(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
    )
    # CSR-style adjacency blocks (see pagerank.adjacency_blocks): the
    # per-superstep join touches ~V block rows instead of E edge rows;
    # hub vertices split/salted across blocks
    blocks, salt_map = adjacency_blocks(sym, P)
    E = int(blocks.agg(F.sum(F.size("dsts"))).collect()[0][0] or 0)

    ckpt = CheckpointManager(checkpoint_dir) if checkpoint_dir else None
    metrics: list[dict] = []
    start_iter = 0
    if ckpt is not None and (last := ckpt.latest()) is not None:
        labels, _ = ckpt.load(spark, last)
        labels = labels.repartition(P, "id").localCheckpoint(eager=True)
        metrics = ckpt.history()
        start_iter = last + 1
    else:
        labels = v.select("id", F.col("id").alias("component")).localCheckpoint(eager=True)

    for it in range(start_iter, max_iter):
        t0 = time.time()
        # blocks keep their pinned (src, salt) partitioning; only the V-row
        # label state shuffles, then one map-side-combined grouped min
        lab_src = labels.select(F.col("id").alias("src"), "component")
        if salt_map is None:
            # hub-free: blocks carry no salt column (src-partitioned)
            j = blocks.join(lab_src.hint("shuffle_hash"), "src")
        else:
            lab_salted = lab_src.join(
                salt_map.hint("shuffle_hash"), "src"
            ).select("src", "component", F.explode("salts").alias("salt"))
            j = blocks.join(lab_salted.hint("shuffle_hash"), ["src", "salt"])
        nb_min = (
            j.select(F.explode("dsts").alias("id"), "component")
            .groupBy("id")
            .agg(F.min("component").alias("nb_component"))
        )
        obs = Observation(f"cc_changes_{it}")
        updated = (
            labels.join(nb_min.hint("shuffle_hash"), "id", "left")
            .select(
                "id",
                F.least(
                    F.col("component"), F.coalesce("nb_component", F.col("component"))
                ).alias("component"),
                (F.col("nb_component") < F.col("component")).alias("_changed"),
            )
            .repartition(P, "id")
            # change count piggy-backs on the checkpoint job (one job/superstep)
            .observe(obs, F.coalesce(
                F.sum(F.col("_changed").cast("long")), F.lit(0)).alias("c"))
            .localCheckpoint(eager=True)
        )
        changes = int(obs.get["c"])
        new_labels = updated.select("id", "component")
        secs = time.time() - t0
        m = {
            "iteration": it,
            "labels_changed": int(changes),
            "seconds": secs,
            "edges_processed": E,
            "edges_per_sec": E / secs if secs > 0 else None,
            "num_partitions": P,
        }
        metrics.append(m)
        if ckpt is not None:
            ckpt.save(it, new_labels, m)
        labels = new_labels
        gc.collect()  # release prior superstep's checkpoint RDD + shuffles
        if changes == 0:
            break

    v.unpersist()
    blocks.unpersist()
    if salt_map is not None:
        salt_map.unpersist()
    return labels, metrics
