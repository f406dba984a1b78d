"""PageRank as iterative DataFrame joins + grouped aggregation.

Semantics: damping 0.85, uniform dangling-mass redistribution, ranks sum
to 1, convergence when the L1 delta < tol.  This is the engine's headline
metric query (BASELINE.json: edges-processed/sec per superstep, wall-time
to 1e-6 convergence).

Scale design:
  * ``links`` (edges ⋈ out-degree) is computed once, hash-partitioned on
    ``src`` (pinned per superstep — the partitioning is reused by every
    iteration's join) and persisted.
  * The per-superstep shuffle is exactly one: re-keying contributions from
    src-partitioning to dst-partitioning inside the groupBy(dst).  The
    rank-contribution sum uses Spark's map-side partial aggregation, which
    already absorbs in-degree hub skew.
  * Out-degree hub skew on the ranks⋈links join is handled with explicit
    salting (skew.salted_join) — edges of hub vertices are split across
    ``num_salts`` shards and the hub's rank row is replicated (north rule).
  * Dangling mass is a 1-row aggregate cross-joined into the update — no
    ``collect()`` in the hot loop; the only action per iteration is the
    eager ``localCheckpoint`` that truncates lineage.
  * Per-iteration checkpoint (parquet + metrics.json) enables mid-algorithm
    resume (ckpt.CheckpointManager).

Reference parity: the superstep loop replaces ZGraph's
OpenMP-reduction + MPI_Allreduce execution (/root/reference/src/ZGraphInstance.cpp:257-297);
partitioning replaces its 1-D vertex-range scheme (/root/reference/src/Graph.cpp:26-111).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..ckpt import CheckpointManager
from .. import skew as _skew


def pagerank(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    damping: float = 0.85,
    tol: float = 1e-6,
    max_iter: int = 200,
    num_iters: int | None = None,
    partitions: int | None = None,
    checkpoint_dir: str | None = None,
    hub_degree_threshold: int | None = None,
    num_salts: int = 8,
    lineage_truncate_every: int = 1,
) -> tuple[DataFrame, list[dict]]:
    """Run PageRank; returns (ranks(id, rank), per-iteration metrics).

    ``num_iters`` forces an exact iteration count (no convergence check) —
    used for fixed-iteration oracle comparisons; otherwise iterate until
    the L1 delta < ``tol`` or ``max_iter``.
    """
    spark = edges.sparkSession
    P = partitions or edges.sparkSession.conf.get("spark.sql.shuffle.partitions")
    P = int(P)

    if vertices is None:
        vertices = (
            edges.select(F.col("src").alias("id"))
            .union(edges.select(F.col("dst").alias("id")))
            .distinct()
        )
    v = vertices.select("id").repartition(P, "id").persist()
    V = v.count()

    out_deg = edges.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("out_degree")
    )
    links = (
        edges.select("src", "dst")
        .join(out_deg.withColumnRenamed("id", "src"), "src")
        .repartition(P, "src")
        .persist()
    )
    links.count()  # materialize once; reused every superstep
    E = edges.count()

    dangling = v.join(out_deg, "id", "left_anti").persist()

    hubs = None
    if hub_degree_threshold is not None:
        hubs = _skew.hub_ids(
            out_deg.withColumnRenamed("out_degree", "degree"), hub_degree_threshold
        ).persist()
        links_salted = _skew.salt_edges(
            links, hubs, "src", num_salts
        ).repartition(P, "src", "_salt").persist()
        links_salted.count()

    ckpt = CheckpointManager(checkpoint_dir) if checkpoint_dir else None
    metrics: list[dict] = []
    start_iter = 0
    if ckpt is not None and (last := ckpt.latest()) is not None:
        ranks, _ = ckpt.load(spark, last)
        ranks = ranks.repartition(P, "id").localCheckpoint(eager=True)
        metrics = ckpt.history()
        start_iter = last + 1
    else:
        ranks = v.select("id", (F.lit(1.0) / V).alias("rank")).localCheckpoint(eager=True)

    total_iters = num_iters if num_iters is not None else max_iter
    it = start_iter
    while it < total_iters:
        t0 = time.time()
        # dangling mass as a lazy 1-row aggregate (no driver round-trip)
        dm = (
            ranks.join(dangling, "id", "left_semi")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dm"))
        )
        src_ranks = ranks.select(F.col("id").alias("src"), "rank")
        if hubs is not None:
            joined = _skew.salt_state(src_ranks, hubs, "src", num_salts).join(
                links_salted, ["src", "_salt"]
            )
        else:
            joined = links.join(src_ranks, "src")
        contribs = (
            joined.select("dst", (F.col("rank") / F.col("out_degree")).alias("contrib"))
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum("contrib").alias("contrib"))
        )
        new_ranks = (
            v.join(contribs, "id", "left")
            .crossJoin(F.broadcast(dm))
            .select(
                "id",
                (
                    F.lit((1.0 - damping) / V)
                    + F.lit(damping)
                    * (F.coalesce(F.col("contrib"), F.lit(0.0)) + F.col("_dm") / V)
                ).alias("rank"),
            )
            .repartition(P, "id")
        )
        truncate = (it + 1) % lineage_truncate_every == 0
        if truncate:
            new_ranks = new_ranks.localCheckpoint(eager=True)

        delta = None
        if num_iters is None:
            delta_row = (
                new_ranks.withColumnRenamed("rank", "new_rank")
                .join(ranks, "id")
                .agg(F.sum(F.abs(F.col("new_rank") - F.col("rank"))).alias("d"))
                .collect()[0]
            )
            delta = float(delta_row["d"])
        secs = time.time() - t0
        m = {
            "iteration": it,
            "l1_delta": delta,
            "seconds": secs,
            "edges_processed": E,
            "edges_per_sec": E / secs if secs > 0 else None,
            "num_partitions": P,
        }
        metrics.append(m)
        if ckpt is not None:
            ckpt.save(it, new_ranks, m)
        ranks = new_ranks
        it += 1
        if delta is not None and delta < tol:
            break

    for df in (v, links, dangling):
        df.unpersist()
    if hubs is not None:
        hubs.unpersist()
        links_salted.unpersist()
    return ranks, metrics
