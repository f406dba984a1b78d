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
  * **Dangling mass needs no join**: with ranks summing to 1, the uniform
    dangling redistribution is a per-vertex constant recoverable from the
    raw update's total mass — S = sum(raw') = 1 - d*dm, so the correction
    is corr = (1 - S)/V, folded lazily into the next superstep.  This
    removes the reference-style dangling semi-join + broadcast job; each
    superstep is ONE heavy job (contrib shuffle + checkpoint) plus a
    V-row scalar aggregate.
  * Per-iteration ``localCheckpoint`` truncates lineage; optional durable
    checkpoint (parquet + metrics.json) enables mid-algorithm resume
    (ckpt.CheckpointManager).

Reference parity: the superstep loop replaces ZGraph's
OpenMP-reduction + MPI_Allreduce execution (/root/reference/src/ZGraphInstance.cpp:257-297);
partitioning replaces its 1-D vertex-range scheme (/root/reference/src/Graph.cpp:26-111).
"""

from __future__ import annotations

import gc
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
    corr = 0.0  # lazy per-vertex additive correction (dangling mass)
    if ckpt is not None and (last := ckpt.latest()) is not None:
        ranks_raw, _ = ckpt.load(spark, last)
        ranks_raw = ranks_raw.repartition(P, "id").localCheckpoint(eager=True)
        metrics = ckpt.history()
        start_iter = last + 1
    else:
        ranks_raw = v.select("id", (F.lit(1.0) / V).alias("rank")).localCheckpoint(
            eager=True
        )

    total_iters = num_iters if num_iters is not None else max_iter
    it = start_iter
    while it < total_iters:
        t0 = time.time()
        # the correction enters through a broadcast 1-row LocalRelation, NOT
        # a literal: the generated code is byte-identical across supersteps,
        # so whole-stage-codegen compiles once and is cache-hit thereafter
        corr_df = spark.createDataFrame([(float(corr),)], "corr double")
        src_ranks = ranks_raw.crossJoin(F.broadcast(corr_df)).select(
            F.col("id").alias("src"), (F.col("rank") + F.col("corr")).alias("rank")
        )
        # SHUFFLE_HASH hint on the per-vertex state side: the persisted edge
        # side keeps its pinned src-partitioning (no exchange, and — unlike
        # sort-merge — no per-superstep sort of E rows); only the V-row state
        # shuffles.  State comes from a checkpoint RDD whose stats are
        # unknown, so without the hint Spark would fall back to SMJ.
        if hubs is not None:
            joined = links_salted.join(
                _skew.salt_state(src_ranks, hubs, "src", num_salts)
                .hint("shuffle_hash"),
                ["src", "_salt"],
            )
        else:
            joined = links.join(src_ranks.hint("shuffle_hash"), "src")
        contribs = (
            joined.select("dst", (F.col("rank") / F.col("out_degree")).alias("contrib"))
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum("contrib").alias("contrib"))
        )
        raw_new = (
            v.join(contribs.hint("shuffle_hash"), "id", "left")
            .select(
                "id",
                (
                    F.lit((1.0 - damping) / V)
                    + F.lit(damping) * F.coalesce(F.col("contrib"), F.lit(0.0))
                ).alias("rank"),
            )
            .repartition(P, "id")
        )
        truncate = (it + 1) % lineage_truncate_every == 0
        if truncate:
            raw_new = raw_new.localCheckpoint(eager=True)

        # dangling correction from total mass: S = 1 - damping * dm
        S = float(
            raw_new.agg(F.sum("rank").alias("s")).collect()[0]["s"]
        )
        corr_new = (1.0 - S) / V

        delta = None
        if num_iters is None:
            delta_row = (
                raw_new.withColumnRenamed("rank", "new_rank")
                .join(ranks_raw, "id")
                .agg(
                    F.sum(
                        F.abs(
                            F.col("new_rank") + F.lit(corr_new)
                            - F.col("rank") - F.lit(corr)
                        )
                    ).alias("d")
                )
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
            "dangling_mass": (1.0 - S) / damping,
        }
        metrics.append(m)
        if ckpt is not None:
            # durable state carries the correction folded in, so resume
            # needs no side-channel
            ckpt.save(
                it,
                raw_new.select("id", (F.col("rank") + F.lit(corr_new)).alias("rank")),
                m,
            )
        ranks_raw = raw_new
        corr = corr_new
        it += 1
        # drop py4j refs to the previous superstep's checkpoint RDD so the
        # ContextCleaner can free its memory and shuffle files — without
        # this, executor memory grows linearly with iterations
        gc.collect()
        if delta is not None and delta < tol:
            break

    ranks = ranks_raw.select("id", (F.col("rank") + F.lit(corr)).alias("rank"))
    for df in (v, links):
        df.unpersist()
    if hubs is not None:
        hubs.unpersist()
        links_salted.unpersist()
    return ranks, metrics
