"""1-dimensional Weisfeiler–Leman color refinement.

Iteratively refines vertex colors by the multiset of neighbor colors:
``color'(v) = relabel(color(v), sorted multiset of neighbor colors)``.
The stable coloring is a structural fingerprint — two vertices sharing a
final color are 1-WL-indistinguishable — used for template/boilerplate
page-structure dedup and as the classic graph-isomorphism invariant.

Scale design: per-round relabeling is ``xxhash64(color, signature)`` — a
pure column expression, collision-free w.h.p., with NO global sort and NO
window (the round-1 dense_rank relabel moved all V rows through a single
partition every round).  Because hash labels are engine-specific, the
RETURNED colors are canonicalized once at the end to the minimum vertex id
of each color class — a single groupBy + broadcast join back, deterministic
and portable, so the DuckDB oracle (which refines with its own per-round
labels) lands on byte-identical output.  The refinement join/agg structure
(one adjacency⋈state join + one grouped sort_array/collect_list per round,
both partial-aggregable) carries to 10^10 vertices unchanged.

Oracle: the identical refinement computed sequentially (pytest) and a
round-unrolled SQL twin with the same min-id canonicalization (suite).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def wl_refinement(
    edges: DataFrame,
    rounds: int = 3,
    partitions: int | None = None,
) -> DataFrame:
    """Returns ``(id, color)`` after ``rounds`` refinement steps over the
    undirected view of ``edges`` (vertices with ≥1 neighbor).  ``color`` is
    the minimum vertex id sharing the vertex's final WL class."""
    spark = edges.sparkSession
    P = int(partitions or spark.conf.get("spark.sql.shuffle.partitions"))

    und = (
        edges.select("src", "dst")
        .union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .filter(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
        .repartition(P, "src")
        .localCheckpoint(eager=True)
    )
    state = und.select(F.col("src").alias("id")).distinct() \
        .select("id", F.lit(1).cast("long").alias("color"))

    for _ in range(rounds):
        sig = (
            und.join(state.select(F.col("id").alias("dst"),
                                  F.col("color").alias("nc")), "dst")
            .groupBy(F.col("src").alias("id"))
            .agg(F.concat_ws(",", F.sort_array(F.collect_list("nc"))
                             .cast("array<string>")).alias("sig"))
        )
        # hash relabel: equal (old color, signature) -> equal new color;
        # distinct classes collide with prob ~V^2/2^64 (negligible, and any
        # collision would only MERGE classes — caught by the oracle gate)
        state = (
            state.join(sig, "id")
            .select("id", F.xxhash64(F.concat_ws("|", "color", "sig"))
                    .alias("color"))
            .repartition(P, "id")
            .localCheckpoint(eager=True)
        )
    # canonicalize: engine-portable label = min vertex id in the class
    canon = state.groupBy("color").agg(F.min("id").alias("canon"))
    return state.join(F.broadcast(canon), "color") \
        .select("id", F.col("canon").alias("color"))
