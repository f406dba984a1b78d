"""k-core decomposition by iterative peeling.

Repeatedly remove vertices of undirected degree < k until none remain; the
survivors are the k-core.  Each round is one grouped degree count + one
broadcast-able semi-join filter (the removed set shrinks the edge table);
lineage truncated per round.  Converges in O(peeling depth) rounds; early
exit when a round removes nothing.  New link-graph capability (no
reference analogue); oracle: oracles.kcore_oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def kcore_vertices(
    edges: DataFrame,
    k: int,
    max_rounds: int = 50,
    partitions: int | None = None,
) -> DataFrame:
    """(id) — vertices of the k-core of the undirected simple graph."""
    spark = edges.sparkSession
    P = int(partitions or spark.conf.get("spark.sql.shuffle.partitions"))

    sym = (
        edges.select("src", "dst")
        .union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .filter(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
        .repartition(P, "src")
        .localCheckpoint(eager=True)
    )
    for _ in range(max_rounds):
        keep = (
            sym.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
            .filter(F.col("d") >= k)
            .select("src")
        )
        pruned = (
            sym.join(keep.hint("shuffle_hash"), "src", "left_semi")
            .join(keep.withColumnRenamed("src", "dst").hint("shuffle_hash"),
                  "dst", "left_semi")
            .repartition(P, "src")
            .localCheckpoint(eager=True)
        )
        before = sym.count()
        after = pruned.count()
        sym = pruned
        if after == before:
            break
    return sym.select(F.col("src").alias("id")).distinct()
