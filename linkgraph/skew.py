"""Hub detection + explicit salted joins for skewed vertices.

North-rule requirement: skewed hub vertices are handled with salted/split
high-degree partitions (beyond AQE's runtime skew-join).  The pattern: the
big fact side (edges) gets a salt column spreading each hub key across S
shards; the small dim side (per-vertex state) is exploded S ways for hub
keys only, then the join runs on (key, salt).  Aggregations after the join
re-combine, so results are provably identical with salting on/off (tested).

The reference's analogue is the random vertex relabel for load balance
(/root/reference/src/Graph.cpp:125-156) — necessary there because of static
range partitioning; here we salt only the heavy keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hub_ids(degrees: DataFrame, threshold: int, degree_col: str = "degree") -> DataFrame:
    """(id) vertices whose degree exceeds the threshold."""
    return degrees.filter(F.col(degree_col) > threshold).select("id")


def salt_edges(edges: DataFrame, hubs: DataFrame, key: str, num_salts: int) -> DataFrame:
    """Add a ``_salt`` column: hash-spread for hub keys, 0 otherwise.

    The salt is derived from the *other* endpoint so it is deterministic
    (resume-safe) and spreads a hub's edges uniformly across shards.
    """
    other = "dst" if key == "src" else "src"
    h = F.broadcast(hubs.select(F.col("id").alias(key)).withColumn("_is_hub", F.lit(True)))
    return (
        edges.join(h, key, "left")
        .withColumn(
            "_salt",
            F.when(
                F.col("_is_hub").isNotNull(),
                F.pmod(F.xxhash64(F.col(other)), F.lit(num_salts)).cast("int"),
            ).otherwise(F.lit(0)),
        )
        .drop("_is_hub")
    )


def salt_state(state: DataFrame, hubs: DataFrame, key: str, num_salts: int) -> DataFrame:
    """Replicate hub rows of a per-vertex state table across all salts."""
    h = F.broadcast(hubs.select(F.col("id").alias(key)).withColumn("_is_hub", F.lit(True)))
    return (
        state.join(h, key, "left")
        .withColumn(
            "_salts",
            F.when(
                F.col("_is_hub").isNotNull(),
                F.sequence(F.lit(0), F.lit(num_salts - 1)),
            ).otherwise(F.array(F.lit(0))),
        )
        .withColumn("_salt_raw", F.explode("_salts"))
        .withColumn("_salt", F.col("_salt_raw").cast("int"))
        .drop("_is_hub", "_salts", "_salt_raw")
    )


def salted_join(big: DataFrame, small: DataFrame, key: str, hubs: DataFrame,
                num_salts: int, how: str = "inner") -> DataFrame:
    """Join ``big`` (edges) with ``small`` (vertex state) on ``key``,
    splitting hub keys across ``num_salts`` shards.  Returns the joined
    frame without the salt column."""
    b = salt_edges(big, hubs, key, num_salts)
    s = salt_state(small, hubs, key, num_salts)
    return b.join(s, [key, "_salt"], how).drop("_salt")
