"""Graph file-format sources/sinks mirroring the reference's formats.

Reference formats (SURVEY.md §1.2):
  * ``.edgelist`` — ASCII, first line ``V E`` header, then ``src dst`` pairs
    (/root/reference/datasets/simple-10/scripts/main.cpp:23-37).
  * ``.biedgelist`` — headerless packed binary, 2 x uint32 per edge
    (3 x uint32 when weighted); edge count = file_size / record_size
    (/root/reference/src/Graph.cpp:400-402;
     writer /root/reference/datasets/toolkits/edgelist_to_biedgelist.cpp:34-38).
  * per-node ASCII partition files ``M N\\nu v...`` sorted by src
    (/root/reference/sampling/Graph.cpp:36-83) — subsumed by the edgelist
    reader (the header is skipped the same way).

Spark-first design: the ASCII path is ``spark.read.csv`` (JVM-side parse,
splittable); the binary path reads via ``binaryFiles`` + numpy frombuffer in
``mapInPandas``-style batches — one record-array decode per file chunk, no
per-row Python.  At 100 TB one would convert to parquet once and never
re-read the legacy format; these sources exist for ingest parity.
"""

from __future__ import annotations

import os
import shutil
import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EDGE_SCHEMA = "src long, dst long"
WEDGE_SCHEMA = "src long, dst long, weight long"


def read_edgelist(spark: SparkSession, path: str) -> DataFrame:
    """Read an ASCII `.edgelist` (``V E`` header line, then ``src dst``)."""
    raw = spark.read.csv(path, sep=" ", schema="c0 long, c1 long, c2 long")
    # the header row is the only row whose (c0,c1) are the counts; drop it by
    # position: monotonically_increasing_id is 0 for the first row of the
    # first partition — robust here because the header is line 1 of file 1.
    with_idx = raw.withColumn("_i", F.monotonically_increasing_id())
    first = with_idx.orderBy("_i").limit(1)
    body = with_idx.join(first.select("_i"), "_i", "left_anti")
    if "c2" in raw.columns and raw.select(F.max("c2")).first()[0] is not None:
        return body.select(
            F.col("c0").alias("src"), F.col("c1").alias("dst"),
            F.col("c2").alias("weight"),
        )
    return body.select(F.col("c0").alias("src"), F.col("c1").alias("dst"))


def edgelist_meta(path: str) -> tuple[int, int]:
    """Parse the ``V E`` header (the reference's load_graph_meta_data,
    /root/reference/src/Utilities.cpp:25-37)."""
    with open(path) as f:
        v, e = f.readline().split()
    return int(v), int(e)


def write_edgelist(edges: DataFrame, path: str, num_vertices: int) -> None:
    """Write a single ASCII edgelist file with the ``V E`` header
    (driver-side collect — byte-exact single-file parity fixture only;
    the scale sink is :func:`write_edgelist_sharded`)."""
    rows = edges.select("src", "dst").collect()
    with open(path, "w") as f:
        f.write(f"{num_vertices} {len(rows)}\n")
        for r in rows:
            f.write(f"{r['src']} {r['dst']}\n")


def write_edgelist_sharded(
    edges: DataFrame, dir_path: str, num_vertices: int
) -> None:
    """Distributed ASCII edgelist sink: executors write the edge body as
    sharded text (``df.write.text`` — fully parallel, no driver collect);
    the 2-integer ``V E`` header lands in a sidecar ``_meta`` file (Spark's
    own _SUCCESS-marker pattern) because a header line inside shard 0 would
    serialize the whole write through one task."""
    body = edges.select(
        F.concat_ws(" ", F.col("src").cast("string"),
                    F.col("dst").cast("string")).alias("value")
    )
    body.write.mode("overwrite").text(dir_path)
    n = edges.count()
    with open(os.path.join(dir_path, "_meta"), "w") as f:
        f.write(f"{num_vertices} {n}\n")


def read_edgelist_sharded(spark: SparkSession, dir_path: str) -> DataFrame:
    """Read a sharded edgelist directory written by write_edgelist_sharded."""
    raw = spark.read.csv(
        os.path.join(dir_path, "part-*"), sep=" ", schema="c0 long, c1 long"
    )
    return raw.select(F.col("c0").alias("src"), F.col("c1").alias("dst"))


def edgelist_sharded_meta(dir_path: str) -> tuple[int, int]:
    with open(os.path.join(dir_path, "_meta")) as f:
        v, e = f.readline().split()
    return int(v), int(e)


def read_biedgelist(
    spark: SparkSession, path: str, weighted: bool = False
) -> DataFrame:
    """Read packed-binary edges (2 or 3 little-endian uint32 per record).

    Files land as whole blobs (binaryFiles); each decodes with ONE numpy
    frombuffer — vectorized, no per-edge Python.  Edge count derives from
    byte length exactly like the reference (/root/reference/src/Graph.cpp:400-402).
    """
    width = 3 if weighted else 2
    schema = WEDGE_SCHEMA if weighted else EDGE_SCHEMA

    def decode(iterator):
        for pdf in iterator:
            for content in pdf["content"]:
                arr = np.frombuffer(content, dtype="<u4").reshape(-1, width)
                out = {"src": arr[:, 0].astype("int64"),
                       "dst": arr[:, 1].astype("int64")}
                if weighted:
                    out["weight"] = arr[:, 2].astype("int64")
                yield pd.DataFrame(out)

    files = spark.read.format("binaryFile").load(path).select("content")
    return files.mapInPandas(decode, schema=schema)


def write_biedgelist(edges: DataFrame, path: str, weighted: bool = False) -> None:
    """Write a single packed-binary edge file (driver-side collect —
    byte-exact single-file parity fixture only; the scale sink is
    :func:`write_biedgelist_sharded`)."""
    cols = ["src", "dst", "weight"] if weighted else ["src", "dst"]
    rows = edges.select(*cols).collect()
    fmt = "<" + "I" * len(cols)
    with open(path, "wb") as f:
        for r in rows:
            f.write(struct.pack(fmt, *[int(r[c]) for c in cols]))


def write_biedgelist_sharded(
    edges: DataFrame, dir_path: str, weighted: bool = False
) -> None:
    """Distributed packed-binary sink: each partition packs its edges with
    ONE vectorized numpy ``tobytes`` (no per-row Python, no driver collect)
    and writes its own ``part-NNNNN.biedgelist`` shard.  Record layout is
    exactly the reference's (2 or 3 little-endian uint32,
    /root/reference/datasets/toolkits/edgelist_to_biedgelist.cpp:34-38), so
    ``read_biedgelist`` on the directory round-trips.  Executors write
    through the mounted filesystem — the same contract as any
    foreachPartition sink; on a real cluster point dir_path at the shared
    store.  The target directory is cleared first (``df.write``'s
    mode='overwrite' semantics): re-writing a dataset with fewer
    partitions must not leave stale part-*.biedgelist shards behind for
    ``read_biedgelist``'s directory glob to silently include."""
    if os.path.isdir(dir_path):
        shutil.rmtree(dir_path)
    os.makedirs(dir_path, exist_ok=True)
    cols = ["src", "dst", "weight"] if weighted else ["src", "dst"]
    width = len(cols)

    def write_part(it):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        bufs = []
        for pdf in it:
            if len(pdf):
                arr = np.ascontiguousarray(
                    pdf[cols].to_numpy(dtype="<u4")
                ).reshape(-1, width)
                bufs.append(arr.tobytes())
        if bufs:
            with open(
                os.path.join(dir_path, f"part-{pid:05d}.biedgelist"), "wb"
            ) as f:
                for b in bufs:
                    f.write(b)
        yield pd.DataFrame({"n": [sum(len(b) for b in bufs) // (4 * width)]})

    counted = edges.select(*cols).mapInPandas(write_part, schema="n long")
    counted.agg(F.sum("n")).collect()  # materialize the write


def densify_ids(edges: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Dedup, drop self-loops, and remap vertex ids to dense 0..V-1 by rank —
    the reference's preprocessing stage
    (/root/reference/datasets/wiki-vote/scripts/process.cpp:31-120).

    Returns (dense_edges(src,dst), mapping(orig_id, id)).  Rank assignment
    delegates to :func:`linkgraph.ingest.dense_ids` (range-partitioned
    two-phase rank + broadcast offsets) — no global single-task window.
    """
    from .ingest import dense_ids

    e = edges.select("src", "dst").filter(F.col("src") != F.col("dst")).distinct()
    ids = (
        e.select(F.col("src").alias("orig_id"))
        .union(e.select(F.col("dst").alias("orig_id")))
        .distinct()
    )
    mapping = dense_ids(ids, "orig_id", partitions=32)
    dense = (
        e.join(mapping.withColumnRenamed("orig_id", "src")
               .withColumnRenamed("id", "new_src"), "src")
        .join(mapping.withColumnRenamed("orig_id", "dst")
              .withColumnRenamed("id", "new_dst"), "dst")
        .select(F.col("new_src").alias("src"), F.col("new_dst").alias("dst"))
    )
    return dense, mapping
