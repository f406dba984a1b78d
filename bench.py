"""Benchmark harness — headline queries at $SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec", "queries": {...}, "sf": ...,
   "extra": {per-metric detail incl. edges/sec per PageRank superstep}}

The headline metric (BASELINE.json) is edges-processed/sec per PageRank
superstep + wall-time to 1e-6 convergence on the derived link graph.
Scaling-efficiency evidence (N vs 4N cores) is produced by
tools/run_scaling.py (kept out of the per-round bench for runtime).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402


def bench_edges(spark, sf_dir: str, partitions: int):
    """Derived deterministic link graph scaled to the sf: V ~ |lineitem|/30."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    n = li.count()
    v = max(2000, n // 30)
    s = (F.col("l_orderkey").cast("long") * 7 + F.col("l_linenumber").cast("long")) % v
    d = (F.col("l_partkey").cast("long") * 11 + 3) % v
    e = (
        li.select(s.alias("src"), d.alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .repartition(partitions, "src")
        .persist()
    )
    return e, v, e.count()


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    P = int(os.environ.get("SPARK_GRAFT_PARTITIONS", str(2 * cores)))

    from linkgraph.session import get_spark
    from linkgraph.algos import (
        connected_components,
        label_propagation,
        pagerank,
        triangle_count,
    )
    from linkgraph import datagen
    from linkgraph.graph import LinkGraph

    spark = get_spark("linkgraph-bench", cores=cores, shuffle_partitions=P,
                      driver_memory="48g")

    timings: dict[str, float] = {}
    extra: dict = {"cores": cores, "partitions": P}

    edges, v, e_count = bench_edges(spark, sf_dir, P)
    vertices = spark.range(v).select("id")
    extra["num_vertices"] = v
    extra["num_edges"] = e_count

    # 1. PageRank fixed 10 supersteps — headline throughput metric
    t0 = time.time()
    _, metrics = pagerank(edges, vertices=vertices, num_iters=10, partitions=P)
    timings["pagerank_10iter"] = time.time() - t0
    per_iter = [m["seconds"] for m in metrics]
    extra["pagerank_sec_per_superstep"] = sum(per_iter) / len(per_iter)
    extra["pagerank_edges_per_sec_per_superstep"] = e_count / (
        sum(per_iter) / len(per_iter)
    )

    # 2. PageRank to 1e-6 convergence — headline wall-time metric
    t0 = time.time()
    _, cm = pagerank(edges, vertices=vertices, tol=1e-6, max_iter=120, partitions=P)
    timings["pagerank_converge_1e6"] = time.time() - t0
    extra["pagerank_converge_iters"] = len(cm)
    extra["pagerank_final_l1_delta"] = cm[-1]["l1_delta"]

    # 3. Connected components to fixpoint
    t0 = time.time()
    _, ccm = connected_components(edges, vertices=vertices, partitions=P)
    timings["connected_components"] = time.time() - t0
    extra["cc_iters"] = len(ccm)

    # 4. Label propagation, 5 supersteps
    t0 = time.time()
    label_propagation(edges, vertices=vertices, max_iter=5, partitions=P)
    timings["label_propagation_5iter"] = time.time() - t0

    # 5. Exact triangle count
    t0 = time.time()
    tri = triangle_count(edges)
    timings["triangle_count"] = time.time() - t0
    extra["triangles"] = tri

    # 6. Training-data pipeline ops at sf scale
    from linkgraph import suite as _suite

    t0 = time.time()
    n_dup_pairs = _suite.q_minhash_lsh_dedup(spark, sf_dir).count()
    timings["minhash_lsh_dedup"] = time.time() - t0
    extra["minhash_dup_pairs"] = n_dup_pairs

    t0 = time.time()
    _suite.q_ann_lsh_topk(spark, sf_dir).count()
    timings["ann_lsh_topk"] = time.time() - t0

    t0 = time.time()
    _suite.q_stream_hourly(spark, sf_dir).count()
    timings["stream_hourly"] = time.time() - t0

    # 7. Ingest: synthetic pages -> edge table (pandas-UDF outlink extraction)
    n_pages = 20000
    pages = datagen.synth_pages(spark, n_pages, partitions=P)
    t0 = time.time()
    g = LinkGraph.from_pages(pages, partitions=P)
    ingested = g.num_edges()
    timings["ingest_pages_20k"] = time.time() - t0
    extra["ingest_edges"] = ingested
    extra["ingest_pages_per_sec"] = n_pages / timings["ingest_pages_20k"]

    total = sum(timings.values())
    print(
        json.dumps(
            {
                "metric": "link-graph suite wall time (headline: edges/sec per PageRank superstep in extra)",
                "value": round(total, 3),
                "unit": "sec",
                "queries": {k: round(s, 3) for k, s in timings.items()},
                "sf": sf_dir.rstrip("/").split("/")[-1],
                "extra": extra,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
