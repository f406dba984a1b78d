"""Two-cluster-size scaling evidence (north rule: efficiency >= 0.8).

No real cluster exists in this sandbox, so the two "cluster sizes" are two
parallelism levels of the SAME job on the SAME input: a fresh JVM at
local[N] and one at local[4N], shuffle partitions scaled 2x cores each,
running fixed-iteration PageRank over a large derived edge table from
$SPARK_GRAFT_SF_DIR.  Throughput = edges-processed/sec per superstep
(BASELINE.json metric); efficiency = throughput(4N) / (4 x throughput(N)).

Each measurement runs in its own subprocess so JVM/thread-pool sizing is
honest (Spark local mode cannot resize an existing JVM's scheduler).

Usage:
  python tools/run_scaling.py                 # orchestrate N=8 vs 4N=32
  python tools/run_scaling.py --child C P M   # one measurement (internal)

Writes BENCH_SCALING.md at the repo root and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ITERS = int(os.environ.get("SCALING_ITERS", "8"))
MULT = int(os.environ.get("SCALING_EDGE_MULT", "8"))  # derived-graph blow-up
N_SMALL = int(os.environ.get("SCALING_N", "8"))
FACTOR = 4


def derived_edges(spark, sf_dir: str, mult: int, partitions: int):
    """Deterministic large edge table: lineitem x mult replicas, ~V=50k*mult/8."""
    from pyspark.sql import functions as F

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    n = li.count()
    v = max(10_000, (n * mult) // 100)
    rep = li.crossJoin(spark.range(mult).select(F.col("id").alias("_r")))
    s = (
        F.col("l_orderkey").cast("long") * 7919
        + F.col("l_linenumber").cast("long") * 104729
        + F.col("_r") * 31
    ) % v
    d = (F.col("l_partkey").cast("long") * 6271 + F.col("_r") * 17 + 3) % v
    e = (
        rep.select(s.alias("src"), d.alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .repartition(partitions, "src")
        .persist()
    )
    return e, v, e.count()


def child(cores: int, partitions: int, mult: int) -> None:
    from linkgraph.session import get_spark
    from linkgraph.algos import pagerank

    spark = get_spark(
        f"scaling-{cores}", cores=cores, shuffle_partitions=partitions,
        driver_memory="40g",
        # pinned per-superstep partitioning: do NOT let AQE coalesce the
        # iterative shuffles below the configured parallelism (at 100 TB the
        # advisory size would keep P >> cores anyway; at bench scale it
        # collapses P to ~4 and caps parallelism identically in both configs)
        extra_conf={"spark.sql.adaptive.coalescePartitions.enabled": "false"},
    )
    from pyspark.sql import functions as F  # noqa: F401

    edges, v, m = derived_edges(spark, SF_DIR, mult, partitions)
    vertices = spark.range(v).select("id")
    # 2-superstep warm-up (JIT/codegen compile), then the measured run;
    # steady-state average drops the first 2 measured supersteps as well
    pagerank(edges, vertices=vertices, num_iters=2, partitions=partitions)
    t0 = time.time()
    _, metrics = pagerank(
        edges, vertices=vertices, num_iters=ITERS, partitions=partitions
    )
    wall = time.time() - t0
    per_iter = [mm["seconds"] for mm in metrics][2:]
    print(
        "CHILD_RESULT "
        + json.dumps(
            {
                "cores": cores,
                "partitions": partitions,
                "num_vertices": v,
                "num_edges": m,
                "iters": ITERS,
                "wall_s": round(wall, 3),
                "sec_per_superstep": round(sum(per_iter) / len(per_iter), 4),
                "edges_per_sec_per_superstep": round(
                    m / (sum(per_iter) / len(per_iter))
                ),
            }
        )
    )
    spark.stop()


def run_child(cores: int, partitions: int) -> dict:
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--child",
         str(cores), str(partitions), str(MULT)],
        capture_output=True, text=True, cwd=REPO, timeout=3600,
    )
    for line in out.stdout.splitlines():
        if line.startswith("CHILD_RESULT "):
            return json.loads(line[len("CHILD_RESULT "):])
    sys.stderr.write(out.stdout[-3000:] + "\n" + out.stderr[-3000:])
    raise RuntimeError(f"child local[{cores}] produced no result")


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]))
        return

    small = run_child(N_SMALL, 2 * N_SMALL)
    big = run_child(N_SMALL * FACTOR, 2 * N_SMALL * FACTOR)
    eff = big["edges_per_sec_per_superstep"] / (
        FACTOR * small["edges_per_sec_per_superstep"]
    )
    result = {
        "metric": "PageRank scaling efficiency (local[N] vs local[4N], same input)",
        "sf_dir": SF_DIR,
        "N": small,
        "4N": big,
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
        "pass": eff >= 0.8,
    }
    print(json.dumps(result))

    md = f"""# BENCH_SCALING — two-parallelism-level throughput evidence

North rule: scaling efficiency (throughput at 4N / 4x throughput at N) >= 0.8.
No real cluster exists in this sandbox, so the two cluster sizes are two
fresh-JVM parallelism levels of the same PageRank job on the same derived
edge table ({big["num_edges"]:,} edges, {big["num_vertices"]:,} vertices,
from `{SF_DIR}`), shuffle partitions pinned at 2x cores.

| config | cores | shuffle partitions | sec/superstep | edges/sec/superstep |
|---|---|---|---|---|
| local[{small["cores"]}] | {small["cores"]} | {small["partitions"]} | {small["sec_per_superstep"]} | {small["edges_per_sec_per_superstep"]:,} |
| local[{big["cores"]}] | {big["cores"]} | {big["partitions"]} | {big["sec_per_superstep"]} | {big["edges_per_sec_per_superstep"]:,} |

**Scaling efficiency = {big["edges_per_sec_per_superstep"]:,} / (4 x {small["edges_per_sec_per_superstep"]:,}) = {eff:.3f}** (target >= 0.8: {"PASS" if eff >= 0.8 else "FAIL"})

Measured {small["iters"]} supersteps after a 1-superstep JIT warm-up; each
config in its own JVM (`python tools/run_scaling.py`).
"""
    with open(os.path.join(REPO, "BENCH_SCALING.md"), "w") as f:
        f.write(md)


if __name__ == "__main__":
    main()
