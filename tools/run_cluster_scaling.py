"""Two-CLUSTER-SIZE scaling evidence on a real multi-executor cluster.

The north rule asks for ``spark-submit --py-files`` on a multi-executor
cluster at N and 4N executors with throughput scaling efficiency >= 0.8.
This harness runs EXACTLY that, on this box: a Spark STANDALONE cluster
(master + single-core worker JVMs from the /opt/spark distribution), the
PageRank job submitted via ``spark-submit --master spark://... --py-files
linkgraph.zip tools/submit_job.py pagerank ...``, at N and 4N worker
(= executor) JVMs of FIXED shape (1 core, fixed memory) — scaling the
executor COUNT, the thing a real cluster scales, not the thread count of
one JVM.  This removes two confounders of the local[N] simulation
(tools/run_scaling.py): per-JVM thread-pool/GC scaling, and the VM's
single-thread CPU-burst boost that makes local[1] artificially fast.

Per config and rep: fresh worker JVMs, fresh driver, fixed-iteration
PageRank (--tol 0) over the SAME staged parquet edge table, per-superstep
seconds from --metrics-out; steady-state = supersteps after DROP.
Reps are INTERLEAVED round-robin over the two cluster sizes (shared
contention windows); the GATED statistic is the per-config MEDIAN.

Usage:  python tools/run_cluster_scaling.py
Env:    CLUSTER_N (default 2), CLUSTER_REPS (3), CLUSTER_ITERS (12),
        CLUSTER_DROP (4), SCALING_EDGE_MULT (96), SPARK_GRAFT_SF_DIR.
Writes BENCH_CLUSTER_SCALING.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import signal
import statistics
import subprocess
import sys
import time
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SPARK_HOME = os.environ.get("SPARK_HOME", "/opt/spark")
SPARK_CLASS = os.path.join(SPARK_HOME, "bin", "spark-class")
SPARK_SUBMIT = os.path.join(SPARK_HOME, "bin", "spark-submit")
MASTER_URL = "spark://127.0.0.1:7077"
WORK = "/tmp/lg_cluster_scaling"

N = int(os.environ.get("CLUSTER_N", "2"))
REPS = int(os.environ.get("CLUSTER_REPS", "3"))
ITERS = int(os.environ.get("CLUSTER_ITERS", "12"))
DROP = int(os.environ.get("CLUSTER_DROP", "4"))
MULT = int(os.environ.get("SCALING_EDGE_MULT", "96"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
EXEC_MEM = os.environ.get("CLUSTER_EXEC_MEM", "5g")

ENV = dict(
    os.environ,
    SPARK_HOME=SPARK_HOME,
    SPARK_LOCAL_IP="127.0.0.1",
    SPARK_MASTER_HOST="127.0.0.1",
    PYSPARK_PYTHON=sys.executable,
    PYSPARK_DRIVER_PYTHON=sys.executable,
)


def _spawn(args: list[str], log: str) -> subprocess.Popen:
    f = open(log, "w")
    return subprocess.Popen(args, stdout=f, stderr=subprocess.STDOUT, env=ENV)


def _wait_log(log: str, needle: str, timeout: float = 60) -> None:
    t0 = time.time()
    while time.time() - t0 < timeout:
        if os.path.exists(log) and needle in open(log, errors="replace").read():
            return
        time.sleep(0.5)
    raise RuntimeError(f"'{needle}' not seen in {log}")


def stage_input() -> tuple[str, int]:
    """Stage the derived edge table once (identical bytes for every
    config) via the local-mode run_scaling staging path."""
    sys.path.insert(0, os.path.join(REPO, "tools"))
    staged = f"/tmp/lg_scaling_edges_m{MULT}.parquet"
    if not os.path.exists(os.path.join(staged, "_SUCCESS")):
        subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "run_scaling.py"),
             "--prep", str(MULT)],
            cwd=REPO, timeout=3600, check=True, capture_output=True, env=ENV,
        )
    import duckdb

    m = duckdb.sql(f"SELECT count(*) FROM '{staged}/*.parquet'").fetchone()[0]
    return staged, int(m)


def build_zip() -> str:
    z = os.path.join(WORK, "linkgraph.zip")
    with zipfile.ZipFile(z, "w") as zf:
        pkg = os.path.join(REPO, "linkgraph")
        for root, _d, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    zf.write(full, os.path.join(
                        "linkgraph", os.path.relpath(full, pkg)))
    return z


def run_job(workers: int, zip_path: str, staged: str, tag: str) -> list[float]:
    """Start `workers` single-core worker JVMs, submit the PageRank job,
    return steady-state per-superstep seconds, stop the workers."""
    P = 2 * workers
    procs = []
    try:
        for i in range(workers):
            wd = os.path.join(WORK, f"work_{tag}_{i}")
            os.makedirs(wd, exist_ok=True)
            env_line = dict(ENV, SPARK_WORKER_DIR=wd)
            f = open(os.path.join(WORK, f"worker_{tag}_{i}.log"), "w")
            procs.append(subprocess.Popen(
                [SPARK_CLASS, "org.apache.spark.deploy.worker.Worker",
                 MASTER_URL, "--cores", "1", "--memory", EXEC_MEM,
                 "--webui-port", str(8200 + i)],
                stdout=f, stderr=subprocess.STDOUT, env=env_line))
        for i in range(workers):
            _wait_log(os.path.join(WORK, f"worker_{tag}_{i}.log"),
                      "Successfully registered with master")

        metrics = os.path.join(WORK, f"metrics_{tag}.json")
        out = os.path.join(WORK, f"ranks_{tag}.parquet")
        cmd = [
            SPARK_SUBMIT, "--master", MASTER_URL,
            "--conf", f"spark.sql.shuffle.partitions={P}",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.driver.memory=8g",
            "--conf", f"spark.executor.memory={EXEC_MEM}",
            "--conf", "spark.executor.cores=1",
            "--conf", "spark.sql.adaptive.coalescePartitions.enabled=false",
            *(["--conf", "spark.shuffle.compress=false",
               "--conf", "spark.shuffle.spill.compress=false"]
              if os.environ.get("CLUSTER_NO_SHUFFLE_COMPRESS") else []),
            "--py-files", zip_path,
            os.path.join(REPO, "tools", "submit_job.py"),
            "pagerank", "--input", staged, "--output", out,
            "--partitions", str(P),
            "--tol", "0", "--max-iter", str(ITERS),
            "--metrics-out", metrics,
        ]
        r = subprocess.run(cmd, cwd=WORK, capture_output=True, text=True,
                           timeout=3600, env=ENV)
        if r.returncode != 0:
            sys.stderr.write(r.stdout[-2000:] + "\n" + r.stderr[-4000:])
            raise RuntimeError(f"submit failed for {tag}")
        per = [m["seconds"] for m in json.load(open(metrics))]
        return per[DROP:]
    finally:
        for p in procs:
            p.send_signal(signal.SIGTERM)
        for p in procs:
            try:
                p.wait(timeout=20)
            except subprocess.TimeoutExpired:
                p.kill()
        time.sleep(2)


def main() -> None:
    os.makedirs(WORK, exist_ok=True)
    staged, m = stage_input()
    zip_path = build_zip()

    master = _spawn(
        [SPARK_CLASS, "org.apache.spark.deploy.master.Master",
         "--host", "127.0.0.1", "--port", "7077", "--webui-port", "8190"],
        os.path.join(WORK, "master.log"))
    try:
        _wait_log(os.path.join(WORK, "master.log"),
                  "I have been elected leader")

        sizes = [N, 4 * N]
        per_cfg: dict[int, list[list[float]]] = {w: [] for w in sizes}
        for rep in range(REPS):
            for w in sizes:
                steady = run_job(w, zip_path, staged, f"w{w}_r{rep}")
                per_cfg[w].append(steady)
                print(f"rep {rep} workers {w}: "
                      f"{[round(s, 2) for s in steady]}", file=sys.stderr)

        results = []
        for w in sizes:
            sps = [sum(s) / len(s) for s in per_cfg[w]]
            med = statistics.median(sps)
            results.append({
                "executors": w,
                "executor_shape": f"1 core / {EXEC_MEM}",
                "partitions": 2 * w,
                "num_edges": m,
                "iters": ITERS,
                "sec_per_superstep": round(med, 4),
                "mean_sec_per_superstep": round(sum(sps) / len(sps), 4),
                "best_sec_per_superstep": round(min(sps), 4),
                "edges_per_sec_per_superstep": round(m / med),
                "rep_sec_per_superstep": [round(s, 4) for s in sps],
                "reps": len(sps),
            })
        a, b = results
        eff = (b["edges_per_sec_per_superstep"]
               / (4 * a["edges_per_sec_per_superstep"]))
        eff_mean = ((m / b["mean_sec_per_superstep"])
                    / (4 * (m / a["mean_sec_per_superstep"])))
        pair = {
            "N_executors": a["executors"],
            "xN_executors": b["executors"],
            "factor": 4.0,
            "scaling_efficiency": round(eff, 3),
            "scaling_efficiency_mean": round(eff_mean, 3),
            "pass_0_8": eff >= 0.8,
        }
        out = {
            "metric": ("PageRank scaling efficiency, standalone cluster, "
                       "N vs 4N single-core executor JVMs via spark-submit "
                       "--py-files"),
            "sf_dir": SF_DIR,
            "edge_mult": MULT,
            "configs": results,
            "pair": pair,
        }
        print(json.dumps(out))

        rows = "\n".join(
            f"| {r['executors']} × (1 core, {EXEC_MEM}) | {r['partitions']} | "
            f"{r['sec_per_superstep']} | "
            f"{r['edges_per_sec_per_superstep']:,} | "
            f"{r['mean_sec_per_superstep']} | {r['best_sec_per_superstep']} | "
            f"{', '.join(str(x) for x in r['rep_sec_per_superstep'])} |"
            for r in results
        )
        md = f"""# BENCH_CLUSTER_SCALING — N vs 4N executors, real multi-executor cluster

The north rule's literal launch mode: a Spark STANDALONE cluster on this
box (master + single-core worker JVMs from /opt/spark), the PageRank job
submitted with `spark-submit --master {MASTER_URL} --py-files
linkgraph.zip tools/submit_job.py pagerank ...` over the same staged
parquet edge table ({m:,} edges), at {a['executors']} and
{b['executors']} executor JVMs of FIXED shape (1 core, {EXEC_MEM}).
Scaling the executor COUNT — the thing a real cluster scales — removes
the two local[N] confounders (per-JVM thread-pool/GC scaling and the
VM's single-thread CPU-burst boost).  {REPS} interleaved repetitions,
fresh worker+driver JVMs each; steady state drops the first {DROP} of
{ITERS} supersteps; GATED statistic = per-config median.

| cluster size | shuffle partitions | sec/superstep (median, gated) | edges/sec (median) | mean | best | per-rep sec/superstep |
|---|---|---|---|---|---|---|
{rows}

| pair | factor | efficiency (median, gated) | efficiency (mean) | >= 0.8 |
|---|---|---|---|---|
| {a['executors']} -> {b['executors']} executors | 4x | {pair['scaling_efficiency']} | {pair['scaling_efficiency_mean']} | {"PASS" if pair['pass_0_8'] else "FAIL"} |

Reproduce: `python tools/run_cluster_scaling.py` (env: CLUSTER_N,
CLUSTER_REPS, CLUSTER_ITERS, CLUSTER_DROP, CLUSTER_EXEC_MEM,
SCALING_EDGE_MULT, SPARK_GRAFT_SF_DIR).
"""
        with open(os.path.join(REPO, "BENCH_CLUSTER_SCALING.md"), "w") as f:
            f.write(md)
    finally:
        master.send_signal(signal.SIGTERM)
        try:
            master.wait(timeout=20)
        except subprocess.TimeoutExpired:
            master.kill()


if __name__ == "__main__":
    main()
