"""spark-submit entry point: ``spark-submit --py-files linkgraph.zip
tools/submit_job.py <job> ...`` (north rule's launch mode), or locally
``python -m linkgraph.cli <job> ...``.

Jobs: ingest (pages -> edge table), pagerank, components,
components-star, labelprop, triangles, scc, bfs, sssp, corenums,
closeness, walks.  Inputs/outputs go through the io.py seam, so each accepts a
Parquet path or an Iceberg/catalog table name.

Under spark-submit the cluster's master/conf are respected (the builder
only supplies pinned SQL configs); under plain ``python`` the session
falls back to ``local[$SPARK_GRAFT_CPUS]`` via session.get_spark.
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark import SparkConf
from pyspark.sql import SparkSession

from . import io as lgio
from .session import get_spark


def _spark(args) -> SparkSession:
    if SparkConf().contains("spark.master"):  # launched via spark-submit
        b = (
            SparkSession.builder.appName(f"linkgraph-{args.job}")
            .config("spark.sql.adaptive.enabled", "true")
            .config("spark.sql.adaptive.skewJoin.enabled", "true")
            .config("spark.sql.session.timeZone", "UTC")
            .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        )
        if args.partitions:
            b = b.config("spark.sql.shuffle.partitions", str(args.partitions))
        return b.getOrCreate()
    return get_spark(f"linkgraph-{args.job}",
                     shuffle_partitions=args.partitions or None)


def main(argv: list[str] | None = None) -> dict:
    p = argparse.ArgumentParser(prog="linkgraph")
    p.add_argument("job", choices=["ingest", "pagerank", "components",
                                   "components-star", "labelprop", "triangles",
                                   "scc", "bfs", "sssp", "corenums",
                                   "closeness", "walks"])
    p.add_argument("--input", required=True,
                   help="pages table (ingest) or edge table (algorithms); "
                        "parquet path or catalog table name")
    p.add_argument("--output", help="result table/path (parquet or catalog)")
    p.add_argument("--partitions", type=int, default=0)
    p.add_argument("--checkpoint-dir", default=None)
    p.add_argument("--damping", type=float, default=0.85)
    p.add_argument("--tol", type=float, default=1e-6)
    p.add_argument("--max-iter", type=int, default=100)
    p.add_argument("--metrics-out", default=None,
                   help="write per-superstep metrics JSON here")
    p.add_argument("--sources", default="0",
                   help="comma-separated source vertex ids (bfs/sssp/closeness)")
    p.add_argument("--weight-col", default="weight")
    p.add_argument("--directed", action="store_true")
    p.add_argument("--walk-length", type=int, default=10)
    args = p.parse_args(argv)
    spark = _spark(args)
    P = args.partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))

    summary: dict = {"job": args.job, "input": args.input}
    if args.job == "ingest":
        from .ingest import ingest_pages

        pages = lgio.read_pages(spark, args.input)
        vmap, edges = ingest_pages(pages, partitions=P)
        if args.output:
            lgio.write_table(edges, args.output, buckets=P, bucket_cols=["src"])
            lgio.write_table(vmap, args.output.rstrip("/") + "_vertices")
        summary["num_edges"] = edges.count()
        summary["num_vertices"] = vmap.count()
    else:
        edges = lgio.read_edges(spark, args.input)
        if args.job == "pagerank":
            from .algos.pagerank import pagerank

            ranks, metrics = pagerank(
                edges, damping=args.damping, tol=args.tol,
                max_iter=args.max_iter, partitions=P,
                checkpoint_dir=args.checkpoint_dir,
            )
            out, summary["iterations"] = ranks, len(metrics)
            summary["final_l1_delta"] = metrics[-1]["l1_delta"] if metrics else None
        elif args.job == "components":
            from .algos.components import connected_components

            out, metrics = connected_components(
                edges, partitions=P, checkpoint_dir=args.checkpoint_dir,
                max_iter=args.max_iter,
            )
            summary["iterations"] = len(metrics)
        elif args.job == "labelprop":
            from .algos.labelprop import label_propagation

            out, metrics = label_propagation(
                edges, partitions=P, checkpoint_dir=args.checkpoint_dir,
                max_iter=min(args.max_iter, 20),
            )
            summary["iterations"] = len(metrics)
        elif args.job == "components-star":
            from .algos.components import connected_components_star

            out = connected_components_star(edges, partitions=P)
            metrics = []
        elif args.job == "scc":
            from .algos.scc import strongly_connected_components

            out, metrics = strongly_connected_components(edges, partitions=P)
            summary["rounds"] = len(metrics)
        elif args.job in ("bfs", "sssp", "closeness"):
            from .algos import paths as _paths

            srcs = spark.createDataFrame(
                [(int(x),) for x in args.sources.split(",")], "id long"
            )
            if args.job == "bfs":
                out, metrics = _paths.bfs_distances(
                    edges, srcs, directed=args.directed, partitions=P,
                    max_iter=args.max_iter,
                )
            elif args.job == "sssp":
                out, metrics = _paths.sssp_distances(
                    edges, srcs, weight_col=args.weight_col,
                    directed=args.directed, partitions=P,
                    max_iter=args.max_iter,
                )
            else:
                out = _paths.closeness_centrality(
                    edges, srcs, directed=args.directed, partitions=P,
                    max_iter=args.max_iter,
                )
                metrics = []
            if metrics:
                summary["iterations"] = len(metrics)
        elif args.job == "corenums":
            from .algos.kcore import core_numbers

            out, metrics = core_numbers(edges, partitions=P)
            summary["rounds"] = len(metrics)
        elif args.job == "walks":
            from .algos.paths import random_walks

            srcs = spark.createDataFrame(
                [(int(x),) for x in args.sources.split(",")], "id long"
            )
            out = random_walks(edges, srcs, length=args.walk_length,
                               directed=args.directed, partitions=P)
            metrics = []
        else:  # triangles
            from .algos.triangles import triangle_count

            summary["triangles"] = triangle_count(edges)
            metrics, out = [], None
        if args.output and out is not None:
            lgio.write_table(out, args.output)
            summary["output"] = args.output
        if args.metrics_out and metrics:
            with open(args.metrics_out, "w") as f:
                json.dump(metrics, f, indent=1)
    print(json.dumps(summary))
    return summary


if __name__ == "__main__":
    main(sys.argv[1:])
