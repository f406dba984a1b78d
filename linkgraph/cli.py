"""spark-submit entry point: ``spark-submit --py-files linkgraph.zip
tools/submit_job.py <job> ...`` (north rule's launch mode), or locally
``python -m linkgraph.cli <job> ...``.

Jobs: ingest (pages -> edge table), pagerank, components, labelprop,
triangles.  Inputs/outputs go through the io.py seam, so each accepts a
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
                                   "labelprop", "triangles"])
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
