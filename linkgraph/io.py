"""Table IO seam: Iceberg catalog tables when available, Parquet otherwise.

The north rule's production source is an Iceberg table of Common-Crawl-style
web pages ``(url, warc_ts, html, text, lang)``.  The sandbox has no Iceberg
runtime jar, so every reader/writer goes through this seam:

  * a source string containing ``/`` (or ending ``.parquet``) is a Parquet
    path — ``spark.read.parquet``;
  * otherwise it is treated as a catalog table name and read with
    ``spark.read.table`` (works for Iceberg, Hive, or any configured
    catalog; Iceberg needs only the usual spark-submit configs —
    ``--packages org.apache.iceberg:iceberg-spark-runtime-...`` plus
    ``spark.sql.catalog.<name>`` settings — none of which change this code).

Schema is identical either way, so tests exercise the Parquet branch and
the cluster flips to Iceberg by passing a table name (SURVEY.md §7 risk 6).

Replaces the reference's path-hardcoded loaders
(/root/reference/src/Graph.cpp:386-615, /root/reference/sampling/Graph.cpp:36-83).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"
EDGES_SCHEMA = "src long, dst long"


def is_path(source: str) -> bool:
    return "/" in source or source.endswith(".parquet")


def read_table(spark: SparkSession, source: str) -> DataFrame:
    """Read a Parquet path or a catalog (Iceberg) table name."""
    if is_path(source):
        return spark.read.parquet(source)
    return spark.read.table(source)


def read_pages(spark: SparkSession, source: str) -> DataFrame:
    """Web-pages table, projected to the canonical column set (column
    pruning reaches the scan either way)."""
    return read_table(spark, source).select("url", "warc_ts", "html", "text", "lang")


def read_edges(spark: SparkSession, source: str) -> DataFrame:
    return read_table(spark, source).select("src", "dst")


def write_table(
    df: DataFrame,
    target: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    buckets: int = 0,
    bucket_cols: list[str] | None = None,
) -> None:
    """Write to a Parquet path or a catalog (Iceberg) table.

    ``buckets`` > 0 hash-buckets on ``bucket_cols`` — on the table-name
    branch via ``bucketBy`` + ``saveAsTable`` (co-located joins: two tables
    bucketed the same way join without a shuffle); the path branch falls
    back to ``repartition`` so file layout still clusters by key.
    """
    if is_path(target):
        w = df
        if buckets and bucket_cols:
            w = df.repartition(buckets, *bucket_cols)
        writer = w.write.mode(mode)
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(target)
        return
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if buckets and bucket_cols:
        writer = writer.bucketBy(buckets, *bucket_cols).sortBy(*bucket_cols)
    writer.saveAsTable(target)
