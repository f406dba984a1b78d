"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (PageRank over the derived link graph) on
/root/testdata/sf0.001.  ``queries()`` / ``oracle_sql()`` — the engine's
operator suite with DuckDB-checkable oracles (see linkgraph/suite.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: derived edge table -> 5-iteration PageRank (id, rank_e8)."""
    from linkgraph import suite

    return suite.q_pagerank5(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from linkgraph import suite

    return {name: fn for name, (fn, _sql) in suite.REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    from linkgraph import suite

    return {
        name: sql for name, (_fn, sql) in suite.REGISTRY.items() if sql is not None
    }
