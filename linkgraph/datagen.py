"""Deterministic synthetic Common-Crawl-style web-pages fixture.

Mirrors the reference's committed micro-dataset convention (V vertices,
~4V random edges, no self-loops, no duplicate links — generation rule as in
/root/reference/datasets/simple-10/scripts/main.cpp:16-43) but produces the
web-page table shape required by BASELINE.json's input_hint:
``(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)``.

Vertex 0 is a hub receiving an inlink from every vertex with ``i % 3 == 0``
(exercises the salted/skew join paths).  All generation is seeded — no
external data.  The ``text`` column is the byte-identical-extraction
invariant target: ``ingest.extract_text`` must recover it exactly from
``html``.
"""

from __future__ import annotations

import datetime as _dt
import hashlib

import numpy as np
import pandas as pd

EPOCH = _dt.datetime(2025, 1, 1, tzinfo=_dt.timezone.utc)


def url_of(i: int) -> str:
    return f"https://site{i // 10}.example/page{i}"


def text_of(i: int) -> str:
    h = hashlib.sha1(url_of(i).encode("utf-8")).hexdigest()[:12]
    return f"page {i} canonical text {h}"


def outlinks_of(num_vertices: int, seed: int = 42) -> list[list[int]]:
    """Adjacency list: ~4 random outlinks per page + the i%3==0 -> 0 hub edge.

    No self-links, no duplicate links per page.  Seeded numpy Generator so
    the graph is a pure function of (num_vertices, seed).
    """
    rng = np.random.default_rng(seed)
    adj: list[list[int]] = []
    for i in range(num_vertices):
        targets: set[int] = set()
        if i % 3 == 0 and i != 0:
            targets.add(0)
        want = int(rng.integers(3, 6))  # ~4 outlinks/page
        # Rejection-sample distinct non-self targets.
        for _ in range(want * 4):
            if len(targets) >= want + (1 if 0 in targets else 0):
                break
            t = int(rng.integers(0, num_vertices))
            if t != i:
                targets.add(t)
        adj.append(sorted(targets))
    return adj


def synth_pages_pdf(num_vertices: int, seed: int = 42) -> pd.DataFrame:
    """Pandas frame of the pages table (html as utf-8 bytes)."""
    adj = outlinks_of(num_vertices, seed)
    rows = []
    for i in range(num_vertices):
        text = text_of(i)
        links = "".join(f'<a href="{url_of(t)}">link</a>' for t in adj[i])
        html = f"<html><body><p>{text}</p>{links}</body></html>".encode("utf-8")
        rows.append(
            {
                "url": url_of(i),
                "warc_ts": EPOCH + _dt.timedelta(seconds=137 * i),
                "html": html,
                "text": text,
                "lang": "de" if i % 10 == 3 else "en",
            }
        )
    return pd.DataFrame(rows)


def synth_pages(spark, num_vertices: int, seed: int = 42, partitions: int = 8):
    """Spark DataFrame of the pages table with the input_hint schema."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("warc_ts", T.TimestampType(), False),
            T.StructField("html", T.BinaryType(), False),
            T.StructField("text", T.StringType(), False),
            T.StructField("lang", T.StringType(), False),
        ]
    )
    pdf = synth_pages_pdf(num_vertices, seed)
    return spark.createDataFrame(pdf, schema=schema).repartition(partitions)


def expected_edges(num_vertices: int, seed: int = 42) -> list[tuple[int, int]]:
    """Ground-truth directed edge list (src, dst) in generator vertex ids."""
    adj = outlinks_of(num_vertices, seed)
    return [(i, t) for i, ts in enumerate(adj) for t in ts]


# ---------------------------------------------------------------------------
# R-MAT synthetic graph generator (Chakrabarti et al., SDM 2004) —
# deterministic arithmetic-hash quadrant choices, so the SAME edge list is
# reproducible in any engine from pure integer expressions (no RNG state).
# Embarrassingly parallel: edge i is a function of i alone — spark.range(E)
# partitions generate independently with zero shuffle, which is how the
# engine would materialize a 10^12-edge benchmark graph in-cluster.
# Quadrant split (a,b,c,d) = (0.57, 0.19, 0.19, 0.05) via integer
# thresholds on h % 10000: the canonical web-graph-skew parameters.
# ---------------------------------------------------------------------------

RMAT_A1 = 2_654_435_761  # Knuth multiplicative hash
RMAT_A2 = 40_503
RMAT_C = 97
RMAT_M = (1 << 31) - 1
RMAT_T = (5700, 7600, 9500)  # cumulative a, a+b, a+b+c out of 10000


def rmat_quadrant(i: int, level: int) -> int:
    """0..3 quadrant for edge i at recursion level (pure integer hash).

    The level multiplies AFTER the first mod, so per-level choices decorrelate
    (additive level offsets collapse the edge set); intermediates stay
    < 2^31 · 6e5 — no BIGINT overflow under ANSI mode in either engine."""
    h = ((i * RMAT_A1 + RMAT_C) % RMAT_M * (level * RMAT_A2 + 1)) % RMAT_M % 10000
    return 0 if h < RMAT_T[0] else 1 if h < RMAT_T[1] else 2 if h < RMAT_T[2] else 3


def rmat_edge(i: int, levels: int) -> tuple[int, int]:
    """Python oracle for edge i of a 2^levels-vertex R-MAT graph."""
    src = dst = 0
    for lv in range(levels):
        q = rmat_quadrant(i, lv)
        src |= (q >> 1) << lv
        dst |= (q & 1) << lv
    return src, dst


def rmat_edges(spark, num_edges: int, levels: int, partitions: int = 8):
    """DataFrame (src, dst) of the deterministic R-MAT graph — generated
    JVM-side from spark.range, no Python, no shuffle."""
    from pyspark.sql import functions as F

    df = spark.range(0, num_edges, numPartitions=partitions)
    src = F.lit(0).cast("long")
    dst = F.lit(0).cast("long")
    for lv in range(levels):
        h = ((F.col("id") * RMAT_A1 + RMAT_C) % RMAT_M * (lv * RMAT_A2 + 1)) % RMAT_M % 10000
        q = (
            F.when(h < RMAT_T[0], 0)
            .when(h < RMAT_T[1], 1)
            .when(h < RMAT_T[2], 2)
            .otherwise(3)
        )
        src = src + (q.bitwiseAND(2) / 2).cast("long") * (1 << lv)
        dst = dst + q.bitwiseAND(1).cast("long") * (1 << lv)
    return df.select(src.alias("src"), dst.alias("dst"))


def rmat_edges_sql(num_edges: int, levels: int) -> str:
    """DuckDB twin of rmat_edges: same integer expressions over range()."""
    src_terms, dst_terms = [], []
    for lv in range(levels):
        h = (f"((((i * {RMAT_A1} + {RMAT_C}) % {RMAT_M}) * {lv * RMAT_A2 + 1}) "
             f"% {RMAT_M} % 10000)")
        q = (f"(CASE WHEN {h} < {RMAT_T[0]} THEN 0 WHEN {h} < {RMAT_T[1]} THEN 1 "
             f"WHEN {h} < {RMAT_T[2]} THEN 2 ELSE 3 END)")
        src_terms.append(f"(({q} // 2) * {1 << lv})")
        dst_terms.append(f"(({q} % 2) * {1 << lv})")
    return (
        f"SELECT {' + '.join(src_terms)} AS src, {' + '.join(dst_terms)} AS dst "
        f"FROM (SELECT CAST(range AS BIGINT) AS i FROM range({num_edges}))"
    )
