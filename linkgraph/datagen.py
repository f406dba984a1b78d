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
