"""Ingest stage: web pages -> partitioned edge table.

Replaces the reference's binary-edge loader + preprocessing pipeline
(/root/reference/src/Graph.cpp:386-615 shuffle-to-owner load;
/root/reference/datasets/wiki-vote/scripts/process.cpp:31-120 dedup /
self-loop drop / id densification) with the web-native equivalent demanded
by BASELINE.json's input_hint: vectorized Arrow/pandas UDFs extract per-url
outlinks from ``html``; ids are densified with a two-phase distributed rank
(no global single-task window, no ``collect()``).

All heavy lifting is batch-at-a-time inside Arrow-transferred pandas
Series — no per-row Python UDFs anywhere.
"""

from __future__ import annotations

import html as _htmllib
import re

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

_HREF_RE = re.compile(r"""<a\s[^>]*?href\s*=\s*["']([^"'<>\s]+)["']""", re.IGNORECASE)
_P_RE = re.compile(r"<p>(.*?)</p>", re.DOTALL)
_TAG_RE = re.compile(r"<[^>]+>")


def _decode(b) -> str:
    if b is None:
        return ""
    if isinstance(b, (bytes, bytearray)):
        return bytes(b).decode("utf-8", errors="replace")
    return str(b)


def normalize_url(u: str) -> str:
    """Drop fragments, strip surrounding whitespace, lowercase scheme+host."""
    u = u.strip()
    u = u.split("#", 1)[0]
    m = re.match(r"^([a-zA-Z][a-zA-Z0-9+.-]*://)([^/]*)(.*)$", u)
    if m:
        u = m.group(1).lower() + m.group(2).lower() + m.group(3)
    return u


@F.pandas_udf(T.ArrayType(T.StringType()))
def extract_outlinks(html: pd.Series) -> pd.Series:
    """href targets of every <a> tag, normalized, deduped (order-preserving)."""

    def one(b) -> list[str]:
        seen: dict[str, None] = {}
        for href in _HREF_RE.findall(_decode(b)):
            n = normalize_url(_htmllib.unescape(href))
            if n and n not in seen:
                seen[n] = None
        return list(seen)

    return html.map(one)


@F.pandas_udf(T.StringType())
def extract_text(html: pd.Series) -> pd.Series:
    """Visible paragraph text of the page — the byte-identical invariant.

    Concatenates the text of all <p> blocks (tags stripped, entities
    unescaped), joined by a single space.  On the synthetic fixture this
    must equal the ``text`` column byte-for-byte (north-rule invariant,
    mirroring the reference's preprocessing-stage determinism).
    """

    def one(b) -> str:
        parts = [_TAG_RE.sub("", p) for p in _P_RE.findall(_decode(b))]
        return _htmllib.unescape(" ".join(parts))

    return html.map(one)


def pages_to_url_edges(pages: DataFrame) -> DataFrame:
    """(src_url, dst_url) directed edges: explode extracted outlinks.

    Self-links dropped; duplicates per page already deduped in the UDF, and
    a global ``dropDuplicates`` guards against repeated crawls of one url.
    """
    return (
        pages.select(
            F.col("url").alias("src_url"),
            F.explode(extract_outlinks(F.col("html"))).alias("dst_url"),
        )
        .filter(F.col("src_url") != F.col("dst_url"))
        .dropDuplicates(["src_url", "dst_url"])
    )


def dense_ids(df: DataFrame, col: str, partitions: int = 32) -> DataFrame:
    """Assign dense ids 0..n-1 by ascending ``col`` — DETERMINISTIC
    distributed two-phase rank.

    Phase 1: pick ~``partitions``·32 boundary keys by a DETERMINISTIC hash
    sample (xxhash64(key) mod s == 0 — a pure function of the data, unlike
    ``repartitionByRange`` whose reservoir-sampled boundaries change per
    execution) and reduce them to ``partitions`` bucket boundaries.
    Phase 2: bucket = #boundaries <= key (a broadcast literal comparison —
    monotone, so bucket order == key order), rank within each bucket
    (window PARTITIONED by bucket), add broadcast cumulative bucket
    offsets.  No single-task window, no ``spark_partition_id`` (whose
    value is re-derived per sub-plan and broke rank/offset agreement).

    The scalable replacement for a global ``row_number()`` window and for
    the reference's sort-based densify
    (/root/reference/datasets/wiki-vote/scripts/process.cpp:92-96).
    """
    # Materialize the (small: one row per distinct key) key table ONCE and
    # truncate its lineage: everything upstream — possibly an expensive
    # Arrow-UDF extraction — must not re-execute for the count, the
    # boundary-sample collect, the rank window, and the offset join below.
    # Eager localCheckpoint (MEMORY_AND_DISK on executors, GC-cleaned with
    # the RDD) beats persist() here because the returned DataFrame keeps
    # referencing ``keys`` after this function exits, so there is no safe
    # place to unpersist.
    keys = df.select(col).distinct().localCheckpoint()
    n = keys.count()
    # deterministic boundary sample: expect ~partitions*32 keys
    target = max(int(partitions) * 32, 1)
    s = max(n // target, 1)
    sample = sorted(
        r[0] for r in keys.filter(
            F.pmod(F.xxhash64(F.col(col)), F.lit(int(s))) == 0
        ).collect()
    )
    step = max(len(sample) // max(int(partitions), 1), 1)
    bounds = sample[step::step][: max(int(partitions) - 1, 0)]
    bucket = sum(
        (F.col(col) >= F.lit(b)).cast("int") for b in bounds
    ) if bounds else F.lit(0)
    part = keys.withColumn("_bkt", bucket.cast("long"))
    w = Window.partitionBy("_bkt").orderBy(col)
    ranked = part.withColumn("_rn", F.row_number().over(w))
    btot = part.groupBy("_bkt").agg(F.count(F.lit(1)).alias("_cnt"))
    offsets = (
        btot.select(F.col("_bkt").alias("_ba"))
        .join(btot.select(F.col("_bkt").alias("_bb"), "_cnt"),
              F.col("_bb") < F.col("_ba"), "left")
        .groupBy(F.col("_ba").alias("_bkt"))
        .agg(F.coalesce(F.sum("_cnt"), F.lit(0)).alias("_offset"))
    )
    return (
        ranked.join(F.broadcast(offsets), "_bkt")
        .select(col, (F.col("_offset") + F.col("_rn") - 1).alias("id"))
    )


def build_vertex_map(pages: DataFrame, url_edges: DataFrame | None = None,
                     partitions: int = 32) -> DataFrame:
    """(id, url) dictionary over all page urls ∪ all link-target urls.

    Includes dangling targets (linked-to urls never crawled) so PageRank's
    dangling-mass accounting sees them.
    """
    urls = pages.select(F.col("url"))
    if url_edges is not None:
        urls = urls.union(url_edges.select(F.col("dst_url").alias("url")))
    return dense_ids(urls, "url", partitions).select("id", "url")


def edges_with_ids(url_edges: DataFrame, vmap: DataFrame) -> DataFrame:
    """(src, dst) long-typed edge table via two dictionary joins.

    The dictionary is broadcast when small; at 10^12-url scale both joins
    are plain shuffle hash joins on url (Catalyst/AQE decide) — this is the
    Spark-native analogue of the reference's MPI shuffle-to-owner pass
    (/root/reference/src/Graph.cpp:500-578).
    """
    src_map = vmap.select(F.col("url").alias("src_url"), F.col("id").alias("src"))
    dst_map = vmap.select(F.col("url").alias("dst_url"), F.col("id").alias("dst"))
    return (
        url_edges.join(src_map, "src_url")
        .join(dst_map, "dst_url")
        .select("src", "dst")
    )


def ingest_pages(pages: DataFrame, partitions: int = 32):
    """Full ingest: pages -> (vertices(id,url), edges(src,dst)).

    Edge table comes back hash-partitioned by ``src`` (the partitioning the
    superstep joins reuse).

    ``url_edges`` is eagerly localCheckpoint-ed so the pandas-UDF outlink
    extraction executes EXACTLY ONCE per source scan: without it the
    vertex-map build (count + boundary collect + rank) and the final edge
    join each re-ran the whole extraction lineage (the 13× ingest bench
    regression in round 2).  At 10^12-url scale the same staging point is
    an explicit Parquet write (``write_edge_table``) instead of executor
    block storage — the plan shape is identical.
    """
    url_edges = pages_to_url_edges(pages).localCheckpoint()
    vmap = build_vertex_map(pages, url_edges, partitions)
    edges = edges_with_ids(url_edges, vmap).repartition(partitions, "src")
    return vmap, edges


def write_edge_table(edges: DataFrame, path: str, buckets: int = 0) -> None:
    """Persist the edge table as Parquet, partitioned for src-keyed reuse."""
    edges.write.mode("overwrite").parquet(path)


def host_of(url_col) -> "F.Column":
    """Host part of a URL column — JVM-side regexp, no UDF."""
    return F.regexp_extract(url_col, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/]+)", 1)


def host_graph(url_edges: DataFrame) -> DataFrame:
    """Contract a page-level URL edge list ``(src_url, dst_url)`` to the
    weighted host graph ``(src_host, dst_host, weight)`` — the standard
    Common-Crawl rollup (host-level PageRank inputs are this table).

    One regexp projection + one grouped count: the host-graph cardinality
    is orders of magnitude below the page graph, so every downstream
    superstep runs on the contracted table (same rationale as the SCC
    condensation, algos/scc.py).  Self-loops (intra-host links) are kept:
    ``host_locality`` consumes them.
    """
    return (
        url_edges.select(
            host_of(F.col("src_url")).alias("src_host"),
            host_of(F.col("dst_url")).alias("dst_host"),
        )
        .groupBy("src_host", "dst_host")
        .agg(F.count(F.lit(1)).alias("weight"))
    )


def host_locality(hgraph: DataFrame) -> DataFrame:
    """Per-host intra-host link share: e6-quantized ratio of self-loop
    weight to total out-weight (crawl-frontier locality diagnostic)."""
    return (
        hgraph.groupBy(F.col("src_host").alias("host"))
        .agg(
            F.sum("weight").alias("out_weight"),
            F.sum(F.when(F.col("src_host") == F.col("dst_host"),
                         F.col("weight")).otherwise(F.lit(0)))
            .alias("intra_weight"),
        )
        .select(
            "host", F.col("out_weight").cast("long").alias("out_weight"),
            F.col("intra_weight").cast("long").alias("intra_weight"),
            F.round(F.col("intra_weight").cast("double") * 1e6
                    / F.col("out_weight"))
            .cast("long").alias("locality_e6"),
        )
    )


def rendezvous_assign(df: DataFrame, key_col: str, num_nodes: int = 8) -> "F.Column":
    """Rendezvous (highest-random-weight) assignment: adds a ``node``
    column = argmax over k of H60(key#k) — consistent placement where a
    node failure only remaps that node's keys (no global reshuffle), the
    crawl-fleet / cache-shard assignment scheme.  Pure per-row array
    expressions (zero shuffle); H60 is the engine's portable md5-prefix
    hash (dedup.h60), so a SQL engine reproduces the assignment exactly.
    """
    from .dedup import h60

    arr = F.transform(
        F.sequence(F.lit(0), F.lit(num_nodes - 1)),
        lambda k: F.struct(
            h60(F.concat(F.col(key_col), F.lit("#"), k.cast("string")))
            .alias("h"),
            k.cast("long").alias("k"),
        ),
    )
    return df.withColumn("node", F.array_max(arr).getField("k"))


def per_host_cap(
    urls: DataFrame, n: int, host_col: str = "host", url_col: str = "url"
) -> DataFrame:
    """Keep at most ``n`` urls per host, chosen by the deterministic H60
    order (hash-ordered, so the kept subset is unbiased and stable across
    runs/engines) — the per-domain cap used to balance web corpora before
    training.  One window per host partition; no global sort."""
    from pyspark.sql import Window

    from .dedup import h60

    w = Window.partitionBy(host_col).orderBy(h60(F.col(url_col)), url_col)
    return (
        urls.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n)
        .drop("_rn")
    )


@F.pandas_udf(T.StringType())
def normalize_urls(urls: pd.Series) -> pd.Series:
    """Vectorized normalize_url (Arrow batches) — exposed standalone so
    the normalization logic itself is value-gated against an independent
    SQL twin (suite `url_normalize`), not just exercised inside
    extract_outlinks."""
    return urls.map(lambda u: normalize_url(u) if u is not None else None)


# ---------------------------------------------------------------------------
# anchor-text extraction (the web-search relevance signal)
# ---------------------------------------------------------------------------

# shared Java-regex / RE2 dialect: double-quoted hrefs, non-greedy body,
# case-insensitive + dotall via inline flags (no lookaround — RE2-safe)
ANCHOR_RE = r'(?is)<a\s[^>]*?href\s*=\s*"([^"<>\s]+)"[^>]*?>(.*?)</a>'


def anchor_pairs(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(src_url, href, anchor) for every ``<a href="...">text</a>`` in
    every page — the classic link-graph signal (anchor text describes the
    TARGET page; aggregated per target it powered early web ranking).
    Inner markup is stripped and whitespace collapsed, so
    ``<a href=u><b>two  words</b></a>`` yields anchor ``"two words"``.

    Stays entirely JVM-side (`regexp_extract_all` with group indexes +
    an index-lambda `transform` zip + `explode`) — no Python, no shuffle;
    cites the reference's text→graph preprocessor
    (datasets/wiki-vote/scripts/process.cpp:31-120) which drops anchor
    text on the floor; this keeps it."""
    h = F.col(html_col)
    if dict(pages.dtypes).get(html_col) == "binary":
        h = h.cast("string")
    hrefs = F.regexp_extract_all(h, F.lit(ANCHOR_RE), 1)
    texts = F.regexp_extract_all(h, F.lit(ANCHOR_RE), 2)
    pair = F.transform(
        hrefs,
        lambda x, i: F.struct(
            x.alias("href"), F.element_at(texts, i + 1).alias("_raw")
        ),
    )
    out = pages.select(
        F.col(url_col).alias("src_url"), F.explode(pair).alias("_p")
    )
    anchor = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.col("_p._raw"), r"<[^>]*>", ""), r"\s+", " "
        )
    )
    return out.select(
        "src_url", F.col("_p.href").alias("href"), anchor.alias("anchor")
    )


# ---------------------------------------------------------------------------
# redirect-chain resolution (functional-graph closure by pointer doubling)
# ---------------------------------------------------------------------------


def resolve_redirects(
    redirects: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    max_rounds: int = 40,
) -> DataFrame:
    """Resolve every redirect source to its FINAL target with the hop
    count: (src, final, hops).  The crawl-canonicalization step — 301
    chains must collapse to the terminal url before ids are assigned,
    else the link graph splits pages across chain aliases.

    100-TB plan: POINTER DOUBLING, not chain walking — each round
    self-joins the current (src -> 2^t-step ancestor, hops) map on
    ancestor = src, squaring the resolved path length, so a depth-D
    chain set needs ceil(log2 D) shuffles total (a sequential walk
    needs D).  State stays (src, final, hops) — never materializes
    paths.  Assumes acyclic redirects (a crawl dedups 301 loops
    upstream); the round cap turns an unexpected cycle into a loud
    error instead of an infinite loop."""
    # eager localCheckpoint per round (repo convention, cf. pagerank/cc):
    # lineage is CUT each doubling, so the final plan reads one
    # materialized table instead of re-deriving every round
    m = redirects.select(
        F.col(src_col).cast("long").alias("u"),
        F.col(dst_col).cast("long").alias("v"),
        F.lit(1).cast("long").alias("h"),
    ).localCheckpoint(eager=True)
    targets = m.select(F.col("u").alias("_t")).distinct().localCheckpoint(
        eager=True
    )
    for _ in range(max_rounds):
        nxt = m.alias("a").join(
            m.select(
                F.col("u").alias("_ju"),
                F.col("v").alias("_jv"),
                F.col("h").alias("_jh"),
            ).alias("b"),
            F.col("a.v") == F.col("b._ju"),
            "left",
        )
        m2 = nxt.select(
            F.col("a.u").alias("u"),
            F.coalesce(F.col("b._jv"), F.col("a.v")).alias("v"),
            (F.col("a.h") + F.coalesce(F.col("b._jh"), F.lit(0))).alias("h"),
        ).localCheckpoint(eager=True)
        still = m2.join(
            targets, m2["v"] == F.col("_t"), "left_semi"
        ).limit(1).count()
        m = m2
        if still == 0:
            return m.select(
                F.col("u").alias("src"),
                F.col("v").alias("final"),
                F.col("h").alias("hops"),
            )
    raise ValueError(
        f"resolve_redirects: chains not closed after {max_rounds} doubling "
        "rounds — redirect cycle suspected"
    )


# ---------------------------------------------------------------------------
# URL feature extraction + C4-style crawl filtering verdict
# ---------------------------------------------------------------------------

URL_EXT_BLACKLIST = (
    "jpg", "jpeg", "png", "gif", "pdf", "zip", "exe", "css", "js",
)


def url_features(
    urls: DataFrame,
    url_col: str = "url",
    max_depth: int = 6,
    max_params: int = 4,
) -> DataFrame:
    """Per-URL structural features + a C4-style keep/drop verdict — the
    crawl-frontier filter that runs BEFORE fetch at 10^12-url scale, so
    it must be pure column expressions (it is: regexp extracts only, no
    Python, no shuffle).  keep = http(s) scheme AND extension not in the
    binary/asset blacklist AND path depth <= max_depth AND <= max_params
    query parameters.  Adds scheme, host, tld, path depth, extension and
    query-parameter count alongside the verdict."""
    u = F.col(url_col)
    scheme = F.regexp_extract(u, r"^([a-z][a-z0-9+.-]*):", 1)
    host = F.regexp_extract(u, r"^[a-z][a-z0-9+.-]*://([^/?#]+)", 1)
    tld = F.regexp_extract(host, r"\.([a-z0-9-]+)$", 1)
    path = F.regexp_extract(u, r"^[a-z][a-z0-9+.-]*://[^/?#]+([^?#]*)", 1)
    depth = F.size(F.filter(F.split(path, "/"), lambda x: x != ""))
    ext = F.regexp_extract(path, r"\.([a-z0-9]+)$", 1)
    query = F.regexp_extract(u, r"\?([^#]*)", 1)
    n_params = F.when(query == "", F.lit(0)).otherwise(
        F.size(F.split(query, "&"))
    )
    keep = (
        scheme.isin("http", "https")
        & ~ext.isin(*URL_EXT_BLACKLIST)
        & (depth <= max_depth)
        & (n_params <= max_params)
    )
    return urls.select(
        "*",
        scheme.alias("scheme"),
        host.alias("host"),
        tld.alias("tld"),
        depth.cast("long").alias("path_depth"),
        ext.alias("ext"),
        n_params.cast("long").alias("n_params"),
        keep.cast("long").alias("keep"),
    )


def path_prefix_rollup(
    pages: DataFrame, url_col: str = "url", max_depth: int = 2
) -> DataFrame:
    """Sitemap-structure rollup: page counts per (host, path-prefix) at
    every depth 1..max_depth — the URL-tree aggregation a crawl planner
    reads ("which sections of each site are big"), the path-level
    refinement of :func:`host_graph`'s host contraction.

    Returns ``(host, depth, prefix, n_pages)``; a page counts toward its
    ancestor prefix at every depth its path reaches (depth-d prefix = the
    first d path segments, '/'-joined, leading '/'), so per-host rows sum
    to reachable-page mass per level, and a page with fewer than d
    segments emits no depth-d row.

    Plan: one regexp projection + one explode of <= max_depth scalar rows
    per page + one map-side-combinable grouped count — linear in pages,
    output bounded by the URL tree, never the page count squared.
    """
    u = F.col(url_col)
    segs = F.expr(
        f"filter(split(regexp_extract({url_col}, "
        r"'^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]+(/.*)?$', 1), '/'), "
        "s -> s <> '')"
    )
    rows = F.filter(
        F.transform(
            F.sequence(F.lit(1), F.lit(max_depth)),
            lambda d: F.struct(
                d.cast("long").alias("depth"),
                F.when(
                    F.size(segs) >= d,
                    F.concat(F.lit("/"), F.array_join(F.slice(segs, 1, d), "/")),
                ).alias("prefix"),
            ),
        ),
        lambda s: s["prefix"].isNotNull(),
    )
    return (
        pages.select(host_of(u).alias("host"), F.explode(rows).alias("r"))
        .select("host", F.col("r.depth").alias("depth"),
                F.col("r.prefix").alias("prefix"))
        .groupBy("host", "depth", "prefix")
        .agg(F.count(F.lit(1)).alias("n_pages"))
    )
