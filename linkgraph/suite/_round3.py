"""linkgraph.suite.round3 — mechanical split of the former monolithic suite.py.

round-3 additions: incremental CC, DOULION, pattern widening, edit-distance, link-prediction scores, mixing stats, KMV.

Imported (in order) by suite/__init__.py; registers its queries into the
shared REGISTRY defined in _base.  Pure move: definitions and registration
order are byte-identical to the monolith.
"""

from __future__ import annotations

from ._base import *  # noqa: F401,F403
from ._round1b import *  # noqa: F401,F403
from ._round1e import *  # noqa: F401,F403
from ._corpus2 import *  # noqa: F401,F403

# round-3b additions: incremental CC, DOULION, pattern widening, edit-distance
# dedup verify, politeness crawl scheduler
# ---------------------------------------------------------------------------


def q_incremental_components(spark, sf_dir):
    """Incremental connected components over an edge-delta batch: converge
    min-label propagation on the base graph (~90% of edges), then ingest
    the delta and WARM-START from the converged labels
    (components.connected_components(initial_labels=...)) — the
    cheap-recompute path for a continuously-crawled link graph.  The
    monotone least() update makes the warm fixpoint equal the cold one
    (component-min vertex id), so the oracle is the full-graph recursive
    closure shared with `connected_components`."""
    from ..algos import connected_components

    full = edges_b(spark, sf_dir)
    base = full.filter((F.col("src") * 5 + F.col("dst")) % 10 != 7)
    base_labels, _ = connected_components(
        base, vertices=verts(spark, V_B), partitions=8
    )
    labels, _ = connected_components(
        full, vertices=verts(spark, V_B), partitions=8,
        initial_labels=base_labels,
    )
    return labels.select("id", F.col("component").cast("long").alias("component"))


REGISTRY["incremental_components"] = (q_incremental_components, COMPONENTS_SQL)


def q_doulion_triangle(spark, sf_dir):
    """DOULION sparsified triangle estimate (Tsourakakis et al., KDD'09):
    keep each oriented edge with p = 1/2 by a deterministic integer hash,
    count triangles EXACTLY on the sparsified graph (same oriented 2-join
    + semi-close plan as `triangle_count`), scale by 1/p^3 = 8 — integer
    exact, partition-invariant, SQL-reproducible.  The sparsify-then-exact
    strategy complements the reference's per-estimator sampling
    (/root/reference/applications/Triangle.cpp:42-74): one Bernoulli pass
    shrinks E before the join instead of sampling estimators after it.
    The keep decision is the repo's md5-derived h60 hash of the edge key:
    a LINEAR hash mod 2 would degenerate to endpoint parity (odd
    multipliers) and keep only parity-monochromatic triangles — a ~2x
    structural bias, caught by the ε assert in tests/test_round3b.py."""
    from ..algos import triangle_count
    from ..dedup import h60

    e = edges_a(spark, sf_dir)
    key = F.concat(F.col("a").cast("string"), F.lit(","),
                   F.col("b").cast("string"))
    o = (
        e.select(F.least("src", "dst").alias("a"),
                 F.greatest("src", "dst").alias("b"))
        .distinct()
        .filter(h60(key) % 2 == 0)
    )
    est = 8 * triangle_count(o.select(F.col("a").alias("src"),
                                      F.col("b").alias("dst")))
    exact = triangle_count(e)
    return spark.createDataFrame(
        [(int(est), int(exact))],
        "doulion_estimate long, exact_triangles long",
    )


DOULION_SQL = f"""
WITH {EDGES_A_SQL}, {OE_A_SQL},
kept AS (SELECT a, b FROM oe_a
         WHERE CAST(('0x' || substr(md5(CAST(a AS VARCHAR) || ',' ||
                                        CAST(b AS VARCHAR)), 1, 15))
                    AS BIGINT) % 2 = 0),
t1 AS (SELECT CAST(count(*) * 8 AS BIGINT) AS doulion_estimate
       FROM kept e1 JOIN kept e2 ON e1.b = e2.a
       JOIN kept e3 ON e3.a = e1.a AND e3.b = e2.b),
t2 AS (SELECT CAST(count(*) AS BIGINT) AS exact_triangles
       FROM oe_a e1 JOIN oe_a e2 ON e1.b = e2.a
       JOIN oe_a e3 ON e3.a = e1.a AND e3.b = e2.b)
SELECT doulion_estimate, exact_triangles FROM t1 CROSS JOIN t2
"""

REGISTRY["doulion_triangle_estimate"] = (q_doulion_triangle, DOULION_SQL)


DENSE_PATTERNS = ("diamond", "bowtie", "five_cycle")


def q_dense_patterns(spark, sf_dir):
    """diamond / bowtie / exact 5-cycle through the generic pattern
    compiler (closure-first join plan, algos/patterns.py) — on the dense
    25-vertex fixture: these patterns are join-heavy for a mechanical SQL
    oracle on the bigger graphs (C5 has no early closure at all, so
    intermediates are length-4 paths), and the dense fixture gives rich
    counts (5.5k / 27.6k / 26.5k at sf0.01) at sub-second oracle cost."""
    from ..algos import patterns

    e = edges_dense(spark, sf_dir).persist()
    rows = [(n, patterns.pattern_count(e, patterns.PATTERNS[n]))
            for n in DENSE_PATTERNS]
    e.unpersist()
    return spark.createDataFrame(rows, "pattern string, n long")


def _dense_patterns_sql() -> str:
    from ..algos import patterns

    subs = [
        f"SELECT '{n}' AS pattern, n FROM ("
        + patterns.pattern_count_sql(patterns.PATTERNS[n], "und_dense", "n")
        + ")"
        for n in DENSE_PATTERNS
    ]
    return (
        f"WITH {EDGES_DENSE_SQL}, {UND_DENSE_SQL}\n"
        + "\nUNION ALL\n".join(subs)
    )


REGISTRY["dense_pattern_counts"] = (q_dense_patterns, _dense_patterns_sql())


def q_edit_distance_verify(spark, sf_dir):
    """Near-dup verification by exact edit distance: MinHash+LSH candidate
    pairs re-scored with Levenshtein distance over the raw texts (the
    high-precision last stage of a dedup cascade).  The distance runs
    only on the candidate pairs (bounded by LSH collisions), never
    all-pairs; JVM-side F.levenshtein, no Python."""
    from .. import dedup

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = dedup.minhash_lsh_pairs(d, num_hashes=16, bands=8,
                                    jaccard_threshold=0.5)
    ta = d.select(F.col("doc_id").alias("id_a"), F.col("text").alias("_ta"))
    tb = d.select(F.col("doc_id").alias("id_b"), F.col("text").alias("_tb"))
    return (
        pairs.join(ta, "id_a").join(tb, "id_b")
        .select(
            "id_a", "id_b",
            F.levenshtein("_ta", "_tb").cast("long").alias("edit_distance"),
        )
    )


def _edit_distance_sql() -> str:
    from .. import dedup

    inner = dedup.minhash_lsh_pairs_sql(num_hashes=16, bands=8,
                                        jaccard_threshold=0.5)
    return f"""
WITH pairs AS ({inner})
SELECT p.id_a, p.id_b,
       CAST(levenshtein(a.text, b.text) AS BIGINT) AS edit_distance
FROM pairs p
JOIN documents a ON a.doc_id = p.id_a
JOIN documents b ON b.doc_id = p.id_b
"""


REGISTRY["edit_distance_verify"] = (q_edit_distance_verify,
                                    _edit_distance_sql())


def q_crawl_schedule(spark, sf_dir):
    """Politeness-aware crawl scheduling: per-host fetch order by priority
    with a fixed inter-request delay — fetch_offset_ms = (rank-1) * 500
    within each host.  The window is keyed by host (bounded per-host
    cardinality; hosts themselves scale out), never a global sort."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    d = F.col("doc_id").cast("long")
    u = docs.select(
        d.alias("doc_id"),
        F.concat(F.lit("h"), (d % 30).cast("string")).alias("host"),
        ((d * 37) % 100).alias("priority"),
    )
    w = Window.partitionBy("host").orderBy(
        F.col("priority").desc(), F.col("doc_id").asc()
    )
    rn = F.row_number().over(w)
    return u.select(
        "doc_id", "host",
        rn.cast("long").alias("fetch_order"),
        ((rn - 1) * 500).cast("long").alias("fetch_offset_ms"),
    )


CRAWL_SCHEDULE_SQL = """
WITH u AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         'h' || CAST(doc_id % 30 AS VARCHAR) AS host,
         (doc_id * 37) % 100 AS priority
  FROM documents
)
SELECT doc_id, host,
       CAST(row_number() OVER (PARTITION BY host
                               ORDER BY priority DESC, doc_id ASC) AS BIGINT)
         AS fetch_order,
       CAST((row_number() OVER (PARTITION BY host
                                ORDER BY priority DESC, doc_id ASC) - 1) * 500
            AS BIGINT) AS fetch_offset_ms
FROM u
"""

REGISTRY["crawl_schedule"] = (q_crawl_schedule, CRAWL_SCHEDULE_SQL)


def q_recrawl_priority(spark, sf_dir):
    """Change-rate-driven recrawl scheduling: from the crawl-to-crawl edge
    delta (same two snapshots as `crawl_delta`), compute each source
    page's link-change ratio (added+removed over total touched) and bin
    it into hot / warm / cold recrawl tiers — the freshness policy loop
    of a continuous crawler.  One full-outer join + one grouped agg."""
    from ..graph import edge_delta

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    s = (F.col("o_orderkey").cast("long") * 13 + 7) % V_B
    d = (F.col("o_custkey").cast("long") * 17 + 5) % V_B

    def snap(pred):
        return (o.filter(pred).select(s.alias("src"), d.alias("dst"))
                .filter(F.col("src") != F.col("dst")))

    old = snap(F.col("o_orderkey") % 10 < 2)
    new = snap((F.col("o_orderkey") % 10 >= 1) & (F.col("o_orderkey") % 10 <= 2))
    delta = edge_delta(old, new)
    changed = F.sum((F.col("status") != "kept").cast("long"))
    total = F.count(F.lit(1))
    agg = delta.groupBy("src").agg(
        changed.alias("changed"), total.alias("total"))
    ratio_e6 = F.floor(F.col("changed") * F.lit(1000000) / F.col("total"))
    return agg.select(
        F.col("src").cast("long").alias("src"),
        F.col("changed").cast("long").alias("changed"),
        F.col("total").cast("long").alias("total"),
        ratio_e6.cast("long").alias("change_ratio_e6"),
        F.when(ratio_e6 >= 500000, "hot")
        .when(ratio_e6 >= 100000, "warm")
        .otherwise("cold").alias("tier"),
    )


RECRAWL_PRIORITY_SQL = f"""
WITH o_snap AS (
  SELECT DISTINCT CAST((o_orderkey * 13 + 7) % {V_B} AS BIGINT) AS src,
         CAST((o_custkey * 17 + 5) % {V_B} AS BIGINT) AS dst
  FROM orders
  WHERE o_orderkey % 10 < 2
    AND (o_orderkey * 13 + 7) % {V_B} <> (o_custkey * 17 + 5) % {V_B}),
n_snap AS (
  SELECT DISTINCT CAST((o_orderkey * 13 + 7) % {V_B} AS BIGINT) AS src,
         CAST((o_custkey * 17 + 5) % {V_B} AS BIGINT) AS dst
  FROM orders
  WHERE o_orderkey % 10 BETWEEN 1 AND 2
    AND (o_orderkey * 13 + 7) % {V_B} <> (o_custkey * 17 + 5) % {V_B}),
delta AS (
  SELECT coalesce(o.src, n.src) AS src,
         CASE WHEN o.src IS NULL THEN 'added'
              WHEN n.src IS NULL THEN 'removed'
              ELSE 'kept' END AS status
  FROM o_snap o FULL OUTER JOIN n_snap n
    ON o.src = n.src AND o.dst = n.dst),
agg AS (
  SELECT src,
         CAST(sum(CASE WHEN status <> 'kept' THEN 1 ELSE 0 END) AS BIGINT)
           AS changed,
         CAST(count(*) AS BIGINT) AS total
  FROM delta GROUP BY src)
SELECT src, changed, total,
       CAST(floor(changed * 1000000 / total) AS BIGINT) AS change_ratio_e6,
       CASE WHEN floor(changed * 1000000 / total) >= 500000 THEN 'hot'
            WHEN floor(changed * 1000000 / total) >= 100000 THEN 'warm'
            ELSE 'cold' END AS tier
FROM agg
"""

REGISTRY["recrawl_priority"] = (q_recrawl_priority, RECRAWL_PRIORITY_SQL)


def q_robots_filter(spark, sf_dir):
    """robots.txt-style disallow filtering: a tiny per-host rule table
    (host -> disallowed path prefix) BROADCAST against the url fixture;
    a url is allowed iff no rule of its host prefixes its path.  The
    rules side is O(hosts) — always broadcast at any corpus scale."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    d = F.col("doc_id").cast("long")
    path = F.concat(
        F.repeat(F.lit("/s"), (d % 9).cast("int")),
        F.when(d % 5 == 0, F.lit("/img.jpg"))
        .when(d % 5 == 1, F.lit("/page.html"))
        .otherwise(F.lit("")),
    )
    urls = docs.select(
        d.alias("doc_id"),
        F.concat(F.lit("h"), (d % 30).cast("string")).alias("host"),
        path.alias("path"),
    )
    rules = [(f"h{m}", "/s/s/s") for m in range(30) if m % 5 == 0]
    rules += [(f"h{m}", "/page.html") for m in range(30) if m % 3 == 0]
    rdf = spark.createDataFrame(rules, "host string, dis string")
    hit = (
        urls.join(F.broadcast(rdf), "host")
        .filter(F.col("path").startswith(F.col("dis")))
        .select("doc_id").distinct()
    )
    return (
        urls.join(hit.withColumn("_hit", F.lit(1)), "doc_id", "left")
        .select(
            "doc_id", "host", "path",
            F.when(F.col("_hit").isNull(), F.lit(1))
            .otherwise(F.lit(0)).cast("long").alias("allowed"),
        )
    )


ROBOTS_FILTER_SQL = """
WITH u AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         'h' || CAST(doc_id % 30 AS VARCHAR) AS host,
         repeat('/s', CAST(doc_id % 9 AS INT)) ||
         CASE WHEN doc_id % 5 = 0 THEN '/img.jpg'
              WHEN doc_id % 5 = 1 THEN '/page.html'
              ELSE '' END AS path
  FROM documents),
rules AS (
  SELECT 'h' || CAST(m AS VARCHAR) AS host, '/s/s/s' AS dis
  FROM range(30) t(m) WHERE m % 5 = 0
  UNION ALL
  SELECT 'h' || CAST(m AS VARCHAR) AS host, '/page.html' AS dis
  FROM range(30) t(m) WHERE m % 3 = 0)
SELECT u.doc_id, u.host, u.path,
       CAST(CASE WHEN EXISTS (
              SELECT 1 FROM rules r
              WHERE r.host = u.host AND u.path LIKE r.dis || '%')
            THEN 0 ELSE 1 END AS BIGINT) AS allowed
FROM u
"""

REGISTRY["robots_filter"] = (q_robots_filter, ROBOTS_FILTER_SQL)


def q_partition_edgecut(spark, sf_dir):
    """Partitioning quality audit: edge-cut of the derived page graph
    under (a) per-url hash partitioning and (b) host-grouped partitioning
    (all pages of a host on one partition), P = 8.  The engine's
    shuffle-cost model for adjacency layout: host-grouped placement turns
    intra-host links into partition-local edges — the quantity this gate
    reports is exactly the shuffled fraction per superstep.  Zero-shuffle
    scan + one global agg."""
    from ..dedup import h60

    e = edges_a(spark, sf_dir)
    host = lambda c: (F.col(c) % 40).cast("string")  # noqa: E731
    part_hash = lambda c: h60(F.col(c).cast("string")) % 8  # noqa: E731
    part_host = lambda c: h60(host(c)) % 8  # noqa: E731
    return e.agg(
        F.count(F.lit(1)).cast("long").alias("edges"),
        F.sum((part_hash("src") != part_hash("dst")).cast("long"))
        .cast("long").alias("cut_hash"),
        F.sum((part_host("src") != part_host("dst")).cast("long"))
        .cast("long").alias("cut_host"),
        F.floor(
            F.sum((part_hash("src") != part_hash("dst")).cast("long"))
            * F.lit(1000000) / F.count(F.lit(1))
        ).cast("long").alias("cut_hash_e6"),
        F.floor(
            F.sum((part_host("src") != part_host("dst")).cast("long"))
            * F.lit(1000000) / F.count(F.lit(1))
        ).cast("long").alias("cut_host_e6"),
    )


PARTITION_EDGECUT_SQL = f"""
WITH {EDGES_A_SQL},
p AS (
  SELECT
    CAST(('0x' || substr(md5(CAST(src AS VARCHAR)), 1, 15)) AS BIGINT) % 8
      AS ph_s,
    CAST(('0x' || substr(md5(CAST(dst AS VARCHAR)), 1, 15)) AS BIGINT) % 8
      AS ph_d,
    CAST(('0x' || substr(md5(CAST(src % 40 AS VARCHAR)), 1, 15)) AS BIGINT) % 8
      AS hh_s,
    CAST(('0x' || substr(md5(CAST(dst % 40 AS VARCHAR)), 1, 15)) AS BIGINT) % 8
      AS hh_d
  FROM edges_a)
SELECT CAST(count(*) AS BIGINT) AS edges,
       CAST(sum(CASE WHEN ph_s <> ph_d THEN 1 ELSE 0 END) AS BIGINT)
         AS cut_hash,
       CAST(sum(CASE WHEN hh_s <> hh_d THEN 1 ELSE 0 END) AS BIGINT)
         AS cut_host,
       CAST(floor(sum(CASE WHEN ph_s <> ph_d THEN 1 ELSE 0 END) * 1000000
                  / count(*)) AS BIGINT) AS cut_hash_e6,
       CAST(floor(sum(CASE WHEN hh_s <> hh_d THEN 1 ELSE 0 END) * 1000000
                  / count(*)) AS BIGINT) AS cut_host_e6
FROM p
"""

REGISTRY["partition_edgecut"] = (q_partition_edgecut, PARTITION_EDGECUT_SQL)


def q_cms_heavy_hitters(spark, sf_dir):
    """Count-min-sketch frequency estimation graded against the exact
    top-20 tokens: the D x W = 4 x 128 integer sketch replaces the full
    vocabulary count table (bounded state at any corpus scale); CMS never
    underestimates, so overestimate >= 0 for every key."""
    from .. import sketch

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return sketch.cms_heavy_hitters(docs, k=20)


def _cms_sql() -> str:
    from .. import sketch

    return sketch.cms_heavy_hitters_sql(k=20)


REGISTRY["cms_heavy_hitters"] = (q_cms_heavy_hitters, _cms_sql())


def q_pps_sample(spark, sf_dir):
    """Sequential Poisson (PPS) corpus subsample: 100 documents drawn with
    inclusion odds proportional to token count — the unequal-probability
    sampler behind size-weighted corpus mixing.  Priority = h60(id) div
    weight (BIGINT-exact), selection is a global top-n, never a full
    sort."""
    from .. import corpus, sketch

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return sketch.pps_sample(docs, n=100,
                             weight=corpus.n_tokens(F.col("text")))


def _pps_sql() -> str:
    from .. import corpus, sketch

    return sketch.pps_sample_sql(n=100, weight_sql=corpus.N_TOKENS_SQL)


REGISTRY["pps_weighted_sample"] = (q_pps_sample, _pps_sql())


def q_dup_span_stats(spark, sf_dir):
    """Per-document duplicated 8-token-span mass — the exact-substring
    dedup signal (Lee et al., ACL'22) as one explode + one keyed agg;
    grams shuffle as 60-bit hashes, never strings."""
    from .. import dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return dedup.dup_span_stats(docs, k=8)


def _dup_span_sql() -> str:
    from .. import dedup

    return dedup.dup_span_stats_sql(k=8)


REGISTRY["dup_span_stats"] = (q_dup_span_stats, _dup_span_sql())


def q_dup_span_removal(spark, sf_dir):
    """Exact-substring span REMOVAL (Lee et al. ACL'22 production step):
    drop every duplicated 8-token span except its corpus-wide first
    occurrence; per-doc (n_tokens, n_removed, kept_fp) proves the
    byte-level output (see dedup.remove_dup_spans)."""
    from .. import dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return dedup.remove_dup_spans(docs, k=8)


def _dup_span_removal_sql() -> str:
    from .. import dedup

    return dedup.remove_dup_spans_sql(k=8)


REGISTRY["dup_span_removal"] = (q_dup_span_removal, _dup_span_removal_sql())


def q_neighbor_sample(spark, sf_dir):
    """GraphSAGE-style deterministic k=5 neighbor fan-out over the
    undirected orders graph — the GNN minibatch sampling primitive;
    per-vertex work bounded by degree (hub skew = the PageRank salting
    problem, handled the same way at scale)."""
    from ..graph import neighbor_sample

    return neighbor_sample(edges_b(spark, sf_dir), k=5, directed=False)


def _neighbor_sample_sql() -> str:
    from ..graph import neighbor_sample_sql

    return (f"WITH {EDGES_B_SQL}, {UND_B_SQL}\n"
            + neighbor_sample_sql(5, edges_cte="und_b"))


REGISTRY["neighbor_sample_k5"] = (q_neighbor_sample, _neighbor_sample_sql())


def q_stream_cms(spark, sf_dir):
    """Count-min sketch AS streaming state: D x W = 512 rows of running
    (d, bucket) counts over the event stream — bounded state for an
    unbounded user-id domain; bucket sums are associative so the drained
    sketch equals the batch build exactly."""
    from .. import streaming

    return streaming.stream_cms_user_counts(
        spark, f"{sf_dir}/events.parquet", sink_table="q_stream_cms"
    )


def _stream_cms_sql() -> str:
    from ..dedup import h60_sql
    from ..sketch import CMS_DEPTH, CMS_WIDTH

    b = h60_sql("CAST(user_id AS VARCHAR) || ':' || CAST(d AS VARCHAR)")
    return f"""
SELECT d, {b} % {CMS_WIDTH} AS bucket, CAST(count(*) AS BIGINT) AS c
FROM events CROSS JOIN range({CMS_DEPTH}) t(d)
GROUP BY d, {b} % {CMS_WIDTH}
"""


REGISTRY["stream_cms_user_counts"] = (q_stream_cms, _stream_cms_sql())


def q_bloom_decontaminate(spark, sf_dir):
    """Bloom-filter decontamination: the benchmark set (docs with
    doc_id % 20 == 0) is carried as a 2048-bit filter over its 5-token
    shingles — O(words) state vs the raw key set, no false negatives
    (bloom_hits >= exact_hits per doc, tested), false positives bounded.
    The scale case for when the probe set is too big to broadcast raw."""
    from .. import dedup, sketch

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sh = dedup.word_shingles(F.col("text"), k=5)
    bench_keys = (
        docs.filter(F.col("doc_id") % 20 == 0)
        .select(F.explode(sh).alias("s")).distinct()
    )
    bloom = sketch.bloom_build(bench_keys, "s")
    pd = (
        docs.filter(F.col("doc_id") % 20 != 0)
        .select(F.col("doc_id").cast("long").alias("doc_id"),
                F.explode_outer(sh).alias("s"))
    ).persist()
    keys = pd.filter(F.col("s").isNotNull()).select("s").distinct()
    maybe = sketch.bloom_probe(bloom, keys, "s")
    exact = keys.join(bench_keys.withColumn("_e", F.lit(1)), "s", "left")
    out = (
        pd.join(maybe, "s", "left")
        .join(exact.select("s", "_e"), "s", "left")
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("s").isNotNull().cast("long")).cast("long")
            .alias("shingles"),
            F.sum(F.coalesce(F.col("maybe"), F.lit(0))).cast("long")
            .alias("bloom_hits"),
            F.sum(F.coalesce(F.col("_e"), F.lit(0))).cast("long")
            .alias("exact_hits"),
        )
    ).localCheckpoint(eager=True)
    pd.unpersist()
    return out


def _bloom_decon_sql() -> str:
    from .. import dedup
    from ..sketch import BLOOM_BITS, BLOOM_K, BLOOM_WORD_BITS

    sh = dedup.word_shingles_sql("text", k=5)
    hp = dedup.h60_sql("s || '#' || CAST(i AS VARCHAR)")
    one = "CAST(1 AS BIGINT)"
    return f"""
WITH bench AS (
  SELECT DISTINCT unnest({sh}) AS s FROM documents WHERE doc_id % 20 = 0),
bloom AS (
  SELECT p // {BLOOM_WORD_BITS} AS word,
         CAST(bit_or({one} << CAST(p % {BLOOM_WORD_BITS} AS INT)) AS BIGINT)
           AS bits
  FROM (SELECT {hp} % {BLOOM_BITS} AS p
        FROM bench CROSS JOIN range({BLOOM_K}) t(i))
  GROUP BY p // {BLOOM_WORD_BITS}),
pd AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id, unnest({sh}) AS s
  FROM documents WHERE doc_id % 20 <> 0),
keys AS (SELECT DISTINCT s FROM pd),
probes AS (
  SELECT s, {hp} % {BLOOM_BITS} AS p
  FROM keys CROSS JOIN range({BLOOM_K}) t(i)),
hit AS (
  SELECT s,
         CASE WHEN sum(CASE WHEN (b.bits &
                   ({one} << CAST(p % {BLOOM_WORD_BITS} AS INT))) <> 0
                 THEN 1 ELSE 0 END) = {BLOOM_K} THEN 1 ELSE 0 END AS maybe
  FROM probes LEFT JOIN bloom b ON b.word = p // {BLOOM_WORD_BITS}
  GROUP BY s),
ex AS (
  SELECT k.s, CASE WHEN b.s IS NOT NULL THEN 1 ELSE 0 END AS e
  FROM keys k LEFT JOIN bench b ON b.s = k.s)
SELECT d.doc_id,
       CAST(count(pd.s) AS BIGINT) AS shingles,
       CAST(coalesce(sum(hit.maybe), 0) AS BIGINT) AS bloom_hits,
       CAST(coalesce(sum(ex.e), 0) AS BIGINT) AS exact_hits
FROM (SELECT DISTINCT CAST(doc_id AS BIGINT) AS doc_id
      FROM documents WHERE doc_id % 20 <> 0) d
LEFT JOIN pd USING (doc_id)
LEFT JOIN hit ON hit.s = pd.s
LEFT JOIN ex ON ex.s = pd.s
GROUP BY d.doc_id
"""


REGISTRY["bloom_decontaminate"] = (q_bloom_decontaminate, _bloom_decon_sql())


def q_graphsage_fanout(spark, sf_dir):
    """GraphSAGE 2-hop minibatch fan-out: from seed vertices (id % 50 ==
    0), sample k=5 neighbors deterministically, then k=5 neighbors of
    that frontier — the exact sampled-subgraph shape a GNN trainer
    consumes.  Each hop is one equi-join against the degree-bounded
    neighbor_sample table; total rows <= seeds * k + seeds * k^2
    regardless of graph size."""
    from ..graph import neighbor_sample

    ns = neighbor_sample(edges_b(spark, sf_dir), k=5,
                         directed=False).persist()
    h1 = (ns.filter(F.col("src") % 50 == 0)
          .select("src", "dst", F.lit(1).cast("long").alias("hop")))
    f1 = h1.select(F.col("dst").alias("src")).distinct()
    h2 = (ns.join(f1, "src")
          .select("src", "dst", F.lit(2).cast("long").alias("hop")))
    out = h1.unionByName(h2).localCheckpoint(eager=True)
    ns.unpersist()
    return out


def _graphsage_sql() -> str:
    from ..graph import neighbor_sample_sql

    inner = neighbor_sample_sql(5, edges_cte="und_b").strip()
    return f"""
WITH {EDGES_B_SQL}, {UND_B_SQL},
ns AS ({inner}),
h1 AS (SELECT src, dst, CAST(1 AS BIGINT) AS hop FROM ns WHERE src % 50 = 0),
f1 AS (SELECT DISTINCT dst FROM h1),
h2 AS (SELECT ns.src, ns.dst, CAST(2 AS BIGINT) AS hop
       FROM ns JOIN f1 ON f1.dst = ns.src)
SELECT src, dst, hop FROM h1
UNION ALL
SELECT src, dst, hop FROM h2
"""


REGISTRY["graphsage_fanout_2hop"] = (q_graphsage_fanout, _graphsage_sql())


# ---------------------------------------------------------------------------
# round-3 additions: link-prediction scores, mixing statistics, KMV sketch
# ---------------------------------------------------------------------------


def _und_b_df(spark, sf_dir):
    e = edges_b(spark, sf_dir)
    return e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()


def q_resource_allocation(spark, sf_dir):
    """Resource-allocation link-prediction scores (Zhou, Lu & Zhang,
    EPJ B 2009) on the undirected small graph: for every NON-adjacent
    pair {a,b}, RA(a,b) = sum over shared neighbors w of 1/deg(w) —
    the degree-penalized shared-neighbor score that beats raw common
    neighbors on web graphs (hubs contribute little).  Each term is
    quantized FIRST (1e6 div deg, exact integer division) and summed as
    BIGINT, so the score is engine- and order-exact — no float-sum
    nondeterminism.  Plan: wedge equi-join through w (never all pairs),
    broadcast degree dim, anti-join vs the edge set; per-w fan-out is
    deg(w)^2 — the documented skew cap is the same high-degree split
    used by the triangle counter (algos/triangles.py)."""
    und = _und_b_df(spark, sf_dir).persist()
    deg = und.groupBy(F.col("src").alias("w")).agg(
        F.count(F.lit(1)).cast("long").alias("dw")
    )
    n1 = und.select(F.col("dst").alias("w"), F.col("src").alias("a"))
    n2 = und.select(F.col("dst").alias("w2"), F.col("src").alias("b"))
    pairs = (
        n1.join(n2, (F.col("w") == F.col("w2")) & (F.col("a") < F.col("b")))
        .join(F.broadcast(deg), "w")
        .groupBy("a", "b")
        .agg(
            F.sum(F.expr("1000000 div dw")).cast("long").alias("ra_e6"),
            F.count(F.lit(1)).cast("long").alias("shared"),
        )
    )
    oe = und.filter(F.col("src") < F.col("dst")).select(
        F.col("src").alias("a"), F.col("dst").alias("b")
    )
    out = (
        pairs.join(oe, ["a", "b"], "left_anti")
        .filter(F.col("shared") >= 2)
        .select("a", "b", "shared", "ra_e6")
    ).localCheckpoint(eager=True)
    und.unpersist()
    return out


RESOURCE_ALLOCATION_SQL = f"""
WITH {EDGES_B_SQL}, {UND_B_SQL},
deg AS (SELECT src AS w, CAST(count(*) AS BIGINT) AS dw FROM und_b GROUP BY src),
pairs AS (
  SELECT n1.src AS a, n2.src AS b,
         CAST(count(*) AS BIGINT) AS shared,
         CAST(sum(1000000 // d.dw) AS BIGINT) AS ra_e6
  FROM und_b n1
  JOIN und_b n2 ON n2.dst = n1.dst AND n1.src < n2.src
  JOIN deg d ON d.w = n1.dst
  GROUP BY 1, 2)
SELECT a, b, shared, ra_e6 FROM pairs p
WHERE shared >= 2
  AND NOT EXISTS (SELECT 1 FROM und_b e WHERE e.src = p.a AND e.dst = p.b)
"""

REGISTRY["resource_allocation_scores"] = (
    q_resource_allocation, RESOURCE_ALLOCATION_SQL)


def q_rich_club(spark, sf_dir):
    """Rich-club coefficients (Zhou & Mondragon, 2004) of the larger
    derived graph: for each degree threshold k in {1,2,4,8,16,32},
    phi(k) = 2*E_k / (N_k*(N_k-1)) over the subgraph induced by vertices
    with undirected degree > k — do high-degree hubs wire to each other?
    Exact integer counts; the density is an exact BIGINT integer
    division (e6).  Plan: one degree aggregation, threshold table
    broadcast both ways, edge side filtered by two broadcast-hash
    semijoin-style joins — never an induced-subgraph materialization per
    threshold."""
    e = edges_a(spark, sf_dir)
    und = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    deg = und.groupBy(F.col("src").alias("v")).agg(
        F.count(F.lit(1)).cast("long").alias("d")
    ).persist()
    ks = spark.createDataFrame([(k,) for k in (1, 2, 4, 8, 16, 32)], "k long")
    nk = (
        ks.join(deg, F.col("d") > F.col("k"))
        .groupBy("k").agg(F.count(F.lit(1)).cast("long").alias("n_k"))
    )
    oe = und.filter(F.col("src") < F.col("dst"))
    da = F.broadcast(deg.select(F.col("v").alias("src"), F.col("d").alias("da")))
    db = F.broadcast(deg.select(F.col("v").alias("dst"), F.col("d").alias("db")))
    ek = (
        oe.join(da, "src").join(db, "dst")
        .crossJoin(F.broadcast(ks))
        .filter((F.col("da") > F.col("k")) & (F.col("db") > F.col("k")))
        .groupBy("k").agg(F.count(F.lit(1)).cast("long").alias("e_k"))
    )
    # Drive the output from the threshold table (mirrors the SQL twin's
    # FROM ks LEFT JOIN shape) so every k emits a row even when no vertex
    # exceeds it — nk/ek have no row for such k and a full_outer would
    # silently drop the threshold.
    out = (
        ks.join(F.broadcast(nk), "k", "left").join(F.broadcast(ek), "k", "left")
        .select(
            "k",
            F.coalesce("n_k", F.lit(0)).cast("long").alias("n_k"),
            F.coalesce("e_k", F.lit(0)).cast("long").alias("e_k"),
            F.when(
                F.coalesce("n_k", F.lit(0)) >= 2,
                F.expr("(2000000 * coalesce(e_k, 0)) div (n_k * (n_k - 1))"),
            ).otherwise(F.lit(0)).cast("long").alias("phi_e6"),
        )
    )
    out = out.localCheckpoint(eager=True)
    deg.unpersist()
    return out


RICH_CLUB_SQL = f"""
WITH {EDGES_A_SQL}, und_am AS MATERIALIZED (SELECT src, dst FROM edges_a
  UNION SELECT dst AS src, src AS dst FROM edges_a),
deg AS MATERIALIZED (
  SELECT src AS v, CAST(count(*) AS BIGINT) AS d FROM und_am GROUP BY src),
ks AS (SELECT CAST(unnest([1, 2, 4, 8, 16, 32]) AS BIGINT) AS k),
nk AS (SELECT k, CAST(count(*) AS BIGINT) AS n_k
       FROM ks JOIN deg ON deg.d > ks.k GROUP BY k),
oe AS (SELECT src, dst FROM und_am WHERE src < dst),
ek AS (SELECT k, CAST(count(*) AS BIGINT) AS e_k
       FROM oe JOIN deg da ON da.v = oe.src JOIN deg db ON db.v = oe.dst
       CROSS JOIN ks WHERE da.d > ks.k AND db.d > ks.k GROUP BY k)
SELECT ks.k,
       CAST(coalesce(nk.n_k, 0) AS BIGINT) AS n_k,
       CAST(coalesce(ek.e_k, 0) AS BIGINT) AS e_k,
       CAST(CASE WHEN coalesce(nk.n_k, 0) >= 2
                 THEN (2000000 * coalesce(ek.e_k, 0))
                      // (nk.n_k * (nk.n_k - 1))
                 ELSE 0 END AS BIGINT) AS phi_e6
FROM ks LEFT JOIN nk ON nk.k = ks.k LEFT JOIN ek ON ek.k = ks.k
"""

REGISTRY["rich_club_coefficients"] = (q_rich_club, RICH_CLUB_SQL)


def q_kmv_distinct_users(spark, sf_dir):
    """KMV distinct-user counting per event_type plus a MERGED all-types
    row: per-scope sketches are built once, the union row re-ranks the
    merged sketch rows (k smallest of the union are always inside the
    per-scope k-smallest lists) — the partial-aggregatable distinct
    counter that replaces count(DISTINCT) at 100 TB.  The oracle builds
    the union sketch directly from the global hash set; equality with
    the Spark-side MERGE is exactly the mergeability property."""
    from .. import sketch
    from ..dedup import h60

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    pairs = ev.select(
        F.col("event_type").cast("string").alias("scope"),
        F.col("user_id").alias("u"),
    )
    sk = sketch.kmv_build(pairs, "scope", "u").persist()
    per_scope = sketch.kmv_estimate(sk)
    g_exact = (
        ev.select(h60(F.col("user_id").cast("string")).alias("h"))
        .distinct()
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    merged = sketch.kmv_merge(sk, "__all__", g_exact)
    out = per_scope.unionByName(merged).localCheckpoint(eager=True)
    sk.unpersist()
    return out


def _kmv_distinct_sql() -> str:
    from ..sketch import kmv_sql

    return "WITH " + kmv_sql(
        "CAST(event_type AS VARCHAR)", "user_id", "events"
    ).lstrip()


KMV_DISTINCT_SQL = _kmv_distinct_sql()

REGISTRY["kmv_distinct_users"] = (q_kmv_distinct_users, KMV_DISTINCT_SQL)


def q_stream_bucket_min(spark, sf_dir):
    """Streaming bucket-min distinct sketch over the event backlog: the
    sketch IS the state (16 rows bound an unbounded user domain); min
    is associative, so the drained sketch equals the batch build
    bit-for-bit — which is exactly what the oracle checks."""
    from .. import streaming

    out = streaming.stream_bucket_min_distinct(
        spark, f"{sf_dir}/events.parquet", buckets=16,
        sink_table="suite_stream_bmin",
    )
    return out.select(
        F.col("bucket").cast("long").alias("bucket"),
        F.col("minh").cast("long").alias("minh"),
    )


def _stream_bmin_sql() -> str:
    from ..dedup import h60_sql

    h = h60_sql("CAST(user_id AS VARCHAR)")
    return f"""
WITH hs AS (SELECT {h} AS h FROM events)
SELECT CAST(h % 16 AS BIGINT) AS bucket, CAST(min(h // 16) AS BIGINT) AS minh
FROM hs GROUP BY 1
"""


REGISTRY["stream_bucket_min_distinct"] = (q_stream_bucket_min,
                                          _stream_bmin_sql())


def q_bpe_train(spark, sf_dir):
    """Tokenizer training: 6 BPE merge rules learned from the corpus
    (see corpus.bpe_train — vocab-sized iterative state, word-keyed
    bounded windows, deterministic tie-break)."""
    from ..corpus import bpe_train

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return bpe_train(docs)


def _bpe_train_sql() -> str:
    from ..corpus import bpe_train_sql

    return bpe_train_sql()


REGISTRY["bpe_train_merges"] = (q_bpe_train, _bpe_train_sql())


def q_bpe_encode(spark, sf_dir):
    """Tokenizer application: train the 6-rule BPE merge table, then
    encode the corpus with it (corpus.bpe_encode — vocab-bounded pandas
    UDF over distinct words, frequency-weighted token stats).  The twin
    replays the same training rounds in SQL and aggregates the final
    symbol table, so a hash match proves the iterative Python encoder
    reproduces the window-based merge semantics end to end."""
    from ..corpus import bpe_encode, bpe_train

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rules_df = bpe_train(docs)
    rules = [(r["lsym"], r["rsym"])
             for r in rules_df.orderBy("round").collect()]
    return bpe_encode(docs, rules)


def _bpe_encode_sql() -> str:
    from ..corpus import bpe_encode_sql

    return bpe_encode_sql()


REGISTRY["bpe_encode_stats"] = (q_bpe_encode, _bpe_encode_sql())


def q_gnn_training_batch(spark, sf_dir):
    """GNN training-minibatch assembly: sampled 2-hop neighborhoods
    (fan-out k=5 from seeds id % 50 == 0) joined with 2-hop propagated
    features, flattened to the padded (1 + k + k^2)-slot tensor rows a
    trainer consumes (graph.gnn_training_batch)."""
    from ..graph import feature_propagation, gnn_training_batch

    e = edges_b(spark, sf_dir)
    v = verts(spark, V_B)
    feats = feature_propagation(e, v, hops=2)
    seeds = v.filter(F.col("id") % 50 == 0)
    return gnn_training_batch(e, seeds, feats, k=5)


def _gnn_batch_sql(k: int = 5) -> str:
    from ..graph import neighbor_sample_sql

    ns = neighbor_sample_sql(k, edges_cte="und_b").strip()
    n_slots = 1 + k + k * k
    return f"""
WITH {EDGES_B_SQL}, {UND_B_SQL}, {VERTS_B_SQL},
ns AS ({ns}),
x0 AS (
  SELECT v.id, CAST(coalesce(d.x, 0) AS BIGINT) AS x
  FROM verts_b v LEFT JOIN (
    SELECT src AS id, count(*) AS x FROM und_b GROUP BY src
  ) d USING (id)
),
x1 AS (
  SELECT v.id, CAST(coalesce(a.x, 0) AS BIGINT) AS x
  FROM verts_b v LEFT JOIN (
    SELECT s.src AS id, CAST(round(avg(n.x) * 1e6) AS BIGINT) AS x
    FROM und_b s JOIN x0 n ON s.dst = n.id GROUP BY s.src
  ) a USING (id)
),
x2 AS (
  SELECT v.id, CAST(coalesce(a.x, 0) AS BIGINT) AS x
  FROM verts_b v LEFT JOIN (
    SELECT s.src AS id, CAST(round(avg(n.x)) AS BIGINT) AS x
    FROM und_b s JOIN x1 n ON s.dst = n.id GROUP BY s.src
  ) a USING (id)
),
feats AS (
  SELECT x0.id, x0.x AS x0, x1.x AS x1_e6, x2.x AS x2_e6
  FROM x0 JOIN x1 USING (id) JOIN x2 USING (id)
),
seeds AS (SELECT id AS seed FROM verts_b WHERE id % 50 = 0),
h1 AS (
  SELECT s.seed, ns.draw_rank AS r1, ns.dst AS n1
  FROM seeds s JOIN ns ON ns.src = s.seed
),
h2 AS (
  SELECT h1.seed, h1.r1, ns.draw_rank AS r2, ns.dst AS n2
  FROM h1 JOIN ns ON ns.src = h1.n1
),
actual AS (
  SELECT seed, CAST(0 AS BIGINT) AS idx, seed AS nbr FROM seeds
  UNION ALL
  SELECT seed, CAST(r1 AS BIGINT), n1 FROM h1
  UNION ALL
  SELECT seed, CAST({k} + (r1 - 1) * {k} + r2 AS BIGINT), n2 FROM h2
),
tmpl AS (
  SELECT seed, CAST(t.idx AS BIGINT) AS idx
  FROM seeds CROSS JOIN range(0, {n_slots}) t(idx)
)
SELECT t.seed,
       CAST(CASE WHEN t.idx = 0 THEN 0
                 WHEN t.idx <= {k} THEN 1 ELSE 2 END AS BIGINT) AS hop,
       CAST(CASE WHEN t.idx <= {k} THEN t.idx
                 ELSE t.idx - {k} END AS BIGINT) AS slot,
       CAST(coalesce(a.nbr, -1) AS BIGINT) AS nbr_id,
       CAST(coalesce(f.x0, 0) AS BIGINT) AS x0,
       CAST(coalesce(f.x1_e6, 0) AS BIGINT) AS x1_e6,
       CAST(coalesce(f.x2_e6, 0) AS BIGINT) AS x2_e6
FROM tmpl t
LEFT JOIN actual a USING (seed, idx)
LEFT JOIN feats f ON f.id = a.nbr
"""


REGISTRY["gnn_training_batch"] = (q_gnn_training_batch, _gnn_batch_sql())


# ---------------------------------------------------------------------------


# re-export everything (incl. underscore helpers) to the next
# module in the suite package chain and to suite/__init__.py
__all__ = [_n for _n in dir() if not _n.startswith('__')]
