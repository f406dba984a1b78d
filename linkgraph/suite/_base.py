"""Driver-facing query suite: paired (Spark DataFrame fn, DuckDB oracle SQL).

Each entry computes the same result two ways: the engine's Spark pipeline
and an independent ANSI-SQL oracle that DuckDB runs on the same parquet
tables (the driver's correctness gate).  The graph queries run over edge
tables derived *deterministically* (pure integer arithmetic — identical in
both engines) from the lineitem/orders tables, mirroring the reference's
oracle pattern of exact counters vs. engine output
(/root/reference/naive_implementation/, /root/reference/sampling/Graph.cpp:169-291).

Float outputs are emitted as scaled BIGINTs (e.g. round(rank*1e8)) so the
value-hash comparison is immune to formatting / last-ulp differences.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

V_A = 2000  # larger derived graph (lineitem): degrees/pagerank/triangles/stars
V_B = 300   # smaller derived graph (orders): components/labelprop/4-chain/4-clique

STOPWORDS = ("the", "a", "and", "of", "to", "in")

# ---------------------------------------------------------------------------
# derived graph inputs (Spark side)
# ---------------------------------------------------------------------------


def edges_a(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    s = (F.col("l_orderkey").cast("long") * 7 + F.col("l_linenumber").cast("long")) % V_A
    d = (F.col("l_partkey").cast("long") * 11 + 3) % V_A
    return (
        li.select(s.alias("src"), d.alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def edges_b(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    s = (F.col("o_orderkey").cast("long") * 13 + 7) % V_B
    d = (F.col("o_custkey").cast("long") * 17 + 5) % V_B
    return (
        o.filter(F.col("o_orderkey") % 10 < 2)
        .select(s.alias("src"), d.alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def verts(spark: SparkSession, n: int) -> DataFrame:
    return spark.range(n).select(F.col("id"))


def _scalar_df(spark: SparkSession, name: str, value: int) -> DataFrame:
    return spark.createDataFrame([(int(value),)], f"{name} long")


# ---------------------------------------------------------------------------
# derived graph inputs (SQL side)
# ---------------------------------------------------------------------------

EDGES_A_SQL = f"""
edges_a AS (
  SELECT DISTINCT
    CAST((l_orderkey * 7 + l_linenumber) % {V_A} AS BIGINT) AS src,
    CAST((l_partkey * 11 + 3) % {V_A} AS BIGINT) AS dst
  FROM lineitem
  WHERE (l_orderkey * 7 + l_linenumber) % {V_A} <> (l_partkey * 11 + 3) % {V_A}
)"""

EDGES_B_SQL = f"""
edges_b AS (
  SELECT DISTINCT
    CAST((o_orderkey * 13 + 7) % {V_B} AS BIGINT) AS src,
    CAST((o_custkey * 17 + 5) % {V_B} AS BIGINT) AS dst
  FROM orders
  WHERE o_orderkey % 10 < 2
    AND (o_orderkey * 13 + 7) % {V_B} <> (o_custkey * 17 + 5) % {V_B}
)"""

VERTS_A_SQL = f"verts_a AS (SELECT CAST(range AS BIGINT) AS id FROM range({V_A}))"
VERTS_B_SQL = f"verts_b AS (SELECT CAST(range AS BIGINT) AS id FROM range({V_B}))"
# NOTE: explicit DISTINCT over UNION ALL, not bare UNION — DuckDB 1.0
# stops deduplicating a bare UNION inside non-self-referencing CTEs when
# the query is WITH RECURSIVE (observed: und_b 5486 -> 5558 rows), which
# silently corrupts any multiplicity-sensitive consumer (degrees, counts).
UND_A_SQL = """
und_a AS (
  SELECT DISTINCT src, dst FROM (
    SELECT src, dst FROM edges_a
    UNION ALL
    SELECT dst AS src, src AS dst FROM edges_a
  ) u
)"""
UND_B_SQL = """
und_b AS (
  SELECT DISTINCT src, dst FROM (
    SELECT src, dst FROM edges_b
    UNION ALL
    SELECT dst AS src, src AS dst FROM edges_b
  ) u
)"""
OE_A_SQL = "oe_a AS (SELECT DISTINCT least(src,dst) AS a, greatest(src,dst) AS b FROM edges_a)"
OE_B_SQL = "oe_b AS (SELECT DISTINCT least(src,dst) AS a, greatest(src,dst) AS b FROM edges_b)"


# ---------------------------------------------------------------------------
# graph queries
# ---------------------------------------------------------------------------


def q_degrees(spark, sf_dir):
    from ..graph import LinkGraph

    g = LinkGraph(edges_a(spark, sf_dir), vertices=verts(spark, V_A), partitions=16)
    return g.degrees().select(
        "id",
        F.col("out_degree").cast("long").alias("out_degree"),
        F.col("in_degree").cast("long").alias("in_degree"),
        F.col("degree").cast("long").alias("degree"),
    )


DEGREES_SQL = f"""
WITH {EDGES_A_SQL}, {VERTS_A_SQL}, {UND_A_SQL}
SELECT v.id,
       CAST(coalesce(o.c, 0) AS BIGINT) AS out_degree,
       CAST(coalesce(i.c, 0) AS BIGINT) AS in_degree,
       CAST(coalesce(u.c, 0) AS BIGINT) AS degree
FROM verts_a v
LEFT JOIN (SELECT src, count(*) AS c FROM edges_a GROUP BY src) o ON v.id = o.src
LEFT JOIN (SELECT dst, count(*) AS c FROM edges_a GROUP BY dst) i ON v.id = i.dst
LEFT JOIN (SELECT src, count(*) AS c FROM und_a GROUP BY src) u ON v.id = u.src
"""


def q_triangle_count(spark, sf_dir):
    from ..algos import triangle_count

    return _scalar_df(spark, "triangles", triangle_count(edges_a(spark, sf_dir)))


TRIANGLE_SQL = f"""
WITH {EDGES_A_SQL}, {OE_A_SQL}
SELECT CAST(count(*) AS BIGINT) AS triangles
FROM oe_a e1
JOIN oe_a e2 ON e1.b = e2.a
JOIN oe_a e3 ON e3.a = e1.a AND e3.b = e2.b
"""


def q_clustering_coeff(spark, sf_dir):
    """Per-vertex local clustering coefficient: triangles_v / C(deg_v, 2),
    scaled e6 (0 for degree < 2) — composed from per-vertex triangle
    participation (oriented self-joins) and the undirected degree table."""
    from ..algos.triangles import per_vertex_triangle_counts
    from ..graph import LinkGraph

    g = LinkGraph(edges_a(spark, sf_dir), vertices=verts(spark, V_A), partitions=16)
    deg = g.degrees().select("id", "degree")
    tri = per_vertex_triangle_counts(edges_a(spark, sf_dir))
    pairs = (F.col("degree") * (F.col("degree") - 1) / 2).cast("double")
    return (
        deg.join(tri, "id", "left")
        .select(
            "id",
            F.when(
                F.col("degree") >= 2,
                F.round(F.coalesce(F.col("triangles"), F.lit(0)) / pairs * 1e6),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("lcc_e6"),
        )
    )


CLUSTERING_COEFF_SQL = f"""
WITH {EDGES_A_SQL}, {VERTS_A_SQL}, {UND_A_SQL}, {OE_A_SQL},
tri AS (
  SELECT e1.a AS a, e1.b AS b, e2.b AS c
  FROM oe_a e1
  JOIN oe_a e2 ON e1.b = e2.a
  JOIN oe_a e3 ON e3.a = e1.a AND e3.b = e2.b
),
tv AS (
  SELECT id, count(*) AS triangles FROM (
    SELECT a AS id FROM tri UNION ALL SELECT b FROM tri UNION ALL SELECT c FROM tri
  ) GROUP BY id
),
deg AS (SELECT src AS id, count(*) AS degree FROM und_a GROUP BY src)
SELECT v.id,
       CAST(CASE WHEN coalesce(d.degree, 0) >= 2
            THEN round(coalesce(t.triangles, 0) * 1e6 / (d.degree * (d.degree - 1) / 2.0))
            ELSE 0 END AS BIGINT) AS lcc_e6
FROM verts_a v
LEFT JOIN deg d ON v.id = d.id
LEFT JOIN tv t ON v.id = t.id
"""


def q_hits3(spark, sf_dir):
    """HITS hubs/authorities, 3 fixed L2-normalized iterations (e6-scaled,
    value-checked vs an iterative SQL twin)."""
    from ..algos.hits import hits

    out = hits(edges_b(spark, sf_dir), vertices=verts(spark, V_B),
               num_iters=3, partitions=8)
    return out.select(
        "id",
        F.round(F.col("hub") * 1e6).cast("long").alias("hub_e6"),
        F.round(F.col("authority") * 1e6).cast("long").alias("auth_e6"),
    )


def _hits_sql(num_iters: int, edges_sql: str, verts_sql: str,
              verts_name: str, edges_name: str) -> str:
    parts = [edges_sql, verts_sql,
             f"s0 AS (SELECT id, 1.0 AS hub, 1.0 AS auth FROM {verts_name})"]
    for i in range(1, num_iters + 1):
        p = f"s{i - 1}"
        parts.append(
            f"""ar{i} AS (SELECT e.dst AS id, sum(s.hub) AS r
                 FROM {edges_name} e JOIN {p} s ON e.src = s.id GROUP BY e.dst)"""
        )
        parts.append(
            f"""av{i} AS MATERIALIZED (SELECT v.id, s.hub, coalesce(ar.r, 0) AS auth
                 FROM {verts_name} v JOIN {p} s ON v.id = s.id
                 LEFT JOIN ar{i} ar ON v.id = ar.id)"""
        )
        parts.append(
            f"an{i} AS (SELECT CASE WHEN sqrt(sum(auth*auth)) = 0 THEN 1.0 "
            f"ELSE sqrt(sum(auth*auth)) END AS n FROM av{i})"
        )
        parts.append(
            f"a{i} AS MATERIALIZED (SELECT av.id, av.hub, av.auth / n.n AS auth FROM av{i} av CROSS JOIN an{i} n)"
        )
        parts.append(
            f"""hr{i} AS (SELECT e.src AS id, sum(a.auth) AS r
                 FROM {edges_name} e JOIN a{i} a ON e.dst = a.id GROUP BY e.src)"""
        )
        parts.append(
            f"""hv{i} AS MATERIALIZED (SELECT v.id, coalesce(hr.r, 0) AS hub, a.auth
                 FROM {verts_name} v JOIN a{i} a ON v.id = a.id
                 LEFT JOIN hr{i} hr ON v.id = hr.id)"""
        )
        parts.append(
            f"hn{i} AS (SELECT CASE WHEN sqrt(sum(hub*hub)) = 0 THEN 1.0 "
            f"ELSE sqrt(sum(hub*hub)) END AS n FROM hv{i})"
        )
        parts.append(
            f"s{i} AS MATERIALIZED (SELECT hv.id, hv.hub / n.n AS hub, hv.auth FROM hv{i} hv CROSS JOIN hn{i} n)"
        )
    return (
        "WITH " + ",\n".join(parts)
        + f"""\nSELECT id, CAST(round(hub * 1e6) AS BIGINT) AS hub_e6,
       CAST(round(auth * 1e6) AS BIGINT) AS auth_e6 FROM s{num_iters}"""
    )


HITS3_SQL = _hits_sql(3, EDGES_B_SQL, VERTS_B_SQL, "verts_b", "edges_b")


def q_pagerank5(spark, sf_dir):
    from ..algos import pagerank

    ranks, _ = pagerank(
        edges_a(spark, sf_dir), vertices=verts(spark, V_A), num_iters=5, partitions=16
    )
    return ranks.select(
        "id", F.round(F.col("rank") * 1e8).cast("long").alias("rank_e8")
    )


def q_pagerank_grid5(spark, sf_dir):
    """PageRank on the 2-D grid (dst-bucketed) adjacency layout
    (pagerank.bucketed_adjacency_blocks): per-task aggregation state
    bounded by V/K and a <=V-row contribution shuffle — the declared
    V~1e10 layout.  Shares the unrolled-SQL oracle with pagerank_5iter:
    a green hash gate here proves the grid layout is answer-invariant."""
    from ..algos import pagerank

    ranks, _ = pagerank(
        edges_a(spark, sf_dir), vertices=verts(spark, V_A), num_iters=5,
        partitions=16, dst_buckets=16,
    )
    return ranks.select(
        "id", F.round(F.col("rank") * 1e8).cast("long").alias("rank_e8")
    )


def _pagerank_sql(num_iters: int, v: int, edges_sql: str, verts_sql: str,
                  verts_name: str, edges_name: str) -> str:
    d = 0.85
    parts = [
        edges_sql,
        verts_sql,
        f"outd AS (SELECT src AS id, CAST(count(*) AS DOUBLE) AS od FROM {edges_name} GROUP BY src)",
        f"r0 AS (SELECT id, 1.0/{v} AS rank FROM {verts_name})",
    ]
    for i in range(1, num_iters + 1):
        p = f"r{i - 1}"
        parts.append(
            f"""d{i} AS (SELECT coalesce(sum(r.rank), 0) AS dm FROM {p} r
                 LEFT JOIN outd o ON r.id = o.id WHERE o.id IS NULL)"""
        )
        parts.append(
            f"""c{i} AS (SELECT e.dst AS id, sum(r.rank / o.od) AS contrib
                 FROM {edges_name} e JOIN {p} r ON e.src = r.id
                 JOIN outd o ON e.src = o.id GROUP BY e.dst)"""
        )
        parts.append(
            f"""r{i} AS (SELECT v.id,
                 {(1.0 - d) / v!r} + {d} * (coalesce(c.contrib, 0) + (SELECT dm FROM d{i})/{v}) AS rank
                 FROM {verts_name} v LEFT JOIN c{i} c ON v.id = c.id)"""
        )
    return (
        "WITH " + ",\n".join(parts)
        + f"\nSELECT id, CAST(round(rank * 100000000) AS BIGINT) AS rank_e8 FROM r{num_iters}"
    )


PAGERANK5_SQL = _pagerank_sql(5, V_A, EDGES_A_SQL, VERTS_A_SQL, "verts_a", "edges_a")


PPR_SOURCES = (0, 3, 7, 11)


def q_ppr5(spark, sf_dir):
    """Personalized PageRank from a fixed source set, 5 fixed iterations
    (e8-scaled, value-checked vs an iterative SQL twin)."""
    from ..algos.pagerank import personalized_pagerank

    ranks = personalized_pagerank(
        edges_b(spark, sf_dir),
        sources=spark.createDataFrame([(s,) for s in PPR_SOURCES], "id long"),
        vertices=verts(spark, V_B), num_iters=5, partitions=8,
    )
    return ranks.select(
        "id", F.round(F.col("rank") * 1e8).cast("long").alias("rank_e8")
    )


def _ppr_sql(num_iters: int, sources: tuple, edges_sql: str, verts_sql: str,
             verts_name: str, edges_name: str) -> str:
    d = 0.85
    src_list = ", ".join(str(x) for x in sources)
    parts = [
        edges_sql, verts_sql,
        f"outd AS (SELECT src AS id, CAST(count(*) AS DOUBLE) AS od FROM {edges_name} GROUP BY src)",
        f"reset AS (SELECT id, CASE WHEN id IN ({src_list}) THEN 1.0/{len(sources)} ELSE 0.0 END AS p FROM {verts_name})",
        "r0 AS (SELECT id, p AS rank FROM reset)",
    ]
    for i in range(1, num_iters + 1):
        p = f"r{i - 1}"
        parts.append(
            f"""d{i} AS MATERIALIZED (SELECT coalesce(sum(r.rank), 0) AS dm FROM {p} r
                 LEFT JOIN outd o ON r.id = o.id WHERE o.id IS NULL)"""
        )
        parts.append(
            f"""c{i} AS MATERIALIZED (SELECT e.dst AS id, sum(r.rank / o.od) AS contrib
                 FROM {edges_name} e JOIN {p} r ON e.src = r.id
                 JOIN outd o ON e.src = o.id GROUP BY e.dst)"""
        )
        parts.append(
            f"""r{i} AS MATERIALIZED (SELECT v.id,
                 {1.0 - d} * rs.p + {d} * (coalesce(c.contrib, 0) + dd.dm * rs.p) AS rank
                 FROM {verts_name} v
                 JOIN reset rs ON v.id = rs.id
                 LEFT JOIN c{i} c ON v.id = c.id
                 CROSS JOIN d{i} dd)"""
        )
    return (
        "WITH " + ",\n".join(parts)
        + f"\nSELECT id, CAST(round(rank * 100000000) AS BIGINT) AS rank_e8 FROM r{num_iters}"
    )


PPR5_SQL = _ppr_sql(5, PPR_SOURCES, EDGES_B_SQL, VERTS_B_SQL, "verts_b", "edges_b")


def q_graph_summary(spark, sf_dir):
    """One-row web-graph summary: edge/vertex counts, density_e9,
    reciprocity_e6 (fraction of directed edges whose reverse exists),
    max/avg degree — the metadata pass a crawl pipeline runs first."""
    e = edges_a(spark, sf_dir).persist()
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    n_recip = e.join(rev, ["src", "dst"], "left_semi").count()
    m = e.count()
    und_deg = (
        e.select("src", "dst")
        .union(rev)
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .groupBy("src")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    row = und_deg.agg(
        F.max("d").alias("maxd"), F.sum("d").alias("sumd"),
        F.count(F.lit(1)).alias("nv"),
    ).collect()[0]
    e.unpersist()
    V = V_A
    return spark.createDataFrame(
        [(
            int(m), int(V),
            int(round(m / (V * (V - 1)) * 1e9)),
            int(round(n_recip / m * 1e6)),
            int(row["maxd"]),
            int(round(row["sumd"] / row["nv"] * 1e6)),
        )],
        "n_edges long, n_vertices long, density_e9 long, reciprocity_e6 long, "
        "max_degree long, avg_degree_e6 long",
    )


GRAPH_SUMMARY_SQL = f"""
WITH {EDGES_A_SQL}, {UND_A_SQL},
m AS (SELECT count(*) AS m FROM edges_a),
r AS (SELECT count(*) AS n FROM edges_a e
      WHERE EXISTS (SELECT 1 FROM edges_a x WHERE x.src = e.dst AND x.dst = e.src)),
deg AS (SELECT src, count(*) AS d FROM und_a GROUP BY src),
ds AS (SELECT max(d) AS maxd, sum(d) AS sumd, count(*) AS nv FROM deg)
SELECT CAST(m.m AS BIGINT) AS n_edges,
       CAST({V_A} AS BIGINT) AS n_vertices,
       CAST(round(m.m * 1e9 / ({V_A} * ({V_A} - 1))) AS BIGINT) AS density_e9,
       CAST(round(r.n * 1e6 / m.m) AS BIGINT) AS reciprocity_e6,
       CAST(ds.maxd AS BIGINT) AS max_degree,
       CAST(round(ds.sumd * 1e6 / ds.nv) AS BIGINT) AS avg_degree_e6
FROM m CROSS JOIN r CROSS JOIN ds
"""


def q_components(spark, sf_dir):
    from ..algos import connected_components

    labels, _ = connected_components(
        edges_b(spark, sf_dir), vertices=verts(spark, V_B), partitions=8
    )
    return labels.select("id", F.col("component").cast("long").alias("component"))


COMPONENTS_SQL = f"""
WITH RECURSIVE {EDGES_B_SQL}, {VERTS_B_SQL}, {UND_B_SQL},
reach(id, comp) AS (
  SELECT id, id FROM verts_b
  UNION
  SELECT e.dst, r.comp FROM reach r JOIN und_b e ON e.src = r.id
)
SELECT id, CAST(min(comp) AS BIGINT) AS component FROM reach GROUP BY id
"""


def q_labelprop3(spark, sf_dir):
    from ..algos import label_propagation

    labels, _ = label_propagation(
        edges_b(spark, sf_dir), vertices=verts(spark, V_B), max_iter=3, partitions=8
    )
    return labels.select("id", F.col("label").cast("long").alias("label"))


def _labelprop_sql(num_iters: int) -> str:
    parts = [EDGES_B_SQL, VERTS_B_SQL, UND_B_SQL,
             "l0 AS (SELECT id, id AS label FROM verts_b)"]
    for i in range(1, num_iters + 1):
        p = f"l{i - 1}"
        parts.append(
            f"""n{i} AS (SELECT e.src AS id, l.label, count(*) AS cnt
                 FROM und_b e JOIN {p} l ON l.id = e.dst GROUP BY e.src, l.label)"""
        )
        parts.append(
            f"""b{i} AS (SELECT id, label FROM (
                 SELECT id, label,
                        row_number() OVER (PARTITION BY id ORDER BY cnt DESC, label ASC) AS rn
                 FROM n{i}) t WHERE rn = 1)"""
        )
        parts.append(
            f"""l{i} AS (SELECT l.id, CAST(coalesce(b.label, l.label) AS BIGINT) AS label
                 FROM {p} l LEFT JOIN b{i} b ON l.id = b.id)"""
        )
    return "WITH " + ",\n".join(parts) + f"\nSELECT id, label FROM l{num_iters}"


LABELPROP3_SQL = _labelprop_sql(3)


def q_three_chain(spark, sf_dir):
    from ..algos import motifs

    return _scalar_df(
        spark, "three_chains", motifs.three_chain_count(edges_a(spark, sf_dir))
    )


THREE_CHAIN_SQL = f"""
WITH {EDGES_A_SQL}, {UND_A_SQL}
SELECT CAST(coalesce(sum(d * (d - 1) / 2), 0) AS BIGINT) AS three_chains
FROM (SELECT count(*) AS d FROM und_a GROUP BY src) t
"""


def q_five_star(spark, sf_dir):
    from ..algos import motifs

    return _scalar_df(spark, "five_stars", motifs.k_star_count(edges_a(spark, sf_dir), 5))


FIVE_STAR_SQL = f"""
WITH {EDGES_A_SQL}, {UND_A_SQL}
SELECT CAST(coalesce(sum(CASE WHEN d >= 5
        THEN d*(d-1)*(d-2)*(d-3)*(d-4)/120 ELSE 0 END), 0) AS BIGINT) AS five_stars
FROM (SELECT count(*) AS d FROM und_a GROUP BY src) t
"""


def q_four_chain(spark, sf_dir):
    from ..algos import motifs

    return _scalar_df(spark, "four_chains", motifs.four_chain_count(edges_b(spark, sf_dir)))


FOUR_CHAIN_SQL = f"""
WITH {EDGES_B_SQL}, {UND_B_SQL}
SELECT CAST(count(*) / 2 AS BIGINT) AS four_chains
FROM und_b e1
JOIN und_b e2 ON e1.dst = e2.src AND e2.dst <> e1.src
JOIN und_b e3 ON e2.dst = e3.src AND e3.dst <> e2.src AND e3.dst <> e1.src
"""


def q_four_clique(spark, sf_dir):
    from ..algos import motifs

    return _scalar_df(spark, "four_cliques", motifs.four_clique_count(edges_b(spark, sf_dir)))


FOUR_CLIQUE_SQL = f"""
WITH {EDGES_B_SQL}, {OE_B_SQL}
SELECT CAST(count(*) AS BIGINT) AS four_cliques
FROM oe_b e1
JOIN oe_b e2 ON e1.b = e2.a
JOIN oe_b e3 ON e3.a = e1.a AND e3.b = e2.b
JOIN oe_b e4 ON e4.a = e2.b
JOIN oe_b e5 ON e5.a = e1.a AND e5.b = e4.b
JOIN oe_b e6 ON e6.a = e1.b AND e6.b = e4.b
"""


def q_graph_filter_weighted(spark, sf_dir):
    """GraphFilter parity (/root/reference/src/GraphFilters.cpp + the
    weight >= 50 predicate of /root/reference/tests/TestGraphFilter.cpp:35-37);
    weights derived arithmetically like the reference's rand()%79 weighting
    (/root/reference/datasets/toolkits/get_weighted_datasets.cpp:39-46)."""
    from ..graph import LinkGraph

    e = edges_a(spark, sf_dir).withColumn(
        "weight", ((F.col("src") * 31 + F.col("dst") * 7) % 79).cast("long")
    )
    g = LinkGraph(e, partitions=16, weighted=True).filter_edges(F.col("weight") >= 50)
    return g.edges.agg(
        F.count(F.lit(1)).cast("long").alias("n_edges"),
        F.sum("weight").cast("long").alias("total_weight"),
    )


GRAPH_FILTER_SQL = f"""
WITH {EDGES_A_SQL},
w AS (SELECT src, dst, (src * 31 + dst * 7) % 79 AS weight FROM edges_a)
SELECT CAST(count(*) AS BIGINT) AS n_edges,
       CAST(sum(weight) AS BIGINT) AS total_weight
FROM w WHERE weight >= 50
"""


def q_edge_sample_deterministic(spark, sf_dir):
    """GraphSampler-shaped deterministic sample (hash-mod Bernoulli at 5%,
    the reference default rate — /root/reference/src/Graph.cpp:624-780)."""
    e = edges_a(spark, sf_dir).filter((F.col("src") * 100003 + F.col("dst")) % 20 == 0)
    return e.agg(
        F.count(F.lit(1)).cast("long").alias("n_edges"),
        F.sum(F.col("src") + F.col("dst")).cast("long").alias("endpoint_sum"),
    )


EDGE_SAMPLE_SQL = f"""
WITH {EDGES_A_SQL}
SELECT CAST(count(*) AS BIGINT) AS n_edges,
       CAST(sum(src + dst) AS BIGINT) AS endpoint_sum
FROM edges_a WHERE (src * 100003 + dst) % 20 = 0
"""


# ---------------------------------------------------------------------------
# text / document queries
# ---------------------------------------------------------------------------


def q_doc_token_stats(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    t = F.trim(F.col("text"))
    return d.select(
        "doc_id",
        F.when(F.length(t) == 0, F.lit(0))
        .otherwise(F.size(F.split(t, r"\s+")))
        .cast("long")
        .alias("n_tokens"),
        F.length(F.col("text")).cast("long").alias("n_chars_measured"),
    )


DOC_TOKEN_SQL = r"""
SELECT doc_id,
       CAST(CASE WHEN length(trim(text)) = 0 THEN 0
            ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS BIGINT) AS n_tokens,
       CAST(length(text) AS BIGINT) AS n_chars_measured
FROM documents
"""


def q_doc_quality(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    words = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    n_words = F.size(words)
    stops = F.size(F.filter(words, lambda w: w.isin(*STOPWORDS)))
    nonspace = F.length(F.regexp_replace(F.col("text"), r"\s", ""))
    return d.select(
        "doc_id",
        n_words.cast("long").alias("n_words"),
        stops.cast("long").alias("n_stopwords"),
        F.round(nonspace / n_words * 1e6).cast("long").alias("mean_word_len_e6"),
        F.round(stops / n_words * 1e6).cast("long").alias("stop_ratio_e6"),
    )


DOC_QUALITY_SQL = rf"""
WITH w AS (
  SELECT doc_id,
         regexp_split_to_array(trim(lower(text)), '\s+') AS words,
         length(regexp_replace(text, '\s', '', 'g')) AS nonspace
  FROM documents
)
SELECT doc_id,
       CAST(len(words) AS BIGINT) AS n_words,
       CAST(len(list_filter(words, x -> x IN {STOPWORDS!r})) AS BIGINT) AS n_stopwords,
       CAST(round(nonspace * 1e6 / len(words)) AS BIGINT) AS mean_word_len_e6,
       CAST(round(len(list_filter(words, x -> x IN {STOPWORDS!r})) * 1e6 / len(words)) AS BIGINT) AS stop_ratio_e6
FROM w
"""


def q_exact_dedup(spark, sf_dir):
    """Exact + bag-of-words-normalized dedup over documents (hash-groupBy)."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    norm = F.array_join(F.array_sort(F.split(F.trim(F.lower(F.col("text"))), r"\s+")), " ")
    h = d.select("doc_id", F.md5(norm).alias("norm_hash"))
    keep = h.groupBy("norm_hash").agg(F.min("doc_id").alias("keep_id"))
    return h.join(keep, "norm_hash").select(
        "doc_id",
        "norm_hash",
        F.col("keep_id").cast("long").alias("keep_id"),
        (F.col("doc_id") != F.col("keep_id")).alias("is_dup"),
    )


EXACT_DEDUP_SQL = r"""
WITH h AS (
  SELECT doc_id,
         md5(array_to_string(list_sort(regexp_split_to_array(trim(lower(text)), '\s+')), ' ')) AS norm_hash
  FROM documents
),
keep AS (SELECT norm_hash, min(doc_id) AS keep_id FROM h GROUP BY norm_hash)
SELECT h.doc_id, h.norm_hash, CAST(k.keep_id AS BIGINT) AS keep_id,
       h.doc_id <> k.keep_id AS is_dup
FROM h JOIN keep k ON h.norm_hash = k.norm_hash
"""


def q_lang_guess(spark, sf_dir):
    """Deterministic marker-based language heuristic (n-gram/stopword style)."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    low = F.concat(F.lit(" "), F.lower(F.col("text")), F.lit(" "))

    def occur(tok):
        return (F.length(low) - F.length(F.regexp_replace(low, tok, ""))) / len(tok)

    en = occur(" the ") + occur(" and ")
    es = occur(" el ") + occur(" la ") + occur(" los ")
    zh = occur(" de ") + occur(" shi ")
    return d.select(
        "doc_id",
        "lang",
        F.when(en >= F.greatest(es, zh), F.lit("en"))
        .when(es >= zh, F.lit("es"))
        .otherwise(F.lit("zh"))
        .alias("lang_pred"),
    )


LANG_GUESS_SQL = """
WITH t AS (
  SELECT doc_id, lang, ' ' || lower(text) || ' ' AS low FROM documents
),
s AS (
  SELECT doc_id, lang,
    (length(low) - length(replace(low, ' the ', ''))) / 5.0
      + (length(low) - length(replace(low, ' and ', ''))) / 5.0 AS en,
    (length(low) - length(replace(low, ' el ', ''))) / 4.0
      + (length(low) - length(replace(low, ' la ', ''))) / 4.0
      + (length(low) - length(replace(low, ' los ', ''))) / 5.0 AS es,
    (length(low) - length(replace(low, ' de ', ''))) / 4.0
      + (length(low) - length(replace(low, ' shi ', ''))) / 5.0 AS zh
  FROM t
)
SELECT doc_id, lang,
       CASE WHEN en >= greatest(es, zh) THEN 'en'
            WHEN es >= zh THEN 'es' ELSE 'zh' END AS lang_pred
FROM s
"""


# ---------------------------------------------------------------------------
# embeddings: brute-force cosine top-k
# ---------------------------------------------------------------------------


def q_embedding_topk(spark, sf_dir):
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    q = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("qemb")
    )
    dot = F.aggregate(
        F.zip_with(F.col("qemb"), F.col("emb"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(c, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    sim = dot / (norm(F.col("qemb")) * norm(F.col("emb")))
    pairs = (
        q.crossJoin(e)
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"), sim.alias("sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select(
            "query_id",
            "neighbor_id",
            F.round(F.col("sim") * 1e6).cast("long").alias("sim_e6"),
        )
    )


EMBEDDING_TOPK_SQL = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
pairs AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         list_dot_product(q.emb, c.emb)
           / (sqrt(list_dot_product(q.emb, q.emb)) * sqrt(list_dot_product(c.emb, c.emb))) AS sim
  FROM e q JOIN e c ON q.vec_id < 10 AND c.vec_id <> q.vec_id
),
ranked AS (
  SELECT query_id, neighbor_id, sim,
         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rn
  FROM pairs
)
SELECT query_id, neighbor_id, CAST(round(sim * 1e6) AS BIGINT) AS sim_e6
FROM ranked WHERE rn <= 5
"""


# ---------------------------------------------------------------------------
# events: sessionization + windowed aggregation
# ---------------------------------------------------------------------------


def q_event_sessions(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    flagged = ev.withColumn(
        "new_s", F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    )
    return flagged.groupBy("user_id").agg(
        F.sum("new_s").cast("long").alias("n_sessions"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    )


EVENT_SESSIONS_SQL = """
WITH f AS (
  SELECT user_id,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch(ts - lag(ts) OVER w) > 1800 THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id, CAST(sum(new_s) AS BIGINT) AS n_sessions,
       CAST(count(*) AS BIGINT) AS n_events
FROM f GROUP BY user_id
"""


def q_event_hourly(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour"), "event_type"
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(F.sum("value") * 1e4).cast("long").alias("sum_value_e4"),
    )


EVENT_HOURLY_SQL = """
SELECT date_trunc('hour', ts) AS hour, event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(round(sum(value) * 1e4) AS BIGINT) AS sum_value_e4
FROM events GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# relational layer sanity (TPC-H-style)
# ---------------------------------------------------------------------------


def q_pricing_summary(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity") * 100).cast("long").alias("sum_qty_e2"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))) * 100)
        .cast("long")
        .alias("revenue_e2"),
        F.count(F.lit(1)).cast("long").alias("n_rows"),
    )


PRICING_SUMMARY_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(round(sum(l_quantity) * 100) AS BIGINT) AS sum_qty_e2,
       CAST(round(sum(l_extendedprice * (1 - l_discount)) * 100) AS BIGINT) AS revenue_e2,
       CAST(count(*) AS BIGINT) AS n_rows
FROM lineitem GROUP BY l_returnflag, l_linestatus
"""


def q_top_customer_per_nation(spark, sf_dir):
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    w = Window.partitionBy("n_name").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "n_name",
            F.col("c_custkey").cast("long").alias("c_custkey"),
            F.round(F.col("c_acctbal") * 100).cast("long").alias("acctbal_e2"),
            F.col("rn").cast("long").alias("rank"),
        )
    )


TOP_CUSTOMER_SQL = """
SELECT n_name, CAST(c_custkey AS BIGINT) AS c_custkey,
       CAST(round(c_acctbal * 100) AS BIGINT) AS acctbal_e2,
       CAST(rn AS BIGINT) AS rank
FROM (
  SELECT n.n_name, c.c_custkey, c.c_acctbal,
         row_number() OVER (PARTITION BY n.n_name
                            ORDER BY c.c_acctbal DESC, c.c_custkey ASC) AS rn
  FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
) t WHERE rn <= 3
"""


# ---------------------------------------------------------------------------
# near-dup dedup family (documents)
# ---------------------------------------------------------------------------


def q_minhash_lsh_dedup(spark, sf_dir):
    """MinHash(16) + LSH(8 bands) near-dup pairs, exact-Jaccard verified."""
    from .. import dedup

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return dedup.minhash_lsh_pairs(d, num_hashes=16, bands=8, jaccard_threshold=0.5)


def q_simhash_pairs(spark, sf_dir):
    """32-bit SimHash pairs with Hamming distance <= 3 — exact pigeonhole
    banding (4 disjoint 8-bit bands), output identical to brute force with
    an equi-join-only plan."""
    from .. import dedup

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return dedup.simhash_pairs(d, bits=32, max_hamming=3)


def q_ngram_jaccard(spark, sf_dir):
    """Exact word-3-gram Jaccard pairs >= 0.3 via the shingle inverted
    index (pairs sharing >= 1 shingle; grouped-count intersection) —
    output identical to brute force, no cross join."""
    from .. import dedup

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return dedup.ngram_jaccard_pairs(d, shingle_k=3, threshold=0.3)


def q_embedding_near_dup(spark, sf_dir):
    """Embedding-cosine near-dup detector (cos >= 0.45): hyperplane-LSH
    banded candidates + exact cosine verify; the banding is part of the
    detector's semantics and the oracle mirrors it exactly (dedup.py)."""
    from .. import dedup

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return dedup.embedding_near_dup_banded(e, threshold=0.45)


def q_doc_fingerprint(spark, sf_dir):
    """Karp-Rabin rolling-hash document fingerprints + fingerprint dedup."""
    from .. import text

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return text.doc_fingerprints(d)


def q_bpe_token_stats(spark, sf_dir):
    """BPE-ish regex tokenizer statistics per document."""
    from .. import text

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return text.bpe_token_stats(d)


# ---------------------------------------------------------------------------
# ANN (LSH-bucketed scale path; brute force is q_embedding_topk)
# ---------------------------------------------------------------------------


def q_ann_lsh_topk(spark, sf_dir):
    """Hyperplane-LSH bucketed cosine top-5 for queries vec_id < 20."""
    from .. import ann

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = e.filter(F.col("vec_id") < 20)
    return ann.lsh_topk(e, q, k=5, bands=3, planes_per_band=4, dim=64)


# ---------------------------------------------------------------------------
# multimodal binary-column plumbing (Arrow mapInPandas; decode is a stub)
# ---------------------------------------------------------------------------


def q_ann_ivf_topk(spark, sf_dir):
    """IVF coarse-quantizer ANN: probed-cluster exact rerank (value-checked
    vs the DuckDB twin of the same deterministic codebook)."""
    from .. import ann

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = e.filter(F.col("vec_id") < 20)
    return ann.ivf_topk(e, q, k=5, n_centroids=8, nprobe=2)


def q_multimodal_decode(spark, sf_dir):
    from .. import multimodal

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return multimodal.decode_features(multimodal.docs_as_blobs(d))


def q_multimodal_frames(spark, sf_dir):
    from .. import multimodal

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return multimodal.frame_sample(multimodal.docs_as_blobs(d), stride=64)


# ---------------------------------------------------------------------------
# structured streaming (parity vs the batch oracles)
# ---------------------------------------------------------------------------


def q_stream_hourly(spark, sf_dir):
    from .. import streaming

    return streaming.stream_hourly_counts(
        spark, f"{sf_dir}/events.parquet", sink_table="q_stream_hourly"
    )


def q_stream_sessions(spark, sf_dir):
    from .. import streaming

    return streaming.stream_sessionize(
        spark, f"{sf_dir}/events.parquet", sink_table="q_stream_sessions"
    )


def q_stream_sessions_buffered(spark, sf_dir):
    """Order-robust buffered sessionizer (watermark-finalized per-user
    event buffer, streaming.stream_sessionize_buffered) — same batch
    oracle as stream_sessions; the cross-batch out-of-order case is
    exercised in tests/test_streaming.py."""
    from .. import streaming

    return streaming.stream_sessionize_buffered(
        spark, f"{sf_dir}/events.parquet",
        sink_table="q_stream_sessions_buffered",
    )


# ---------------------------------------------------------------------------
# additional motif / predicate parity queries
# ---------------------------------------------------------------------------


def q_five_house(spark, sf_dir):
    from ..algos import motifs

    return _scalar_df(spark, "five_houses", motifs.five_house_count(edges_b(spark, sf_dir)))


FIVE_HOUSE_SQL = f"""
WITH {EDGES_B_SQL}, {UND_B_SQL},
roof AS (
  SELECT e01.src AS v0, e01.dst AS v1, e02.dst AS v2
  FROM und_b e01
  JOIN und_b e02 ON e01.src = e02.src AND e01.dst <> e02.dst
  WHERE EXISTS (SELECT 1 FROM und_b e12 WHERE e12.src = e01.dst AND e12.dst = e02.dst)
),
walls AS (
  SELECT r.v0, r.v1, r.v2, e13.dst AS v3, e24.dst AS v4
  FROM roof r
  JOIN und_b e13 ON e13.src = r.v1
  JOIN und_b e24 ON e24.src = r.v2
  WHERE e13.dst <> r.v0 AND e13.dst <> r.v2
    AND e24.dst <> r.v0 AND e24.dst <> r.v1 AND e24.dst <> e13.dst
)
SELECT CAST(count(*) / 2 AS BIGINT) AS five_houses
FROM walls w
WHERE EXISTS (SELECT 1 FROM und_b e34 WHERE e34.src = w.v3 AND e34.dst = w.v4)
"""

EDGES_C_SQL = """
edges_c AS (
  SELECT DISTINCT
    CAST((c_custkey * 19 + 11) % 150 AS BIGINT) AS src,
    CAST((c_nationkey * 23 + c_custkey * 3 + 1) % 150 AS BIGINT) AS dst
  FROM customer
  WHERE c_custkey % 7 < 2
    AND (c_custkey * 19 + 11) % 150 <> (c_nationkey * 23 + c_custkey * 3 + 1) % 150
)"""


def edges_c(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    s = (F.col("c_custkey").cast("long") * 19 + 11) % 150
    d = (F.col("c_nationkey").cast("long") * 23 + F.col("c_custkey").cast("long") * 3 + 1) % 150
    return (
        c.filter(F.col("c_custkey") % 7 < 2)
        .select(s.alias("src"), d.alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def q_five_chain(spark, sf_dir):
    """Runtime-parameterized k-chain (k=5), the reference's ChainMining
    (/root/reference/applications/ChainMining.cpp:18-106)."""
    from ..algos import motifs

    return _scalar_df(spark, "five_chains", motifs.k_chain_count(edges_c(spark, sf_dir), 5))


FIVE_CHAIN_SQL = f"""
WITH {EDGES_C_SQL},
und_c AS (
  SELECT src, dst FROM edges_c UNION SELECT dst, src FROM edges_c
)
SELECT CAST(count(*) / 2 AS BIGINT) AS five_chains
FROM und_c e1
JOIN und_c e2 ON e1.dst = e2.src AND e2.dst <> e1.src
JOIN und_c e3 ON e2.dst = e3.src AND e3.dst <> e2.src AND e3.dst <> e1.src
JOIN und_c e4 ON e3.dst = e4.src AND e4.dst <> e3.src AND e4.dst <> e2.src
                 AND e4.dst <> e1.src
"""


def q_at_least_one_weighted_triangle(spark, sf_dir):
    """Inclusion-exclusion predicate triangles: >= 1 edge with weight >= 50
    (/root/reference/applications/AtLeastOnePredicateWeightedTriangle.cpp:135-153)."""
    from ..algos import motifs

    e = edges_a(spark, sf_dir).withColumn(
        "weight", ((F.col("src") * 31 + F.col("dst") * 7) % 79).cast("long")
    )
    n = motifs.at_least_one_predicate_triangle_count(e, F.col("weight") >= 50)
    return _scalar_df(spark, "triangles_pred", n)


AT_LEAST_ONE_SQL = f"""
WITH {EDGES_A_SQL},
w AS (SELECT src, dst, (src * 31 + dst * 7) % 79 AS weight FROM edges_a),
oe_all AS (SELECT DISTINCT least(src,dst) AS a, greatest(src,dst) AS b FROM w),
oe_none AS (SELECT DISTINCT least(src,dst) AS a, greatest(src,dst) AS b
            FROM w WHERE NOT (weight >= 50)),
t_all AS (
  SELECT count(*) AS n FROM oe_all e1
  JOIN oe_all e2 ON e1.b = e2.a
  JOIN oe_all e3 ON e3.a = e1.a AND e3.b = e2.b
),
t_none AS (
  SELECT count(*) AS n FROM oe_none e1
  JOIN oe_none e2 ON e1.b = e2.a
  JOIN oe_none e3 ON e3.a = e1.a AND e3.b = e2.b
)
SELECT CAST((SELECT n FROM t_all) - (SELECT n FROM t_none) AS BIGINT) AS triangles_pred
"""


def q_three_motif(spark, sf_dir):
    """Both connected 3-vertex motifs in one pass over a shared cached
    intermediate (/root/reference/applications/ThreeMotif.cpp:42-122)."""
    from ..algos import motifs

    c = motifs.three_motif_counts(edges_a(spark, sf_dir))
    return spark.createDataFrame(
        [(c["triangle"], c["three_chain_open"], c["three_chain_total"])],
        "triangles long, three_chain_open long, three_chain_total long",
    )


THREE_MOTIF_SQL = f"""
WITH {EDGES_A_SQL}, {OE_A_SQL}, {UND_A_SQL},
tri AS (
  SELECT count(*) AS n FROM oe_a e1
  JOIN oe_a e2 ON e1.b = e2.a
  JOIN oe_a e3 ON e3.a = e1.a AND e3.b = e2.b
),
ch AS (
  SELECT coalesce(sum(d * (d - 1) / 2), 0) AS n
  FROM (SELECT count(*) AS d FROM und_a GROUP BY src) t
)
SELECT CAST((SELECT n FROM tri) AS BIGINT) AS triangles,
       CAST((SELECT n FROM ch) - 3 * (SELECT n FROM tri) AS BIGINT) AS three_chain_open,
       CAST((SELECT n FROM ch) AS BIGINT) AS three_chain_total
"""


def q_edgelist_roundtrip(spark, sf_dir):
    """Write the derived edge table to the reference's .edgelist and
    .biedgelist formats, read both back, and aggregate — proves the legacy
    source/sink path end-to-end (formats per SURVEY.md §1.2)."""
    import tempfile

    from .. import sources

    e = edges_c(spark, sf_dir)
    d = tempfile.mkdtemp(prefix="lg_fmt_")
    sources.write_edgelist(e, f"{d}/g.edgelist", 150)
    sources.write_biedgelist(e, f"{d}/g.biedgelist")
    a = sources.read_edgelist(spark, f"{d}/g.edgelist")
    b = sources.read_biedgelist(spark, f"{d}/g.biedgelist")
    agg = lambda df, tag: df.agg(  # noqa: E731
        F.lit(tag).alias("fmt"),
        F.count(F.lit(1)).cast("long").alias("n_edges"),
        F.sum(F.col("src") * 3 + F.col("dst")).cast("long").alias("checksum"),
    )
    return agg(a, "edgelist").union(agg(b, "biedgelist"))


EDGELIST_ROUNDTRIP_SQL = f"""
WITH {EDGES_C_SQL},
a AS (SELECT 'edgelist' AS fmt, CAST(count(*) AS BIGINT) AS n_edges,
             CAST(sum(src * 3 + dst) AS BIGINT) AS checksum FROM edges_c),
b AS (SELECT 'biedgelist' AS fmt, CAST(count(*) AS BIGINT) AS n_edges,
             CAST(sum(src * 3 + dst) AS BIGINT) AS checksum FROM edges_c)
SELECT * FROM a UNION ALL SELECT * FROM b
"""


# five_star is deliberately absent: the generic join chain enumerates
# sum(deg^4) tuples for stars — the closed-form C(deg,k) agg in
# motifs.k_star_count is the right plan (tested equal in tests/test_patterns.py)
# diamond / bowtie / five_cycle run on the dense 25-vertex fixture instead
# (see q_dense_patterns): on und_b their mechanical SQL twins cost DuckDB
# minutes (measured 457 s for the 4-pattern variant), and a parity oracle
# must stay cheap
GENERIC_PATTERNS = ("four_cycle", "tailed_triangle")


def q_generic_patterns(spark, sf_dir):
    """Declarative pattern queries through the generic compiler — the Spark
    analogue of the reference's SamplerGenerator entry point
    (/root/reference/applications/Triangle2.cpp:18-24); exact counts, plan
    auto-derived closure-first (algos/patterns.py)."""
    from ..algos import patterns

    e = edges_b(spark, sf_dir).persist()
    rows = [(n, patterns.pattern_count(e, patterns.PATTERNS[n]))
            for n in GENERIC_PATTERNS]
    e.unpersist()
    return spark.createDataFrame(rows, "pattern string, n long")


def _generic_patterns_sql() -> str:
    from ..algos import patterns

    subs = [
        f"SELECT '{n}' AS pattern, n FROM ("
        + patterns.pattern_count_sql(patterns.PATTERNS[n], "und_b", "n")
        + ")"
        for n in GENERIC_PATTERNS
    ]
    return (
        f"WITH {EDGES_B_SQL}, {UND_B_SQL}\n"
        + "\nUNION ALL\n".join(subs)
    )


def _eps_row(spark, est: float, exact: int, eps: float,
             exact_alias: str, flag_alias: str):
    """One-row (exact, within_eps) DataFrame — the DRIVER-CHECKABLE shape
    for randomized estimators: all randomness is hash-derived (see
    algos/triangles.py), so a fixed seed reproduces the same estimate at
    any parallelism, and the oracle asserts the exact count plus
    ``within_eps = TRUE`` (the reference's own acceptance criterion,
    ε = 5 %, /root/reference/applications/Triangle.cpp:117-118)."""
    ok = exact > 0 and abs(est - exact) <= eps * exact
    return spark.createDataFrame(
        [(int(exact), bool(ok))], f"{exact_alias} long, {flag_alias} boolean"
    )


def q_adaptive_triangle(spark, sf_dir):
    """Sequential adaptive-stopping estimate (IEStop) over batches of
    sampled-triangle estimators (reference: /root/reference/sampling/main.cpp:97-146).
    Deterministic given the seeds — the gate hash-checks exact + ε-bound."""
    from .. import adaptive
    from ..algos import triangles

    e = edges_b(spark, sf_dir).persist()
    stop = adaptive.IEStop(delta=0.2, alpha=0.05, min_samples=3, max_samples=6)
    est = stop.run(
        lambda n: triangles.triangle_count_sampled(e, 2048, seed=100 + n)
    )
    exact = triangles.triangle_count(e)
    e.unpersist()
    return _eps_row(spark, est, exact, 0.10, "exact_triangles", "within_10pct")


ADAPTIVE_TRIANGLE_SQL = f"""
WITH {EDGES_B_SQL}, {OE_B_SQL}
SELECT CAST(count(*) AS BIGINT) AS exact_triangles, TRUE AS within_10pct
FROM oe_b e1
JOIN oe_b e2 ON e1.b = e2.a
JOIN oe_b e3 ON e3.a = e1.a AND e3.b = e2.b
"""


_STREAM_INGEST_N = 200


def _stream_ingest_pages(spark):
    """Closed-form web-pages fixture: page i carries exactly ``2 + i % 4``
    distinct non-self outlinks, targets ``(i + 7j + 1) % N`` for
    j = 0..1+i%4 (7j+1 mod 200 ∈ {1,8,15,22,29,36} — never 0, all
    distinct, so no self-links and no per-page dupes for the extraction
    UDF to collapse).  Pure column expressions — the fixture's expected
    output is therefore expressible as plain SQL for the DuckDB oracle,
    while the Spark side still runs the REAL readStream + pandas-UDF
    extraction pipeline over it."""
    n = _STREAM_INGEST_N
    i = F.col("id").cast("long")

    def link(j):
        t = (i + j * F.lit(7) + 1) % n
        return F.concat(
            F.lit('<a href="https://site'),
            F.floor(t / 10).cast("long").cast("string"),
            F.lit(".example/page"),
            t.cast("string"),
            F.lit('">link</a>'),
        )

    links = F.array_join(
        F.transform(F.sequence(F.lit(0), (i % 4 + 1).cast("int")), link), ""
    )
    return spark.range(n).select(
        F.concat(
            F.lit("https://site"),
            F.floor(i / 10).cast("long").cast("string"),
            F.lit(".example/page"),
            i.cast("string"),
        ).alias("url"),
        F.timestamp_seconds(F.lit(1735689600) + i * 137).alias("warc_ts"),
        F.encode(
            F.concat(
                F.lit("<html><body><p>page "),
                i.cast("string"),
                F.lit("</p>"),
                links,
                F.lit("</body></html>"),
            ),
            "UTF-8",
        ).alias("html"),
        F.concat(F.lit("page "), i.cast("string")).alias("text"),
        F.lit("en").alias("lang"),
    )


def q_stream_ingest(spark, sf_dir):
    """Streaming ingest: readStream over a web-pages table -> pandas-UDF
    outlink extraction per micro-batch -> per-url outlink counts.  The
    fixture is closed-form (see _stream_ingest_pages) so the DuckDB oracle
    computes the expected counts analytically — this was the registry's
    last rows-only gate."""
    import tempfile

    from .. import streaming

    pages = _stream_ingest_pages(spark).repartition(4)
    d = tempfile.mkdtemp(prefix="lg_si_") + "/pages.parquet"
    pages.write.mode("overwrite").parquet(d)
    out = streaming.stream_ingest_edges(spark, d, sink_table="q_stream_ingest_t")
    return out.select("src_url", "n_outlinks")


STREAM_INGEST_SQL = f"""
SELECT 'https://site' || CAST(i // 10 AS VARCHAR) || '.example/page'
         || CAST(i AS VARCHAR) AS src_url,
       CAST(2 + i % 4 AS BIGINT) AS n_outlinks
FROM (SELECT CAST(range AS BIGINT) AS i FROM range(0, {_STREAM_INGEST_N}))
"""


def q_four_chain_sampled(spark, sf_dir):
    """Sampled 4-chain estimate via the middle-edge plan — deterministic
    hash-seeded randomness; gate hash-checks exact count + ε-bound."""
    from ..algos import motifs, triangles

    eb = edges_b(spark, sf_dir).persist()
    est = triangles.four_chain_count_sampled(eb, num_estimators=8192, seed=11)
    exact = motifs.four_chain_count(eb)
    eb.unpersist()
    return _eps_row(spark, est, exact, 0.05, "exact_four_chains", "within_5pct")


FOUR_CHAIN_SAMPLED_SQL = f"""
WITH {EDGES_B_SQL}, {UND_B_SQL}
SELECT CAST(count(*) / 2 AS BIGINT) AS exact_four_chains, TRUE AS within_5pct
FROM und_b e1
JOIN und_b e2 ON e1.dst = e2.src AND e2.dst <> e1.src
JOIN und_b e3 ON e2.dst = e3.src AND e3.dst <> e2.src AND e3.dst <> e1.src
"""


def q_four_chain_multiplan(spark, sf_dir):
    """Sampled 4-chain estimate via the reference's THREE-ORIENTATION
    importance sampler (/root/reference/applications/FourChain.cpp:18-125:
    sample_interger(1,3) plan choice, plan-specific edge-id canonicality) —
    deterministic hash-seeded randomness; gate hash-checks exact + ε-bound."""
    from ..algos import motifs, triangles

    eb = edges_b(spark, sf_dir).persist()
    est = triangles.four_chain_count_sampled_multiplan(
        eb, num_estimators=8192, seed=11
    )
    exact = motifs.four_chain_count(eb)
    eb.unpersist()
    return _eps_row(spark, est, exact, 0.05, "exact_four_chains", "within_5pct")


def q_five_chain_sampled(spark, sf_dir):
    """Runtime-k sampled chain estimate at k=5 — deterministic hash-seeded
    randomness; gate hash-checks the exact count + ε-bound."""
    from ..algos import motifs, triangles

    eb = edges_b(spark, sf_dir).persist()
    est = triangles.k_chain_count_sampled(eb, k=5, num_estimators=8192, seed=13)
    exact = motifs.k_chain_count(eb, 5)
    eb.unpersist()
    return _eps_row(spark, est, exact, 0.10, "exact_five_chains", "within_10pct")


FIVE_CHAIN_SAMPLED_SQL = f"""
WITH {EDGES_B_SQL}, {UND_B_SQL}
SELECT CAST(count(*) / 2 AS BIGINT) AS exact_five_chains, TRUE AS within_10pct
FROM und_b e1
JOIN und_b e2 ON e1.dst = e2.src AND e2.dst <> e1.src
JOIN und_b e3 ON e2.dst = e3.src AND e3.dst <> e2.src AND e3.dst <> e1.src
JOIN und_b e4 ON e3.dst = e4.src AND e4.dst <> e3.src AND e4.dst <> e2.src
                 AND e4.dst <> e1.src
"""


def q_profiled_triangle(spark, sf_dir):
    """ErrorProfile-driven estimation lifecycle: pilot batches on a
    half-sampled graph measure the estimator's coefficient of variation,
    size_estimators picks the batch budget for (eps, conf), then the final
    run executes that budget on the full graph — the reference's
    profile-then-run flow (/root/reference/src/ErrorLatencyProfile.cpp:72-207)
    with the profiling subgraph of :83 as a DETERMINISTIC hash half-sample
    (edge kept iff xxhash64(src,dst,seed) is even — partition-independent,
    unlike DataFrame.sample whose draws follow partition layout)."""
    from .. import adaptive
    from ..algos import triangles

    e = edges_b(spark, sf_dir).persist()
    pilot_graph = e.filter(
        F.pmod(F.xxhash64("src", "dst", F.lit(404)), F.lit(2)) == 0
    ).persist()
    pilot = [
        triangles.triangle_count_sampled(pilot_graph, 2048, seed=200 + i)
        for i in range(2)
    ]
    pilot_graph.unpersist()
    n_batches = min(adaptive.size_estimators(pilot, eps=0.1, conf=0.95), 3)
    ests = [
        triangles.triangle_count_sampled(e, 2048, seed=300 + i)
        for i in range(n_batches)
    ]
    exact = triangles.triangle_count(e)
    e.unpersist()
    return _eps_row(spark, sum(ests) / len(ests), exact, 0.10,
                    "exact_triangles", "within_10pct")


def q_triangle_sampled(spark, sf_dir):
    """ASAP-style sampled triangle estimate (Rao-Blackwellized close probe,
    deterministic hash-seeded randomness); gate hash-checks exact + ε."""
    from ..algos.triangles import triangle_count, triangle_count_sampled

    e = edges_a(spark, sf_dir)
    est = triangle_count_sampled(e, num_estimators=200_000, seed=42)
    exact = triangle_count(e)
    return _eps_row(spark, est, exact, 0.05, "exact_triangles", "within_5pct")


TRIANGLE_SAMPLED_SQL = f"""
WITH {EDGES_A_SQL}, {OE_A_SQL}
SELECT CAST(count(*) AS BIGINT) AS exact_triangles, TRUE AS within_5pct
FROM oe_a e1
JOIN oe_a e2 ON e1.b = e2.a
JOIN oe_a e3 ON e3.a = e1.a AND e3.b = e2.b
"""

PROFILED_TRIANGLE_SQL = f"""
WITH {EDGES_B_SQL}, {OE_B_SQL}
SELECT CAST(count(*) AS BIGINT) AS exact_triangles, TRUE AS within_10pct
FROM oe_b e1
JOIN oe_b e2 ON e1.b = e2.a
JOIN oe_b e3 ON e3.a = e1.a AND e3.b = e2.b
"""


def edges_dense(spark, sf_dir):
    """Dense 25-vertex graph derived from the ``nation`` table (25 rows at
    EVERY TPC-H scale factor, so this fixture — and the sampled-pattern
    estimator gates below — behave identically at every sf): edge (i, j),
    i < j, iff (i*7 + j*13 + 3) % 10 < 6 (~165 edges, avg degree ~13).
    The generic sampled estimator needs a dense fixture for a checkable
    ε-bound: its per-trial hit probability scales like 1/prod(candidate
    slots), so on sparse derived graphs a bound-verifying run would need
    billions of trials (the reference sizes 2^25 estimators for the same
    reason, /root/reference/applications/FiveHouse.cpp:66).

    NOTE: named ``edges_dense`` — NOT ``edges_c`` (taken, customer-derived,
    line ~1040) or ``edges_d`` (taken, simrank fixture, line ~4831).  A
    module-level name collision shipped TWICE (commits 5d2465e, 6864538):
    Python's call-time name resolution silently repointed
    q_five_chain/q_edgelist_roundtrip at this graph while their SQL
    oracles kept the import-time CTE.  tests/test_suite_symbols.py now
    asserts every ``edges_*``/``*_SQL`` module symbol is bound exactly
    once."""
    n = spark.read.parquet(f"{sf_dir}/nation.parquet").select(
        F.col("n_nationkey").cast("long").alias("i")
    )
    return (
        n.select(F.col("i").alias("src"))
        .crossJoin(n.select(F.col("i").alias("dst")))
        .filter(F.col("src") < F.col("dst"))
        .filter((F.col("src") * 7 + F.col("dst") * 13 + 3) % 10 < 6)
    )


EDGES_DENSE_SQL = """
edges_dense AS (
  SELECT CAST(a.n_nationkey AS BIGINT) AS src,
         CAST(b.n_nationkey AS BIGINT) AS dst
  FROM nation a JOIN nation b ON a.n_nationkey < b.n_nationkey
  WHERE (a.n_nationkey * 7 + b.n_nationkey * 13 + 3) % 10 < 6
)"""
UND_DENSE_SQL = (
    "und_dense AS (SELECT src, dst FROM edges_dense "
    "UNION SELECT dst AS src, src AS dst FROM edges_dense)"
)


def q_five_house_sampled(spark, sf_dir):
    """Generic sampled-pattern estimate of the 5-house via the
    SamplerGenerator twin (algos/patterns.pattern_count_sampled — the
    reference's flagship declarative estimator path,
    /root/reference/src/SamplerGenerator.cpp:379-464, app
    /root/reference/applications/FiveHouse.cpp:18-27).  Deterministic
    hash-seeded randomness; the gate hash-checks exact count + ε-bound."""
    from ..algos import patterns

    ec = edges_dense(spark, sf_dir).persist()
    est = patterns.pattern_count_sampled(
        ec, patterns.PATTERNS["five_house"], num_estimators=50_000, seed=7
    )
    exact = patterns.pattern_count(ec, patterns.PATTERNS["five_house"])
    ec.unpersist()
    return _eps_row(spark, est, exact, 0.10, "exact_five_houses", "within_10pct")


def q_four_clique_sampled(spark, sf_dir):
    """Generic sampled-pattern estimate of the 4-clique (the reference's
    FourClique2 app over SamplerGenerator,
    /root/reference/applications/FourClique2.cpp:18-24; the hand-rolled
    estimator twin is /root/reference/applications/FourClique.cpp:17-77).
    Deterministic; gate hash-checks exact + ε-bound."""
    from ..algos import patterns

    ec = edges_dense(spark, sf_dir).persist()
    est = patterns.pattern_count_sampled(
        ec, patterns.PATTERNS["four_clique"], num_estimators=600_000, seed=7
    )
    exact = patterns.pattern_count(ec, patterns.PATTERNS["four_clique"])
    ec.unpersist()
    return _eps_row(spark, est, exact, 0.15, "exact_four_cliques", "within_15pct")


def q_three_motif_sampled(spark, sf_dir):
    """Sampled cached 3-motif: triangle + 3-chain estimates sharing one
    persisted 2-edge partial-sample stage (the reference's
    CachedSubPatterns, /root/reference/applications/ThreeMotif.cpp:42-122).
    Deterministic hash-seeded randomness; gate hash-checks BOTH exact
    counts + both ε-bounds."""
    from ..algos import motifs, triangles

    e = edges_a(spark, sf_dir).persist()
    tri_est, chain_est = triangles.three_motif_sampled(
        e, num_estimators=200_000, seed=42
    )
    tri_exact = triangles.triangle_count(e)
    chain_exact = motifs.three_chain_count(e)
    e.unpersist()
    tri_ok = tri_exact > 0 and abs(tri_est - tri_exact) <= 0.05 * tri_exact
    chain_ok = (
        chain_exact > 0 and abs(chain_est - chain_exact) <= 0.05 * chain_exact
    )
    return spark.createDataFrame(
        [(int(tri_exact), int(chain_exact), bool(tri_ok), bool(chain_ok))],
        "exact_triangles long, exact_three_chains long, "
        "tri_within_5pct boolean, chain_within_5pct boolean",
    )


THREE_MOTIF_SAMPLED_SQL = f"""
WITH {EDGES_A_SQL}, {OE_A_SQL}, {UND_A_SQL},
tri AS (
  SELECT CAST(count(*) AS BIGINT) AS exact_triangles
  FROM oe_a e1
  JOIN oe_a e2 ON e1.b = e2.a
  JOIN oe_a e3 ON e3.a = e1.a AND e3.b = e2.b
),
ch AS (
  SELECT CAST(coalesce(sum(d * (d - 1) / 2), 0) AS BIGINT) AS exact_three_chains
  FROM (SELECT count(*) AS d FROM und_a GROUP BY src) t
)
SELECT exact_triangles, exact_three_chains,
       TRUE AS tri_within_5pct, TRUE AS chain_within_5pct
FROM tri, ch
"""


def q_five_star_sampled(spark, sf_dir):
    """Generic sampled-pattern estimate of the 5-star (the reference's
    FiveStar app over SamplerGenerator,
    /root/reference/applications/FiveStar.cpp:18-26).  Deterministic;
    gate hash-checks exact + ε-bound."""
    from ..algos import patterns

    ec = edges_dense(spark, sf_dir).persist()
    est = patterns.pattern_count_sampled(
        ec, patterns.PATTERNS["five_star"], num_estimators=50_000, seed=7
    )
    exact = patterns.pattern_count(ec, patterns.PATTERNS["five_star"])
    ec.unpersist()
    return _eps_row(spark, est, exact, 0.05, "exact_five_stars", "within_5pct")


def _sampled_pattern_sql(name: str, exact_alias: str, flag_alias: str) -> str:
    from ..algos import patterns

    inner = patterns.pattern_count_sql(patterns.PATTERNS[name], "und_dense", exact_alias)
    return (
        f"WITH {EDGES_DENSE_SQL}, {UND_DENSE_SQL}\n"
        f"SELECT {exact_alias}, TRUE AS {flag_alias} FROM ({inner})"
    )


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

class _Registry(dict):
    """Rejects duplicate keys at IMPORT time.  The silent-overwrite twin
    of the module-level name-shadowing bug that shipped twice (commits
    5d2465e, 6864538): a second REGISTRY entry under an existing name
    would replace its (query, oracle) pair with no test failing."""

    def __setitem__(self, key, value):
        if key in self:
            raise ValueError(f"duplicate registry key: {key!r}")
        super().__setitem__(key, value)

    def update(self, other=(), **kw):  # dict.update bypasses __setitem__
        items = other.items() if hasattr(other, "items") else other
        for k, v in items:
            self[k] = v
        for k, v in kw.items():
            self[k] = v


# name -> (spark_fn, oracle_sql | None)
REGISTRY: dict = _Registry({
    "degrees": (q_degrees, DEGREES_SQL),
    "triangle_count": (q_triangle_count, TRIANGLE_SQL),
    "pagerank_5iter": (q_pagerank5, PAGERANK5_SQL),
    "pagerank_grid_5iter": (q_pagerank_grid5, PAGERANK5_SQL),
    "clustering_coefficient": (q_clustering_coeff, CLUSTERING_COEFF_SQL),
    "hits_3iter": (q_hits3, HITS3_SQL),
    "personalized_pagerank_5iter": (q_ppr5, PPR5_SQL),
    "graph_summary": (q_graph_summary, GRAPH_SUMMARY_SQL),
    "connected_components": (q_components, COMPONENTS_SQL),
    "label_propagation_3iter": (q_labelprop3, LABELPROP3_SQL),
    "three_chain_count": (q_three_chain, THREE_CHAIN_SQL),
    "five_star_count": (q_five_star, FIVE_STAR_SQL),
    "four_chain_count": (q_four_chain, FOUR_CHAIN_SQL),
    "four_clique_count": (q_four_clique, FOUR_CLIQUE_SQL),
    "graph_filter_weighted": (q_graph_filter_weighted, GRAPH_FILTER_SQL),
    "edge_sample_deterministic": (q_edge_sample_deterministic, EDGE_SAMPLE_SQL),
    "doc_token_stats": (q_doc_token_stats, DOC_TOKEN_SQL),
    "doc_quality": (q_doc_quality, DOC_QUALITY_SQL),
    "exact_dedup": (q_exact_dedup, EXACT_DEDUP_SQL),
    "lang_guess": (q_lang_guess, LANG_GUESS_SQL),
    "embedding_topk": (q_embedding_topk, EMBEDDING_TOPK_SQL),
    "event_sessions": (q_event_sessions, EVENT_SESSIONS_SQL),
    "event_hourly": (q_event_hourly, EVENT_HOURLY_SQL),
    "pricing_summary": (q_pricing_summary, PRICING_SUMMARY_SQL),
    "top_customer_per_nation": (q_top_customer_per_nation, TOP_CUSTOMER_SQL),
})


def _register_extensions() -> None:
    from .. import ann, dedup, multimodal, text  # noqa: F401

    REGISTRY.update(
        {
            "minhash_lsh_dedup": (
                q_minhash_lsh_dedup,
                dedup.minhash_lsh_pairs_sql(num_hashes=16, bands=8,
                                            jaccard_threshold=0.5),
            ),
            "simhash_pairs": (
                q_simhash_pairs,
                dedup.simhash_pairs_sql(bits=32, max_hamming=3),
            ),
            "ngram_jaccard": (
                q_ngram_jaccard,
                dedup.ngram_jaccard_pairs_sql(shingle_k=3, threshold=0.3),
            ),
            "embedding_near_dup": (
                q_embedding_near_dup,
                dedup.embedding_near_dup_banded_sql(threshold=0.45),
            ),
            "doc_fingerprint": (q_doc_fingerprint, text.doc_fingerprints_sql()),
            "bpe_token_stats": (q_bpe_token_stats, text.bpe_token_stats_sql()),
            "ann_lsh_topk": (
                q_ann_lsh_topk,
                ann.lsh_topk_sql(query_where="vec_id < 20", k=5, bands=3,
                                 planes_per_band=4, dim=64),
            ),
            "ann_ivf_topk": (
                q_ann_ivf_topk,
                ann.ivf_topk_sql(query_where="vec_id < 20", k=5,
                                 n_centroids=8, nprobe=2),
            ),
            "multimodal_decode": (q_multimodal_decode, multimodal.decode_features_sql()),
            "multimodal_frames": (q_multimodal_frames, multimodal.frame_sample_sql(stride=64)),
            "stream_hourly": (q_stream_hourly, EVENT_HOURLY_SQL),
            "stream_sessions": (q_stream_sessions, EVENT_SESSIONS_SQL),
            "stream_sessions_buffered": (q_stream_sessions_buffered,
                                         EVENT_SESSIONS_SQL),
            "stream_ingest_counts": (q_stream_ingest, STREAM_INGEST_SQL),
            "five_house_count": (q_five_house, FIVE_HOUSE_SQL),
            "five_chain_count": (q_five_chain, FIVE_CHAIN_SQL),
            "at_least_one_weighted_triangle": (
                q_at_least_one_weighted_triangle,
                AT_LEAST_ONE_SQL,
            ),
            "three_motif_counts": (q_three_motif, THREE_MOTIF_SQL),
            "edgelist_roundtrip": (q_edgelist_roundtrip, EDGELIST_ROUNDTRIP_SQL),
            "generic_pattern_counts": (q_generic_patterns, _generic_patterns_sql()),
            "triangle_sampled_estimate": (q_triangle_sampled,
                                          TRIANGLE_SAMPLED_SQL),
            "four_chain_sampled_estimate": (q_four_chain_sampled,
                                            FOUR_CHAIN_SAMPLED_SQL),
            "four_chain_multiplan_estimate": (q_four_chain_multiplan,
                                              FOUR_CHAIN_SAMPLED_SQL),
            "five_chain_sampled_estimate": (q_five_chain_sampled,
                                            FIVE_CHAIN_SAMPLED_SQL),
            "adaptive_triangle_estimate": (q_adaptive_triangle,
                                           ADAPTIVE_TRIANGLE_SQL),
            "profiled_triangle_estimate": (q_profiled_triangle,
                                           PROFILED_TRIANGLE_SQL),
            "five_house_sampled_estimate": (
                q_five_house_sampled,
                _sampled_pattern_sql("five_house", "exact_five_houses",
                                     "within_10pct"),
            ),
            "four_clique_sampled_estimate": (
                q_four_clique_sampled,
                _sampled_pattern_sql("four_clique", "exact_four_cliques",
                                     "within_15pct"),
            ),
            "three_motif_sampled_estimate": (
                q_three_motif_sampled, THREE_MOTIF_SAMPLED_SQL,
            ),
            "five_star_sampled_estimate": (
                q_five_star_sampled,
                _sampled_pattern_sql("five_star", "exact_five_stars",
                                     "within_5pct"),
            ),
        }
    )


_register_extensions()




# re-export everything (incl. underscore helpers) to the next
# module in the suite package chain and to suite/__init__.py
__all__ = [_n for _n in dir() if not _n.startswith('__')]
