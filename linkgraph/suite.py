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
    from .graph import LinkGraph

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
    from .algos import triangle_count

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
    from .algos.triangles import per_vertex_triangle_counts
    from .graph import LinkGraph

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
    from .algos.hits import hits

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
    from .algos import pagerank

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
    from .algos import pagerank

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
    from .algos.pagerank import personalized_pagerank

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
    from .algos import connected_components

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
    from .algos import label_propagation

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
    from .algos import motifs

    return _scalar_df(
        spark, "three_chains", motifs.three_chain_count(edges_a(spark, sf_dir))
    )


THREE_CHAIN_SQL = f"""
WITH {EDGES_A_SQL}, {UND_A_SQL}
SELECT CAST(coalesce(sum(d * (d - 1) / 2), 0) AS BIGINT) AS three_chains
FROM (SELECT count(*) AS d FROM und_a GROUP BY src) t
"""


def q_five_star(spark, sf_dir):
    from .algos import motifs

    return _scalar_df(spark, "five_stars", motifs.k_star_count(edges_a(spark, sf_dir), 5))


FIVE_STAR_SQL = f"""
WITH {EDGES_A_SQL}, {UND_A_SQL}
SELECT CAST(coalesce(sum(CASE WHEN d >= 5
        THEN d*(d-1)*(d-2)*(d-3)*(d-4)/120 ELSE 0 END), 0) AS BIGINT) AS five_stars
FROM (SELECT count(*) AS d FROM und_a GROUP BY src) t
"""


def q_four_chain(spark, sf_dir):
    from .algos import motifs

    return _scalar_df(spark, "four_chains", motifs.four_chain_count(edges_b(spark, sf_dir)))


FOUR_CHAIN_SQL = f"""
WITH {EDGES_B_SQL}, {UND_B_SQL}
SELECT CAST(count(*) / 2 AS BIGINT) AS four_chains
FROM und_b e1
JOIN und_b e2 ON e1.dst = e2.src AND e2.dst <> e1.src
JOIN und_b e3 ON e2.dst = e3.src AND e3.dst <> e2.src AND e3.dst <> e1.src
"""


def q_four_clique(spark, sf_dir):
    from .algos import motifs

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
    from .graph import LinkGraph

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
    from . import dedup

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return dedup.minhash_lsh_pairs(d, num_hashes=16, bands=8, jaccard_threshold=0.5)


def q_simhash_pairs(spark, sf_dir):
    """32-bit SimHash pairs with Hamming distance <= 3 — exact pigeonhole
    banding (4 disjoint 8-bit bands), output identical to brute force with
    an equi-join-only plan."""
    from . import dedup

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return dedup.simhash_pairs(d, bits=32, max_hamming=3)


def q_ngram_jaccard(spark, sf_dir):
    """Exact word-3-gram Jaccard pairs >= 0.3 via the shingle inverted
    index (pairs sharing >= 1 shingle; grouped-count intersection) —
    output identical to brute force, no cross join."""
    from . import dedup

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return dedup.ngram_jaccard_pairs(d, shingle_k=3, threshold=0.3)


def q_embedding_near_dup(spark, sf_dir):
    """Embedding-cosine near-dup detector (cos >= 0.45): hyperplane-LSH
    banded candidates + exact cosine verify; the banding is part of the
    detector's semantics and the oracle mirrors it exactly (dedup.py)."""
    from . import dedup

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return dedup.embedding_near_dup_banded(e, threshold=0.45)


def q_doc_fingerprint(spark, sf_dir):
    """Karp-Rabin rolling-hash document fingerprints + fingerprint dedup."""
    from . import text

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return text.doc_fingerprints(d)


def q_bpe_token_stats(spark, sf_dir):
    """BPE-ish regex tokenizer statistics per document."""
    from . import text

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return text.bpe_token_stats(d)


# ---------------------------------------------------------------------------
# ANN (LSH-bucketed scale path; brute force is q_embedding_topk)
# ---------------------------------------------------------------------------


def q_ann_lsh_topk(spark, sf_dir):
    """Hyperplane-LSH bucketed cosine top-5 for queries vec_id < 20."""
    from . import ann

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = e.filter(F.col("vec_id") < 20)
    return ann.lsh_topk(e, q, k=5, bands=3, planes_per_band=4, dim=64)


# ---------------------------------------------------------------------------
# multimodal binary-column plumbing (Arrow mapInPandas; decode is a stub)
# ---------------------------------------------------------------------------


def q_ann_ivf_topk(spark, sf_dir):
    """IVF coarse-quantizer ANN: probed-cluster exact rerank (value-checked
    vs the DuckDB twin of the same deterministic codebook)."""
    from . import ann

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = e.filter(F.col("vec_id") < 20)
    return ann.ivf_topk(e, q, k=5, n_centroids=8, nprobe=2)


def q_multimodal_decode(spark, sf_dir):
    from . import multimodal

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return multimodal.decode_features(multimodal.docs_as_blobs(d))


def q_multimodal_frames(spark, sf_dir):
    from . import multimodal

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return multimodal.frame_sample(multimodal.docs_as_blobs(d), stride=64)


# ---------------------------------------------------------------------------
# structured streaming (parity vs the batch oracles)
# ---------------------------------------------------------------------------


def q_stream_hourly(spark, sf_dir):
    from . import streaming

    return streaming.stream_hourly_counts(
        spark, f"{sf_dir}/events.parquet", sink_table="q_stream_hourly"
    )


def q_stream_sessions(spark, sf_dir):
    from . import streaming

    return streaming.stream_sessionize(
        spark, f"{sf_dir}/events.parquet", sink_table="q_stream_sessions"
    )


def q_stream_sessions_buffered(spark, sf_dir):
    """Order-robust buffered sessionizer (watermark-finalized per-user
    event buffer, streaming.stream_sessionize_buffered) — same batch
    oracle as stream_sessions; the cross-batch out-of-order case is
    exercised in tests/test_streaming.py."""
    from . import streaming

    return streaming.stream_sessionize_buffered(
        spark, f"{sf_dir}/events.parquet",
        sink_table="q_stream_sessions_buffered",
    )


# ---------------------------------------------------------------------------
# additional motif / predicate parity queries
# ---------------------------------------------------------------------------


def q_five_house(spark, sf_dir):
    from .algos import motifs

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
    from .algos import motifs

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
    from .algos import motifs

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
    from .algos import motifs

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

    from . import sources

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
    from .algos import patterns

    e = edges_b(spark, sf_dir).persist()
    rows = [(n, patterns.pattern_count(e, patterns.PATTERNS[n]))
            for n in GENERIC_PATTERNS]
    e.unpersist()
    return spark.createDataFrame(rows, "pattern string, n long")


def _generic_patterns_sql() -> str:
    from .algos import patterns

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
    from . import adaptive
    from .algos import triangles

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

    from . import streaming

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
    from .algos import motifs, triangles

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
    from .algos import motifs, triangles

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
    from .algos import motifs, triangles

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
    from . import adaptive
    from .algos import triangles

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
    from .algos.triangles import triangle_count, triangle_count_sampled

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
    from .algos import patterns

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
    from .algos import patterns

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
    from .algos import motifs, triangles

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
    from .algos import patterns

    ec = edges_dense(spark, sf_dir).persist()
    est = patterns.pattern_count_sampled(
        ec, patterns.PATTERNS["five_star"], num_estimators=50_000, seed=7
    )
    exact = patterns.pattern_count(ec, patterns.PATTERNS["five_star"])
    ec.unpersist()
    return _eps_row(spark, est, exact, 0.05, "exact_five_stars", "within_5pct")


def _sampled_pattern_sql(name: str, exact_alias: str, flag_alias: str) -> str:
    from .algos import patterns

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
    from . import ann, dedup, multimodal, text  # noqa: F401

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


# ---------------------------------------------------------------------------
# round-1b extensions: paths / SCC / k-core / link-prediction / weighted PR /
# dedup clustering — each with a DuckDB SQL twin (recursive CTE or unrolled
# fixpoint), keeping every new operator inside the driver's value-hash gate
# ---------------------------------------------------------------------------


def q_bfs_distances(spark, sf_dir):
    """Hop distance from vertex 0 over the undirected derived graph
    (frontier-expansion BFS; bounded recursive-CTE SQL twin)."""
    from .algos.paths import bfs_distances

    dist, _ = bfs_distances(
        edges_b(spark, sf_dir),
        sources=spark.createDataFrame([(0,)], "id long"),
        directed=False,
        partitions=8,
    )
    return dist.select("id", F.col("dist").cast("long").alias("dist"))


BFS_SQL = f"""
WITH RECURSIVE {EDGES_B_SQL}, {UND_B_SQL},
walk(id, d) AS (
  SELECT CAST(0 AS BIGINT) AS id, 0 AS d
  UNION
  SELECT e.dst, w.d + 1 FROM walk w JOIN und_b e ON e.src = w.id WHERE w.d < 40
)
SELECT id, CAST(min(d) AS BIGINT) AS dist FROM walk GROUP BY id
"""


def q_scc(spark, sf_dir):
    """Strongly connected components of the DIRECTED derived graph
    (trim + forward-coloring + backward-membership; label = min id in SCC;
    transitive-closure recursive-CTE SQL twin)."""
    from .algos.scc import strongly_connected_components

    labels, _ = strongly_connected_components(
        edges_b(spark, sf_dir), vertices=verts(spark, V_B), partitions=8
    )
    return labels.select("id", F.col("scc").cast("long").alias("scc"))


SCC_SQL = f"""
WITH RECURSIVE {EDGES_B_SQL}, {VERTS_B_SQL},
reach(u, v) AS (
  SELECT id AS u, id AS v FROM verts_b
  UNION
  SELECT r.u, e.dst FROM reach r JOIN edges_b e ON e.src = r.v
)
SELECT r1.u AS id, CAST(min(r1.v) AS BIGINT) AS scc
FROM reach r1 JOIN reach r2 ON r1.u = r2.v AND r1.v = r2.u
GROUP BY r1.u
"""


def q_kcore3(spark, sf_dir):
    """3-core of the undirected derived graph by iterative peeling
    (unrolled-peel SQL twin)."""
    from .algos.kcore import kcore_vertices

    return kcore_vertices(edges_b(spark, sf_dir), k=3, partitions=8)


def _kcore_sql(k: int, rounds: int) -> str:
    # MATERIALIZED is load-bearing: each p_i is referenced 3x (k_{i+1} and
    # both join sides of p_{i+1}); inlining would expand 3^rounds subtrees
    parts = [EDGES_B_SQL, UND_B_SQL, "p0 AS MATERIALIZED (SELECT src, dst FROM und_b)"]
    for i in range(1, rounds + 1):
        parts.append(
            f"k{i} AS MATERIALIZED (SELECT src FROM p{i - 1} GROUP BY src HAVING count(*) >= {k})"
        )
        parts.append(
            f"""p{i} AS MATERIALIZED (SELECT e.src, e.dst FROM p{i - 1} e
                 JOIN k{i} a ON e.src = a.src JOIN k{i} b ON e.dst = b.src)"""
        )
    return (
        "WITH " + ",\n".join(parts)
        + f"\nSELECT DISTINCT src AS id FROM p{rounds}"
    )


KCORE3_SQL = _kcore_sql(3, 24)


def q_jaccard_neighbors(spark, sf_dir):
    """Neighborhood Jaccard similarity of every adjacent pair (a<b) in the
    undirected derived graph: |N(a)∩N(b)| / |N(a)∪N(b)|, e6-scaled.
    The wedge self-join + degree join plan (exact ints, then one rounding)."""
    ea = edges_a(spark, sf_dir)
    und = (
        ea.union(ea.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
    )
    deg = und.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    e1 = und.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    e2 = und.select(F.col("src").alias("c"), F.col("dst").alias("b"))
    cn = (
        e1.join(e2, "c")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("cn"))
    )
    pairs = und.filter(F.col("src") < F.col("dst")).select(
        F.col("src").alias("a"), F.col("dst").alias("b")
    )
    j = (
        pairs.join(cn, ["a", "b"], "left")
        .na.fill({"cn": 0})
        .join(deg.withColumnRenamed("src", "a").withColumnRenamed("d", "da"), "a")
        .join(deg.withColumnRenamed("src", "b").withColumnRenamed("d", "db"), "b")
    )
    return j.select(
        "a", "b",
        F.round(F.col("cn") * 1e6 / (F.col("da") + F.col("db") - F.col("cn")))
        .cast("long").alias("jaccard_e6"),
    )


JACCARD_SQL = f"""
WITH {EDGES_A_SQL}, {UND_A_SQL},
deg AS (SELECT src, count(*) AS d FROM und_a GROUP BY src),
cn AS (
  SELECT e1.src AS a, e2.dst AS b, count(*) AS cn
  FROM und_a e1 JOIN und_a e2 ON e1.dst = e2.src
  WHERE e1.src < e2.dst
  GROUP BY e1.src, e2.dst
)
SELECT p.src AS a, p.dst AS b,
       CAST(round(coalesce(cn.cn, 0) * 1e6 /
                  (da.d + db.d - coalesce(cn.cn, 0))) AS BIGINT) AS jaccard_e6
FROM und_a p
LEFT JOIN cn ON cn.a = p.src AND cn.b = p.dst
JOIN deg da ON da.src = p.src
JOIN deg db ON db.src = p.dst
WHERE p.src < p.dst
"""


def q_adamic_adar_topk(spark, sf_dir):
    """Link prediction: top-20 non-adjacent pairs by quantized Adamic–Adar
    score Σ_c round(1e6/ln(deg(c))) over common neighbors c — integer-sum
    formulation so the result is exactly reproducible in any engine.
    Deterministic total order (score desc, a, b)."""
    eb = edges_b(spark, sf_dir)
    und = (
        eb.union(eb.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
    )
    deg = und.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    # per-neighbor quantized weight — integer, so the final sum is order-free;
    # degree-1 vertices (ln d = 0) can never be common neighbors: drop them
    w = deg.filter(F.col("d") >= 2).select(
        F.col("src").alias("c"),
        F.round(F.lit(1e6) / F.log(F.col("d").cast("double"))).cast("long").alias("w"),
    )
    e1 = und.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    e2 = und.select(F.col("src").alias("c"), F.col("dst").alias("b"))
    scores = (
        e1.join(e2, "c")
        .filter(F.col("a") < F.col("b"))
        .join(w, "c")
        .groupBy("a", "b")
        .agg(F.sum("w").alias("score_e6"))
        .join(
            und.select(F.col("src").alias("a"), F.col("dst").alias("b")),
            ["a", "b"], "left_anti",
        )
    )
    return (
        scores.orderBy(F.col("score_e6").desc(), "a", "b")
        .limit(20)
        .select("a", "b", "score_e6")
    )


ADAMIC_ADAR_SQL = f"""
WITH {EDGES_B_SQL}, {UND_B_SQL},
deg AS (SELECT src, count(*) AS d FROM und_b GROUP BY src),
w AS (SELECT src AS c, CAST(round(1e6 / ln(CAST(d AS DOUBLE))) AS BIGINT) AS w FROM deg WHERE d >= 2),
sc AS (
  SELECT e1.src AS a, e2.dst AS b, sum(w.w) AS score_e6
  FROM und_b e1 JOIN und_b e2 ON e1.dst = e2.src JOIN w ON w.c = e1.dst
  WHERE e1.src < e2.dst
    AND NOT EXISTS (SELECT 1 FROM und_b u WHERE u.src = e1.src AND u.dst = e2.dst)
  GROUP BY e1.src, e2.dst
)
SELECT a, b, CAST(score_e6 AS BIGINT) AS score_e6
FROM sc ORDER BY score_e6 DESC, a, b LIMIT 20
"""


def q_four_cycle_count(spark, sf_dir):
    """Exact 4-cycle (rectangle) count — the engine runs the hub-safe
    vertex-priority wedge plan (motifs.four_cycle_count: wedges only where
    the start out-ranks center AND end under (degree, id) order, so no
    C(d, 2) blow-up at a hub center); the oracle keeps the textbook
    Σ_{{u<v}} C(common(u,v), 2) / 2 form — same number, different plan."""
    from .algos.motifs import four_cycle_count

    return _scalar_df(
        spark, "four_cycles", four_cycle_count(edges_b(spark, sf_dir))
    )


FOUR_CYCLE_SQL = f"""
WITH {EDGES_B_SQL}, {UND_B_SQL},
cn AS (
  SELECT e1.src AS u, e2.dst AS v, count(*) AS w
  FROM und_b e1 JOIN und_b e2 ON e1.dst = e2.src
  WHERE e1.src < e2.dst
  GROUP BY e1.src, e2.dst
)
SELECT CAST(sum(w * (w - 1) / 2) / 2 AS BIGINT) AS four_cycles FROM cn
"""


def q_degree_assortativity(spark, sf_dir):
    """Degree assortativity (Pearson r of endpoint degrees over the
    symmetric edge list), computed from exact integer sums so the one
    double-precision expression is bit-identical across engines; e6."""
    ea = edges_a(spark, sf_dir)
    und = (
        ea.union(ea.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
    )
    deg = und.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    j = (
        und.join(deg.hint("shuffle_hash"), "src")
        .withColumnRenamed("d", "dx")
        .join(
            deg.withColumnRenamed("src", "dst").withColumnRenamed("d", "dy")
            .hint("shuffle_hash"),
            "dst",
        )
    )
    s = j.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("dx").alias("sx"), F.sum("dy").alias("sy"),
        F.sum(F.col("dx") * F.col("dy")).alias("sxy"),
        F.sum(F.col("dx") * F.col("dx")).alias("sxx"),
        F.sum(F.col("dy") * F.col("dy")).alias("syy"),
    ).collect()[0]
    n, sx, sy = float(s["n"]), float(s["sx"]), float(s["sy"])
    sxy, sxx, syy = float(s["sxy"]), float(s["sxx"]), float(s["syy"])
    import math

    r = (n * sxy - sx * sy) / (
        math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy)
    )
    return _scalar_df(spark, "assortativity_e6", int(round(r * 1e6)))


ASSORT_SQL = f"""
WITH {EDGES_A_SQL}, {UND_A_SQL},
deg AS (SELECT src, count(*) AS d FROM und_a GROUP BY src),
j AS (
  SELECT da.d AS dx, db.d AS dy
  FROM und_a e JOIN deg da ON da.src = e.src JOIN deg db ON db.src = e.dst
),
s AS (
  SELECT CAST(count(*) AS DOUBLE) AS n,
         CAST(sum(dx) AS DOUBLE) AS sx, CAST(sum(dy) AS DOUBLE) AS sy,
         CAST(sum(dx * dy) AS DOUBLE) AS sxy,
         CAST(sum(dx * dx) AS DOUBLE) AS sxx,
         CAST(sum(dy * dy) AS DOUBLE) AS syy
  FROM j
)
SELECT CAST(round(1e6 * (n * sxy - sx * sy) /
            (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))) AS BIGINT)
       AS assortativity_e6
FROM s
"""


WPR_WEIGHT_SQL = "(src * 7 + dst * 3) % 19 + 1"


def q_weighted_pagerank5(spark, sf_dir):
    """Edge-weighted PageRank, 5 fixed supersteps over weighted adjacency
    blocks (contribution ∝ w/Σw); deterministic derived weights; e8."""
    from .algos.pagerank import pagerank_weighted

    ea = edges_a(spark, sf_dir).withColumn(
        "weight",
        ((F.col("src") * 7 + F.col("dst") * 3) % 19 + 1).cast("double"),
    )
    ranks = pagerank_weighted(
        ea, vertices=verts(spark, V_A), num_iters=5, partitions=8
    )
    return ranks.select(
        "id", F.round(F.col("rank") * 1e8).cast("long").alias("rank_e8")
    )


def _weighted_pagerank_sql(num_iters: int, V: int) -> str:
    d = 0.85
    parts = [
        EDGES_A_SQL, VERTS_A_SQL,
        f"we AS (SELECT src, dst, CAST({WPR_WEIGHT_SQL} AS DOUBLE) AS w FROM edges_a)",
        "wout AS (SELECT src AS id, sum(w) AS w_out FROM we GROUP BY src)",
        f"r0 AS (SELECT id, 1.0 / {V} AS rank FROM verts_a)",
    ]
    for i in range(1, num_iters + 1):
        p = f"r{i - 1}"
        parts.append(
            f"""live{i} AS MATERIALIZED (
                 SELECT coalesce(sum(r.rank), 0) AS s FROM {p} r
                 JOIN wout o ON r.id = o.id)"""
        )
        parts.append(
            f"""c{i} AS MATERIALIZED (
                 SELECT e.dst AS id, sum(r.rank * e.w / o.w_out) AS contrib
                 FROM we e JOIN {p} r ON e.src = r.id JOIN wout o ON e.src = o.id
                 GROUP BY e.dst)"""
        )
        parts.append(
            f"""r{i} AS MATERIALIZED (
                 SELECT v.id,
                        {(1.0 - d) / V} + {d} * (coalesce(c.contrib, 0)
                            + (1.0 - l.s) / {V}) AS rank
                 FROM verts_a v
                 LEFT JOIN c{i} c ON v.id = c.id CROSS JOIN live{i} l)"""
        )
    return (
        "WITH " + ",\n".join(parts)
        + f"\nSELECT id, CAST(round(rank * 1e8) AS BIGINT) AS rank_e8 FROM r{num_iters}"
    )


WEIGHTED_PAGERANK5_SQL = _weighted_pagerank_sql(5, V_A)


def q_dedup_clusters(spark, sf_dir):
    """Near-duplicate CLUSTERS: connected components over the MinHash-LSH
    duplicate-pair graph — the standard web-corpus dedup pipeline (pair
    generation feeding a graph algorithm); cluster id = min doc_id."""
    from . import dedup
    from .algos import connected_components

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = dedup.minhash_lsh_pairs(
        docs, num_hashes=16, bands=8, jaccard_threshold=0.5
    )
    e = pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    vs = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    labels, _ = connected_components(e, vertices=vs, partitions=8)
    return labels.select(
        F.col("id").alias("doc_id"), F.col("component").cast("long").alias("cluster")
    )


def _dedup_clusters_sql() -> str:
    from . import dedup

    pairs_sql = dedup.minhash_lsh_pairs_sql(
        num_hashes=16, bands=8, jaccard_threshold=0.5
    )
    return f"""
WITH RECURSIVE pairs AS (SELECT id_a, id_b FROM ({pairs_sql}) t),
du AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b AS src, id_a AS dst FROM pairs
),
dv AS (SELECT DISTINCT src AS id FROM du),
reach(id, comp) AS (
  SELECT id, id FROM dv
  UNION
  SELECT e.dst, r.comp FROM reach r JOIN du e ON e.src = r.id
)
SELECT id AS doc_id, CAST(min(comp) AS BIGINT) AS cluster FROM reach GROUP BY id
"""


def _register_round1b() -> None:
    REGISTRY.update(
        {
            "bfs_distances": (q_bfs_distances, BFS_SQL),
            "scc": (q_scc, SCC_SQL),
            "k_core_3": (q_kcore3, KCORE3_SQL),
            "jaccard_neighbors": (q_jaccard_neighbors, JACCARD_SQL),
            "adamic_adar_topk": (q_adamic_adar_topk, ADAMIC_ADAR_SQL),
            "four_cycle_count": (q_four_cycle_count, FOUR_CYCLE_SQL),
            "degree_assortativity": (q_degree_assortativity, ASSORT_SQL),
            "weighted_pagerank_5iter": (q_weighted_pagerank5, WEIGHTED_PAGERANK5_SQL),
            "dedup_clusters": (q_dedup_clusters, _dedup_clusters_sql()),
        }
    )


_register_round1b()


def q_components_star(spark, sf_dir):
    """Connected components via alternating large-star/small-star rounds
    (O(log V) rounds — the large-diameter scale path); output identical to
    `connected_components`, so it shares that oracle."""
    from .algos.components import connected_components_star

    labels = connected_components_star(
        edges_b(spark, sf_dir), vertices=verts(spark, V_B), partitions=8
    )
    return labels.select("id", F.col("component").cast("long").alias("component"))


REGISTRY["connected_components_star"] = (q_components_star, COMPONENTS_SQL)


# symmetric integer weight for the undirected derived graph: identical for
# (u,v) and (v,u), BIGINT-exact in both engines
SYM_W = "((CASE WHEN src < dst THEN src ELSE dst END) * 7 + (CASE WHEN src < dst THEN dst ELSE src END) * 3) % 19 + 1"


def q_sssp_distances(spark, sf_dir):
    """Weighted single-source shortest paths from vertex 0 (Bellman–Ford
    relaxation supersteps; integer weights → exact long distances)."""
    from .algos.paths import sssp_distances

    eb = edges_b(spark, sf_dir)
    lo, hi = F.least("src", "dst"), F.greatest("src", "dst")
    we = eb.withColumn("weight", (lo * 7 + hi * 3) % 19 + 1)
    dist, _ = sssp_distances(
        we, sources=spark.createDataFrame([(0,)], "id long"),
        directed=False, partitions=8,
    )
    return dist.select("id", F.col("dist").cast("long").alias("dist"))


def _sssp_sql(rounds: int) -> str:
    parts = [
        EDGES_B_SQL, UND_B_SQL,
        f"we AS MATERIALIZED (SELECT src, dst, CAST({SYM_W} AS BIGINT) AS w FROM und_b)",
        "d0 AS MATERIALIZED (SELECT CAST(0 AS BIGINT) AS id, CAST(0 AS BIGINT) AS dist)",
    ]
    for i in range(1, rounds + 1):
        p = f"d{i - 1}"
        parts.append(
            f"""d{i} AS MATERIALIZED (
                 SELECT id, min(dist) AS dist FROM (
                   SELECT id, dist FROM {p}
                   UNION ALL
                   SELECT e.dst AS id, x.dist + e.w AS dist
                   FROM we e JOIN {p} x ON e.src = x.id
                 ) u GROUP BY id)"""
        )
    return (
        "WITH " + ",\n".join(parts)
        + f"\nSELECT id, dist FROM d{rounds}"
    )


SSSP_SQL = _sssp_sql(25)


def q_random_walks(spark, sf_dir):
    """Deterministic hash-walk corpus: 20 walks of length 8 over the
    undirected derived graph — bit-reproducible in any engine (DeepWalk-
    style training-data generation)."""
    from .algos.paths import random_walks

    walks = random_walks(
        edges_b(spark, sf_dir),
        starts=spark.createDataFrame([(i,) for i in range(20)], "id long"),
        length=8, directed=False, partitions=8,
    )
    return walks.select(
        F.col("walk_id").cast("long").alias("walk_id"),
        F.col("step").cast("long").alias("step"),
        F.col("v").cast("long").alias("v"),
    )


def _random_walks_sql(n_starts: int, length: int) -> str:
    from .algos.paths import WALK_A, WALK_B, WALK_C

    parts = [
        EDGES_B_SQL, UND_B_SQL,
        """adj AS MATERIALIZED (
             SELECT src, dst,
                    row_number() OVER (PARTITION BY src ORDER BY dst) - 1 AS idx,
                    count(*) OVER (PARTITION BY src) AS deg
             FROM und_b)""",
        f"""w0 AS MATERIALIZED (
             SELECT CAST(range AS BIGINT) AS walk_id, 0 AS step,
                    CAST(range AS BIGINT) AS v
             FROM range({n_starts}))""",
    ]
    for s in range(1, length + 1):
        p = f"w{s - 1}"
        parts.append(
            f"""w{s} AS MATERIALIZED (
                 SELECT c.walk_id, {s} AS step, a.dst AS v
                 FROM {p} c JOIN adj a ON a.src = c.v
                  AND a.idx = (c.walk_id * {WALK_A} + c.v * {WALK_B}
                               + {s} * {WALK_C}) % a.deg)"""
        )
    union = "\nUNION ALL\n".join(
        f"SELECT walk_id, step, v FROM w{s}" for s in range(length + 1)
    )
    return (
        "WITH " + ",\n".join(parts)
        + f"\nSELECT CAST(walk_id AS BIGINT) AS walk_id, CAST(step AS BIGINT) AS step,"
          f" CAST(v AS BIGINT) AS v FROM ({union}) t"
    )


RANDOM_WALKS_SQL = _random_walks_sql(20, 8)

REGISTRY["sssp_distances"] = (q_sssp_distances, SSSP_SQL)
REGISTRY["random_walks"] = (q_random_walks, RANDOM_WALKS_SQL)


def q_core_numbers(spark, sf_dir):
    """Full core decomposition (coreness per vertex) via synchronous H-index
    iteration — exact vs sequential peeling; unrolled SQL twin."""
    from .algos.kcore import core_numbers

    core, _ = core_numbers(edges_b(spark, sf_dir), partitions=8)
    return core.select("id", F.col("core").cast("long").alias("core"))


def _core_numbers_sql(rounds: int) -> str:
    parts = [
        EDGES_B_SQL, UND_B_SQL,
        "c0 AS MATERIALIZED (SELECT src AS id, count(*) AS core FROM und_b GROUP BY src)",
    ]
    for i in range(1, rounds + 1):
        p = f"c{i - 1}"
        parts.append(
            f"""h{i} AS MATERIALIZED (
                 SELECT src, max(CASE WHEN rn < nc THEN rn ELSE nc END) AS h FROM (
                   SELECT e.src, c.core AS nc,
                          row_number() OVER (PARTITION BY e.src
                                             ORDER BY c.core DESC) AS rn
                   FROM und_b e JOIN {p} c ON c.id = e.dst
                 ) t GROUP BY src)"""
        )
        parts.append(
            f"""c{i} AS MATERIALIZED (
                 SELECT c.id, CASE WHEN h.h < c.core THEN h.h ELSE c.core END AS core
                 FROM {p} c JOIN h{i} h ON h.src = c.id)"""
        )
    return (
        "WITH " + ",\n".join(parts)
        + f"\nSELECT id, CAST(core AS BIGINT) AS core FROM c{rounds}"
    )


CORE_NUMBERS_SQL = _core_numbers_sql(20)

REGISTRY["core_numbers"] = (q_core_numbers, CORE_NUMBERS_SQL)


CLOSENESS_SOURCES = tuple(range(10))


def q_closeness_centrality(spark, sf_dir):
    """Exact closeness for a 10-source sample — all sources advance through
    one composite-key BFS loop (the sampled-centrality scale pattern)."""
    from .algos.paths import closeness_centrality

    return closeness_centrality(
        edges_b(spark, sf_dir),
        sources=spark.createDataFrame([(s,) for s in CLOSENESS_SOURCES], "id long"),
        directed=False, partitions=8,
    ).select("s", "reached", "total_dist", "closeness_e6", "harmonic_e6", "ecc")


CLOSENESS_SQL = f"""
WITH RECURSIVE {EDGES_B_SQL}, {UND_B_SQL},
srcs AS (SELECT CAST(range AS BIGINT) AS s FROM range({len(CLOSENESS_SOURCES)})),
walk(s, v, d) AS (
  SELECT s, s AS v, 0 AS d FROM srcs
  UNION
  SELECT w.s, e.dst, w.d + 1 FROM walk w JOIN und_b e ON e.src = w.v WHERE w.d < 40
),
dist AS (SELECT s, v, min(d) AS d FROM walk GROUP BY s, v)
SELECT s, CAST(count(*) - 1 AS BIGINT) AS reached,
       CAST(sum(d) AS BIGINT) AS total_dist,
       CAST(CASE WHEN sum(d) > 0
                 THEN round((count(*) - 1) * 1e6 / sum(d)) ELSE 0 END AS BIGINT)
         AS closeness_e6,
       CAST(sum(CASE WHEN d > 0 THEN CAST(round(1e6 / d) AS BIGINT) ELSE 0 END)
            AS BIGINT) AS harmonic_e6,
       CAST(max(d) AS BIGINT) AS ecc
FROM dist GROUP BY s
"""

REGISTRY["closeness_centrality"] = (q_closeness_centrality, CLOSENESS_SQL)


def q_modularity(spark, sf_dir):
    """Modularity of the 3-iteration label-propagation clustering — computed
    integer-exactly: Q = Σ_c (e_c·2m − d_c²) / (2m)², one double division at
    the end (engine-independent), e6-quantized."""
    from .algos import label_propagation

    eb = edges_b(spark, sf_dir)
    labels, _ = label_propagation(
        eb, vertices=verts(spark, V_B), max_iter=3, partitions=8
    )
    und = (
        eb.union(eb.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
    )
    lab = labels.select(F.col("id"), F.col("label"))
    deg = und.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    m2 = und.count()  # = 2m (symmetric rows)
    ec = (
        und.join(lab.withColumnRenamed("id", "src")
                 .withColumnRenamed("label", "ls"), "src")
        .join(lab.withColumnRenamed("id", "dst")
              .withColumnRenamed("label", "ld"), "dst")
        .filter(F.col("ls") == F.col("ld"))
        .groupBy(F.col("ls").alias("c"))
        .agg(F.count(F.lit(1)).alias("e"))
    )
    dc = (
        lab.join(deg.withColumnRenamed("src", "id"), "id", "left")
        .na.fill({"d": 0})
        .groupBy(F.col("label").alias("c"))
        .agg(F.sum("d").alias("dsum"))
    )
    num = (
        dc.join(ec, "c", "left")
        .na.fill({"e": 0})
        .agg(
            F.sum(
                F.col("e") * F.lit(m2) - F.col("dsum") * F.col("dsum")
            ).alias("num")
        )
        .collect()[0]["num"]
    )
    q = float(num) / float(m2 * m2) if m2 else 0.0
    return _scalar_df(spark, "modularity_e6", int(round(q * 1e6)))


MODULARITY_SQL = f"""
WITH lp AS ({_labelprop_sql(3)}),
{EDGES_B_SQL},
mu AS (
  SELECT src, dst FROM edges_b
  UNION
  SELECT dst AS src, src AS dst FROM edges_b
),
mdeg AS (SELECT src, count(*) AS d FROM mu GROUP BY src),
m2 AS (SELECT count(*) AS m2 FROM mu),
ec AS (
  SELECT l1.label AS c, count(*) AS e
  FROM mu e JOIN lp l1 ON l1.id = e.src JOIN lp l2 ON l2.id = e.dst
  WHERE l1.label = l2.label
  GROUP BY l1.label
),
dc AS (
  SELECT l.label AS c, sum(coalesce(d.d, 0)) AS dsum
  FROM lp l LEFT JOIN mdeg d ON d.src = l.id
  GROUP BY l.label
)
SELECT CAST(round(1e6 * CAST(sum(coalesce(ec.e, 0) * m2.m2 - dc.dsum * dc.dsum) AS DOUBLE)
            / CAST(m2.m2 * m2.m2 AS DOUBLE)) AS BIGINT) AS modularity_e6
FROM dc LEFT JOIN ec ON ec.c = dc.c CROSS JOIN m2
GROUP BY m2.m2
"""

REGISTRY["modularity"] = (q_modularity, MODULARITY_SQL)


def q_pricing_rollup(spark, sf_dir):
    """ROLLUP aggregation over (returnflag, linestatus) — subtotal + grand
    total rows; exact integer measures for engine-independent hashing."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("(all)")).alias("l_returnflag"),
            F.coalesce("l_linestatus", F.lit("(all)")).alias("l_linestatus"),
            "n_rows", "sum_qty",
        )
    )


PRICING_ROLLUP_SQL = """
SELECT coalesce(l_returnflag, '(all)') AS l_returnflag,
       coalesce(l_linestatus, '(all)') AS l_linestatus,
       count(*) AS n_rows,
       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def q_customers_without_orders(spark, sf_dir):
    """Anti-join: customers with no URGENT-priority order, counted per
    nation (broadcast dimension join on the nation name)."""
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("c_custkey")
    )
    return (
        c.join(urgent, "c_custkey", "left_anti")
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


CUSTOMERS_WITHOUT_ORDERS_SQL = """
SELECT n.n_name, count(*) AS n_customers
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
GROUP BY n.n_name
"""


def q_order_priority_counts(spark, sf_dir):
    """TPC-H Q4 shape: order counts per priority for orders having at least
    one lineitem shipped >30 days after the order date — a CORRELATED
    EXISTS, executed as a theta semi-join on (orderkey, date condition)."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    cond = (o["o_orderkey"] == li["l_orderkey"]) & (
        li["l_shipdate"] > F.date_add(F.col("o_orderdate"), 30)
    )
    return (
        o.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


ORDER_PRIORITY_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
GROUP BY o_orderpriority
"""

REGISTRY["pricing_rollup"] = (q_pricing_rollup, PRICING_ROLLUP_SQL)
REGISTRY["customers_without_orders"] = (
    q_customers_without_orders, CUSTOMERS_WITHOUT_ORDERS_SQL,
)
REGISTRY["order_priority_counts"] = (q_order_priority_counts, ORDER_PRIORITY_SQL)


def q_degree_histogram(spark, sf_dir):
    """Log2-bucketed degree distribution of the undirected derived graph —
    the power-law sanity check every link-graph pipeline ships."""
    ea = edges_a(spark, sf_dir)
    und = (
        ea.union(ea.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
    )
    deg = und.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    return (
        deg.select(F.floor(F.log2("d")).cast("long").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_vertices"))
    )


DEGREE_HISTOGRAM_SQL = f"""
WITH {EDGES_A_SQL}, {UND_A_SQL},
deg AS (SELECT src, count(*) AS d FROM und_a GROUP BY src)
SELECT CAST(floor(log2(d)) AS BIGINT) AS bucket, count(*) AS n_vertices
FROM deg GROUP BY 1
"""


def q_event_transition_counts(spark, sf_dir):
    """Per-user event-type transition graph (Markov edge counts): lag()
    window over the time-ordered event stream, then grouped count — the
    sequential-pattern shape (clickstream → transition matrix)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select(
            "user_id",
            F.lag("event_type").over(w).alias("prev_type"),
            F.col("event_type").alias("next_type"),
        )
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )


EVENT_TRANSITION_SQL = """
SELECT prev_type, next_type, count(*) AS n_transitions FROM (
  SELECT lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type,
         event_type AS next_type
  FROM events
) t WHERE prev_type IS NOT NULL
GROUP BY prev_type, next_type
"""

REGISTRY["degree_histogram"] = (q_degree_histogram, DEGREE_HISTOGRAM_SQL)
REGISTRY["event_transition_counts"] = (
    q_event_transition_counts, EVENT_TRANSITION_SQL,
)


def q_butterfly_count(spark, sf_dir):
    """Bipartite butterfly (2x2 biclique) count over the customer–part
    purchase graph: Σ over customer pairs of C(|common parts|, 2) — the
    bipartite analogue of rectangle counting (co-purchase density)."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    bip = (
        o.filter(F.col("o_orderkey") % 20 == 0)
        .select("o_orderkey", "o_custkey")
        .join(li.select("l_orderkey", "l_partkey"),
              F.col("o_orderkey") == F.col("l_orderkey"))
        .select(F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    # side-disambiguated vertex ids (2c / 2p+1): butterflies are exactly
    # the rectangles of the encoded graph, counted by the hub-safe
    # vertex-priority plan (motifs.four_cycle_count) — the hot customer /
    # hot part wedge blow-up of the naive per-side self-join disappears
    from .algos.motifs import four_cycle_count

    enc = bip.select(
        (F.col("c") * 2).alias("src"), (F.col("p") * 2 + 1).alias("dst")
    )
    return _scalar_df(spark, "butterflies", four_cycle_count(enc))


BUTTERFLY_SQL = """
WITH bip AS (
  SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
  WHERE o.o_orderkey % 20 = 0
),
wedge AS (
  SELECT a.c AS c1, b.c AS c2, count(*) AS w
  FROM bip a JOIN bip b ON a.p = b.p
  WHERE a.c < b.c
  GROUP BY a.c, b.c
)
SELECT CAST(sum(w * (w - 1) / 2) AS BIGINT) AS butterflies FROM wedge
"""

REGISTRY["butterfly_count"] = (q_butterfly_count, BUTTERFLY_SQL)


STRESS_SOURCES = tuple(range(10))
STRESS_LEVELS = 12  # ≥ max source eccentricity of edges_b at every sf (7 at
                    # sf0.001, 3 at sf0.01, 2 at sf0.1 — measured; see
                    # tests/test_paths_scc.py budget test)


def q_stress_centrality(spark, sf_dir):
    """Brandes stress centrality for a 10-source sample — integer-exact
    forward σ + backward suffix-count passes (betweenness's BIGINT sibling)."""
    from .algos.paths import stress_centrality

    return stress_centrality(
        edges_b(spark, sf_dir),
        sources=spark.createDataFrame([(s,) for s in STRESS_SOURCES], "id long"),
        directed=False, partitions=8,
    )


def _stress_sql(levels: int) -> str:
    parts = [
        EDGES_B_SQL, UND_B_SQL,
        f"srcs AS (SELECT CAST(range AS BIGINT) AS s FROM range({len(STRESS_SOURCES)}))",
        "lvl0 AS MATERIALIZED (SELECT s, s AS v, CAST(1 AS BIGINT) AS sig FROM srcs)",
        "set0 AS MATERIALIZED (SELECT s, v FROM lvl0)",
    ]
    for i in range(1, levels + 1):
        parts.append(
            f"""lvl{i} AS MATERIALIZED (
  SELECT p.s, e.dst AS v, CAST(sum(p.sig) AS BIGINT) AS sig
  FROM lvl{i - 1} p JOIN und_b e ON e.src = p.v
  WHERE NOT EXISTS (SELECT 1 FROM set{i - 1} st WHERE st.s = p.s AND st.v = e.dst)
  GROUP BY p.s, e.dst)"""
        )
        parts.append(
            f"set{i} AS MATERIALIZED (SELECT s, v FROM set{i - 1} "
            f"UNION ALL SELECT s, v FROM lvl{i})"
        )
    parts.append(
        f"c{levels} AS MATERIALIZED "
        f"(SELECT s, v, sig, CAST(0 AS BIGINT) AS cv FROM lvl{levels})"
    )
    for i in range(levels - 1, -1, -1):
        parts.append(
            f"""c{i} AS MATERIALIZED (
  SELECT p.s, p.v, p.sig, COALESCE(x.cv, 0) AS cv
  FROM lvl{i} p LEFT JOIN (
    SELECT p2.s, p2.v, CAST(sum(1 + cn.cv) AS BIGINT) AS cv
    FROM lvl{i} p2 JOIN und_b e ON e.src = p2.v
    JOIN c{i + 1} cn ON cn.s = p2.s AND cn.v = e.dst
    GROUP BY p2.s, p2.v) x ON x.s = p.s AND x.v = p.v)"""
        )
    union = " UNION ALL ".join(
        f"SELECT s, v, sig, cv FROM c{i}" for i in range(levels + 1)
    )
    return (
        "WITH " + ",\n".join(parts)
        + f"\nSELECT v AS id, CAST(sum(sig * cv) AS BIGINT) AS stress"
        + f"\nFROM ({union}) WHERE v <> s GROUP BY v HAVING sum(sig * cv) > 0"
    )


STRESS_SQL = _stress_sql(STRESS_LEVELS)

REGISTRY["stress_centrality"] = (q_stress_centrality, STRESS_SQL)


def q_pagerank_top20(spark, sf_dir):
    """Top-20 vertices by 5-iteration PageRank — deterministic total order
    (rank_e8 desc, id): the ranking/limit stage over an iterative result."""
    ranks = q_pagerank5(spark, sf_dir)
    return ranks.orderBy(F.col("rank_e8").desc(), "id").limit(20)


PAGERANK_TOP20_SQL = (
    "WITH pr AS (" + PAGERANK5_SQL + ")\n"
    "SELECT id, rank_e8 FROM pr ORDER BY rank_e8 DESC, id LIMIT 20"
)

REGISTRY["pagerank_top20"] = (q_pagerank_top20, PAGERANK_TOP20_SQL)


def q_incremental_pagerank(spark, sf_dir):
    """Incremental PageRank over an edge-delta batch: converge 5 iterations
    on the base graph (~90% of edges), then ingest the remaining edges and
    warm-start 3 more iterations from the previous vector (L1-renormalized)
    — the cheap-recompute path for a continuously-crawled link graph."""
    from .algos import pagerank

    full = edges_a(spark, sf_dir)
    base = full.filter((F.col("src") * 5 + F.col("dst")) % 10 != 7)
    base_ranks, _ = pagerank(
        base, vertices=verts(spark, V_A), num_iters=5, partitions=16
    )
    ranks, _ = pagerank(
        full, vertices=verts(spark, V_A), num_iters=3, partitions=16,
        initial_ranks=base_ranks,
    )
    return ranks.select(
        "id", F.round(F.col("rank") * 1e8).cast("long").alias("rank_e8")
    )


def _pr_iters_sql(parts: list, prefix: str, edges_name: str, outd_name: str,
                  start_name: str, n: int, v: int) -> str:
    """Append n damped-iteration CTEs (dangling mass + contribution + update)
    starting from rank vector ``start_name``; returns the final CTE name."""
    d = 0.85
    prev = start_name
    for i in range(1, n + 1):
        parts.append(
            f"""{prefix}d{i} AS MATERIALIZED (SELECT coalesce(sum(r.rank), 0) AS dm
      FROM {prev} r LEFT JOIN {outd_name} o ON r.id = o.id WHERE o.id IS NULL)"""
        )
        parts.append(
            f"""{prefix}c{i} AS MATERIALIZED (SELECT e.dst AS id, sum(r.rank / o.od) AS contrib
      FROM {edges_name} e JOIN {prev} r ON e.src = r.id
      JOIN {outd_name} o ON e.src = o.id GROUP BY e.dst)"""
        )
        parts.append(
            f"""{prefix}r{i} AS MATERIALIZED (SELECT vv.id,
      {(1.0 - d) / v!r} + {d} * (coalesce(c.contrib, 0) + dd.dm / {v}) AS rank
      FROM verts_a vv LEFT JOIN {prefix}c{i} c ON vv.id = c.id
      CROSS JOIN {prefix}d{i} dd)"""
        )
        prev = f"{prefix}r{i}"
    return prev


def _incremental_pagerank_sql() -> str:
    parts = [
        EDGES_A_SQL, VERTS_A_SQL,
        "base_e AS MATERIALIZED "
        "(SELECT src, dst FROM edges_a WHERE (src * 5 + dst) % 10 <> 7)",
        "boutd AS MATERIALIZED (SELECT src AS id, CAST(count(*) AS DOUBLE) AS od "
        "FROM base_e GROUP BY src)",
        f"br0 AS (SELECT id, 1.0/{V_A} AS rank FROM verts_a)",
    ]
    last = _pr_iters_sql(parts, "b", "base_e", "boutd", "br0", 5, V_A)
    parts.append(f"tot AS MATERIALIZED (SELECT sum(rank) AS t FROM {last})")
    parts.append(
        "foutd AS MATERIALIZED (SELECT src AS id, CAST(count(*) AS DOUBLE) AS od "
        "FROM edges_a GROUP BY src)"
    )
    # warm start: L1-normalize the base vector (mirrors pagerank(initial_ranks=))
    parts.append(
        f"fr0 AS MATERIALIZED (SELECT r.id, r.rank / tt.t AS rank "
        f"FROM {last} r CROSS JOIN tot tt)"
    )
    last = _pr_iters_sql(parts, "f", "edges_a", "foutd", "fr0", 3, V_A)
    return (
        "WITH " + ",\n".join(parts)
        + f"\nSELECT id, CAST(round(rank * 100000000) AS BIGINT) AS rank_e8 FROM {last}"
    )


INCREMENTAL_PAGERANK_SQL = _incremental_pagerank_sql()

REGISTRY["incremental_pagerank"] = (q_incremental_pagerank, INCREMENTAL_PAGERANK_SQL)


def q_hyperball_ball3(spark, sf_dir):
    """HyperBall radius-3 ball-size estimate per vertex — HLL register
    max-merge supersteps with BIGINT-exact register math, so the sketch
    itself (not just its inputs) is value-checked against the SQL twin."""
    from .algos.hyperball import hyperball

    return hyperball(
        edges_b(spark, sf_dir), vertices=verts(spark, V_B),
        radius=3, directed=False, partitions=8,
    )


def _hyperball_sql(radius: int) -> str:
    from .algos.hyperball import EST_NUM_E6, HASH_A, HASH_B, HASH_MOD

    rho_case = (
        "CASE "
        + " ".join(
            f"WHEN (m >> 4) % {1 << k} = {1 << (k - 1)} THEN {k}"
            for k in range(1, 17)
        )
        + " ELSE 17 END"
    )
    parts = [
        EDGES_B_SQL, UND_B_SQL, VERTS_B_SQL,
        f"hbm AS (SELECT id AS v, (id * {HASH_A} + {HASH_B}) % {HASH_MOD} AS m "
        "FROM verts_b)",
        f"hb0 AS MATERIALIZED (SELECT v, CAST(m % 16 AS BIGINT) AS j, "
        f"CAST({rho_case} AS BIGINT) AS r FROM hbm)",
    ]
    for t in range(1, radius + 1):
        parts.append(
            f"""hb{t} AS MATERIALIZED (
  SELECT v, j, max(r) AS r FROM (
    SELECT e.src AS v, p.j, p.r FROM und_b e JOIN hb{t - 1} p ON p.v = e.dst
    UNION ALL SELECT v, j, r FROM hb{t - 1}) u GROUP BY v, j)"""
        )
    # registers are sparse rows here (absent j ⇒ M_j = 0 ⇒ term 2^32);
    # the engine's dense 16-column layout computes the identical sum
    return (
        "WITH " + ",\n".join(parts)
        + f"""
SELECT v AS id,
       CAST(sum(4294967296 >> r) + (16 - count(*)) * 4294967296 AS BIGINT)
         AS sum_int,
       CAST(round({EST_NUM_E6!r} /
            (sum(4294967296 >> r) + (16 - count(*)) * 4294967296)) AS BIGINT)
         AS ball_e6
FROM hb{radius} GROUP BY v"""
    )


HYPERBALL_SQL = _hyperball_sql(3)

REGISTRY["hyperball_ball3"] = (q_hyperball_ball3, HYPERBALL_SQL)


def q_louvain_sync4(spark, sf_dir):
    """Synchronous Louvain-style clustering, 4 rounds — integer-exact
    modularity-gain scores with min-label tie-break (deterministic across
    engines; quality measured by the separate modularity query)."""
    from .algos.louvain import louvain_sync

    return louvain_sync(
        edges_b(spark, sf_dir), vertices=verts(spark, V_B),
        num_rounds=4, partitions=8,
    )


def _louvain_sql(num_rounds: int) -> str:
    parts = [
        EDGES_B_SQL, UND_B_SQL, VERTS_B_SQL,
        "ldeg AS MATERIALIZED (SELECT src AS id, CAST(count(*) AS BIGINT) AS deg "
        "FROM und_b GROUP BY src)",
        "lm2 AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS m2 FROM und_b)",
        "lv0 AS MATERIALIZED (SELECT id, id AS label FROM verts_b)",
    ]
    for r in range(1, num_rounds + 1):
        p = f"lv{r - 1}"
        parts.append(
            f"tot{r} AS MATERIALIZED (SELECT l.label, CAST(sum(d.deg) AS BIGINT) "
            f"AS tot FROM {p} l JOIN ldeg d ON d.id = l.id GROUP BY l.label)"
        )
        parts.append(
            f"kvc{r} AS MATERIALIZED (SELECT e.src AS id, l.label AS clab, "
            f"CAST(count(*) AS BIGINT) AS kvc FROM und_b e "
            f"JOIN {p} l ON l.id = e.dst GROUP BY e.src, l.label)"
        )
        parts.append(
            f"cand{r} AS MATERIALIZED (SELECT id, clab, CAST(sum(kvc) AS BIGINT) "
            f"AS kvc FROM (SELECT id, clab, kvc FROM kvc{r} "
            f"UNION ALL SELECT id, label AS clab, 0 FROM {p}) u GROUP BY id, clab)"
        )
        parts.append(
            f"""scored{r} AS MATERIALIZED (
  SELECT c.id, c.clab,
         (SELECT m2 FROM lm2) * c.kvc
         - COALESCE(d.deg, 0) * (COALESCE(t.tot, 0)
             - CASE WHEN c.clab = l.label THEN COALESCE(d.deg, 0) ELSE 0 END)
           AS score
  FROM cand{r} c
  JOIN {p} l ON l.id = c.id
  LEFT JOIN ldeg d ON d.id = c.id
  LEFT JOIN tot{r} t ON t.label = c.clab)"""
        )
        parts.append(
            f"""lv{r} AS MATERIALIZED (SELECT id, clab AS label FROM (
  SELECT id, clab, row_number() OVER (PARTITION BY id
         ORDER BY score DESC, clab ASC) AS rn
  FROM scored{r}) z WHERE rn = 1)"""
        )
    return (
        "WITH " + ",\n".join(parts)
        + f"\nSELECT id, label FROM lv{num_rounds}"
    )


LOUVAIN_SQL = _louvain_sql(4)

REGISTRY["louvain_sync4"] = (q_louvain_sync4, LOUVAIN_SQL)


def q_collocations_top20(spark, sf_dir):
    """Top-20 bigram collocations by Dice coefficient (integer-exact counts,
    e6-quantized score, total order) — corpus collocation extraction for a
    training-data pipeline."""
    from . import text

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return text.collocations_topk(d, min_count=5, k=20)


from . import text as _text

REGISTRY["collocations_top20"] = (q_collocations_top20, _text.collocations_sql())


def q_tfidf_top3(spark, sf_dir):
    """Top-3 TF-IDF terms per document (per-term-quantized idf, exact
    BIGINT scores, window top-k) — feature extraction for a training-data
    pipeline."""
    from . import text

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return text.tfidf_topk(d, k=3)


REGISTRY["tfidf_top3"] = (q_tfidf_top3, _text.tfidf_sql(k=3))


def q_reciprocity(spark, sf_dir):
    """Link reciprocity of the directed derived graph: the fraction of
    edges (u,v) whose reverse (v,u) also exists — a standard web-graph
    shape statistic (exact counts, e6-quantized ratio)."""
    e = edges_a(spark, sf_dir)
    recip = e.join(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst")),
        ["src", "dst"],
        "left_semi",
    )
    return (
        e.agg(F.count(F.lit(1)).alias("n_edges"))
        .crossJoin(recip.agg(F.count(F.lit(1)).alias("n_recip")))
        .select(
            F.col("n_edges").cast("long").alias("n_edges"),
            F.col("n_recip").cast("long").alias("n_recip"),
            F.round(F.lit(1e6) * F.col("n_recip") / F.col("n_edges"))
            .cast("long")
            .alias("reciprocity_e6"),
        )
    )


RECIPROCITY_SQL = f"""
WITH {EDGES_A_SQL},
r AS (SELECT count(*) AS c FROM edges_a e
      JOIN edges_a x ON x.src = e.dst AND x.dst = e.src),
n AS (SELECT count(*) AS c FROM edges_a)
SELECT CAST(n.c AS BIGINT) AS n_edges, CAST(r.c AS BIGINT) AS n_recip,
       CAST(round(1e6 * r.c / n.c) AS BIGINT) AS reciprocity_e6
FROM n, r
"""

REGISTRY["reciprocity"] = (q_reciprocity, RECIPROCITY_SQL)


def q_bowtie(spark, sf_dir):
    """Broder bow-tie decomposition of the directed derived graph:
    core / in / out / tendril / disc per vertex (SCC + three BFS
    reachability passes; transitive-closure recursive-CTE SQL twin)."""
    from .algos.components import bowtie_regions

    return bowtie_regions(edges_b(spark, sf_dir), partitions=8)


BOWTIE_SQL = f"""
WITH RECURSIVE {EDGES_B_SQL}, {UND_B_SQL},
vb AS (SELECT DISTINCT id FROM (
  SELECT src AS id FROM edges_b UNION ALL SELECT dst AS id FROM edges_b)),
reach(u, v) AS (
  SELECT id AS u, id AS v FROM vb
  UNION
  SELECT r.u, e.dst FROM reach r JOIN edges_b e ON e.src = r.v
),
scc AS (
  SELECT r1.u AS id, min(r1.v) AS scc
  FROM reach r1 JOIN reach r2 ON r1.u = r2.v AND r1.v = r2.u
  GROUP BY r1.u
),
core AS (
  SELECT id FROM scc WHERE scc = (
    SELECT scc FROM scc GROUP BY scc ORDER BY count(*) DESC, scc ASC LIMIT 1)
),
fwd AS (SELECT DISTINCT r.v AS id FROM reach r JOIN core c ON r.u = c.id),
bwd AS (SELECT DISTINCT r.u AS id FROM reach r JOIN core c ON r.v = c.id),
wreach(id) AS (
  SELECT id FROM core
  UNION
  SELECT e.dst FROM wreach w JOIN und_b e ON e.src = w.id
)
SELECT vb.id,
  CASE WHEN c.id IS NOT NULL THEN 'core'
       WHEN b.id IS NOT NULL THEN 'in'
       WHEN f.id IS NOT NULL THEN 'out'
       WHEN w.id IS NOT NULL THEN 'tendril'
       ELSE 'disc' END AS region
FROM vb
LEFT JOIN core c ON c.id = vb.id
LEFT JOIN bwd b ON b.id = vb.id
LEFT JOIN fwd f ON f.id = vb.id
LEFT JOIN wreach w ON w.id = vb.id
"""

REGISTRY["bowtie_regions"] = (q_bowtie, BOWTIE_SQL)


def q_ktruss5(spark, sf_dir):
    """5-truss of the undirected derived graph (every edge in ≥3
    triangles within the subgraph) by iterative support peeling;
    unrolled-peel SQL twin."""
    from .algos.ktruss import ktruss_edges

    e, _ = ktruss_edges(edges_b(spark, sf_dir), k=5, partitions=8)
    return e.select(F.col("a").cast("long").alias("a"),
                    F.col("b").cast("long").alias("b"))


def _ktruss_sql(k: int, rounds: int) -> str:
    # MATERIALIZED is load-bearing (see _kcore_sql): e{i} is referenced by
    # three join sides of the next round's wedge+closure plan.
    # Round budget validated empirically: sf0.01 needs 14 rounds at k=5
    # (sf0.001 collapses to empty in 2, sf0.1 is already a 5-truss).
    parts = [
        EDGES_B_SQL,
        "e0 AS MATERIALIZED (SELECT DISTINCT least(src,dst) AS a, "
        "greatest(src,dst) AS b FROM edges_b)",
    ]
    for i in range(1, rounds + 1):
        p = f"e{i - 1}"
        parts.append(f"""t{i} AS MATERIALIZED (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM {p} e1 JOIN {p} e2 ON e1.a = e2.a AND e1.b < e2.b
  WHERE EXISTS (SELECT 1 FROM {p} e3 WHERE e3.a = e1.b AND e3.b = e2.b))""")
        parts.append(f"""s{i} AS MATERIALIZED (
  SELECT a, b, count(*) AS supp FROM (
    SELECT x AS a, y AS b FROM t{i}
    UNION ALL SELECT x AS a, z AS b FROM t{i}
    UNION ALL SELECT y AS a, z AS b FROM t{i}) GROUP BY a, b)""")
        parts.append(f"""e{i} AS MATERIALIZED (
  SELECT e.a, e.b FROM {p} e JOIN s{i} s ON s.a = e.a AND s.b = e.b
  WHERE s.supp >= {k - 2})""")
    return "WITH " + ",\n".join(parts) + f"\nSELECT a, b FROM e{rounds}"


KTRUSS5_SQL = _ktruss_sql(5, 20)

REGISTRY["ktruss_5"] = (q_ktruss5, KTRUSS5_SQL)


def q_luby_mis(spark, sf_dir):
    """Maximal independent set (Luby, deterministic hash priorities) on
    the undirected derived graph; 8-round unrolled SQL twin."""
    from .algos.mis import maximal_independent_set

    mis, _ = maximal_independent_set(edges_b(spark, sf_dir), partitions=8)
    return mis.select(F.col("id").cast("long").alias("id"))


def _luby_sql(rounds: int) -> str:
    # Round budget validated empirically: 3 rounds at sf0.001, 2 at
    # sf0.01/sf0.1; 8 gives margin.  MATERIALIZED: a{i}/u{i} feed three
    # references each in round i+1.
    from .algos.mis import PRI_A, PRI_B, PRI_M

    pri = lambda c: f"(({c} * {PRI_A} + {PRI_B}) % {PRI_M})"  # noqa: E731
    parts = [
        EDGES_B_SQL, UND_B_SQL,
        "u0 AS MATERIALIZED (SELECT src, dst FROM und_b)",
        "a0 AS MATERIALIZED (SELECT DISTINCT src AS id FROM und_b)",
        "m0 AS (SELECT CAST(NULL AS BIGINT) AS id WHERE FALSE)",
    ]
    for i in range(1, rounds + 1):
        parts.append(f"""nm{i} AS MATERIALIZED (
  SELECT src AS id, min({pri("dst")}) AS nmin FROM u{i - 1} GROUP BY src)""")
        parts.append(f"""w{i} AS MATERIALIZED (
  SELECT a.id FROM a{i - 1} a LEFT JOIN nm{i} n ON n.id = a.id
  WHERE n.nmin IS NULL OR {pri("a.id")} < n.nmin)""")
        parts.append(f"""a{i} AS MATERIALIZED (
  SELECT id FROM a{i - 1}
  WHERE id NOT IN (SELECT id FROM w{i})
    AND id NOT IN (SELECT u.dst FROM u{i - 1} u JOIN w{i} w ON u.src = w.id))""")
        parts.append(f"""u{i} AS MATERIALIZED (
  SELECT u.src, u.dst FROM u{i - 1} u
  JOIN a{i} x ON u.src = x.id JOIN a{i} y ON u.dst = y.id)""")
        parts.append(
            f"m{i} AS (SELECT id FROM m{i - 1} UNION ALL SELECT id FROM w{i})"
        )
    return "WITH " + ",\n".join(parts) + f"\nSELECT id FROM m{rounds}"


LUBY_SQL = _luby_sql(8)

REGISTRY["luby_mis"] = (q_luby_mis, LUBY_SQL)


def q_katz_4iter(spark, sf_dir):
    """Katz centrality, 4 e6-quantized supersteps (α=0.15) over the
    directed derived graph; 4-step unrolled SQL twin."""
    from .algos.katz import katz_centrality

    return katz_centrality(edges_a(spark, sf_dir), alpha=0.15, iters=4,
                           partitions=8)


def _katz_sql(alpha: float, iters: int) -> str:
    parts = [
        EDGES_A_SQL,
        "va AS MATERIALIZED (SELECT DISTINCT id FROM ("
        "SELECT src AS id FROM edges_a UNION ALL SELECT dst AS id FROM edges_a))",
        "x0 AS MATERIALIZED (SELECT id, CAST(1000000 AS BIGINT) AS x FROM va)",
    ]
    for i in range(1, iters + 1):
        parts.append(f"""c{i} AS MATERIALIZED (
  SELECT e.dst AS id, sum(x.x) AS s
  FROM edges_a e JOIN x{i - 1} x ON x.id = e.src GROUP BY e.dst)""")
        parts.append(f"""x{i} AS MATERIALIZED (
  SELECT v.id,
         1000000 + CAST(round({alpha} * coalesce(c.s, 0)) AS BIGINT) AS x
  FROM va v LEFT JOIN c{i} c ON c.id = v.id)""")
    return (
        "WITH " + ",\n".join(parts)
        + f"\nSELECT id, x AS katz_e6 FROM x{iters}"
    )


KATZ_SQL = _katz_sql(0.15, 4)

REGISTRY["katz_4iter"] = (q_katz_4iter, KATZ_SQL)


def q_two_hop_sizes(spark, sf_dir):
    """Exact 2-hop neighborhood size per vertex (friend-of-friend count)
    over the undirected derived graph — the classic audience-estimation
    query; wedge self-join + distinct aggregation."""
    ea = edges_a(spark, sf_dir)
    # no persist: the table is consumed twice inside ONE job, so Spark's
    # shuffle reuse covers it without pinning executor storage afterwards
    und = (
        ea.union(ea.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .repartition(8, "src")
    )
    two = und.alias("e1").join(
        und.select(F.col("src").alias("mid"), F.col("dst").alias("w"))
        .alias("e2"),
        F.col("e1.dst") == F.col("mid"),
    ).select(F.col("e1.src").alias("src"), F.col("w").alias("dst"))
    return (
        und.select("src", "dst").union(two)
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .groupBy(F.col("src").alias("id"))
        .agg(F.count(F.lit(1)).alias("n2hop"))
        .select("id", F.col("n2hop").cast("long").alias("n2hop"))
    )


TWO_HOP_SQL = f"""
WITH {EDGES_A_SQL}, {UND_A_SQL},
r AS (
  SELECT src, dst FROM und_a
  UNION
  SELECT e1.src, e2.dst FROM und_a e1 JOIN und_a e2 ON e1.dst = e2.src
)
SELECT src AS id, CAST(count(*) AS BIGINT) AS n2hop
FROM r WHERE src <> dst GROUP BY src
"""

REGISTRY["two_hop_sizes"] = (q_two_hop_sizes, TWO_HOP_SQL)


def q_train_test_split(spark, sf_dir):
    """Deterministic stratified train/test split of the documents table:
    arithmetic-hash 80/20 per doc, counts per (lang, split) — the
    training-data partitioning primitive (no RNG, reproducible in any
    engine)."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    split = F.when(
        (F.col("doc_id") * 2654435761) % 1000 < 800, "train"
    ).otherwise("test")
    return (
        d.select("lang", split.alias("split"), "n_chars")
        .groupBy("lang", "split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
        )
    )


TRAIN_TEST_SQL = """
SELECT lang,
       CASE WHEN (doc_id * 2654435761) % 1000 < 800
            THEN 'train' ELSE 'test' END AS split,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM documents GROUP BY 1, 2
"""

REGISTRY["train_test_split"] = (q_train_test_split, TRAIN_TEST_SQL)


def q_rmat_degree_histogram(spark, sf_dir):
    """Deterministic R-MAT benchmark-graph generator (50k edge draws, 2^12
    vertices) + out-degree log2 histogram — the in-engine synthetic-graph
    path for scale testing (edge i is a pure integer function of i:
    embarrassingly parallel, zero shuffle to generate)."""
    from .datagen import rmat_edges

    e = (
        rmat_edges(spark, 50_000, 12, partitions=8)
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    return (
        deg.groupBy(
            F.floor(F.log2("d")).cast("long").alias("bucket")
        )
        .agg(F.count(F.lit(1)).alias("n_vertices"),
             F.sum("d").cast("long").alias("n_edges"))
    )


def _rmat_hist_sql() -> str:
    from .datagen import rmat_edges_sql

    return f"""
WITH gen AS ({rmat_edges_sql(50_000, 12)}),
e AS (SELECT DISTINCT src, dst FROM gen WHERE src <> dst),
deg AS (SELECT src, count(*) AS d FROM e GROUP BY src)
SELECT CAST(floor(log2(d)) AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_vertices,
       CAST(sum(d) AS BIGINT) AS n_edges
FROM deg GROUP BY 1
"""


REGISTRY["rmat_degree_histogram"] = (q_rmat_degree_histogram, _rmat_hist_sql())


EXACT_DIAG_MAX_SOURCES = 20_000


def _guard_exact_all_sources(n_sources: int, what: str) -> None:
    """All-sources BFS diagnostics are O(V·E) — exact small-graph
    companions of the HyperBall sketch (q_hyperball_ball3), never to be
    pointed at a full web graph.  Hard guard so a misconfigured run fails
    fast with the sketch pointer instead of melting the cluster."""
    if n_sources > EXACT_DIAG_MAX_SOURCES:
        raise ValueError(
            f"{what}: {n_sources} BFS sources exceeds the exact-diagnostic "
            f"cap {EXACT_DIAG_MAX_SOURCES} (O(V*E) all-sources BFS). Use "
            f"the HyperBall sketch (hyperball_ball3 / algos.hyperball) at "
            f"scale, or pass a sampled source set."
        )


def q_effective_diameter(spark, sf_dir):
    """Exact diameter + effective diameter (d90) of the undirected derived
    graph from the all-sources distance histogram (the exact counterpart
    of the HyperBall/HyperANF sketch; integer-exact percentile rule
    10·cum ≥ 9·total).  Guarded: refuses > EXACT_DIAG_MAX_SOURCES sources
    (the scale path is the HyperBall sketch)."""
    from .algos.paths import distance_histogram

    eb = edges_b(spark, sf_dir)
    vb = (
        eb.select(F.col("src").alias("id"))
        .union(eb.select(F.col("dst").alias("id")))
        .distinct()
    )
    _guard_exact_all_sources(vb.count(), "effective_diameter")
    hist = distance_histogram(eb, sources=vb, directed=False, partitions=8)
    w_cum = Window.orderBy("dist").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.partitionBy()
    return (
        hist.select(
            "dist", "n_pairs",
            F.sum("n_pairs").over(w_cum).alias("cum"),
            F.sum("n_pairs").over(w_all).alias("tot"),
        )
        .agg(
            F.max("dist").cast("long").alias("diameter"),
            F.min(
                F.when(10 * F.col("cum") >= 9 * F.col("tot"), F.col("dist"))
            ).cast("long").alias("eff_diam_d90"),
            F.max("tot").cast("long").alias("n_pairs"),
        )
    )


EFF_DIAM_SQL = f"""
WITH RECURSIVE {EDGES_B_SQL}, {UND_B_SQL},
vb AS (SELECT DISTINCT id FROM (
  SELECT src AS id FROM edges_b UNION ALL SELECT dst AS id FROM edges_b)),
walk(s, v, d) AS (
  SELECT id AS s, id AS v, 0 AS d FROM vb
  UNION
  SELECT w.s, e.dst, w.d + 1 FROM walk w JOIN und_b e ON e.src = w.v
  WHERE w.d < 40
),
dists AS (SELECT s, v, min(d) AS dist FROM walk GROUP BY s, v HAVING min(d) > 0),
hist AS (SELECT dist, count(*) AS n_pairs FROM dists GROUP BY dist),
c AS (SELECT dist, n_pairs,
             sum(n_pairs) OVER (ORDER BY dist) AS cum,
             sum(n_pairs) OVER () AS tot
      FROM hist)
SELECT CAST(max(dist) AS BIGINT) AS diameter,
       CAST(min(CASE WHEN 10 * cum >= 9 * tot THEN dist END) AS BIGINT)
         AS eff_diam_d90,
       CAST(max(tot) AS BIGINT) AS n_pairs
FROM c
"""

REGISTRY["effective_diameter"] = (q_effective_diameter, EFF_DIAM_SQL)


def q_lp_conductance(spark, sf_dir):
    """Conductance φ(c) = cut(c) / min(vol(c), 2m−vol(c)) of every
    3-iteration label-propagation community (integer-exact cut/volume,
    e6-quantized ratio) — the community-quality metric complementing
    modularity."""
    from .algos import label_propagation

    eb = edges_b(spark, sf_dir)
    labels, _ = label_propagation(
        eb, vertices=verts(spark, V_B), max_iter=3, partitions=8
    )
    und = (
        eb.union(eb.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
    )
    lab = labels.select("id", "label")
    m2 = und.count()
    sides = (
        und.join(lab.withColumnRenamed("id", "src")
                 .withColumnRenamed("label", "ls"), "src")
        .join(lab.withColumnRenamed("id", "dst")
              .withColumnRenamed("label", "ld"), "dst")
    )
    per_c = (
        sides.groupBy(F.col("ls").alias("c"))
        .agg(
            F.count(F.lit(1)).alias("vol"),
            F.sum((F.col("ls") != F.col("ld")).cast("long")).alias("cut"),
        )
        .filter((F.col("vol") > 0) & (F.lit(m2) - F.col("vol") > 0))
    )
    return per_c.select(
        F.col("c").cast("long").alias("c"),
        F.col("cut").cast("long").alias("cut"),
        F.col("vol").cast("long").alias("vol"),
        F.round(
            F.lit(1e6) * F.col("cut")
            / F.least(F.col("vol"), F.lit(m2) - F.col("vol"))
        ).cast("long").alias("conductance_e6"),
    )


LP_CONDUCTANCE_SQL = f"""
WITH lp AS ({_labelprop_sql(3)}),
{EDGES_B_SQL},
mu AS (
  SELECT src, dst FROM edges_b
  UNION
  SELECT dst AS src, src AS dst FROM edges_b
),
m2 AS (SELECT count(*) AS m2 FROM mu),
sides AS (
  SELECT l1.label AS ls, l2.label AS ld
  FROM mu e JOIN lp l1 ON l1.id = e.src JOIN lp l2 ON l2.id = e.dst
),
per_c AS (
  SELECT ls AS c, count(*) AS vol,
         sum(CASE WHEN ls <> ld THEN 1 ELSE 0 END) AS cut
  FROM sides GROUP BY ls
)
SELECT CAST(c AS BIGINT) AS c, CAST(cut AS BIGINT) AS cut,
       CAST(vol AS BIGINT) AS vol,
       CAST(round(1e6 * cut / least(vol, m2.m2 - vol)) AS BIGINT)
         AS conductance_e6
FROM per_c CROSS JOIN m2
WHERE vol > 0 AND m2.m2 - vol > 0
"""

REGISTRY["lp_conductance"] = (q_lp_conductance, LP_CONDUCTANCE_SQL)


def q_salsa_3iter(spark, sf_dir):
    """SALSA hub/authority scores, 3 e6-quantized degree-normalized
    supersteps over the directed derived graph; unrolled SQL twin."""
    from .algos.salsa import salsa

    return salsa(edges_a(spark, sf_dir), num_iters=3, partitions=8)


def _salsa_sql(iters: int) -> str:
    parts = [
        EDGES_A_SQL,
        "sod AS MATERIALIZED (SELECT src, count(*) AS od FROM edges_a GROUP BY src)",
        "sidg AS MATERIALIZED (SELECT dst, count(*) AS idg FROM edges_a GROUP BY dst)",
        "sva AS MATERIALIZED (SELECT DISTINCT id FROM ("
        "SELECT src AS id FROM edges_a UNION ALL SELECT dst AS id FROM edges_a))",
        "s0 AS MATERIALIZED (SELECT id, CAST(1000000 AS BIGINT) AS h, "
        "CAST(1000000 AS BIGINT) AS a FROM sva)",
    ]
    for i in range(1, iters + 1):
        parts.append(f"""sa{i} AS MATERIALIZED (
  SELECT e.dst AS id, CAST(sum(CAST(round(s.h / o.od) AS BIGINT)) AS BIGINT) AS a
  FROM edges_a e JOIN s{i - 1} s ON s.id = e.src JOIN sod o ON o.src = e.src
  GROUP BY e.dst)""")
        parts.append(f"""sm{i} AS MATERIALIZED (
  SELECT v.id, s.h, coalesce(a.a, 0) AS a
  FROM sva v JOIN s{i - 1} s ON s.id = v.id LEFT JOIN sa{i} a ON a.id = v.id)""")
        parts.append(f"""sh{i} AS MATERIALIZED (
  SELECT e.src AS id, CAST(sum(CAST(round(s.a / d.idg) AS BIGINT)) AS BIGINT) AS h
  FROM edges_a e JOIN sm{i} s ON s.id = e.dst JOIN sidg d ON d.dst = e.dst
  GROUP BY e.src)""")
        parts.append(f"""s{i} AS MATERIALIZED (
  SELECT v.id, coalesce(h.h, 0) AS h, s.a
  FROM sva v JOIN sm{i} s ON s.id = v.id LEFT JOIN sh{i} h ON h.id = v.id)""")
    return (
        "WITH " + ",\n".join(parts)
        + f"\nSELECT id, h AS hub_e6, a AS auth_e6 FROM s{iters}"
    )


SALSA_SQL = _salsa_sql(3)

REGISTRY["salsa_3iter"] = (q_salsa_3iter, SALSA_SQL)


def q_bipartite_components(spark, sf_dir):
    """Per-component bipartiteness (odd-cycle detection) of the undirected
    derived graph: BFS-parity 2-coloring from each component's min-label
    root — component is bipartite iff no edge joins same-parity levels.
    Composition of the CC and multi-source-BFS loops."""
    from .algos.components import connected_components
    from .algos.paths import bfs_distances

    eb = edges_b(spark, sf_dir)
    labels, _ = connected_components(eb, partitions=8)
    roots = labels.select(F.col("component").alias("id")).distinct()
    dist, _ = bfs_distances(eb, sources=roots, directed=False, partitions=8)
    par = dist.select("id", (F.col("dist") % 2).alias("par"))
    und = (
        eb.union(eb.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
    )
    bad = (
        und.join(par.withColumnRenamed("id", "src")
                 .withColumnRenamed("par", "ps"), "src")
        .join(par.withColumnRenamed("id", "dst")
              .withColumnRenamed("par", "pd"), "dst")
        .filter(F.col("ps") == F.col("pd"))
        .join(labels.withColumnRenamed("id", "src"), "src")
        .select("component")
        .distinct()
    )
    return (
        roots.select(F.col("id").alias("component"))
        .join(bad.withColumn("b", F.lit(True)), "component", "left")
        .select(
            F.col("component").cast("long").alias("component"),
            F.col("b").isNull().alias("is_bipartite"),
        )
    )


BIPARTITE_SQL = f"""
WITH RECURSIVE {EDGES_B_SQL}, {UND_B_SQL},
vb AS (SELECT DISTINCT id FROM (
  SELECT src AS id FROM edges_b UNION ALL SELECT dst AS id FROM edges_b)),
wreach(u, v) AS (
  SELECT id AS u, id AS v FROM vb
  UNION
  SELECT w.u, e.dst FROM wreach w JOIN und_b e ON e.src = w.v
),
comp AS (SELECT u AS id, min(v) AS component FROM wreach GROUP BY u),
roots AS (SELECT DISTINCT component AS id FROM comp),
walk(id, d) AS (
  SELECT id, 0 AS d FROM roots
  UNION
  SELECT e.dst, w.d + 1 FROM walk w JOIN und_b e ON e.src = w.id WHERE w.d < 40
),
par AS (SELECT id, min(d) % 2 AS par FROM walk GROUP BY id),
bad AS (
  SELECT DISTINCT c.component
  FROM und_b e JOIN par p1 ON p1.id = e.src JOIN par p2 ON p2.id = e.dst
  JOIN comp c ON c.id = e.src
  WHERE p1.par = p2.par
)
SELECT CAST(r.id AS BIGINT) AS component, b.component IS NULL AS is_bipartite
FROM roots r LEFT JOIN bad b ON b.component = r.id
"""

REGISTRY["bipartite_components"] = (q_bipartite_components, BIPARTITE_SQL)


PPR_SEEDS = (0, 17, 42)


def q_multi_seed_ppr(spark, sf_dir):
    """Batch personalized PageRank for 3 seeds concurrently (sparse
    composite-key state, e6-quantized push, bit-equal across engines);
    4-step unrolled SQL twin."""
    from .algos.pprmulti import multi_seed_ppr

    return multi_seed_ppr(edges_a(spark, sf_dir), seeds=list(PPR_SEEDS),
                          damping=0.85, num_iters=4, partitions=8)


def _multi_ppr_sql(seeds: tuple[int, ...], damping: float, iters: int) -> str:
    teleport = int(round((1.0 - damping) * 1_000_000))
    seed_rows = ", ".join(f"({s})" for s in sorted(seeds))
    parts = [
        EDGES_A_SQL,
        f"seeds(s) AS (VALUES {seed_rows})",
        "pod AS MATERIALIZED (SELECT src, count(*) AS od FROM edges_a GROUP BY src)",
        "p0 AS MATERIALIZED (SELECT CAST(s AS BIGINT) AS s, CAST(s AS BIGINT) AS v, "
        "CAST(1000000 AS BIGINT) AS r FROM seeds)",
    ]
    for i in range(1, iters + 1):
        parts.append(f"""pc{i} AS MATERIALIZED (
  SELECT p.s, e.dst AS v,
         CAST(sum(CAST(round({damping} * p.r / o.od) AS BIGINT)) AS BIGINT) AS c
  FROM p{i - 1} p JOIN edges_a e ON e.src = p.v JOIN pod o ON o.src = p.v
  GROUP BY p.s, e.dst)""")
        parts.append(f"""p{i} AS MATERIALIZED (
  SELECT coalesce(c.s, t.s) AS s, coalesce(c.v, t.v) AS v,
         coalesce(c.c, 0)
           + CASE WHEN t.s IS NOT NULL THEN {teleport} ELSE 0 END AS r
  FROM pc{i} c FULL JOIN (
    SELECT CAST(s AS BIGINT) AS s, CAST(s AS BIGINT) AS v FROM seeds) t
    ON t.s = c.s AND t.v = c.v)""")
    return (
        "WITH " + ",\n".join(parts)
        + f"\nSELECT s, v, CAST(r AS BIGINT) AS rank_e6 FROM p{iters} WHERE r > 0"
    )


MULTI_PPR_SQL = _multi_ppr_sql(PPR_SEEDS, 0.85, 4)

REGISTRY["multi_seed_ppr"] = (q_multi_seed_ppr, MULTI_PPR_SQL)


def q_stream_distinct_users(spark, sf_dir):
    """Streaming exact distinct-user count per event type (chained
    stateful dropDuplicates → grouped count, availableNow drain) — must
    equal the batch COUNT(DISTINCT …) oracle."""
    from . import streaming

    return streaming.stream_distinct_users(
        spark, f"{sf_dir}/events.parquet", sink_table="q_stream_distinct"
    )


STREAM_DISTINCT_SQL = """
SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_distinct_users
FROM events GROUP BY event_type
"""

REGISTRY["stream_distinct_users"] = (q_stream_distinct_users, STREAM_DISTINCT_SQL)


def q_condensation_levels(spark, sf_dir):
    """Topological levels of the SCC condensation DAG of the directed
    derived graph (level = longest path from source components) —
    the web-graph hierarchy; transitive-closure SCC + unrolled
    max-relaxation SQL twin."""
    from .algos.scc import condensation_levels

    return condensation_levels(edges_b(spark, sf_dir), partitions=8)


def _cond_levels_sql(rounds: int) -> str:
    # Relaxation depth ≤ 6 on every derived graph (measured); 12 = margin.
    parts = [f"""reach(u, v) AS (
  SELECT id AS u, id AS v FROM cvb
  UNION
  SELECT r.u, e.dst FROM reach r JOIN edges_b e ON e.src = r.v
)""", """cscc AS (
  SELECT r1.u AS id, min(r1.v) AS scc
  FROM reach r1 JOIN reach r2 ON r1.u = r2.v AND r1.v = r2.u
  GROUP BY r1.u
)""", "csizes AS (SELECT scc, count(*) AS n_vertices FROM cscc GROUP BY scc)",
        """ccond AS MATERIALIZED (
  SELECT DISTINCT a.scc AS src, b.scc AS dst
  FROM edges_b e JOIN cscc a ON a.id = e.src JOIN cscc b ON b.id = e.dst
  WHERE a.scc <> b.scc
)""", "l0 AS (SELECT scc AS id, CAST(0 AS BIGINT) AS lvl FROM csizes)"]
    for i in range(1, rounds + 1):
        parts.append(f"""l{i} AS MATERIALIZED (
  SELECT l.id, greatest(l.lvl, coalesce(u.nl, 0)) AS lvl
  FROM l{i - 1} l LEFT JOIN (
    SELECT e.dst AS id, max(p.lvl) + 1 AS nl
    FROM ccond e JOIN l{i - 1} p ON p.id = e.src GROUP BY e.dst) u
  ON u.id = l.id)""")
    return (
        f"WITH RECURSIVE {EDGES_B_SQL},\n"
        "cvb AS (SELECT DISTINCT id FROM (\n"
        "  SELECT src AS id FROM edges_b UNION ALL SELECT dst AS id FROM edges_b)),\n"
        + ",\n".join(parts)
        + f"""
SELECT l.id AS scc, l.lvl AS level, CAST(s.n_vertices AS BIGINT) AS n_vertices
FROM l{rounds} l JOIN csizes s ON s.scc = l.id"""
    )


COND_LEVELS_SQL = _cond_levels_sql(12)

REGISTRY["condensation_levels"] = (q_condensation_levels, COND_LEVELS_SQL)


def q_maximal_matching(spark, sf_dir):
    """Greedy maximal matching (local-min edge priorities, total-order
    struct keys, bit-reproducible) on the undirected derived graph;
    14-round unrolled SQL twin."""
    from .algos.matching import maximal_matching

    m, _ = maximal_matching(edges_b(spark, sf_dir), partitions=8)
    return m.select(F.col("a").cast("long").alias("a"),
                    F.col("b").cast("long").alias("b"))


def _matching_sql(rounds: int) -> str:
    # Measured fixpoint: 4 rounds at sf0.001, 6 at sf0.01, 8 at sf0.1;
    # 14 = margin.  Struct min is lexicographic in DuckDB exactly as in
    # Spark, so the (p, a, b) key gives the identical total order.
    from .algos.matching import PRI_A, PRI_B, PRI_M

    key = (f"{{'p': (((a * {PRI_A} + b) % {PRI_M}) * {PRI_A} + {PRI_B}) "
           f"% {PRI_M}, 'ka': a, 'kb': b}}")
    parts = [
        EDGES_B_SQL,
        "g0 AS MATERIALIZED (SELECT DISTINCT least(src,dst) AS a, "
        "greatest(src,dst) AS b FROM edges_b)",
        "acc0 AS (SELECT CAST(NULL AS BIGINT) AS a, CAST(NULL AS BIGINT) AS b "
        "WHERE FALSE)",
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f"ke{i} AS MATERIALIZED (SELECT a, b, {key} AS key FROM g{i - 1})"
        )
        parts.append(f"""vm{i} AS MATERIALIZED (
  SELECT v, min(key) AS mk FROM (
    SELECT a AS v, key FROM ke{i} UNION ALL SELECT b AS v, key FROM ke{i})
  GROUP BY v)""")
        parts.append(f"""w{i} AS MATERIALIZED (
  SELECT k.a, k.b FROM ke{i} k
  JOIN vm{i} x ON x.v = k.a AND x.mk = k.key
  JOIN vm{i} y ON y.v = k.b AND y.mk = k.key)""")
        parts.append(f"""g{i} AS MATERIALIZED (
  SELECT e.a, e.b FROM g{i - 1} e
  WHERE e.a NOT IN (SELECT a FROM w{i} UNION ALL SELECT b FROM w{i})
    AND e.b NOT IN (SELECT a FROM w{i} UNION ALL SELECT b FROM w{i}))""")
        parts.append(
            f"acc{i} AS (SELECT a, b FROM acc{i - 1} "
            f"UNION ALL SELECT a, b FROM w{i})"
        )
    return "WITH " + ",\n".join(parts) + f"\nSELECT a, b FROM acc{rounds}"


MATCHING_SQL = _matching_sql(14)

REGISTRY["maximal_matching"] = (q_maximal_matching, MATCHING_SQL)


# ---------------------------------------------------------------------------
# round-1e extensions
# ---------------------------------------------------------------------------


def q_betweenness_centrality(spark, sf_dir):
    """Source-sampled fractional betweenness (Brandes two-pass), dependency
    terms quantized e6 before exact BIGINT summation — bit-equal across
    engines (completes the centrality family beside integer stress)."""
    from .algos.paths import betweenness_centrality

    return betweenness_centrality(
        edges_b(spark, sf_dir),
        sources=spark.createDataFrame([(s,) for s in STRESS_SOURCES], "id long"),
        directed=False, partitions=8,
    )


def _betweenness_sql(levels: int) -> str:
    parts = [
        EDGES_B_SQL, UND_B_SQL,
        f"srcs AS (SELECT CAST(range AS BIGINT) AS s FROM range({len(STRESS_SOURCES)}))",
        "lvl0 AS MATERIALIZED (SELECT s, s AS v, CAST(1 AS BIGINT) AS sig FROM srcs)",
        "set0 AS MATERIALIZED (SELECT s, v FROM lvl0)",
    ]
    for i in range(1, levels + 1):
        parts.append(
            f"""lvl{i} AS MATERIALIZED (
  SELECT p.s, e.dst AS v, CAST(sum(p.sig) AS BIGINT) AS sig
  FROM lvl{i - 1} p JOIN und_b e ON e.src = p.v
  WHERE NOT EXISTS (SELECT 1 FROM set{i - 1} st WHERE st.s = p.s AND st.v = e.dst)
  GROUP BY p.s, e.dst)"""
        )
        parts.append(
            f"set{i} AS MATERIALIZED (SELECT s, v FROM set{i - 1} "
            f"UNION ALL SELECT s, v FROM lvl{i})"
        )
    parts.append(
        f"c{levels} AS MATERIALIZED "
        f"(SELECT s, v, sig, CAST(0 AS BIGINT) AS dv FROM lvl{levels})"
    )
    for i in range(levels - 1, -1, -1):
        parts.append(
            f"""c{i} AS MATERIALIZED (
  SELECT p.s, p.v, p.sig, COALESCE(x.dv, 0) AS dv
  FROM lvl{i} p LEFT JOIN (
    SELECT p2.s, p2.v, CAST(sum(CAST(round(
        CAST(p2.sig AS DOUBLE) * CAST(1000000 + cn.dv AS DOUBLE)
        / CAST(cn.sig AS DOUBLE)) AS BIGINT)) AS BIGINT) AS dv
    FROM lvl{i} p2 JOIN und_b e ON e.src = p2.v
    JOIN c{i + 1} cn ON cn.s = p2.s AND cn.v = e.dst
    GROUP BY p2.s, p2.v) x ON x.s = p.s AND x.v = p.v)"""
        )
    union = " UNION ALL ".join(
        f"SELECT s, v, dv FROM c{i}" for i in range(levels + 1)
    )
    return (
        "WITH " + ",\n".join(parts)
        + "\nSELECT v AS id, CAST(sum(dv) AS BIGINT) AS betweenness_e6"
        + f"\nFROM ({union}) WHERE v <> s GROUP BY v HAVING sum(dv) > 0"
    )


BETWEENNESS_SQL = _betweenness_sql(STRESS_LEVELS)

REGISTRY["betweenness_centrality"] = (q_betweenness_centrality, BETWEENNESS_SQL)


def q_eigenvector_4iter(spark, sf_dir):
    """Eigenvector centrality, 4 max-normalized power supersteps over the
    undirected derived graph — e6-quantized per step, bit-equal across
    engines (spectral sibling of PageRank/Katz/SALSA)."""
    from .algos.eigenvector import eigenvector_centrality

    return eigenvector_centrality(edges_b(spark, sf_dir), iters=4, partitions=8)


def _eigenvector_sql(iters: int) -> str:
    parts = [
        EDGES_B_SQL, UND_B_SQL,
        "vb AS MATERIALIZED (SELECT DISTINCT src AS id FROM und_b)",
        "x0 AS MATERIALIZED (SELECT id, CAST(1000000 AS BIGINT) AS x FROM vb)",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"""s{i} AS MATERIALIZED (
  SELECT e.dst AS id, CAST(sum(x.x) AS BIGINT) AS s
  FROM und_b e JOIN x{i - 1} x ON x.id = e.src GROUP BY e.dst)"""
        )
        parts.append(f"m{i} AS (SELECT max(s) AS mx FROM s{i})")
        parts.append(
            f"""x{i} AS MATERIALIZED (
  SELECT v.id,
         CAST(CASE WHEN s.s IS NULL THEN 0
              ELSE round(CAST(s.s AS DOUBLE) * 1000000.0 / CAST(m.mx AS DOUBLE))
              END AS BIGINT) AS x
  FROM vb v LEFT JOIN s{i} s ON v.id = s.id CROSS JOIN m{i} m)"""
        )
    return (
        "WITH " + ",\n".join(parts)
        + f"\nSELECT id, x AS eig_e6 FROM x{iters}"
    )


EIGENVECTOR_SQL = _eigenvector_sql(4)

REGISTRY["eigenvector_4iter"] = (q_eigenvector_4iter, EIGENVECTOR_SQL)


def q_louvain_multilevel(spark, sf_dir):
    """Full two-level Louvain lifecycle: 3 synchronous local-move rounds,
    community contraction to a weighted quotient graph, 3 more weighted
    rounds — integer-exact scores, deterministic across engines."""
    from .algos.louvain import louvain_multilevel

    return louvain_multilevel(
        edges_b(spark, sf_dir), vertices=verts(spark, V_B),
        rounds_level1=3, rounds_level2=3, partitions=8,
    )


def _louvain_multilevel_sql(r1: int, r2: int) -> str:
    parts = [
        EDGES_B_SQL, UND_B_SQL, VERTS_B_SQL,
        "ldeg AS MATERIALIZED (SELECT src AS id, CAST(count(*) AS BIGINT) AS deg "
        "FROM und_b GROUP BY src)",
        "lm2 AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS m2 FROM und_b)",
        "lv0 AS MATERIALIZED (SELECT id, id AS label FROM verts_b)",
    ]
    for r in range(1, r1 + 1):
        p = f"lv{r - 1}"
        parts.append(
            f"tot{r} AS MATERIALIZED (SELECT l.label, CAST(sum(d.deg) AS BIGINT) "
            f"AS tot FROM {p} l JOIN ldeg d ON d.id = l.id GROUP BY l.label)"
        )
        parts.append(
            f"kvc{r} AS MATERIALIZED (SELECT e.src AS id, l.label AS clab, "
            f"CAST(count(*) AS BIGINT) AS kvc FROM und_b e "
            f"JOIN {p} l ON l.id = e.dst GROUP BY e.src, l.label)"
        )
        parts.append(
            f"cand{r} AS MATERIALIZED (SELECT id, clab, CAST(sum(kvc) AS BIGINT) "
            f"AS kvc FROM (SELECT id, clab, kvc FROM kvc{r} "
            f"UNION ALL SELECT id, label AS clab, 0 FROM {p}) u GROUP BY id, clab)"
        )
        parts.append(
            f"""scored{r} AS MATERIALIZED (
  SELECT c.id, c.clab,
         (SELECT m2 FROM lm2) * c.kvc
         - COALESCE(d.deg, 0) * (COALESCE(t.tot, 0)
             - CASE WHEN c.clab = l.label THEN COALESCE(d.deg, 0) ELSE 0 END)
           AS score
  FROM cand{r} c
  JOIN {p} l ON l.id = c.id
  LEFT JOIN ldeg d ON d.id = c.id
  LEFT JOIN tot{r} t ON t.label = c.clab)"""
        )
        parts.append(
            f"""lv{r} AS MATERIALIZED (SELECT id, clab AS label FROM (
  SELECT id, clab, row_number() OVER (PARTITION BY id
         ORDER BY score DESC, clab ASC) AS rn
  FROM scored{r}) z WHERE rn = 1)"""
        )
    parts.append(
        f"""ce AS MATERIALIZED (
  SELECT l1.label AS s, l2.label AS d, CAST(count(*) AS BIGINT) AS w
  FROM und_b e
  JOIN lv{r1} l1 ON l1.id = e.src
  JOIN lv{r1} l2 ON l2.id = e.dst
  GROUP BY l1.label, l2.label)"""
    )
    parts.append(
        "cdeg AS MATERIALIZED (SELECT s AS id, CAST(sum(w) AS BIGINT) AS deg "
        "FROM ce GROUP BY s)"
    )
    parts.append("cm2 AS (SELECT CAST(sum(w) AS BIGINT) AS m2 FROM ce)")
    parts.append(
        f"cv0 AS MATERIALIZED (SELECT DISTINCT label AS id, label FROM lv{r1})"
    )
    for r in range(1, r2 + 1):
        p = f"cv{r - 1}"
        parts.append(
            f"ctot{r} AS MATERIALIZED (SELECT l.label, CAST(sum(d.deg) AS BIGINT) "
            f"AS tot FROM {p} l JOIN cdeg d ON d.id = l.id GROUP BY l.label)"
        )
        parts.append(
            f"ckvc{r} AS MATERIALIZED (SELECT e.s AS id, l.label AS clab, "
            f"CAST(sum(e.w) AS BIGINT) AS kvc FROM ce e "
            f"JOIN {p} l ON l.id = e.d WHERE e.s <> e.d GROUP BY e.s, l.label)"
        )
        parts.append(
            f"ccand{r} AS MATERIALIZED (SELECT id, clab, CAST(sum(kvc) AS BIGINT) "
            f"AS kvc FROM (SELECT id, clab, kvc FROM ckvc{r} "
            f"UNION ALL SELECT id, label AS clab, 0 FROM {p}) u GROUP BY id, clab)"
        )
        parts.append(
            f"""cscored{r} AS MATERIALIZED (
  SELECT c.id, c.clab,
         (SELECT m2 FROM cm2) * c.kvc
         - COALESCE(d.deg, 0) * (COALESCE(t.tot, 0)
             - CASE WHEN c.clab = l.label THEN COALESCE(d.deg, 0) ELSE 0 END)
           AS score
  FROM ccand{r} c
  JOIN {p} l ON l.id = c.id
  LEFT JOIN cdeg d ON d.id = c.id
  LEFT JOIN ctot{r} t ON t.label = c.clab)"""
        )
        parts.append(
            f"""cv{r} AS MATERIALIZED (SELECT id, clab AS label FROM (
  SELECT id, clab, row_number() OVER (PARTITION BY id
         ORDER BY score DESC, clab ASC) AS rn
  FROM cscored{r}) z WHERE rn = 1)"""
        )
    return (
        "WITH " + ",\n".join(parts)
        + f"\nSELECT l.id, c.label FROM lv{r1} l JOIN cv{r2} c ON c.id = l.label"
    )


LOUVAIN_ML_SQL = _louvain_multilevel_sql(3, 3)

REGISTRY["louvain_multilevel"] = (q_louvain_multilevel, LOUVAIN_ML_SQL)


def q_graph_coloring(spark, sf_dir):
    """Jones–Plassmann greedy coloring, 6 supersteps, on the undirected
    derived graph B; 6-round unrolled SQL twin computes the identical
    partial coloring (pytest runs the loop to fixpoint vs a sequential
    oracle — 6 rounds keeps the DuckDB unroll tractable at sf0.1 where
    fixpoint needs ~118 rounds on the dense core)."""
    from .algos.coloring import jones_plassmann_coloring

    colors, _ = jones_plassmann_coloring(
        edges_b(spark, sf_dir), max_rounds=6, partitions=8)
    return colors.select(
        F.col("id").cast("long").alias("id"),
        F.col("color").cast("long").alias("color"),
    )


def _coloring_sql(rounds: int) -> str:
    # Same superstep shape as the Luby unroll plus a mex stage: winners'
    # used neighbor-colors (DISTINCT join vs colored state), candidate
    # colors 0..k from a nums table, smallest candidate not used.
    from .algos.coloring import PRI_A, PRI_B, PRI_M

    pri = lambda c: f"(({c} * {PRI_A} + {PRI_B}) % {PRI_M})"  # noqa: E731
    parts = [
        EDGES_B_SQL, UND_B_SQL,
        "nums AS MATERIALIZED (SELECT CAST(unnest(range(0, 512)) AS INT) AS n)",
        "u0 AS MATERIALIZED (SELECT src, dst FROM und_b)",
        "a0 AS MATERIALIZED (SELECT DISTINCT src AS id FROM und_b)",
        "c0 AS (SELECT CAST(NULL AS BIGINT) AS id, CAST(NULL AS INT) AS color"
        " WHERE FALSE)",
    ]
    for i in range(1, rounds + 1):
        parts.append(f"""nm{i} AS MATERIALIZED (
  SELECT src AS id, min({pri("dst")}) AS nmin FROM u{i - 1} GROUP BY src)""")
        parts.append(f"""w{i} AS MATERIALIZED (
  SELECT a.id FROM a{i - 1} a LEFT JOIN nm{i} n ON n.id = a.id
  WHERE n.nmin IS NULL OR {pri("a.id")} < n.nmin)""")
        parts.append(f"""used{i} AS MATERIALIZED (
  SELECT DISTINCT u.src AS id, c.color FROM und_b u
  JOIN w{i} w ON u.src = w.id JOIN c{i - 1} c ON c.id = u.dst)""")
        parts.append(f"""k{i} AS MATERIALIZED (
  SELECT id, count(*) AS k FROM used{i} GROUP BY id)""")
        parts.append(f"""newc{i} AS MATERIALIZED (
  SELECT w.id, min(n.n) AS color
  FROM w{i} w
  LEFT JOIN k{i} kk ON kk.id = w.id
  JOIN nums n ON n.n <= coalesce(kk.k, 0)
  LEFT JOIN used{i} x ON x.id = w.id AND x.color = n.n
  WHERE x.color IS NULL GROUP BY w.id)""")
        parts.append(
            f"c{i} AS MATERIALIZED (SELECT id, color FROM c{i - 1} "
            f"UNION ALL SELECT id, color FROM newc{i})"
        )
        parts.append(
            f"a{i} AS MATERIALIZED (SELECT id FROM a{i - 1} "
            f"WHERE id NOT IN (SELECT id FROM w{i}))"
        )
        parts.append(f"""u{i} AS MATERIALIZED (
  SELECT u.src, u.dst FROM u{i - 1} u
  JOIN a{i} x ON u.src = x.id JOIN a{i} y ON u.dst = y.id)""")
    return (
        "WITH " + ",\n".join(parts)
        + f"\nSELECT id, CAST(color AS BIGINT) AS color FROM c{rounds}"
    )


COLORING_SQL = _coloring_sql(6)

REGISTRY["graph_coloring"] = (q_graph_coloring, COLORING_SQL)


def q_boruvka_msf(spark, sf_dir):
    """Minimum spanning forest (Borůvka, total-order (w,a,b) tie-break)
    of the weighted undirected derived graph B; weights are the
    deterministic integer hash (a*31+b*17)%997+1, so the MSF is unique
    and the SQL twin (unrolled Borůvka with recursive-CTE contraction)
    and the pytest Kruskal oracle agree bit-for-bit."""
    from .algos.msf import boruvka_msf

    we = (
        edges_b(spark, sf_dir)
        .select(F.least("src", "dst").alias("a"),
                F.greatest("src", "dst").alias("b"))
        .distinct()
        .withColumn("w", (F.col("a") * 31 + F.col("b") * 17) % 997 + 1)
    )
    forest, _ = boruvka_msf(we, max_rounds=6, partitions=8)
    return forest.select(
        F.col("a").cast("long").alias("a"),
        F.col("b").cast("long").alias("b"),
        F.col("w").cast("long").alias("w"),
    )


def _msf_sql(rounds: int) -> str:
    # Measured fixpoint: 4 rounds at every sf (contraction is full CC of
    # the chosen-edge graph, so components collapse to one label per
    # round-component); 6 = margin.  Struct min is lexicographic in both
    # engines; per-round contraction is a stratified recursive closure
    # (DuckDB supports recursive CTEs referencing completed ones).
    key = "{'w': w, 'ka': a, 'kb': b, 'ca': ca, 'cb': cb}"
    parts = [
        EDGES_B_SQL,
        """we AS MATERIALIZED (
  SELECT a, b, (a * 31 + b * 17) % 997 + 1 AS w FROM (
    SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
    FROM edges_b))""",
        "lab0 AS MATERIALIZED (SELECT DISTINCT id, id AS comp FROM ("
        "SELECT a AS id FROM we UNION ALL SELECT b FROM we))",
        "f0 AS (SELECT CAST(NULL AS BIGINT) AS a, CAST(NULL AS BIGINT) AS b,"
        " CAST(NULL AS BIGINT) AS w WHERE FALSE)",
    ]
    for i in range(1, rounds + 1):
        parts.append(f"""el{i} AS MATERIALIZED (
  SELECT e.a, e.b, e.w, la.comp AS ca, lb.comp AS cb
  FROM we e JOIN lab{i - 1} la ON la.id = e.a
  JOIN lab{i - 1} lb ON lb.id = e.b
  WHERE la.comp <> lb.comp)""")
        parts.append(f"""ch{i} AS MATERIALIZED (
  SELECT comp, min(key) AS e FROM (
    SELECT ca AS comp, {key} AS key FROM el{i}
    UNION ALL SELECT cb AS comp, {key} AS key FROM el{i})
  GROUP BY comp)""")
        parts.append(f"""che{i} AS MATERIALIZED (
  SELECT DISTINCT e.w AS w, e.ka AS a, e.kb AS b, e.ca AS ca, e.cb AS cb
  FROM ch{i})""")
        parts.append(f"""cg{i} AS MATERIALIZED (
  SELECT DISTINCT x, y FROM (
    SELECT ca AS x, cb AS y FROM che{i}
    UNION ALL SELECT cb AS x, ca AS y FROM che{i}))""")
        parts.append(
            f"rc{i} AS (SELECT x, y FROM cg{i} "
            f"UNION SELECT r.x, g.y FROM rc{i} r JOIN cg{i} g ON g.x = r.y)"
        )
        parts.append(
            f"nl{i} AS MATERIALIZED (SELECT x AS comp, least(x, min(y)) "
            f"AS newc FROM rc{i} GROUP BY x)"
        )
        parts.append(f"""lab{i} AS MATERIALIZED (
  SELECT l.id, coalesce(n.newc, l.comp) AS comp
  FROM lab{i - 1} l LEFT JOIN nl{i} n ON n.comp = l.comp)""")
        parts.append(
            f"f{i} AS (SELECT a, b, w FROM f{i - 1} "
            f"UNION ALL SELECT a, b, w FROM che{i})"
        )
    return (
        "WITH RECURSIVE " + ",\n".join(parts)
        + f"\nSELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,"
        f" CAST(w AS BIGINT) AS w FROM f{rounds}"
    )


MSF_SQL = _msf_sql(6)

REGISTRY["boruvka_msf"] = (q_boruvka_msf, MSF_SQL)


def q_powerlaw_alpha(spark, sf_dir):
    """Power-law exponent MLE of the in-degree distribution (Clauset
    continuous approximation, d_min = 2): alpha = 1 + n / sum ln(d/1.5).
    Each ln term is e6-quantized BEFORE summing, so the sum is an exact
    BIGINT in both engines and the final alpha is one double expression
    over two exact integers — the web-graph "is it scale-free" check."""
    deg = (
        edges_a(spark, sf_dir)
        .groupBy("dst").agg(F.count(F.lit(1)).alias("d"))
        .filter(F.col("d") >= 2)
    )
    agg = deg.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.round(F.log(F.col("d") / 1.5) * 1e6).cast("long"))
        .cast("long").alias("sum_ln_e6"),
    )
    return agg.select(
        "n", "sum_ln_e6",
        (F.lit(1_000_000)
         + F.round(F.col("n").cast("double") * 1e12 / F.col("sum_ln_e6")))
        .cast("long").alias("alpha_e6"),
    )


POWERLAW_SQL = f"""
WITH {EDGES_A_SQL},
deg AS (SELECT dst, count(*) AS d FROM edges_a GROUP BY dst
        HAVING count(*) >= 2),
q AS (SELECT CAST(round(ln(d / 1.5) * 1e6) AS BIGINT) AS t FROM deg),
s AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(t) AS BIGINT) AS sum_ln_e6
      FROM q)
SELECT n, sum_ln_e6,
       CAST(1000000 + round(CAST(n AS DOUBLE) * 1e12 / sum_ln_e6) AS BIGINT)
         AS alpha_e6
FROM s
"""

REGISTRY["powerlaw_alpha"] = (q_powerlaw_alpha, POWERLAW_SQL)


def q_host_graph(spark, sf_dir):
    """Weighted host-graph rollup of the derived page graph: synthesize
    deterministic urls for graph-A vertices (host = id mod 40), contract
    with ingest.host_graph (regexp host extraction + grouped count) —
    the Common-Crawl page→host contraction."""
    from .ingest import host_graph

    def url(c):
        return F.concat(
            F.lit("https://host"), (F.col(c) % 40).cast("string"),
            F.lit(".example/p"), F.col(c).cast("string"),
        )

    pages = edges_a(spark, sf_dir).select(
        url("src").alias("src_url"), url("dst").alias("dst_url"))
    return host_graph(pages).select(
        "src_host", "dst_host", F.col("weight").cast("long").alias("weight"))


HOST_GRAPH_SQL = f"""
WITH {EDGES_A_SQL},
pages AS (
  SELECT 'https://host' || CAST(src % 40 AS VARCHAR) || '.example/p'
           || CAST(src AS VARCHAR) AS src_url,
         'https://host' || CAST(dst % 40 AS VARCHAR) || '.example/p'
           || CAST(dst AS VARCHAR) AS dst_url
  FROM edges_a)
SELECT regexp_extract(src_url, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/]+)', 1)
         AS src_host,
       regexp_extract(dst_url, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/]+)', 1)
         AS dst_host,
       CAST(count(*) AS BIGINT) AS weight
FROM pages GROUP BY 1, 2
"""

REGISTRY["host_graph_rollup"] = (q_host_graph, HOST_GRAPH_SQL)


def q_host_locality(spark, sf_dir):
    """Per-host intra-host link share (e6 ratio of self-loop weight to
    out-weight) over the host-graph rollup."""
    from .ingest import host_locality

    return host_locality(q_host_graph(spark, sf_dir))


HOST_LOCALITY_SQL = f"""
WITH {EDGES_A_SQL},
hg AS (
  SELECT src % 40 AS sh, dst % 40 AS dh, count(*) AS weight
  FROM edges_a GROUP BY 1, 2)
SELECT 'host' || CAST(sh AS VARCHAR) || '.example' AS host,
       CAST(sum(weight) AS BIGINT) AS out_weight,
       CAST(sum(CASE WHEN sh = dh THEN weight ELSE 0 END) AS BIGINT)
         AS intra_weight,
       CAST(round(CAST(sum(CASE WHEN sh = dh THEN weight ELSE 0 END)
                       AS DOUBLE) * 1e6 / sum(weight)) AS BIGINT)
         AS locality_e6
FROM hg GROUP BY 1
"""

REGISTRY["host_locality"] = (q_host_locality, HOST_LOCALITY_SQL)


def q_host_pagerank(spark, sf_dir):
    """Host-level weighted PageRank: page graph → host_graph rollup →
    drop intra-host self-loops → pagerank_weighted over link-count
    weights, 3 supersteps; e8.  The standard Common-Crawl host ranking,
    exercising contraction → iterative-algorithm composition."""
    from .algos.pagerank import pagerank_weighted

    hg = q_host_graph(spark, sf_dir).filter(
        F.col("src_host") != F.col("dst_host"))
    ranks = pagerank_weighted(
        hg.select(F.col("src_host").alias("src"),
                  F.col("dst_host").alias("dst"),
                  F.col("weight").cast("double").alias("weight")),
        num_iters=3, partitions=8,
    )
    return ranks.select(
        F.col("id").alias("host"),
        F.round(F.col("rank") * 1e8).cast("long").alias("rank_e8"),
    )


def _host_pagerank_sql(num_iters: int) -> str:
    # The weighted-PR template (gate-proven at V_A) with a dynamic vertex
    # count: hosts come from the rollup, self-loops dropped before PR.
    d = 0.85
    parts = [
        EDGES_A_SQL,
        "hg AS MATERIALIZED (SELECT src % 40 AS sh, dst % 40 AS dh, "
        "count(*) AS w FROM edges_a GROUP BY 1, 2)",
        """he AS MATERIALIZED (
  SELECT 'host' || CAST(sh AS VARCHAR) || '.example' AS src,
         'host' || CAST(dh AS VARCHAR) || '.example' AS dst,
         CAST(w AS DOUBLE) AS w
  FROM hg WHERE sh <> dh)""",
        "hv AS MATERIALIZED (SELECT DISTINCT id FROM ("
        "SELECT src AS id FROM he UNION ALL SELECT dst FROM he))",
        "nv AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM hv)",
        "wout AS MATERIALIZED (SELECT src AS id, sum(w) AS w_out "
        "FROM he GROUP BY src)",
        "r0 AS (SELECT id, 1.0 / n AS rank FROM hv CROSS JOIN nv)",
    ]
    for i in range(1, num_iters + 1):
        p = f"r{i - 1}"
        parts.append(
            f"""live{i} AS MATERIALIZED (
  SELECT coalesce(sum(r.rank), 0) AS s FROM {p} r
  JOIN wout o ON r.id = o.id)"""
        )
        parts.append(
            f"""c{i} AS MATERIALIZED (
  SELECT e.dst AS id, sum(r.rank * e.w / o.w_out) AS contrib
  FROM he e JOIN {p} r ON e.src = r.id JOIN wout o ON e.src = o.id
  GROUP BY e.dst)"""
        )
        parts.append(
            f"""r{i} AS MATERIALIZED (
  SELECT v.id,
         (1.0 - {d}) / x.n + {d} * (coalesce(c.contrib, 0)
             + (1.0 - l.s) / x.n) AS rank
  FROM hv v LEFT JOIN c{i} c ON v.id = c.id
  CROSS JOIN live{i} l CROSS JOIN nv x)"""
        )
    return (
        "WITH " + ",\n".join(parts)
        + f"\nSELECT id AS host, CAST(round(rank * 1e8) AS BIGINT) AS rank_e8"
        f" FROM r{num_iters}"
    )


HOST_PAGERANK_SQL = _host_pagerank_sql(3)

REGISTRY["host_pagerank"] = (q_host_pagerank, HOST_PAGERANK_SQL)


def q_crawl_delta(spark, sf_dir):
    """Crawl-to-crawl link delta: two deterministic edge snapshots from
    the orders table (o_orderkey%10<2 vs %10 IN (1,2) — overlapping, so
    all three statuses occur), classified added/removed/kept by one
    full-outer join (graph.edge_delta)."""
    from .graph import edge_delta

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    s = (F.col("o_orderkey").cast("long") * 13 + 7) % V_B
    d = (F.col("o_custkey").cast("long") * 17 + 5) % V_B

    def snap(pred):
        return (o.filter(pred).select(s.alias("src"), d.alias("dst"))
                .filter(F.col("src") != F.col("dst")))

    old = snap(F.col("o_orderkey") % 10 < 2)
    new = snap((F.col("o_orderkey") % 10 >= 1) & (F.col("o_orderkey") % 10 <= 2))
    return edge_delta(old, new).select(
        F.col("src").cast("long").alias("src"),
        F.col("dst").cast("long").alias("dst"), "status")


CRAWL_DELTA_SQL = f"""
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
    AND (o_orderkey * 13 + 7) % {V_B} <> (o_custkey * 17 + 5) % {V_B})
SELECT coalesce(o.src, n.src) AS src, coalesce(o.dst, n.dst) AS dst,
       CASE WHEN o.src IS NULL THEN 'added'
            WHEN n.src IS NULL THEN 'removed'
            ELSE 'kept' END AS status
FROM o_snap o FULL OUTER JOIN n_snap n
  ON o.src = n.src AND o.dst = n.dst
"""

REGISTRY["crawl_delta"] = (q_crawl_delta, CRAWL_DELTA_SQL)


def q_trustrank_spam_mass(spark, sf_dir):
    """TrustRank (personalized PageRank teleporting to a deterministic
    trust-seed whitelist, id%29==3) vs global PageRank on graph B, and
    the relative spam mass (pr - tr)/pr per vertex — the classic
    web-spam demotion signal (Gyöngyi et al.).  Both vectors e8-quantized
    first, so the spam ratio is one double expression over exact ints;
    seeds can have tr > pr, so spam mass may be negative (trust-rich)."""
    from .algos.pagerank import pagerank, personalized_pagerank

    eb = edges_b(spark, sf_dir)
    vb = verts(spark, V_B)
    pr, _ = pagerank(eb, vertices=vb, num_iters=4, partitions=8)
    tr = personalized_pagerank(
        eb, sources=vb.filter(F.col("id") % 29 == 3), vertices=vb,
        num_iters=4, partitions=8,
    )
    j = (
        pr.select("id", F.round(F.col("rank") * 1e8).cast("long").alias("pr_e8"))
        .join(tr.select(
            "id", F.round(F.col("rank") * 1e8).cast("long").alias("tr_e8")),
            "id")
    )
    return j.select(
        "id", "pr_e8", "tr_e8",
        F.round((F.col("pr_e8") - F.col("tr_e8")).cast("double") * 1e6
                / F.col("pr_e8")).cast("long").alias("spam_e6"),
    )


def _trustrank_sql(num_iters: int) -> str:
    d = 0.85
    v = V_B
    parts = [
        EDGES_B_SQL, VERTS_B_SQL,
        "outd AS (SELECT src AS id, CAST(count(*) AS DOUBLE) AS od "
        "FROM edges_b GROUP BY src)",
        f"ns AS (SELECT CAST(count(*) AS DOUBLE) AS c FROM verts_b "
        f"WHERE id % 29 = 3)",
        f"pr0 AS (SELECT id, 1.0/{v} AS rank FROM verts_b)",
        "reset AS (SELECT v.id, CASE WHEN v.id % 29 = 3 THEN 1.0/s.c "
        "ELSE 0.0 END AS p FROM verts_b v CROSS JOIN ns s)",
        "tr0 AS (SELECT id, p AS rank FROM reset)",
    ]
    for i in range(1, num_iters + 1):
        parts.append(
            f"""pd{i} AS (SELECT coalesce(sum(r.rank), 0) AS dm FROM pr{i - 1} r
  LEFT JOIN outd o ON r.id = o.id WHERE o.id IS NULL)"""
        )
        parts.append(
            f"""pc{i} AS (SELECT e.dst AS id, sum(r.rank / o.od) AS contrib
  FROM edges_b e JOIN pr{i - 1} r ON e.src = r.id
  JOIN outd o ON e.src = o.id GROUP BY e.dst)"""
        )
        parts.append(
            f"""pr{i} AS (SELECT v.id,
  {(1.0 - d) / v!r} + {d} * (coalesce(c.contrib, 0) + (SELECT dm FROM pd{i})/{v}) AS rank
  FROM verts_b v LEFT JOIN pc{i} c ON v.id = c.id)"""
        )
        parts.append(
            f"""td{i} AS MATERIALIZED (SELECT coalesce(sum(r.rank), 0) AS dm FROM tr{i - 1} r
  LEFT JOIN outd o ON r.id = o.id WHERE o.id IS NULL)"""
        )
        parts.append(
            f"""tc{i} AS MATERIALIZED (SELECT e.dst AS id, sum(r.rank / o.od) AS contrib
  FROM edges_b e JOIN tr{i - 1} r ON e.src = r.id
  JOIN outd o ON e.src = o.id GROUP BY e.dst)"""
        )
        parts.append(
            f"""tr{i} AS MATERIALIZED (SELECT v.id,
  {1.0 - d} * rs.p + {d} * (coalesce(c.contrib, 0) + dd.dm * rs.p) AS rank
  FROM verts_b v JOIN reset rs ON v.id = rs.id
  LEFT JOIN tc{i} c ON v.id = c.id CROSS JOIN td{i} dd)"""
        )
    return (
        "WITH " + ",\n".join(parts) + f"""
SELECT p.id,
       CAST(round(p.rank * 1e8) AS BIGINT) AS pr_e8,
       CAST(round(t.rank * 1e8) AS BIGINT) AS tr_e8,
       CAST(round(CAST(CAST(round(p.rank * 1e8) AS BIGINT)
                       - CAST(round(t.rank * 1e8) AS BIGINT) AS DOUBLE)
                  * 1e6 / CAST(round(p.rank * 1e8) AS BIGINT)) AS BIGINT)
         AS spam_e6
FROM pr{num_iters} p JOIN tr{num_iters} t ON t.id = p.id"""
    )


TRUSTRANK_SQL = _trustrank_sql(4)

REGISTRY["trustrank_spam_mass"] = (q_trustrank_spam_mass, TRUSTRANK_SQL)


def q_seed_voronoi(spark, sf_dir):
    """Nearest-seed Voronoi partition (multi-source BFS, (dist, seed)
    struct-min) on the undirected derived graph B; seeds = vertices with
    id%37==1.  Crawl-shard assignment: every host labeled by its closest
    anchor; 8-round unrolled SQL twin (measured fixpoint ≤5 rounds)."""
    from .algos.voronoi import nearest_seed_partition

    eb = edges_b(spark, sf_dir)
    seeds = (
        eb.select(F.col("src").alias("id"))
        .union(eb.select(F.col("dst").alias("id")))
        .distinct().filter(F.col("id") % 37 == 1)
    )
    res, _ = nearest_seed_partition(eb, seeds, max_rounds=8, partitions=8)
    return res.select(
        F.col("id").cast("long").alias("id"),
        F.col("dist").cast("long").alias("dist"),
        F.col("seed").cast("long").alias("seed"),
    )


def _voronoi_sql(rounds: int) -> str:
    parts = [
        EDGES_B_SQL, UND_B_SQL,
        """st0 AS MATERIALIZED (
  SELECT id, {'d': CAST(0 AS BIGINT), 'l': id} AS m FROM (
    SELECT DISTINCT src AS id FROM und_b) WHERE id % 37 = 1)""",
    ]
    for i in range(1, rounds + 1):
        parts.append(f"""cb{i} AS MATERIALIZED (
  SELECT u.dst AS id, min({{'d': s.m.d + 1, 'l': s.m.l}}) AS c
  FROM und_b u JOIN st{i - 1} s ON s.id = u.src GROUP BY u.dst)""")
        parts.append(f"""st{i} AS MATERIALIZED (
  SELECT coalesce(s.id, c.id) AS id,
         CASE WHEN s.m IS NULL THEN c.c WHEN c.c IS NULL THEN s.m
              WHEN s.m <= c.c THEN s.m ELSE c.c END AS m
  FROM st{i - 1} s FULL OUTER JOIN cb{i} c ON c.id = s.id)""")
    return (
        "WITH " + ",\n".join(parts)
        + f"\nSELECT id, m.d AS dist, m.l AS seed FROM st{rounds}"
    )


VORONOI_SQL = _voronoi_sql(8)

REGISTRY["seed_voronoi"] = (q_seed_voronoi, VORONOI_SQL)


def q_ego_network(spark, sf_dir):
    """2-hop ego network of vertex 7 on the undirected derived graph B
    (graph.ego_network: capped Voronoi ball + two induced semi-joins)."""
    from .graph import ego_network

    return ego_network(edges_b(spark, sf_dir), seed=7, radius=2).select(
        F.col("src").cast("long").alias("src"),
        F.col("dst").cast("long").alias("dst"),
    )


EGO_SQL = f"""
WITH {EDGES_B_SQL}, {UND_B_SQL},
b1 AS (SELECT DISTINCT id FROM (
  SELECT CAST(7 AS BIGINT) AS id
  UNION ALL SELECT dst FROM und_b WHERE src = 7)),
b2 AS (SELECT DISTINCT id FROM (
  SELECT id FROM b1
  UNION ALL SELECT u.dst FROM und_b u JOIN b1 b ON u.src = b.id))
SELECT u.src, u.dst FROM und_b u
JOIN b2 x ON u.src = x.id JOIN b2 y ON u.dst = y.id
"""

REGISTRY["ego_network_2hop"] = (q_ego_network, EGO_SQL)


def q_wl_colors(spark, sf_dir):
    """1-WL color refinement, 3 rounds, on the undirected derived graph
    B — structural fingerprint classes (template dedup / isomorphism
    invariant).  Per-round relabeling is a hash (no global sort, no
    window); output colors are canonicalized to the min vertex id of the
    final class, which the SQL twin reproduces exactly (algos/wl.py)."""
    from .algos.wl import wl_refinement

    return wl_refinement(edges_b(spark, sf_dir), rounds=3, partitions=8) \
        .select(F.col("id").cast("long").alias("id"),
                F.col("color").cast("long").alias("color"))


def _wl_sql(rounds: int) -> str:
    parts = [
        EDGES_B_SQL, UND_B_SQL,
        "c0 AS MATERIALIZED (SELECT DISTINCT src AS id, CAST(1 AS BIGINT) "
        "AS color FROM und_b)",
    ]
    # per-round label = min vertex id of the (old color, signature) class —
    # injective across classes (classes are disjoint vertex sets), so the
    # refinement matches Spark's hash-relabel classes; the final labels are
    # already the min-id canonical form wl_refinement returns
    for i in range(1, rounds + 1):
        parts.append(f"""g{i} AS MATERIALIZED (
  SELECT u.src AS id,
         array_to_string(list_sort(list(s.color)), ',') AS sig
  FROM und_b u JOIN c{i - 1} s ON s.id = u.dst GROUP BY u.src)""")
        parts.append(f"""c{i} AS MATERIALIZED (
  SELECT v.id,
         CAST(min(v.id) OVER (PARTITION BY v.color, g.sig) AS BIGINT) AS color
  FROM c{i - 1} v JOIN g{i} g ON g.id = v.id)""")
    return "WITH " + ",\n".join(parts) + f"\nSELECT id, color FROM c{rounds}"


WL_SQL = _wl_sql(3)

REGISTRY["wl_colors"] = (q_wl_colors, WL_SQL)


def q_ngram_containment(spark, sf_dir):
    """Benchmark-decontamination containment: probes = documents with
    doc_id%41==5, corpus = all documents; word-3-gram containment ≥ 0.1
    (asymmetric — catches probe-inside-longer-doc that Jaccard misses)."""
    from .dedup import ngram_containment_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    probes = docs.filter(F.col("doc_id") % 41 == 5)
    return ngram_containment_pairs(docs, probes, threshold=0.1).select(
        F.col("pid").cast("long").alias("pid"),
        F.col("did").cast("long").alias("did"),
        "containment_e6",
    )


def _containment_sql() -> str:
    from .dedup import word_shingles_sql

    sh = word_shingles_sql("text", 3)
    return f"""
WITH sh AS (SELECT doc_id, {sh} AS sh FROM documents),
nz AS MATERIALIZED (SELECT * FROM sh WHERE len(sh) > 0),
pex AS MATERIALIZED (
  SELECT doc_id AS pid, unnest(sh) AS s FROM nz WHERE doc_id % 41 = 5),
psz AS MATERIALIZED (
  SELECT doc_id AS pid, len(sh) AS np FROM nz WHERE doc_id % 41 = 5),
dex AS MATERIALIZED (SELECT doc_id AS did, unnest(sh) AS s FROM nz),
m AS MATERIALIZED (
  SELECT pid, did, count(*) AS inter FROM dex JOIN pex USING (s)
  GROUP BY 1, 2)
SELECT m.pid, m.did,
       CAST(round(inter * 1e6 / np) AS BIGINT) AS containment_e6
FROM m JOIN psz USING (pid)
WHERE m.did <> m.pid AND round(inter * 1e6 / np) >= 100000
"""


CONTAINMENT_SQL = _containment_sql()

REGISTRY["ngram_containment"] = (q_ngram_containment, CONTAINMENT_SQL)


def q_snm_pairs(spark, sf_dir):
    """Sorted-neighborhood near-dup pairs on documents (block = 4-char
    normalized-text prefix, window 3, exact-Jaccard verify ≥ 0.2) — the
    third dedup blocking family beside MinHash-LSH and SimHash."""
    from .dedup import snm_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return snm_pairs(docs, window=3, threshold=0.2)


def _snm_sql() -> str:
    from .dedup import word_shingles_sql

    sh = word_shingles_sql("text", 3)
    return f"""
WITH base AS MATERIALIZED (
  SELECT doc_id AS id, substring(trim(lower(text)), 1, 12) AS k,
         {sh} AS sh
  FROM documents),
nz AS MATERIALIZED (SELECT * FROM base WHERE len(sh) > 0),
r AS MATERIALIZED (
  SELECT id, k, sh, substring(k, 1, 4) AS blk,
         row_number() OVER (PARTITION BY substring(k, 1, 4)
                            ORDER BY k, id) AS rn
  FROM nz)
SELECT a.id AS id_a, b.id AS id_b,
       CAST(round(len(list_intersect(a.sh, b.sh)) * 1e6
                  / len(list_distinct(a.sh || b.sh))) AS BIGINT) AS jaccard_e6
FROM r a JOIN r b
  ON a.blk = b.blk AND b.rn > a.rn AND b.rn <= a.rn + 3
WHERE round(len(list_intersect(a.sh, b.sh)) * 1e6
            / len(list_distinct(a.sh || b.sh))) >= 200000
"""


SNM_SQL = _snm_sql()

REGISTRY["snm_dedup_pairs"] = (q_snm_pairs, SNM_SQL)


def q_degree_percentiles(spark, sf_dir):
    """Exact p50/p90/p99 of the undirected degree distribution (graph A)
    via histogram-CDF rank math (percentile = min degree whose cumulative
    count ≥ ceil(q·n)) — no global sort of vertices, the window runs on
    the tiny distinct-degree histogram."""
    ea = edges_a(spark, sf_dir)
    und = (
        ea.union(ea.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
    )
    deg = und.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    hist = deg.groupBy("d").agg(F.count(F.lit(1)).alias("c"))
    wcum = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.select("d", F.sum("c").over(wcum).alias("cum"))
    n = deg.agg(F.count(F.lit(1)).alias("n"))
    j = cum.crossJoin(F.broadcast(n))
    pick = lambda q: F.min(F.when(  # noqa: E731
        F.col("cum") >= F.ceil(F.lit(q) * F.col("n")), F.col("d")))
    return j.agg(
        F.max("n").cast("long").alias("n"),
        pick(0.5).cast("long").alias("p50"),
        pick(0.9).cast("long").alias("p90"),
        pick(0.99).cast("long").alias("p99"),
    )


DEGREE_PCT_SQL = f"""
WITH {EDGES_A_SQL}, {UND_A_SQL},
deg AS (SELECT src, count(*) AS d FROM und_a GROUP BY src),
hist AS (SELECT d, count(*) AS c FROM deg GROUP BY d),
cum AS (SELECT d, sum(c) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING
        AND CURRENT ROW) AS cum FROM hist),
n AS (SELECT count(*) AS n FROM deg)
SELECT CAST(max(n.n) AS BIGINT) AS n,
       CAST(min(CASE WHEN cum >= ceil(0.5 * n.n) THEN d END) AS BIGINT) AS p50,
       CAST(min(CASE WHEN cum >= ceil(0.9 * n.n) THEN d END) AS BIGINT) AS p90,
       CAST(min(CASE WHEN cum >= ceil(0.99 * n.n) THEN d END) AS BIGINT) AS p99
FROM cum CROSS JOIN n
"""

REGISTRY["degree_percentiles"] = (q_degree_percentiles, DEGREE_PCT_SQL)


def q_repetition_stats(spark, sf_dir):
    """Intra-document word-3-gram repetition ratio (C4-style boilerplate
    gate) over documents; zero-shuffle per-row array expressions."""
    from .text import repetition_stats

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return repetition_stats(docs)


def _repetition_sql() -> str:
    from .dedup import word_shingles_sql

    w = "regexp_split_to_array(trim(lower(text)), '\\s+')"
    sh = word_shingles_sql("text", 3)
    return f"""
WITH base AS (
  SELECT doc_id AS id,
         greatest(len({w}) - 2, 0) AS total_grams,
         len({sh}) AS distinct_grams
  FROM documents)
SELECT id, CAST(total_grams AS BIGINT) AS total_grams,
       CAST(distinct_grams AS BIGINT) AS distinct_grams,
       CAST(CASE WHEN total_grams > 0 THEN
              round((total_grams - distinct_grams) * 1e6 / total_grams)
            ELSE 0 END AS BIGINT) AS rep_e6
FROM base
"""


REPETITION_SQL = _repetition_sql()

REGISTRY["repetition_stats"] = (q_repetition_stats, REPETITION_SQL)


def q_hourly_retention(spark, sf_dir):
    """Hour-over-hour user retention: per hour h, distinct active users,
    how many are also active in h+1, and the retention ratio (e6) —
    cohort-style engagement analytics on the events table."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    hu = ev.select(
        F.date_trunc("hour", F.col("ts")).alias("h"), "user_id").distinct()
    nxt = hu.select(
        (F.col("h") - F.expr("INTERVAL 1 HOUR")).alias("h"),
        F.col("user_id").alias("u2"))
    j = hu.join(nxt, (hu.h == nxt.h) & (hu.user_id == nxt.u2), "left")
    return (
        j.groupBy(hu.h.alias("hour"))
        .agg(F.count(F.lit(1)).cast("long").alias("actives"),
             F.count("u2").cast("long").alias("retained"))
        .select(
            "hour", "actives", "retained",
            F.round(F.col("retained").cast("double") * 1e6
                    / F.col("actives")).cast("long").alias("retention_e6"),
        )
    )


HOURLY_RETENTION_SQL = """
WITH hu AS (SELECT DISTINCT date_trunc('hour', ts) AS h, user_id FROM events)
SELECT a.h AS hour,
       CAST(count(*) AS BIGINT) AS actives,
       CAST(count(b.user_id) AS BIGINT) AS retained,
       CAST(round(count(b.user_id) * 1e6 / count(*)) AS BIGINT)
         AS retention_e6
FROM hu a LEFT JOIN hu b
  ON b.user_id = a.user_id AND b.h = a.h + INTERVAL 1 HOUR
GROUP BY a.h
"""

REGISTRY["hourly_retention"] = (q_hourly_retention, HOURLY_RETENTION_SQL)


def _urls_a(spark, sf_dir):
    """Deterministic url table for graph A vertices (host = id mod 40)."""
    ids = (
        edges_a(spark, sf_dir).select(F.col("src").alias("id"))
        .union(edges_a(spark, sf_dir).select(F.col("dst").alias("id")))
        .distinct()
    )
    return ids.select(
        F.concat(F.lit("https://host"), (F.col("id") % 40).cast("string"),
                 F.lit(".example/p"), F.col("id").cast("string")).alias("url"),
        F.concat(F.lit("host"), (F.col("id") % 40).cast("string"),
                 F.lit(".example")).alias("host"),
    )


URLS_A_SQL = f"""
urls_a AS (
  SELECT 'https://host' || CAST(id % 40 AS VARCHAR) || '.example/p'
           || CAST(id AS VARCHAR) AS url,
         'host' || CAST(id % 40 AS VARCHAR) || '.example' AS host
  FROM (SELECT DISTINCT id FROM (
    SELECT src AS id FROM edges_a UNION ALL SELECT dst FROM edges_a)))"""


def q_rendezvous_assign(spark, sf_dir):
    """Rendezvous-hash (HRW) crawl-node assignment of every page url by
    its HOST (same-host pages co-locate on one of 8 nodes; a node loss
    remaps only that node's hosts)."""
    from .ingest import rendezvous_assign

    return rendezvous_assign(_urls_a(spark, sf_dir), "host", 8) \
        .select("url", "host", "node")


RENDEZVOUS_SQL = f"""
WITH {EDGES_A_SQL}, {URLS_A_SQL},
c AS (
  SELECT url, host, k,
         {{'h': CAST(('0x' || substr(md5(host || '#' || CAST(k AS VARCHAR)), 1, 15)) AS BIGINT), 'k': k}} AS s
  FROM urls_a CROSS JOIN (SELECT unnest(range(0, 8)) AS k))
SELECT url, host, CAST((max(s)).k AS BIGINT) AS node
FROM c GROUP BY url, host
"""

REGISTRY["rendezvous_assign"] = (q_rendezvous_assign, RENDEZVOUS_SQL)


def q_per_host_cap(spark, sf_dir):
    """Per-domain cap: keep ≤10 urls per host in deterministic H60 hash
    order — corpus domain-balancing before training."""
    from .ingest import per_host_cap

    return per_host_cap(_urls_a(spark, sf_dir), 10).select("url", "host")


PER_HOST_CAP_SQL = f"""
WITH {EDGES_A_SQL}, {URLS_A_SQL},
r AS (
  SELECT url, host,
         row_number() OVER (
           PARTITION BY host
           ORDER BY CAST(('0x' || substr(md5(url), 1, 15)) AS BIGINT), url)
           AS rn
  FROM urls_a)
SELECT url, host FROM r WHERE rn <= 10
"""

REGISTRY["per_host_cap"] = (q_per_host_cap, PER_HOST_CAP_SQL)


def q_component_size_histogram(spark, sf_dir):
    """Component-size histogram (size → how many components) of graph B —
    the fragmentation fingerprint of a web crawl (giant component +
    dust), composed from the engine's min-label CC."""
    from .algos.components import connected_components

    labels, _ = connected_components(
        edges_b(spark, sf_dir), vertices=verts(spark, V_B), partitions=8)
    return (
        labels.groupBy("component").agg(F.count(F.lit(1)).alias("size"))
        .groupBy("size").agg(F.count(F.lit(1)).cast("long").alias("n_components"))
        .select(F.col("size").cast("long").alias("size"), "n_components")
    )


COMPONENT_SIZES_SQL = f"""
WITH RECURSIVE {EDGES_B_SQL}, {VERTS_B_SQL}, {UND_B_SQL},
reach(id, comp) AS (
  SELECT id, id FROM verts_b
  UNION
  SELECT e.dst, r.comp FROM reach r JOIN und_b e ON e.src = r.id
),
lab AS (SELECT id, min(comp) AS component FROM reach GROUP BY id),
cs AS (SELECT component, count(*) AS size FROM lab GROUP BY component)
SELECT CAST(size AS BIGINT) AS size,
       CAST(count(*) AS BIGINT) AS n_components
FROM cs GROUP BY size
"""

REGISTRY["component_size_histogram"] = (
    q_component_size_histogram, COMPONENT_SIZES_SQL)


def q_url_normalize(spark, sf_dir):
    """Value-gates the ingest URL-normalization UDF itself: deterministic
    dirty urls (uppercase scheme/host, fragments, padding) from graph-A
    ids, normalized by the vectorized pandas UDF; the oracle reimplements
    the same spec (strip → drop fragment → lowercase scheme+host) in
    pure SQL."""
    from .ingest import normalize_urls

    ids = (
        edges_a(spark, sf_dir).select(F.col("src").alias("id")).distinct())
    dirty = ids.select(
        "id",
        F.concat(
            F.lit("  HTTPS://HOST"), (F.col("id") % 40).cast("string"),
            F.lit(".Example/Path"), F.col("id").cast("string"),
            F.when(F.col("id") % 3 == 0, F.lit("#Fragment"))
            .otherwise(F.lit("")),
        ).alias("url"),
    )
    return dirty.select(
        F.col("id").cast("long").alias("id"), "url",
        normalize_urls(F.col("url")).alias("norm"),
    )


URL_NORMALIZE_SQL = f"""
WITH {EDGES_A_SQL},
ids AS (SELECT DISTINCT src AS id FROM edges_a),
dirty AS (
  SELECT id,
         '  HTTPS://HOST' || CAST(id % 40 AS VARCHAR) || '.Example/Path'
           || CAST(id AS VARCHAR)
           || CASE WHEN id % 3 = 0 THEN '#Fragment' ELSE '' END AS url
  FROM ids),
s AS (SELECT id, url, trim(url) AS u FROM dirty),
f AS (SELECT id, url,
             CASE WHEN position('#' IN u) > 0
                  THEN substr(u, 1, position('#' IN u) - 1) ELSE u END AS u
      FROM s)
SELECT id, url,
       CASE WHEN regexp_matches(u, '^[a-zA-Z][a-zA-Z0-9+.-]*://')
            THEN lower(regexp_extract(u,
                   '^([a-zA-Z][a-zA-Z0-9+.-]*://)([^/]*)(.*)$', 1))
              || lower(regexp_extract(u,
                   '^([a-zA-Z][a-zA-Z0-9+.-]*://)([^/]*)(.*)$', 2))
              || regexp_extract(u,
                   '^([a-zA-Z][a-zA-Z0-9+.-]*://)([^/]*)(.*)$', 3)
            ELSE u END AS norm
FROM f
"""

REGISTRY["url_normalize"] = (q_url_normalize, URL_NORMALIZE_SQL)


def q_vertex_reciprocity(spark, sf_dir):
    """Per-vertex link reciprocity: fraction of a vertex's out-links
    whose reverse edge exists (link-farm / mutual-admiration signal —
    the per-vertex refinement of the global `reciprocity` query)."""
    ea = edges_a(spark, sf_dir)
    rev = ea.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    rec = (
        ea.join(rev.hint("shuffle_hash"), ["src", "dst"], "left_semi")
        .groupBy(F.col("src").alias("id"))
        .agg(F.count(F.lit(1)).alias("recip"))
    )
    outd = ea.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("outd"))
    return (
        outd.join(rec, "id", "left")
        .select(
            "id", F.col("outd").cast("long").alias("outd"),
            F.coalesce("recip", F.lit(0)).cast("long").alias("recip"),
            F.round(F.coalesce("recip", F.lit(0)).cast("double") * 1e6
                    / F.col("outd")).cast("long").alias("recip_e6"),
        )
    )


VERTEX_RECIPROCITY_SQL = f"""
WITH {EDGES_A_SQL},
rec AS (
  SELECT e.src AS id, count(*) AS recip
  FROM edges_a e
  WHERE EXISTS (SELECT 1 FROM edges_a r
                WHERE r.src = e.dst AND r.dst = e.src)
  GROUP BY e.src),
outd AS (SELECT src AS id, count(*) AS outd FROM edges_a GROUP BY src)
SELECT o.id, CAST(o.outd AS BIGINT) AS outd,
       CAST(coalesce(r.recip, 0) AS BIGINT) AS recip,
       CAST(round(coalesce(r.recip, 0) * 1e6 / o.outd) AS BIGINT)
         AS recip_e6
FROM outd o LEFT JOIN rec r ON r.id = o.id
"""

REGISTRY["vertex_reciprocity"] = (q_vertex_reciprocity, VERTEX_RECIPROCITY_SQL)


def q_host_entropy(spark, sf_dir):
    """Out-link entropy per host over the host-graph rollup (intra-host
    self-loops excluded): H = Σ (w/W)·ln(W/w), each term e6-quantized
    BEFORE summing so the sum is an exact BIGINT — the crawl-frontier
    diversity signal (low entropy = host links to one place only)."""
    hg = q_host_graph(spark, sf_dir).filter(
        F.col("src_host") != F.col("dst_host"))
    tot = hg.groupBy(F.col("src_host").alias("host")).agg(
        F.sum("weight").alias("W"))
    term = F.round(
        (F.col("weight").cast("double") / F.col("W"))
        * F.log(F.col("W").cast("double") / F.col("weight")) * 1e6
    ).cast("long")
    return (
        hg.join(tot, hg.src_host == tot.host)
        .select(F.col("host"), term.alias("t"))
        .groupBy("host")
        .agg(F.sum("t").cast("long").alias("entropy_e6"))
    )


HOST_ENTROPY_SQL = f"""
WITH {EDGES_A_SQL},
hg AS (
  SELECT 'host' || CAST(src % 40 AS VARCHAR) || '.example' AS src_host,
         'host' || CAST(dst % 40 AS VARCHAR) || '.example' AS dst_host,
         count(*) AS weight
  FROM edges_a GROUP BY 1, 2),
he AS (SELECT * FROM hg WHERE src_host <> dst_host),
tot AS (SELECT src_host AS host, sum(weight) AS W FROM he GROUP BY src_host)
SELECT t.host,
       CAST(sum(CAST(round((e.weight / (1.0 * t.W))
                 * ln(t.W / (1.0 * e.weight)) * 1e6) AS BIGINT)) AS BIGINT)
         AS entropy_e6
FROM he e JOIN tot t ON t.host = e.src_host
GROUP BY t.host
"""

REGISTRY["host_entropy"] = (q_host_entropy, HOST_ENTROPY_SQL)


def q_inverted_index(spark, sf_dir):
    """Inverted index (term → df + sorted posting list) over documents —
    the search-index construction pass."""
    from .text import inverted_index

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return inverted_index(docs)


INVERTED_INDEX_SQL = """
WITH t AS (
  SELECT DISTINCT doc_id AS id,
         unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS term
  FROM documents)
SELECT term, CAST(count(*) AS BIGINT) AS df,
       array_to_string(list_sort(list(id)), ',') AS postings
FROM t WHERE term <> '' GROUP BY term
"""

REGISTRY["inverted_index"] = (q_inverted_index, INVERTED_INDEX_SQL)


V_D = 500  # sparser derived graph (orders, 1-in-20): SimRank pair-state ops


def edges_d(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    s = (F.col("o_orderkey").cast("long") * 23 + 11) % V_D
    d = (F.col("o_custkey").cast("long") * 29 + 3) % V_D
    return (
        o.filter(F.col("o_orderkey") % 20 == 3)
        .select(s.alias("src"), d.alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


EDGES_D_SQL = f"""
edges_d AS (
  SELECT DISTINCT
    CAST((o_orderkey * 23 + 11) % {V_D} AS BIGINT) AS src,
    CAST((o_custkey * 29 + 3) % {V_D} AS BIGINT) AS dst
  FROM orders
  WHERE o_orderkey % 20 = 3
    AND (o_orderkey * 23 + 11) % {V_D} <> (o_custkey * 29 + 3) % {V_D}
)"""


def q_simrank(spark, sf_dir):
    """Truncated SimRank (C=0.8, 2 quantized supersteps, τ=0.01) on the
    sparse derived graph D — the structural related-pages metric; the
    τ-pruning is what bounds the classic pair-state blowup."""
    from .algos.simrank import simrank_truncated

    return simrank_truncated(edges_d(spark, sf_dir), c=0.8, iters=2,
                             tau_e6=10_000, partitions=8)


def _simrank_sql(iters: int, c: float, tau: int) -> str:
    parts = [
        EDGES_D_SQL,
        "ind AS MATERIALIZED (SELECT dst AS v, count(*) AS n FROM edges_d "
        "GROUP BY dst)",
        """dg AS MATERIALIZED (
  SELECT e1.dst AS a, e2.dst AS b,
         count(*) * 1000000 AS dsum
  FROM edges_d e1 JOIN edges_d e2 ON e1.src = e2.src AND e1.dst <> e2.dst
  GROUP BY e1.dst, e2.dst)""",
    ]
    prev = None
    for i in range(1, iters + 1):
        if prev is None:
            parts.append(
                f"t{i} AS MATERIALIZED (SELECT a, b, dsum AS tsum FROM dg)"
            )
        else:
            parts.append(f"""o{i} AS MATERIALIZED (
  SELECT e1.dst AS a, e2.dst AS b, sum(s.v) AS osum
  FROM {prev} s JOIN edges_d e1 ON e1.src = s.x
  JOIN edges_d e2 ON e2.src = s.y
  WHERE e1.dst <> e2.dst
  GROUP BY e1.dst, e2.dst)""")
            parts.append(f"""t{i} AS MATERIALIZED (
  SELECT coalesce(d.a, o.a) AS a, coalesce(d.b, o.b) AS b,
         CAST(coalesce(d.dsum, 0) + coalesce(o.osum, 0) AS BIGINT) AS tsum
  FROM dg d FULL OUTER JOIN o{i} o ON o.a = d.a AND o.b = d.b)""")
        parts.append(f"""s{i} AS MATERIALIZED (
  SELECT t.a AS x, t.b AS y,
         CAST(round({c}e0 * t.tsum / (ia.n * ib.n)) AS BIGINT) AS v
  FROM t{i} t JOIN ind ia ON ia.v = t.a JOIN ind ib ON ib.v = t.b
  WHERE round({c}e0 * t.tsum / (ia.n * ib.n)) >= {tau})""")
        prev = f"s{i}"
    return (
        "WITH " + ",\n".join(parts)
        + f"\nSELECT x AS a, y AS b, v AS sim_e6 FROM {prev}"
    )


SIMRANK_SQL = _simrank_sql(2, 0.8, 10_000)

REGISTRY["simrank_2iter"] = (q_simrank, SIMRANK_SQL)


def q_harmonic_labels(spark, sf_dir):
    """Harmonic-function label spreading (Zhu et al. semi-supervised):
    spam seeds (id%53==2) clamp at 1e6, ham seeds (id%53==7) at 0,
    interior starts at 5e5 and becomes the neighbor average each
    superstep (4 rounds, re-quantized e6 every step) — soft spam scores
    complementing TrustRank's ratio."""
    eb = edges_b(spark, sf_dir)
    und = (
        eb.union(eb.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .filter(F.col("src") != F.col("dst")).distinct()
        .repartition(8, "src").localCheckpoint(eager=True)
    )
    v = und.select(F.col("src").alias("id")).distinct()
    seedv = F.when(F.col("id") % 53 == 2, F.lit(1_000_000)) \
        .when(F.col("id") % 53 == 7, F.lit(0))
    state = v.select(
        "id", F.coalesce(seedv, F.lit(500_000)).cast("long").alias("x"),
        seedv.isNotNull().alias("seed"),
    ).repartition(8, "id").localCheckpoint(eager=True)
    for _ in range(4):
        nbr = (
            und.join(state.select(F.col("id").alias("dst"),
                                  F.col("x").alias("nx")).hint("shuffle_hash"),
                     "dst")
            .groupBy(F.col("src").alias("id"))
            .agg(F.sum("nx").alias("s"), F.count(F.lit(1)).alias("d"))
        )
        state = (
            state.join(nbr.hint("shuffle_hash"), "id")
            .select(
                "id",
                F.when(F.col("seed"), F.col("x"))
                .otherwise(F.round(F.col("s").cast("double") / F.col("d"))
                           .cast("long")).alias("x"),
                "seed",
            )
            .repartition(8, "id").localCheckpoint(eager=True)
        )
    return state.select("id", F.col("x").alias("spam_e6"))


def _harmonic_sql(rounds: int) -> str:
    parts = [
        EDGES_B_SQL, UND_B_SQL,
        """x0 AS MATERIALIZED (
  SELECT id,
         CAST(CASE WHEN id % 53 = 2 THEN 1000000
                   WHEN id % 53 = 7 THEN 0
                   ELSE 500000 END AS BIGINT) AS x,
         (id % 53 = 2 OR id % 53 = 7) AS seed
  FROM (SELECT DISTINCT src AS id FROM und_b))""",
    ]
    for i in range(1, rounds + 1):
        parts.append(f"""nb{i} AS MATERIALIZED (
  SELECT u.src AS id, sum(s.x) AS s, count(*) AS d
  FROM und_b u JOIN x{i - 1} s ON s.id = u.dst GROUP BY u.src)""")
        parts.append(f"""x{i} AS MATERIALIZED (
  SELECT v.id,
         CASE WHEN v.seed THEN v.x
              ELSE CAST(round(n.s / (1.0 * n.d)) AS BIGINT) END AS x,
         v.seed
  FROM x{i - 1} v JOIN nb{i} n ON n.id = v.id)""")
    return (
        "WITH " + ",\n".join(parts)
        + f"\nSELECT id, x AS spam_e6 FROM x{rounds}"
    )


HARMONIC_SQL = _harmonic_sql(4)

REGISTRY["harmonic_labels"] = (q_harmonic_labels, HARMONIC_SQL)


def q_kmeans_assign(spark, sf_dir):
    """Deterministic integer-exact Lloyd k-means (k=4, 2 iterations) over
    the embeddings table — the trainer whose centroids feed ivf_topk's
    coarse quantizer; returns final (vec_id, cluster, dist)."""
    from .ann import kmeans_lloyd

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return kmeans_lloyd(emb, k=4, iters=2)


def _kmeans_sql(k: int, iters: int) -> str:
    parts = [
        "xq AS MATERIALIZED (SELECT vec_id AS vid, "
        "list_transform(embedding, e -> CAST(round(CAST(e AS DOUBLE) * 1e6)"
        " AS BIGINT)) AS x FROM embeddings)",
        f"c0 AS MATERIALIZED (SELECT row_number() OVER (ORDER BY vid) AS cid,"
        f" x AS c FROM (SELECT vid, x FROM xq ORDER BY vid LIMIT {k}))",
        "dims AS MATERIALIZED (SELECT unnest(range(1, "
        "(SELECT max(len(x)) FROM xq) + 1)) AS i)",
    ]
    dist = ("CAST(list_sum(list_transform(range(1, len(a.x) + 1), "
            "i -> (a.x[i] - c.c[i]) * (a.x[i] - c.c[i]))) AS BIGINT)")
    for i in range(1, iters + 1):
        parts.append(f"""asg{i} AS MATERIALIZED (
  SELECT a.vid, min({{'d': {dist}, 'cid': c.cid}}) AS s
  FROM xq a CROSS JOIN c{i - 1} c GROUP BY a.vid)""")
        parts.append(f"""ex{i} AS MATERIALIZED (
  SELECT g.s.cid AS cluster, d.i AS dim, a.x[d.i] AS val
  FROM asg{i} g JOIN xq a ON a.vid = g.vid CROSS JOIN dims d)""")
        parts.append(f"""up{i} AS MATERIALIZED (
  SELECT cluster, dim,
         CAST(round(CAST(sum(val) AS DOUBLE) / count(*)) AS BIGINT) AS cv
  FROM ex{i} GROUP BY 1, 2)""")
        parts.append(
            f"cn{i} AS MATERIALIZED (SELECT cluster AS cid, "
            f"list(cv ORDER BY dim) AS c FROM up{i} GROUP BY cluster)")
        parts.append(
            f"c{i} AS MATERIALIZED (SELECT o.cid, coalesce(n.c, o.c) AS c "
            f"FROM c{i - 1} o LEFT JOIN cn{i} n ON n.cid = o.cid)")
    return (
        "WITH " + ",\n".join(parts)
        + f"\nSELECT g.vid AS vec_id, g.s.cid AS cluster, g.s.d AS dist "
        f"FROM asg{iters} g"
    )


KMEANS_SQL = _kmeans_sql(4, 2)

REGISTRY["kmeans_assign"] = (q_kmeans_assign, KMEANS_SQL)


def q_densest_subgraph(spark, sf_dir):
    """Densest subgraph (ε=0 batch peeling, exact integer density key)
    on the sparse derived graph D — link-farm detection."""
    from .algos.densest import densest_subgraph

    best, _ = densest_subgraph(edges_d(spark, sf_dir), max_rounds=8,
                               partitions=8)
    return best


def _densest_sql(rounds: int) -> str:
    parts = [
        EDGES_D_SQL,
        "s0 AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS a, "
        "greatest(src, dst) AS b FROM edges_d)",
    ]
    for i in range(rounds):
        parts.append(
            f"v{i} AS MATERIALIZED (SELECT DISTINCT id FROM ("
            f"SELECT a AS id FROM s{i} UNION ALL SELECT b FROM s{i}))")
        parts.append(
            f"k{i} AS MATERIALIZED (SELECT {i} AS r, "
            f"(SELECT count(*) FROM s{i}) AS e, "
            f"(SELECT count(*) FROM v{i}) AS v)")
        if i < rounds - 1:
            parts.append(f"""deg{i} AS MATERIALIZED (
  SELECT id, count(*) AS d FROM (
    SELECT a AS id FROM s{i} UNION ALL SELECT b AS id FROM s{i})
  GROUP BY id)""")
            parts.append(f"""keep{i} AS MATERIALIZED (
  SELECT g.id FROM deg{i} g CROSS JOIN k{i} kk
  WHERE g.d * kk.v > 2 * kk.e)""")
            parts.append(f"""s{i + 1} AS MATERIALIZED (
  SELECT e.a, e.b FROM s{i} e
  JOIN keep{i} x ON e.a = x.id JOIN keep{i} y ON e.b = y.id)""")
    meta_union = " UNION ALL ".join(f"SELECT r, e, v FROM k{i}"
                                    for i in range(rounds))
    v_union = " UNION ALL ".join(f"SELECT {i} AS r, id FROM v{i}"
                                 for i in range(rounds))
    parts.append(f"""meta AS MATERIALIZED (
  SELECT r, CASE WHEN v > 0 THEN e * 1000000000 // v ELSE -1 END AS key
  FROM ({meta_union}))""")
    parts.append(
        "bestr AS (SELECT r, key FROM meta ORDER BY key DESC, r ASC LIMIT 1)")
    return (
        "WITH " + ",\n".join(parts)
        + f"""
SELECT u.id, CAST((SELECT key FROM bestr) AS BIGINT) AS density_e9
FROM ({v_union}) u WHERE u.r = (SELECT r FROM bestr)"""
    )


DENSEST_SQL = _densest_sql(8)

REGISTRY["densest_subgraph"] = (q_densest_subgraph, DENSEST_SQL)


def q_kmeans_label_confusion(spark, sf_dir):
    """Cluster-purity contingency: k-means cluster × ground-truth label
    counts over embeddings — the clustering-evaluation pass."""
    from .ann import kmeans_lloyd

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    asg = kmeans_lloyd(emb, k=4, iters=2)
    return (
        asg.join(emb.select("vec_id", "label"), "vec_id")
        .groupBy("cluster", F.col("label").cast("long").alias("label"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


KMEANS_CONFUSION_SQL = (
    _kmeans_sql(4, 2).replace(
        "SELECT g.vid AS vec_id, g.s.cid AS cluster, g.s.d AS dist "
        "FROM asg2 g",
        """SELECT g.s.cid AS cluster, CAST(e.label AS BIGINT) AS label,
       CAST(count(*) AS BIGINT) AS n
FROM asg2 g JOIN embeddings e ON e.vec_id = g.vid
GROUP BY 1, 2""")
)

REGISTRY["kmeans_label_confusion"] = (
    q_kmeans_label_confusion, KMEANS_CONFUSION_SQL)


def q_event_funnel(spark, sf_dir):
    """Funnel conversions: for each ordered event-type pair (a, b), how
    many users did a and then later b (first-a strictly before last-b) —
    the product-analytics staple over the events table."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    ut = (
        ev.groupBy("user_id", "event_type")
        .agg(F.min("ts").alias("first_ts"), F.max("ts").alias("last_ts"))
    )
    a = ut.select("user_id", F.col("event_type").alias("step_a"),
                  F.col("first_ts").alias("fa"))
    b = ut.select("user_id", F.col("event_type").alias("step_b"),
                  F.col("last_ts").alias("lb"))
    return (
        a.join(b, "user_id")
        .filter((F.col("step_a") != F.col("step_b"))
                & (F.col("fa") < F.col("lb")))
        .groupBy("step_a", "step_b")
        .agg(F.count(F.lit(1)).cast("long").alias("converted_users"))
    )


EVENT_FUNNEL_SQL = """
WITH ut AS (
  SELECT user_id, event_type, min(ts) AS first_ts, max(ts) AS last_ts
  FROM events GROUP BY 1, 2)
SELECT a.event_type AS step_a, b.event_type AS step_b,
       CAST(count(*) AS BIGINT) AS converted_users
FROM ut a JOIN ut b ON b.user_id = a.user_id
WHERE a.event_type <> b.event_type AND a.first_ts < b.last_ts
GROUP BY 1, 2
"""

REGISTRY["event_funnel"] = (q_event_funnel, EVENT_FUNNEL_SQL)


def q_corpus_summary(spark, sf_dir):
    """One-row corpus health card over documents: doc/char counts,
    language count, exact-duplicate text count (n_docs − distinct
    texts), and mean doc length (e2) — the dataset datasheet numbers."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.countDistinct("lang").cast("long").alias("n_langs"),
        (F.count(F.lit(1)) - F.countDistinct("text")).cast("long")
        .alias("exact_dup_docs"),
        F.round(F.sum("n_chars").cast("double") * 100
                / F.count(F.lit(1))).cast("long").alias("mean_chars_e2"),
    )


CORPUS_SUMMARY_SQL = """
SELECT CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
       CAST(count(*) - count(DISTINCT text) AS BIGINT) AS exact_dup_docs,
       CAST(round(CAST(sum(n_chars) AS DOUBLE) * 100 / count(*)) AS BIGINT)
         AS mean_chars_e2
FROM documents
"""

REGISTRY["corpus_summary"] = (q_corpus_summary, CORPUS_SUMMARY_SQL)


def q_bfs_parents(spark, sf_dir):
    """BFS shortest-path tree with parent pointers from vertex 7 on the
    undirected derived graph B: parent(v) = min-id neighbor at dist-1
    (deterministic tree, enables path reconstruction); root parent = -1."""
    from .algos.voronoi import nearest_seed_partition

    eb = edges_b(spark, sf_dir)
    seeds = spark.createDataFrame([(7,)], "id long")
    ball, _ = nearest_seed_partition(eb, seeds, max_rounds=30, partitions=8)
    und = (
        eb.union(eb.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .filter(F.col("src") != F.col("dst")).distinct()
    )
    d_of = ball.select(F.col("id").alias("nbr"), F.col("dist").alias("nd"))
    parents = (
        und.join(ball.select(F.col("id").alias("src"),
                             F.col("dist").alias("d")), "src")
        .join(d_of, und.dst == d_of.nbr)
        .filter(F.col("nd") == F.col("d") - 1)
        .groupBy(F.col("src").alias("id"), F.col("d").alias("dist"))
        .agg(F.min("nbr").alias("parent"))
    )
    return (
        ball.select("id", F.col("dist").cast("long").alias("dist"))
        .join(parents.select("id", "parent"), "id", "left")
        .select("id", "dist",
                F.coalesce("parent", F.lit(-1)).cast("long").alias("parent"))
    )


BFS_PARENTS_SQL = f"""
WITH RECURSIVE {EDGES_B_SQL}, {UND_B_SQL},
reach(id, dist) AS (
  SELECT CAST(7 AS BIGINT), 0
  UNION
  SELECT e.dst, r.dist + 1 FROM reach r JOIN und_b e ON e.src = r.id
  WHERE r.dist < 40
),
d AS (SELECT id, min(dist) AS dist FROM reach GROUP BY id),
p AS (
  SELECT v.id, v.dist, min(u.dst) AS parent
  FROM d v JOIN und_b u ON u.src = v.id
  JOIN d w ON w.id = u.dst AND w.dist = v.dist - 1
  GROUP BY v.id, v.dist)
SELECT v.id, CAST(v.dist AS BIGINT) AS dist,
       CAST(coalesce(p.parent, -1) AS BIGINT) AS parent
FROM d v LEFT JOIN p ON p.id = v.id
"""

REGISTRY["bfs_parents"] = (q_bfs_parents, BFS_PARENTS_SQL)


def q_bipartite_projection(spark, sf_dir):
    """Bipartite projection of the user×event-type graph onto event
    types: co-occurrence weight = #users having done both (the classic
    two-mode → one-mode projection, e.g. query co-click graphs)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    ut = ev.select("user_id", "event_type").distinct()
    a = ut.withColumnRenamed("event_type", "type_a")
    b = ut.withColumnRenamed("event_type", "type_b")
    return (
        a.join(b, "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).cast("long").alias("shared_users"))
    )


BIPARTITE_PROJ_SQL = """
WITH ut AS (SELECT DISTINCT user_id, event_type FROM events)
SELECT a.event_type AS type_a, b.event_type AS type_b,
       CAST(count(*) AS BIGINT) AS shared_users
FROM ut a JOIN ut b ON b.user_id = a.user_id
WHERE a.event_type < b.event_type
GROUP BY 1, 2
"""

REGISTRY["bipartite_projection"] = (q_bipartite_projection, BIPARTITE_PROJ_SQL)


def q_source_profile(spark, sf_dir):
    """Per-source corpus profile: docs, chars, distinct languages and
    exact-dup docs per `source` — the per-provider data-quality ledger
    used to decide source-level inclusion/weights."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.countDistinct("lang").cast("long").alias("n_langs"),
        (F.count(F.lit(1)) - F.countDistinct("text")).cast("long")
        .alias("exact_dup_docs"),
    )


SOURCE_PROFILE_SQL = """
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
       CAST(count(*) - count(DISTINCT text) AS BIGINT) AS exact_dup_docs
FROM documents GROUP BY source
"""

REGISTRY["source_profile"] = (q_source_profile, SOURCE_PROFILE_SQL)


def q_walk_visit_counts(spark, sf_dir):
    """Per-vertex visit histogram of the deterministic hash-walk corpus
    (the DeepWalk negative-sampling frequency table): vertex → how many
    times the 20×8 walk corpus visits it."""
    from .algos.paths import random_walks

    walks = random_walks(
        edges_b(spark, sf_dir),
        starts=spark.createDataFrame([(i,) for i in range(20)], "id long"),
        length=8, directed=False, partitions=8,
    )
    return (
        walks.groupBy(F.col("v").cast("long").alias("v"))
        .agg(F.count(F.lit(1)).cast("long").alias("visits"))
    )


WALK_VISITS_SQL = (
    "WITH visits_base AS (\n" + _random_walks_sql(20, 8) + "\n)\n"
    "SELECT v, CAST(count(*) AS BIGINT) AS visits FROM visits_base GROUP BY v"
)

REGISTRY["walk_visit_counts"] = (q_walk_visit_counts, WALK_VISITS_SQL)


def q_ngram_novelty(spark, sf_dir):
    """Train/test n-gram novelty: splitting documents by doc_id parity,
    what fraction of the test half's distinct word-3-grams never occur
    in the train half (high novelty = low leakage; the complement of
    contamination).  One semi-join of two distinct-shingle sets."""
    from .dedup import word_shingles

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sh = docs.select(
        "doc_id", F.explode(word_shingles(F.col("text"), 3)).alias("s"))
    test = sh.filter(F.col("doc_id") % 2 == 1).select("s").distinct()
    train = sh.filter(F.col("doc_id") % 2 == 0).select("s").distinct()
    covered = test.join(train, "s", "left_semi")
    n_test = test.count()
    n_cov = covered.count()
    return spark.createDataFrame(
        [(n_test, n_cov)], "test_grams long, covered_grams long"
    ).select(
        "test_grams", "covered_grams",
        F.round((F.col("test_grams") - F.col("covered_grams"))
                .cast("double") * 1e6 / F.col("test_grams"))
        .cast("long").alias("novelty_e6"),
    )


def _novelty_sql() -> str:
    from .dedup import word_shingles_sql

    sh = word_shingles_sql("text", 3)
    return f"""
WITH sh AS MATERIALIZED (
  SELECT doc_id, unnest({sh}) AS s FROM documents),
test AS MATERIALIZED (SELECT DISTINCT s FROM sh WHERE doc_id % 2 = 1),
train AS MATERIALIZED (SELECT DISTINCT s FROM sh WHERE doc_id % 2 = 0),
m AS (SELECT CAST((SELECT count(*) FROM test) AS BIGINT) AS test_grams,
             CAST((SELECT count(*) FROM test t
                   WHERE EXISTS (SELECT 1 FROM train x WHERE x.s = t.s))
                  AS BIGINT) AS covered_grams)
SELECT test_grams, covered_grams,
       CAST(round(CAST(test_grams - covered_grams AS DOUBLE) * 1e6
                  / test_grams) AS BIGINT) AS novelty_e6
FROM m
"""


NOVELTY_SQL = _novelty_sql()

REGISTRY["ngram_novelty"] = (q_ngram_novelty, NOVELTY_SQL)


def q_partition_balance(spark, sf_dir):
    """Partition-balance diagnostic: rows per hash bucket (H60(src) mod
    32) of the derived edge table, plus each bucket's permille of total —
    the skew report consulted before pinning a partitioning."""
    from .dedup import h60

    ea = edges_a(spark, sf_dir)
    b = ea.select((h60(F.col("src").cast("string")) % 32).alias("bucket"))
    tot = b.groupBy("bucket").agg(F.count(F.lit(1)).alias("rows"))
    return tot.select(
        F.col("bucket").cast("long").alias("bucket"),
        F.col("rows").cast("long").alias("rows"),
        F.round(F.col("rows").cast("double") * 1000
                / F.sum("rows").over(Window.partitionBy()))
        .cast("long").alias("permille"),
    )


PARTITION_BALANCE_SQL = f"""
WITH {EDGES_A_SQL},
b AS (SELECT CAST(('0x' || substr(md5(CAST(src AS VARCHAR)), 1, 15))
             AS BIGINT) % 32 AS bucket FROM edges_a),
t AS (SELECT bucket, count(*) AS rows_ FROM b GROUP BY bucket)
SELECT CAST(bucket AS BIGINT) AS bucket, CAST(rows_ AS BIGINT) AS rows,
       CAST(round(rows_ * 1000.0 / (SELECT sum(rows_) FROM t)) AS BIGINT)
         AS permille
FROM t
"""

REGISTRY["partition_balance"] = (q_partition_balance, PARTITION_BALANCE_SQL)


def _hist_cdf(hist: DataFrame, val: str, cnt: str, shift: int = 20) -> DataFrame:
    """Exact cumulative counts ``(val, cum)`` over an integer histogram via
    the TWO-LEVEL CDF pattern: cumulative sums run inside windows
    PARTITIONED by a coarse value bucket (``val >> shift``), and the
    cross-bucket offsets come from a bucket-totals self-join broadcast back
    in.  No per-value row ever crosses a single-partition global window —
    the level-2 table has ~range/2^shift rows regardless of data size."""
    h = hist.withColumn(
        "_b", F.floor(F.col(val) / F.lit(1 << shift)).cast("long"))
    win = (Window.partitionBy("_b").orderBy(val)
           .rowsBetween(Window.unboundedPreceding, 0))
    within = h.withColumn("_wc", F.sum(cnt).over(win))
    btot = h.groupBy("_b").agg(F.sum(cnt).alias("_bc"))
    off = (
        btot.select(F.col("_b").alias("_ba"))
        .join(btot.select(F.col("_b").alias("_bb"), "_bc"),
              F.col("_bb") < F.col("_ba"), "left")
        .groupBy(F.col("_ba").alias("_b"))
        .agg(F.coalesce(F.sum("_bc"), F.lit(0)).alias("_off"))
    )
    return (
        within.join(F.broadcast(off), "_b")
        .select(val, (F.col("_wc") + F.col("_off")).alias("cum"))
    )


def q_interarrival_percentiles(spark, sf_dir):
    """Exact p50/p90/p99 of per-user event inter-arrival gaps (µs),
    via the engine's two-level histogram-CDF percentile pattern — latency/
    behavior distribution without a global sort or global window."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = (
        ev.select("user_id", "ts", "event_id")
        .withColumn("gap", F.unix_micros(F.col("ts").cast("timestamp"))
                    - F.unix_micros(F.lag("ts").over(w).cast("timestamp")))
        .filter(F.col("gap").isNotNull())
        .select(F.col("gap").cast("long").alias("g"))
    )
    hist = gaps.groupBy("g").agg(F.count(F.lit(1)).alias("c"))
    cum = _hist_cdf(hist, "g", "c")
    n = gaps.agg(F.count(F.lit(1)).alias("n"))
    j = cum.crossJoin(F.broadcast(n))
    pick = lambda q: F.min(F.when(  # noqa: E731
        F.col("cum") >= F.ceil(F.lit(q) * F.col("n")), F.col("g")))
    return j.agg(
        F.max("n").cast("long").alias("n"),
        pick(0.5).cast("long").alias("p50"),
        pick(0.9).cast("long").alias("p90"),
        pick(0.99).cast("long").alias("p99"),
    )


INTERARRIVAL_SQL = """
WITH g AS (
  SELECT epoch_us(ts) - epoch_us(lag(ts) OVER w) AS g
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
gaps AS (SELECT g FROM g WHERE g IS NOT NULL),
hist AS (SELECT g, count(*) AS c FROM gaps GROUP BY g),
cum AS (SELECT g, sum(c) OVER (ORDER BY g ROWS BETWEEN UNBOUNDED PRECEDING
        AND CURRENT ROW) AS cum FROM hist),
n AS (SELECT count(*) AS n FROM gaps)
SELECT CAST(max(n.n) AS BIGINT) AS n,
       CAST(min(CASE WHEN cum >= ceil(0.5 * n.n) THEN g END) AS BIGINT) AS p50,
       CAST(min(CASE WHEN cum >= ceil(0.9 * n.n) THEN g END) AS BIGINT) AS p90,
       CAST(min(CASE WHEN cum >= ceil(0.99 * n.n) THEN g END) AS BIGINT) AS p99
FROM cum CROSS JOIN n
"""

REGISTRY["interarrival_percentiles"] = (
    q_interarrival_percentiles, INTERARRIVAL_SQL)


def q_dedup_agreement(spark, sf_dir):
    """Dedup-method agreement: of the MinHash-LSH near-dup pairs whose
    both documents have embeddings, what fraction the banded
    embedding-cosine detector also flags — the cross-validation number
    quoted when choosing a dedup stack."""
    from . import dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    mh = dedup.minhash_lsh_pairs(
        docs, num_hashes=16, bands=8, jaccard_threshold=0.5
    ).select("id_a", "id_b")
    en = dedup.embedding_near_dup_banded(emb, threshold=0.45) \
        .select("id_a", "id_b")
    ids = emb.select(F.col("vec_id").alias("id")).distinct()
    mh_emb = (
        mh.join(ids.withColumnRenamed("id", "id_a"), "id_a", "left_semi")
        .join(ids.withColumnRenamed("id", "id_b"), "id_b", "left_semi")
    )
    n_mh = mh_emb.count()
    n_both = mh_emb.join(en, ["id_a", "id_b"], "left_semi").count()
    return spark.createDataFrame(
        [(n_mh, n_both)], "mh_pairs_with_emb long, both_flagged long"
    ).select(
        "mh_pairs_with_emb", "both_flagged",
        F.when(F.col("mh_pairs_with_emb") > 0,
               F.round(F.col("both_flagged").cast("double") * 1e6
                       / F.col("mh_pairs_with_emb")))
        .otherwise(F.lit(0)).cast("long").alias("agree_e6"),
    )


def _dedup_agreement_sql() -> str:
    from . import dedup

    mh = dedup.minhash_lsh_pairs_sql(num_hashes=16, bands=8,
                                     jaccard_threshold=0.5)
    en = dedup.embedding_near_dup_banded_sql(threshold=0.45)
    return f"""
WITH mh AS MATERIALIZED ({mh}),
en AS MATERIALIZED ({en}),
ids AS (SELECT DISTINCT vec_id AS id FROM embeddings),
mhe AS MATERIALIZED (
  SELECT m.id_a, m.id_b FROM mh m
  WHERE EXISTS (SELECT 1 FROM ids i WHERE i.id = m.id_a)
    AND EXISTS (SELECT 1 FROM ids i WHERE i.id = m.id_b)),
m AS (SELECT CAST((SELECT count(*) FROM mhe) AS BIGINT) AS mh_pairs_with_emb,
             CAST((SELECT count(*) FROM mhe x
                   WHERE EXISTS (SELECT 1 FROM en e
                                 WHERE e.id_a = x.id_a AND e.id_b = x.id_b))
                  AS BIGINT) AS both_flagged)
SELECT mh_pairs_with_emb, both_flagged,
       CAST(CASE WHEN mh_pairs_with_emb > 0 THEN
              round(CAST(both_flagged AS DOUBLE) * 1e6 / mh_pairs_with_emb)
            ELSE 0 END AS BIGINT) AS agree_e6
FROM m
"""


DEDUP_AGREEMENT_SQL = _dedup_agreement_sql()

REGISTRY["dedup_agreement"] = (q_dedup_agreement, DEDUP_AGREEMENT_SQL)


def q_stream_attribution(spark, sf_dir):
    """Stream-stream interval join (view→purchase attribution within 1h,
    both sides watermarked, append mode) drained with availableNow —
    must equal the batch interval join exactly."""
    from . import streaming

    return streaming.stream_attribution(
        spark, f"{sf_dir}/events.parquet", sink_table="q_stream_attr")


STREAM_ATTRIBUTION_SQL = """
SELECT b.user_id, v.event_id AS view_event, b.event_id AS buy_event
FROM events v JOIN events b
  ON v.user_id = b.user_id
 AND v.event_type = 'view' AND b.event_type = 'purchase'
 AND v.ts BETWEEN b.ts - INTERVAL 1 HOUR AND b.ts
"""

REGISTRY["stream_attribution"] = (q_stream_attribution, STREAM_ATTRIBUTION_SQL)


def q_local_supplier_volume(spark, sf_dir):
    """TPC-H Q5-shaped 6-table star join: revenue by nation where the
    customer's and supplier's nations match, restricted to one region —
    dimension tables (region, nation) broadcast, facts shuffle on their
    join keys.  Revenue terms e2-quantized per row before the integer
    sum (engine-order-proof)."""
    rd = lambda t: spark.read.parquet(f"{sf_dir}/{t}.parquet")  # noqa: E731
    rev = F.round(F.col("l_extendedprice")
                  * (1 - F.col("l_discount")) * 100).cast("long")
    j = (
        rd("customer")
        .join(rd("orders"), F.col("o_custkey") == F.col("c_custkey"))
        .join(rd("lineitem"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(rd("supplier"),
              (F.col("s_suppkey") == F.col("l_suppkey"))
              & (F.col("s_nationkey") == F.col("c_nationkey")))
        .join(F.broadcast(rd("nation")),
              F.col("n_nationkey") == F.col("c_nationkey"))
        .join(F.broadcast(rd("region")),
              F.col("r_regionkey") == F.col("n_regionkey"))
        .filter(F.col("r_name") == "ASIA")
    )
    return (
        j.groupBy("n_name")
        .agg(F.count(F.lit(1)).cast("long").alias("n_items"),
             F.sum(rev).cast("long").alias("revenue_e2"))
    )


LOCAL_SUPPLIER_SQL = """
SELECT n.n_name,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                     AS BIGINT)) AS BIGINT) AS revenue_e2
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
              AND s.s_nationkey = c.c_nationkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
WHERE r.r_name = 'ASIA'
GROUP BY n.n_name
"""

REGISTRY["local_supplier_volume"] = (
    q_local_supplier_volume, LOCAL_SUPPLIER_SQL)


def q_graph_center(spark, sf_dir):
    """Graph center + radius of the undirected derived graph B: run the
    composite-key multi-source BFS from EVERY vertex, restrict to the
    giant component (max reached count), output the vertices whose
    eccentricity equals the radius — "the most central hosts".  Guarded:
    refuses > EXACT_DIAG_MAX_SOURCES sources (scale path: HyperBall)."""
    from .algos.paths import closeness_centrality

    eb = edges_b(spark, sf_dir)
    verts_all = (
        eb.select(F.col("src").alias("id"))
        .union(eb.select(F.col("dst").alias("id"))).distinct()
    )
    _guard_exact_all_sources(verts_all.count(), "graph_center")
    cc = closeness_centrality(eb, sources=verts_all, directed=False,
                              partitions=8).select("s", "reached", "ecc")
    mx = cc.agg(F.max("reached").alias("m"))
    giant = cc.crossJoin(F.broadcast(mx)).filter(F.col("reached") == F.col("m"))
    rad = giant.agg(F.min("ecc").alias("radius"))
    return (
        giant.crossJoin(F.broadcast(rad))
        .filter(F.col("ecc") == F.col("radius"))
        .select(F.col("s").cast("long").alias("id"),
                F.col("radius").cast("long").alias("radius"))
    )


GRAPH_CENTER_SQL = f"""
WITH RECURSIVE {EDGES_B_SQL}, {UND_B_SQL},
srcs AS (SELECT DISTINCT src AS s FROM und_b),
walk(s, v, d) AS (
  SELECT s, s AS v, 0 AS d FROM srcs
  UNION
  SELECT w.s, e.dst, w.d + 1 FROM walk w JOIN und_b e ON e.src = w.v
  WHERE w.d < 40
),
md AS (SELECT s, v, min(d) AS d FROM walk GROUP BY s, v),
ecc AS (SELECT s, count(*) AS reached, max(d) AS ecc FROM md GROUP BY s),
m AS (SELECT max(reached) AS m FROM ecc),
giant AS (SELECT e.s, e.ecc FROM ecc e CROSS JOIN m WHERE e.reached = m.m),
rad AS (SELECT min(ecc) AS radius FROM giant)
SELECT g.s AS id, CAST(r.radius AS BIGINT) AS radius
FROM giant g CROSS JOIN rad r WHERE g.ecc = r.radius
"""

REGISTRY["graph_center"] = (q_graph_center, GRAPH_CENTER_SQL)


def _median_hist(df, col):
    """Exact median of an integer column via the two-level histogram-CDF
    pattern (_hist_cdf) — no single-partition window at any size."""
    hist = df.groupBy(F.col(col).alias("x")).agg(F.count(F.lit(1)).alias("c"))
    cum = _hist_cdf(hist, "x", "c")
    n = df.count()
    import math
    pos = math.ceil(0.5 * n)
    return (
        cum.filter(F.col("cum") >= pos)
        .agg(F.min("x").alias("m")).collect()[0]["m"]
    ), n


def q_length_outliers(spark, sf_dir):
    """Robust doc-length outlier filter: median + MAD via two exact
    histogram-CDF passes (no global sort, no mean/stddev fragility),
    flagging docs with |n_chars − med| > 3·1.4826·MAD (integer-exact
    comparison: |x−med|·1e6 > 4447800·MAD) — the C4-style
    length-anomaly gate."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    med, _ = _median_hist(docs.select("n_chars"), "n_chars")
    dev = docs.select(F.abs(F.col("n_chars") - F.lit(med)).alias("d"))
    mad, _ = _median_hist(dev, "d")
    return docs.select(
        "doc_id", F.col("n_chars").cast("long").alias("n_chars"),
        F.lit(int(med)).cast("long").alias("median"),
        F.lit(int(mad)).cast("long").alias("mad"),
        (F.abs(F.col("n_chars") - F.lit(med)) * 1_000_000
         > F.lit(4_447_800) * F.lit(int(mad))).alias("outlier"),
    )


LENGTH_OUTLIERS_SQL = """
WITH n AS (SELECT count(*) AS n FROM documents),
h1 AS (SELECT n_chars AS x, count(*) AS c FROM documents GROUP BY 1),
c1 AS (SELECT x, sum(c) OVER (ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING
       AND CURRENT ROW) AS cum FROM h1),
med AS (SELECT min(x) AS m FROM c1 CROSS JOIN n WHERE cum >= ceil(0.5 * n.n)),
dev AS (SELECT abs(n_chars - (SELECT m FROM med)) AS d FROM documents),
h2 AS (SELECT d AS x, count(*) AS c FROM dev GROUP BY 1),
c2 AS (SELECT x, sum(c) OVER (ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING
       AND CURRENT ROW) AS cum FROM h2),
mad AS (SELECT min(x) AS m FROM c2 CROSS JOIN n WHERE cum >= ceil(0.5 * n.n))
SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
       CAST((SELECT m FROM med) AS BIGINT) AS median,
       CAST((SELECT m FROM mad) AS BIGINT) AS mad,
       abs(n_chars - (SELECT m FROM med)) * 1000000
         > 4447800 * (SELECT m FROM mad) AS outlier
FROM documents
"""

REGISTRY["length_outliers"] = (q_length_outliers, LENGTH_OUTLIERS_SQL)


def q_dedup_keep_list(spark, sf_dir):
    """The dedup ACTION: one canonical representative (min doc_id) per
    near-dup cluster, all singleton docs kept — emits every kept doc_id
    plus the corpus sizes, i.e. the actual filtered-corpus manifest."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    clusters = q_dedup_clusters(spark, sf_dir)  # (doc_id, cluster)
    drop = (
        clusters.groupBy("cluster").agg(F.min("doc_id").alias("keep"))
        .join(clusters, "cluster")
        .filter(F.col("doc_id") != F.col("keep"))
        .select("doc_id")
    )
    return (
        docs.select("doc_id")
        .join(drop, "doc_id", "left_anti")
        .select(F.col("doc_id").cast("long").alias("doc_id"))
    )


def _dedup_keep_sql() -> str:
    inner = _dedup_clusters_sql()
    return f"""
WITH cl AS MATERIALIZED ({inner}),
keepers AS (SELECT cluster, min(doc_id) AS keep FROM cl GROUP BY cluster),
drop_ AS (SELECT c.doc_id FROM cl c JOIN keepers k ON k.cluster = c.cluster
          WHERE c.doc_id <> k.keep)
SELECT CAST(d.doc_id AS BIGINT) AS doc_id FROM documents d
WHERE d.doc_id NOT IN (SELECT doc_id FROM drop_)
"""


DEDUP_KEEP_SQL = _dedup_keep_sql()

REGISTRY["dedup_keep_list"] = (q_dedup_keep_list, DEDUP_KEEP_SQL)


def q_cocitation_coupling(spark, sf_dir):
    """Co-citation (shared in-neighbors) and bibliographic coupling
    (shared out-neighbors) pair strengths ≥ 5 on the directed graph A —
    the classic directed related-page measures (Kessler 1963 / Small
    1973), full-outer merged so a pair strong on either axis appears."""
    ea = edges_a(spark, sf_dir)
    e1 = ea.select(F.col("src").alias("s"), F.col("dst").alias("x"))
    e2 = ea.select(F.col("src").alias("s2"), F.col("dst").alias("y"))
    cocite = (
        e1.join(e2, (F.col("s") == F.col("s2")) & (F.col("x") < F.col("y")))
        .groupBy(F.col("x").alias("a"), F.col("y").alias("b"))
        .agg(F.count(F.lit(1)).alias("cocitation"))
        .filter(F.col("cocitation") >= 5)
    )
    f1 = ea.select(F.col("src").alias("x"), F.col("dst").alias("d"))
    f2 = ea.select(F.col("src").alias("y"), F.col("dst").alias("d2"))
    coup = (
        f1.join(f2, (F.col("d") == F.col("d2")) & (F.col("x") < F.col("y")))
        .groupBy(F.col("x").alias("a"), F.col("y").alias("b"))
        .agg(F.count(F.lit(1)).alias("coupling"))
        .filter(F.col("coupling") >= 5)
    )
    return (
        cocite.join(coup, ["a", "b"], "full_outer")
        .select(
            "a", "b",
            F.coalesce("cocitation", F.lit(0)).cast("long").alias("cocitation"),
            F.coalesce("coupling", F.lit(0)).cast("long").alias("coupling"),
        )
    )


COCITATION_SQL = f"""
WITH {EDGES_A_SQL},
cocite AS (
  SELECT e1.dst AS a, e2.dst AS b, count(*) AS cocitation
  FROM edges_a e1 JOIN edges_a e2
    ON e1.src = e2.src AND e1.dst < e2.dst
  GROUP BY 1, 2 HAVING count(*) >= 5),
coup AS (
  SELECT e1.src AS a, e2.src AS b, count(*) AS coupling
  FROM edges_a e1 JOIN edges_a e2
    ON e1.dst = e2.dst AND e1.src < e2.src
  GROUP BY 1, 2 HAVING count(*) >= 5)
SELECT coalesce(c.a, p.a) AS a, coalesce(c.b, p.b) AS b,
       CAST(coalesce(c.cocitation, 0) AS BIGINT) AS cocitation,
       CAST(coalesce(p.coupling, 0) AS BIGINT) AS coupling
FROM cocite c FULL OUTER JOIN coup p ON p.a = c.a AND p.b = c.b
"""

REGISTRY["cocitation_coupling"] = (q_cocitation_coupling, COCITATION_SQL)


def q_embedding_norms(spark, sf_dir):
    """Embedding health: integer-exact squared L2 norm (e6-quantized
    coords → BIGINT sum of squares) + zero-vector flag per vector — the
    sanity pass run before any similarity work."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    xq = F.transform(F.col("embedding"),
                     lambda e: F.round(e.cast("double") * 1e6).cast("long"))
    sq = F.aggregate(xq, F.lit(0).cast("long"),
                     lambda acc, v: acc + v * v)
    return emb.select(
        F.col("vec_id").cast("long").alias("vec_id"),
        sq.alias("sq_norm_e12"),
        (sq == 0).alias("is_zero"),
    )


EMBEDDING_NORMS_SQL = """
SELECT CAST(vec_id AS BIGINT) AS vec_id,
       CAST(list_sum(list_transform(embedding,
              e -> CAST(round(CAST(e AS DOUBLE) * 1e6) AS BIGINT)
                   * CAST(round(CAST(e AS DOUBLE) * 1e6) AS BIGINT)))
            AS BIGINT) AS sq_norm_e12,
       CAST(list_sum(list_transform(embedding,
              e -> CAST(round(CAST(e AS DOUBLE) * 1e6) AS BIGINT)
                   * CAST(round(CAST(e AS DOUBLE) * 1e6) AS BIGINT)))
            AS BIGINT) = 0 AS is_zero
FROM embeddings
"""

REGISTRY["embedding_norms"] = (q_embedding_norms, EMBEDDING_NORMS_SQL)


def q_walk_counts_from_seed(spark, sf_dir):
    """Number of directed walks of length exactly 3 from vertex 10 to
    every reachable vertex (graph B) — path-multiplicity relatedness
    (the A^k·e_s matrix power), exact integer supersteps."""
    eb = edges_b(spark, sf_dir)
    x = spark.createDataFrame([(10, 1)], "id long, w long")
    for _ in range(3):
        x = (
            eb.join(x.withColumnRenamed("id", "src"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum("w").alias("w"))
        )
    return x.select("id", F.col("w").cast("long").alias("walks3"))


WALK_COUNTS_SQL = f"""
WITH {EDGES_B_SQL},
x0 AS (SELECT CAST(10 AS BIGINT) AS id, CAST(1 AS BIGINT) AS w),
x1 AS (SELECT e.dst AS id, sum(x.w) AS w FROM edges_b e
       JOIN x0 x ON x.id = e.src GROUP BY e.dst),
x2 AS (SELECT e.dst AS id, sum(x.w) AS w FROM edges_b e
       JOIN x1 x ON x.id = e.src GROUP BY e.dst),
x3 AS (SELECT e.dst AS id, sum(x.w) AS w FROM edges_b e
       JOIN x2 x ON x.id = e.src GROUP BY e.dst)
SELECT id, CAST(w AS BIGINT) AS walks3 FROM x3
"""

REGISTRY["walk_counts_from_seed"] = (
    q_walk_counts_from_seed, WALK_COUNTS_SQL)


# ---------------------------------------------------------------------------
# corpus-assembly operators (linkgraph/corpus.py)
# ---------------------------------------------------------------------------


def q_shard_pack(spark, sf_dir):
    """Token-budget training-shard packing: shard_id = floor(running token
    total BEFORE the doc / 2000), docs in doc_id order.  Two-phase
    bounded-state running sum (per-bucket partials + broadcast prefix),
    never a global single-partition window — see corpus.shard_pack."""
    from . import corpus

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return corpus.shard_pack(docs, budget=2000)


def q_pii_scrub_stats(spark, sf_dir):
    """Per-document PII accounting (emails / IPv4s / phone numbers) plus
    the cross-engine content hash of the scrubbed text — the release
    audit step.  Pure column expressions, zero shuffle."""
    from . import corpus

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return corpus.pii_scrub(docs)


def q_stratified_sample(spark, sf_dir):
    """Exactly 10 docs per language by deterministic hash rank — the
    reproducible eval-set draw.  Pre-filter keeps window state at
    O(oversample*k) per stratum, not O(stratum)."""
    from . import corpus

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return corpus.stratified_sample(docs, k=10, seed=7)


def q_domain_mix_weights(spark, sf_dir):
    """Per-source sampling weights reshaping the natural domain mix into
    a deterministic target mix (share ∝ 1 + suffix % 3) — the mixture
    knob of corpus assembly.  One groupBy; output is |sources| rows."""
    from . import corpus

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return corpus.domain_mix_weights(docs)


def _register_corpus() -> None:
    from . import corpus

    REGISTRY["shard_pack"] = (q_shard_pack, corpus.shard_pack_sql(budget=2000))
    REGISTRY["pii_scrub_stats"] = (q_pii_scrub_stats, corpus.pii_scrub_sql())
    REGISTRY["stratified_sample"] = (
        q_stratified_sample, corpus.stratified_sample_sql(k=10, seed=7))
    REGISTRY["domain_mix_weights"] = (
        q_domain_mix_weights, corpus.domain_mix_weights_sql())


_register_corpus()


def q_asof_purchase_view(spark, sf_dir):
    """As-of (point-in-time) join — the operator Spark lacks and DuckDB
    ships natively: each purchase matched to the user's LATEST view at or
    before the purchase ts (inclusive bound, deterministic tie-break; see
    joins.asof_join).  One shuffle on user_id; streaming window frame."""
    from . import joins

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts")
    v = ev.filter(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts")
    j = joins.asof_join(p, v, key="user_id", payload=["event_id"])
    return j.select(
        F.col("event_id").cast("long").alias("event_id"),
        F.col("user_id").cast("long").alias("user_id"),
        F.col("event_id_asof").cast("long").alias("view_event_id"),
        (
            F.unix_micros(F.col("ts").cast("timestamp"))
            - F.unix_micros(F.col("ts_asof").cast("timestamp"))
        ).alias("lag_us"),  # NTZ->TZ cast shifts both sides equally; diff is tz-invariant
    )


def _register_joins() -> None:
    from . import joins

    REGISTRY["asof_purchase_view"] = (
        q_asof_purchase_view, joins.asof_purchase_view_sql())


_register_joins()


def q_interval_session_overlap(spark, sf_dir):
    """Range (interval-overlap) join gate: each purchase's ±15-minute
    attention window joined to the SAME user's gap-sessions it overlaps —
    via joins.interval_join's bucketed equi-join plan (explode to
    30-minute buckets, emit-once on the first shared bucket), never a
    cartesian product.  Output: one row per overlapping (purchase,
    session) pair with the overlap length in seconds."""
    from . import joins

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    flagged = ev.withColumn(
        "new_s", F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    ).withColumn(
        "session_seq",
        F.sum("new_s").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    sessions = flagged.groupBy("user_id", "session_seq").agg(
        F.min(F.unix_timestamp("ts")).alias("s_start"),
        F.max(F.unix_timestamp("ts")).alias("s_end"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id"),
        F.col("user_id"),
        (F.unix_timestamp("ts") - 900).alias("p_start"),
        (F.unix_timestamp("ts") + 900).alias("p_end"),
    )
    j = joins.interval_join(
        purchases, sessions,
        l_start="p_start", l_end="p_end",
        r_start="s_start", r_end="s_end",
        bucket_width=1800, key="user_id",
    )
    return j.select(
        F.col("event_id").cast("long").alias("event_id"),
        F.col("user_id").cast("long").alias("user_id"),
        F.col("session_seq").cast("long").alias("session_seq"),
        (
            F.least("p_end", "s_end") - F.greatest("p_start", "s_start")
        ).cast("long").alias("overlap_s"),
    )


INTERVAL_SESSION_OVERLAP_SQL = """
WITH f AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch(ts - lag(ts) OVER w) > 1800 THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT user_id,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS session_seq,
         ts
  FROM f
),
sess AS (
  -- floor() mirrors Spark unix_timestamp's whole-second truncation
  SELECT user_id, session_seq,
         min(CAST(floor(epoch(ts)) AS BIGINT)) AS s_start,
         max(CAST(floor(epoch(ts)) AS BIGINT)) AS s_end
  FROM s GROUP BY user_id, session_seq
),
p AS (
  SELECT event_id, user_id,
         CAST(floor(epoch(ts)) AS BIGINT) - 900 AS p_start,
         CAST(floor(epoch(ts)) AS BIGINT) + 900 AS p_end
  FROM events WHERE event_type = 'purchase'
)
SELECT CAST(p.event_id AS BIGINT) AS event_id,
       CAST(p.user_id AS BIGINT) AS user_id,
       CAST(sess.session_seq AS BIGINT) AS session_seq,
       CAST(least(p_end, s_end) - greatest(p_start, s_start) AS BIGINT) AS overlap_s
FROM p JOIN sess ON p.user_id = sess.user_id
                AND p.p_start <= sess.s_end AND sess.s_start <= p.p_end
"""

REGISTRY["interval_session_overlap"] = (
    q_interval_session_overlap, INTERVAL_SESSION_OVERLAP_SQL)


def q_chunk_docs(spark, sf_dir):
    """Context-window chunking gate: 128-token windows every 64 tokens
    (overlapping training examples), tail kept, per-window content
    fingerprint.  Zero-shuffle whole-stage-codegen array expressions —
    see corpus.chunk_docs."""
    from . import corpus

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return corpus.chunk_docs(docs, chunk=128, stride=64)


def q_bigram_xent(spark, sf_dir):
    """Bigram-LM cross-entropy quality score per document (add-one
    smoothing, corpus-trained) — see corpus.bigram_xent."""
    from . import corpus

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return corpus.bigram_xent(docs)


def _register_corpus2() -> None:
    from . import corpus

    REGISTRY["chunk_docs"] = (
        q_chunk_docs, corpus.chunk_docs_sql(chunk=128, stride=64))
    REGISTRY["bigram_xent"] = (q_bigram_xent, corpus.bigram_xent_sql())


_register_corpus2()


def q_anchor_text_stats(spark, sf_dir):
    """Anchor-text aggregation — the web-ranking signal: every
    ``<a href>``'s target paired with its (markup-stripped) anchor text,
    counted per (href, anchor) with distinct source pages.  The page
    fixture is synthesized column-wise from `documents` with the same
    formula in both engines (two anchors per page, the second nested in
    <b> to exercise inner-markup stripping).  See ingest.anchor_pairs —
    all JVM-side regexp, one groupBy."""
    from . import ingest

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    d = F.col("doc_id").cast("long")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    exc1 = F.regexp_replace(F.array_join(F.slice(toks, 1, 4), " "), "[<>]", "")
    exc2 = F.regexp_replace(F.array_join(F.slice(toks, 5, 4), " "), "[<>]", "")
    s = lambda c: c.cast("string")  # noqa: E731
    pages = docs.select(
        F.concat(
            F.lit("http://s"), s(d % 50), F.lit(".example/d"), s(d)
        ).alias("src_url"),
        F.concat(
            F.lit('<html><body><div><a href="http://t'), s((d * 7) % 100),
            F.lit(".example/p"), s(d % 10), F.lit('">'), exc1,
            F.lit('</a> filler <a class="x" href="http://t'),
            s((d * 13) % 100), F.lit(".example/q"), s(d % 5),
            F.lit('"><b>'), exc2, F.lit("</b></a></div></body></html>"),
        ).alias("html"),
    )
    pairs = ingest.anchor_pairs(pages, url_col="src_url", html_col="html")
    return pairs.groupBy("href", "anchor").agg(
        F.count("*").cast("long").alias("n"),
        F.countDistinct("src_url").cast("long").alias("n_pages"),
    )


ANCHOR_TEXT_STATS_SQL = r"""
WITH t AS (
  SELECT CAST(doc_id AS BIGINT) AS d,
         regexp_split_to_array(trim(text), '\s+') AS toks
  FROM documents
),
pages AS (
  SELECT 'http://s' || CAST(d % 50 AS VARCHAR) || '.example/d' || CAST(d AS VARCHAR) AS src_url,
         '<html><body><div><a href="http://t' || CAST((d * 7) % 100 AS VARCHAR)
         || '.example/p' || CAST(d % 10 AS VARCHAR) || '">'
         || regexp_replace(array_to_string(list_slice(toks, 1, 4), ' '), '[<>]', '', 'g')
         || '</a> filler <a class="x" href="http://t' || CAST((d * 13) % 100 AS VARCHAR)
         || '.example/q' || CAST(d % 5 AS VARCHAR) || '"><b>'
         || regexp_replace(array_to_string(list_slice(toks, 5, 8), ' '), '[<>]', '', 'g')
         || '</b></a></div></body></html>' AS html
  FROM t
),
e AS (
  SELECT src_url,
         regexp_extract_all(html, '(?is)<a\s[^>]*?href\s*=\s*"([^"<>\s]+)"[^>]*?>(.*?)</a>', 1) AS hs,
         regexp_extract_all(html, '(?is)<a\s[^>]*?href\s*=\s*"([^"<>\s]+)"[^>]*?>(.*?)</a>', 2) AS ts
  FROM pages
),
pairs AS (
  SELECT src_url, u.z[1] AS href,
         trim(regexp_replace(regexp_replace(u.z[2], '<[^>]*>', '', 'g'),
                             '\s+', ' ', 'g')) AS anchor
  FROM e, unnest(list_zip(hs, ts)) AS u(z)
)
SELECT href, anchor,
       CAST(count(*) AS BIGINT) AS n,
       CAST(count(DISTINCT src_url) AS BIGINT) AS n_pages
FROM pairs GROUP BY 1, 2
"""

REGISTRY["anchor_text_stats"] = (q_anchor_text_stats, ANCHOR_TEXT_STATS_SQL)


def q_mixture_materialize(spark, sf_dir):
    """Materialized reweighted corpus (floor(w) copies + hash-exact
    fractional copy per doc; E[copies] = the domain_mix_weights target)
    — see corpus.materialize_mixture."""
    from . import corpus

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return corpus.materialize_mixture(docs, seed=11)


def _register_corpus3() -> None:
    from . import corpus

    REGISTRY["mixture_materialize"] = (
        q_mixture_materialize, corpus.materialize_mixture_sql(seed=11))


_register_corpus3()


def q_redirect_resolution(spark, sf_dir):
    """Redirect-chain canonicalization: every url resolved to its final
    target + hop count via POINTER DOUBLING (log2(depth) self-joins, not
    depth sequential walks) — see ingest.resolve_redirects.  Fixture:
    doc_id redirects to doc_id-1 unless divisible by 16 (chains up to 15
    hops; multiples of 16 are terminal)."""
    from . import ingest

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    d = F.col("doc_id").cast("long")
    r = docs.filter(d % 16 != 0).select(d.alias("src"), (d - 1).alias("dst"))
    resolved = ingest.resolve_redirects(r)
    ids = docs.select(d.alias("url_id"))
    return ids.join(
        resolved, ids["url_id"] == resolved["src"], "left"
    ).select(
        "url_id",
        F.coalesce("final", "url_id").cast("long").alias("final_id"),
        F.coalesce("hops", F.lit(0)).cast("long").alias("hops"),
    )


REDIRECT_RESOLUTION_SQL = """
WITH RECURSIVE r AS (
  SELECT CAST(doc_id AS BIGINT) AS src, CAST(doc_id AS BIGINT) - 1 AS dst
  FROM documents WHERE doc_id % 16 <> 0
),
walk AS (
  SELECT src, dst, CAST(1 AS BIGINT) AS hops FROM r
  UNION ALL
  SELECT w.src, r2.dst, w.hops + 1 FROM walk w JOIN r r2 ON w.dst = r2.src
),
f AS (
  SELECT src, dst AS final, hops FROM walk
  QUALIFY row_number() OVER (PARTITION BY src ORDER BY hops DESC) = 1
)
SELECT CAST(d.doc_id AS BIGINT) AS url_id,
       coalesce(f.final, CAST(d.doc_id AS BIGINT)) AS final_id,
       CAST(coalesce(f.hops, 0) AS BIGINT) AS hops
FROM documents d LEFT JOIN f ON CAST(d.doc_id AS BIGINT) = f.src
"""

REGISTRY["redirect_resolution"] = (q_redirect_resolution, REDIRECT_RESOLUTION_SQL)


def q_boilerplate_flags(spark, sf_dir):
    """CCNet-style cross-document boilerplate accounting: disjoint
    4-token segments, flagged when the same segment fingerprint occurs
    in >= 2 distinct documents — see corpus.boilerplate_flags."""
    from . import corpus

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return corpus.boilerplate_flags(docs, seg=4, min_df=2)


def _register_corpus4() -> None:
    from . import corpus

    REGISTRY["boilerplate_flags"] = (
        q_boilerplate_flags, corpus.boilerplate_flags_sql(seg=4, min_df=2))


_register_corpus4()


def q_link_prediction_pairs(spark, sf_dir):
    """Link-prediction training pairs: every edge (label 1) + 3
    deterministic hash negatives per source (label 0, anti-joined
    against the symmetric edge set) — see graph.link_prediction_pairs."""
    from .graph import link_prediction_pairs

    return link_prediction_pairs(
        edges_a(spark, sf_dir), num_vertices=V_A, k=3, seed=9
    ).select(
        F.col("src").cast("long").alias("src"),
        F.col("dst").cast("long").alias("dst"),
        "label",
    )


_H_NEG = (
    "CAST(('0x' || substr(md5('neg9:' || CAST(src AS VARCHAR) || ':' "
    "|| CAST(u.i AS VARCHAR)), 1, 15)) AS BIGINT)"
)

LINK_PREDICTION_SQL = f"""
WITH {EDGES_A_SQL},
sym AS (
  SELECT src, dst FROM edges_a
  UNION
  SELECT dst AS src, src AS dst FROM edges_a
),
srcs AS (SELECT DISTINCT src FROM edges_a),
cand AS (
  SELECT src, u.i, {_H_NEG} % {V_A} AS dst
  FROM srcs, unnest(range(1, 11)) AS u(i)
),
cd AS (
  SELECT src, dst, min(i) AS i FROM cand WHERE dst <> src GROUP BY src, dst
),
neg AS (
  SELECT c.src, c.dst, c.i FROM cd c
  LEFT JOIN sym s ON c.src = s.src AND c.dst = s.dst
  WHERE s.src IS NULL
  QUALIFY row_number() OVER (PARTITION BY c.src ORDER BY c.i) <= 3
)
SELECT src, dst, CAST(1 AS BIGINT) AS label FROM edges_a
UNION ALL
SELECT src, dst, CAST(0 AS BIGINT) AS label FROM neg
"""

REGISTRY["link_prediction_pairs"] = (q_link_prediction_pairs, LINK_PREDICTION_SQL)


def q_feature_propagation(spark, sf_dir):
    """2-hop GNN feature propagation (neighbor-mean aggregation of the
    symmetric degree, e6-requantized per hop) — see
    graph.feature_propagation."""
    from .graph import feature_propagation

    return feature_propagation(
        edges_a(spark, sf_dir), verts(spark, V_A), hops=2
    ).select(
        "id",
        F.col("x0").cast("long").alias("x0"),
        F.col("x1_e6").cast("long").alias("x1_e6"),
        F.col("x2_e6").cast("long").alias("x2_e6"),
    )


FEATURE_PROPAGATION_SQL = f"""
WITH {EDGES_A_SQL}, {VERTS_A_SQL},
sym AS (
  SELECT src, dst FROM edges_a
  UNION
  SELECT dst AS src, src AS dst FROM edges_a
),
x0 AS (
  SELECT v.id, CAST(coalesce(d.x, 0) AS BIGINT) AS x
  FROM verts_a v LEFT JOIN (
    SELECT src AS id, count(*) AS x FROM sym GROUP BY src
  ) d USING (id)
),
x1 AS (
  SELECT v.id, CAST(coalesce(a.x, 0) AS BIGINT) AS x
  FROM verts_a v LEFT JOIN (
    SELECT s.src AS id, CAST(round(avg(n.x) * 1e6) AS BIGINT) AS x
    FROM sym s JOIN x0 n ON s.dst = n.id GROUP BY s.src
  ) a USING (id)
),
x2 AS (
  SELECT v.id, CAST(coalesce(a.x, 0) AS BIGINT) AS x
  FROM verts_a v LEFT JOIN (
    SELECT s.src AS id, CAST(round(avg(n.x)) AS BIGINT) AS x
    FROM sym s JOIN x1 n ON s.dst = n.id GROUP BY s.src
  ) a USING (id)
)
SELECT x0.id, x0.x AS x0, x1.x AS x1_e6, x2.x AS x2_e6
FROM x0 JOIN x1 USING (id) JOIN x2 USING (id)
"""

REGISTRY["feature_propagation"] = (q_feature_propagation, FEATURE_PROPAGATION_SQL)


def q_quality_filter(spark, sf_dir):
    """Per-language quality-cutoff keep list (exact ceil(80%) per
    stratum by stopword-ratio score; bounded-histogram threshold, no
    full-stratum ranking) — see corpus.quality_filter."""
    from . import corpus

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return corpus.quality_filter(docs, keep_permille=800)


def _register_corpus5() -> None:
    from . import corpus

    REGISTRY["quality_filter"] = (
        q_quality_filter, corpus.quality_filter_sql(keep_permille=800))


_register_corpus5()


def q_url_filter_features(spark, sf_dir):
    """URL structural features + C4-style crawl keep/drop verdict over a
    deterministic varied-url fixture (schemes, tlds, depths, asset
    extensions, query strings from doc ids) — see ingest.url_features.
    Pure regexp column expressions, zero shuffle."""
    from . import ingest

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    d = F.col("doc_id").cast("long")
    s = lambda c: c.cast("string")  # noqa: E731
    url = F.concat(
        F.when(d % 7 == 0, F.lit("ftp")).otherwise(F.lit("https")),
        F.lit("://h"), s(d % 30), F.lit(".example."),
        F.element_at(
            F.array(F.lit("com"), F.lit("org"), F.lit("net"), F.lit("io")),
            (d % 4 + 1).cast("int"),
        ),
        F.repeat(F.lit("/s"), (d % 9).cast("int")),
        F.when(d % 5 == 0, F.lit("/img.jpg"))
        .when(d % 5 == 1, F.lit("/page.html"))
        .otherwise(F.lit("")),
        F.when(d % 6 == 0, F.lit("?a=1&b=2&c=3&d=4&e=5"))
        .when(d % 6 == 3, F.lit("?x=1"))
        .otherwise(F.lit("")),
    )
    urls = docs.select(d.alias("doc_id"), url.alias("url"))
    return ingest.url_features(urls)


URL_FILTER_FEATURES_SQL = r"""
WITH u AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         (CASE WHEN doc_id % 7 = 0 THEN 'ftp' ELSE 'https' END)
         || '://h' || CAST(doc_id % 30 AS VARCHAR) || '.example.'
         || (['com', 'org', 'net', 'io'])[CAST(doc_id % 4 AS INT) + 1]
         || repeat('/s', CAST(doc_id % 9 AS INT))
         || (CASE WHEN doc_id % 5 = 0 THEN '/img.jpg'
                  WHEN doc_id % 5 = 1 THEN '/page.html' ELSE '' END)
         || (CASE WHEN doc_id % 6 = 0 THEN '?a=1&b=2&c=3&d=4&e=5'
                  WHEN doc_id % 6 = 3 THEN '?x=1' ELSE '' END) AS url
  FROM documents
),
f AS (
  SELECT doc_id, url,
         regexp_extract(url, '^([a-z][a-z0-9+.-]*):', 1) AS scheme,
         regexp_extract(url, '^[a-z][a-z0-9+.-]*://([^/?#]+)', 1) AS host,
         regexp_extract(url, '^[a-z][a-z0-9+.-]*://[^/?#]+([^?#]*)', 1) AS path,
         regexp_extract(url, '\?([^#]*)', 1) AS query
  FROM u
),
g AS (
  SELECT doc_id, url, scheme, host,
         regexp_extract(host, '\.([a-z0-9-]+)$', 1) AS tld,
         CAST(len(list_filter(regexp_split_to_array(path, '/'), x -> x <> ''))
              AS BIGINT) AS path_depth,
         regexp_extract(path, '\.([a-z0-9]+)$', 1) AS ext,
         CAST(CASE WHEN query = '' THEN 0
                   ELSE len(regexp_split_to_array(query, '&')) END
              AS BIGINT) AS n_params
  FROM f
)
SELECT doc_id, url, scheme, host, tld, path_depth, ext, n_params,
       CAST(CASE WHEN scheme IN ('http', 'https')
                  AND ext NOT IN ('jpg','jpeg','png','gif','pdf','zip','exe','css','js')
                  AND path_depth <= 6 AND n_params <= 4
             THEN 1 ELSE 0 END AS BIGINT) AS keep
FROM g
"""

REGISTRY["url_filter_features"] = (q_url_filter_features, URL_FILTER_FEATURES_SQL)


def q_nfc_stats(spark, sf_dir):
    """Unicode NFC canonicalization accounting (pre-dedup step) — see
    text.nfc_stats; Python unicodedata (Arrow pandas UDF) vs DuckDB
    utf8proc, byte-identical."""
    from . import text

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return text.nfc_stats(docs)


def _register_text2() -> None:
    from . import text

    REGISTRY["nfc_stats"] = (q_nfc_stats, text.nfc_stats_sql())


_register_text2()


def q_topgram_char_mass(spark, sf_dir):
    """Gopher-style bigram repetition signals (most-common-bigram char
    mass + duplicated-bigram char mass, exact integer numerators) — see
    text.topgram_char_mass.  Explode -> (id,gram) -> id aggregations,
    map-side partial combine on both."""
    from . import text

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return text.topgram_char_mass(docs)


def q_hash_classifier_scores(spark, sf_dir):
    """fastText-style hashed-bag-of-words classifier scoring pass — see
    corpus.hash_classifier_scores.  Pure per-row higher-order fold,
    whole-stage codegen, zero shuffle."""
    from . import corpus

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return corpus.hash_classifier_scores(docs)


def _register_text3() -> None:
    from . import corpus, text

    REGISTRY["topgram_char_mass"] = (
        q_topgram_char_mass, text.topgram_char_mass_sql())
    REGISTRY["hash_classifier_scores"] = (
        q_hash_classifier_scores, corpus.hash_classifier_sql())


_register_text3()


# ---------------------------------------------------------------------------
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
    from .algos import connected_components

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
    from .algos import triangle_count
    from .dedup import h60

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
    from .algos import patterns

    e = edges_dense(spark, sf_dir).persist()
    rows = [(n, patterns.pattern_count(e, patterns.PATTERNS[n]))
            for n in DENSE_PATTERNS]
    e.unpersist()
    return spark.createDataFrame(rows, "pattern string, n long")


def _dense_patterns_sql() -> str:
    from .algos import patterns

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
    from . import dedup

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
    from . import dedup

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
    from .graph import edge_delta

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
    from .dedup import h60

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
    from . import sketch

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return sketch.cms_heavy_hitters(docs, k=20)


def _cms_sql() -> str:
    from . import sketch

    return sketch.cms_heavy_hitters_sql(k=20)


REGISTRY["cms_heavy_hitters"] = (q_cms_heavy_hitters, _cms_sql())


def q_pps_sample(spark, sf_dir):
    """Sequential Poisson (PPS) corpus subsample: 100 documents drawn with
    inclusion odds proportional to token count — the unequal-probability
    sampler behind size-weighted corpus mixing.  Priority = h60(id) div
    weight (BIGINT-exact), selection is a global top-n, never a full
    sort."""
    from . import corpus, sketch

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return sketch.pps_sample(docs, n=100,
                             weight=corpus.n_tokens(F.col("text")))


def _pps_sql() -> str:
    from . import corpus, sketch

    return sketch.pps_sample_sql(n=100, weight_sql=corpus.N_TOKENS_SQL)


REGISTRY["pps_weighted_sample"] = (q_pps_sample, _pps_sql())


def q_dup_span_stats(spark, sf_dir):
    """Per-document duplicated 8-token-span mass — the exact-substring
    dedup signal (Lee et al., ACL'22) as one explode + one keyed agg;
    grams shuffle as 60-bit hashes, never strings."""
    from . import dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return dedup.dup_span_stats(docs, k=8)


def _dup_span_sql() -> str:
    from . import dedup

    return dedup.dup_span_stats_sql(k=8)


REGISTRY["dup_span_stats"] = (q_dup_span_stats, _dup_span_sql())


def q_dup_span_removal(spark, sf_dir):
    """Exact-substring span REMOVAL (Lee et al. ACL'22 production step):
    drop every duplicated 8-token span except its corpus-wide first
    occurrence; per-doc (n_tokens, n_removed, kept_fp) proves the
    byte-level output (see dedup.remove_dup_spans)."""
    from . import dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return dedup.remove_dup_spans(docs, k=8)


def _dup_span_removal_sql() -> str:
    from . import dedup

    return dedup.remove_dup_spans_sql(k=8)


REGISTRY["dup_span_removal"] = (q_dup_span_removal, _dup_span_removal_sql())


def q_neighbor_sample(spark, sf_dir):
    """GraphSAGE-style deterministic k=5 neighbor fan-out over the
    undirected orders graph — the GNN minibatch sampling primitive;
    per-vertex work bounded by degree (hub skew = the PageRank salting
    problem, handled the same way at scale)."""
    from .graph import neighbor_sample

    return neighbor_sample(edges_b(spark, sf_dir), k=5, directed=False)


def _neighbor_sample_sql() -> str:
    from .graph import neighbor_sample_sql

    return (f"WITH {EDGES_B_SQL}, {UND_B_SQL}\n"
            + neighbor_sample_sql(5, edges_cte="und_b"))


REGISTRY["neighbor_sample_k5"] = (q_neighbor_sample, _neighbor_sample_sql())


def q_stream_cms(spark, sf_dir):
    """Count-min sketch AS streaming state: D x W = 512 rows of running
    (d, bucket) counts over the event stream — bounded state for an
    unbounded user-id domain; bucket sums are associative so the drained
    sketch equals the batch build exactly."""
    from . import streaming

    return streaming.stream_cms_user_counts(
        spark, f"{sf_dir}/events.parquet", sink_table="q_stream_cms"
    )


def _stream_cms_sql() -> str:
    from .dedup import h60_sql
    from .sketch import CMS_DEPTH, CMS_WIDTH

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
    from . import dedup, sketch

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
    from . import dedup
    from .sketch import BLOOM_BITS, BLOOM_K, BLOOM_WORD_BITS

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
    from .graph import neighbor_sample

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
    from .graph import neighbor_sample_sql

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
    from . import sketch
    from .dedup import h60

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
    from .sketch import kmv_sql

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
    from . import streaming

    out = streaming.stream_bucket_min_distinct(
        spark, f"{sf_dir}/events.parquet", buckets=16,
        sink_table="suite_stream_bmin",
    )
    return out.select(
        F.col("bucket").cast("long").alias("bucket"),
        F.col("minh").cast("long").alias("minh"),
    )


def _stream_bmin_sql() -> str:
    from .dedup import h60_sql

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
    from .corpus import bpe_train

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return bpe_train(docs)


def _bpe_train_sql() -> str:
    from .corpus import bpe_train_sql

    return bpe_train_sql()


REGISTRY["bpe_train_merges"] = (q_bpe_train, _bpe_train_sql())


def q_bpe_encode(spark, sf_dir):
    """Tokenizer application: train the 6-rule BPE merge table, then
    encode the corpus with it (corpus.bpe_encode — vocab-bounded pandas
    UDF over distinct words, frequency-weighted token stats).  The twin
    replays the same training rounds in SQL and aggregates the final
    symbol table, so a hash match proves the iterative Python encoder
    reproduces the window-based merge semantics end to end."""
    from .corpus import bpe_encode, bpe_train

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rules_df = bpe_train(docs)
    rules = [(r["lsym"], r["rsym"])
             for r in rules_df.orderBy("round").collect()]
    return bpe_encode(docs, rules)


def _bpe_encode_sql() -> str:
    from .corpus import bpe_encode_sql

    return bpe_encode_sql()


REGISTRY["bpe_encode_stats"] = (q_bpe_encode, _bpe_encode_sql())


def q_gnn_training_batch(spark, sf_dir):
    """GNN training-minibatch assembly: sampled 2-hop neighborhoods
    (fan-out k=5 from seeds id % 50 == 0) joined with 2-hop propagated
    features, flattened to the padded (1 + k + k^2)-slot tensor rows a
    trainer consumes (graph.gnn_training_batch)."""
    from .graph import feature_propagation, gnn_training_batch

    e = edges_b(spark, sf_dir)
    v = verts(spark, V_B)
    feats = feature_propagation(e, v, hops=2)
    seeds = v.filter(F.col("id") % 50 == 0)
    return gnn_training_batch(e, seeds, feats, k=5)


def _gnn_batch_sql(k: int = 5) -> str:
    from .graph import neighbor_sample_sql

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
# round 4: embedding-training data ops — skip-gram pairs from walks,
# GloVe co-occurrence counts, word2vec negative-sampling table
# ---------------------------------------------------------------------------


def q_skipgram_pairs(spark, sf_dir):
    """Skip-gram (center, context) pair counts from the deterministic
    hash-walk corpus (20 walks × length 8, window 2) — DeepWalk training
    data over graph B."""
    from .algos.paths import random_walks, skipgram_pairs

    walks = random_walks(
        edges_b(spark, sf_dir),
        starts=spark.createDataFrame([(i,) for i in range(20)], "id long"),
        length=8, directed=False, partitions=8,
    )
    return skipgram_pairs(walks, window=2)


SKIPGRAM_SQL = (
    "WITH walks AS (\n" + _random_walks_sql(20, 8) + "\n)\n"
    + """
SELECT CAST(a.v AS BIGINT) AS center, CAST(b.v AS BIGINT) AS context,
       CAST(count(*) AS BIGINT) AS cnt
FROM walks a JOIN walks b
  ON a.walk_id = b.walk_id
 AND a.step <> b.step AND abs(a.step - b.step) <= 2
GROUP BY 1, 2
"""
)

REGISTRY["skipgram_pairs"] = (q_skipgram_pairs, SKIPGRAM_SQL)


def q_cooccurrence_counts(spark, sf_dir):
    """GloVe-style windowed co-occurrence matrix (window 4, 1/d weights,
    e6-quantized exact BIGINT sums, min_count 3) over the documents
    corpus — the X_ij an embedding trainer consumes."""
    from . import text

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return text.cooccurrence_counts(d, window=4, min_count=3)


REGISTRY["cooccurrence_counts"] = (
    q_cooccurrence_counts, _text.cooccurrence_sql(window=4, min_count=3)
)


def q_negsample_table(spark, sf_dir):
    """word2vec unigram^0.75 negative-sampling table with exact cumulative
    BIGINT ranges (two-phase bounded-state prefix sum; sqrt∘sqrt for a
    bit-identical cross-engine power)."""
    from . import text

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return text.negsample_table(d, min_count=5)


REGISTRY["negsample_table"] = (q_negsample_table, _text.negsample_sql(min_count=5))


def q_bm25_top20(spark, sf_dir):
    """Top-20 documents by BM25 (k1=1.2, b=0.75) for the fixed query
    {spark, join, merge} — retrieval-scored topical subset mining with
    exact per-term e6-quantized integer score sums."""
    from . import text

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return text.bm25_topk(d, ["spark", "join", "merge"], k=20)


REGISTRY["bm25_top20"] = (
    q_bm25_top20, _text.bm25_sql(["spark", "join", "merge"], k=20)
)


def q_vocab_growth(spark, sf_dir):
    """Heaps-law vocabulary-growth curve: cumulative distinct-token count
    per corpus decile (ascending doc_id; two-phase distributed rank, one
    tokenization pass)."""
    from . import text

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return text.vocab_growth(d, deciles=10)


REGISTRY["vocab_growth"] = (q_vocab_growth, _text.vocab_growth_sql(deciles=10))


# ---------------------------------------------------------------------------
# round-4c extensions: incremental index probe, graphlet orbits, URL tree
# ---------------------------------------------------------------------------


def q_minhash_index_probe(spark, sf_dir):
    """Incremental crawl dedup: probe the NEW batch (doc_id % 5 == 0)
    against the existing corpus INDEX (the rest) — one-sided banded
    MinHash join + exact-Jaccard verify, per-new-doc best match and a
    keep verdict; the index is never self-joined."""
    from . import dedup

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return dedup.minhash_index_probe(
        d.filter(F.col("doc_id") % 5 != 0),
        d.filter(F.col("doc_id") % 5 == 0),
        jaccard_threshold=0.35,
    )


from . import dedup as _dedup  # noqa: E402

REGISTRY["minhash_index_probe"] = (
    q_minhash_index_probe,
    _dedup.minhash_index_probe_sql(jaccard_threshold=0.35),
)


def q_graphlet_orbits(spark, sf_dir):
    """Per-vertex 3-node graphlet orbit counts (GDV-3: degree / induced
    2-path end / 2-path center / triangle) over derived graph A — the
    role-mining feature vector, from closed forms over degree,
    neighbor-degree sums and per-vertex triangle participation."""
    from .algos.motifs import graphlet_orbits

    return graphlet_orbits(edges_a(spark, sf_dir), vertices=verts(spark, V_A))


GRAPHLET_ORBITS_SQL = f"""
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
deg AS (SELECT src AS id, count(*) AS deg FROM und_a GROUP BY src),
nd AS (
  SELECT u.src AS id, sum(d.deg - 1) AS nd1
  FROM und_a u JOIN deg d ON d.id = u.dst GROUP BY u.src
)
SELECT v.id,
       CAST(coalesce(d.deg, 0) AS BIGINT) AS o0_degree,
       CAST(coalesce(n.nd1, 0) - 2 * coalesce(t.triangles, 0) AS BIGINT)
         AS o1_path_end,
       CAST(CAST(coalesce(d.deg, 0) * (coalesce(d.deg, 0) - 1) / 2 AS BIGINT)
            - coalesce(t.triangles, 0) AS BIGINT) AS o2_path_center,
       CAST(coalesce(t.triangles, 0) AS BIGINT) AS o3_triangle
FROM verts_a v
LEFT JOIN deg d ON d.id = v.id
LEFT JOIN nd n ON n.id = v.id
LEFT JOIN tv t ON t.id = v.id
"""

REGISTRY["graphlet_orbits"] = (q_graphlet_orbits, GRAPHLET_ORBITS_SQL)


def q_url_path_rollup(spark, sf_dir):
    """Sitemap-structure URL-tree rollup: page counts per (host, depth,
    path-prefix) for depths 1-2 over deterministic urls synthesized from
    graph-A vertices — the path-level refinement of host_graph_rollup."""
    from .ingest import path_prefix_rollup

    ids = edges_a(spark, sf_dir).select(F.col("src").alias("id")).distinct()
    pages = ids.select(
        F.concat(
            F.lit("https://host"), (F.col("id") % 40).cast("string"),
            F.lit(".example/sec"), (F.col("id") % 7).cast("string"),
            F.lit("/p"), F.col("id").cast("string"),
        ).alias("url")
    )
    return path_prefix_rollup(pages, max_depth=2)


URL_PATH_ROLLUP_SQL = f"""
WITH {EDGES_A_SQL},
ids AS (SELECT DISTINCT src AS id FROM edges_a),
pages AS (
  SELECT 'https://host' || CAST(id % 40 AS VARCHAR) || '.example/sec'
           || CAST(id % 7 AS VARCHAR) || '/p' || CAST(id AS VARCHAR) AS url
  FROM ids),
parts AS (
  SELECT regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/]+)', 1) AS host,
         list_filter(string_split(regexp_extract(url,
           '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]+(/.*)?$', 1), '/'),
           s -> s <> '') AS segs
  FROM pages),
lv AS (
  SELECT host, d AS depth,
         '/' || array_to_string(list_slice(segs, 1, d), '/') AS prefix
  FROM parts, unnest([1, 2]) AS t(d)
  WHERE len(segs) >= d)
SELECT host, CAST(depth AS BIGINT) AS depth, prefix,
       CAST(count(*) AS BIGINT) AS n_pages
FROM lv GROUP BY 1, 2, 3
"""

REGISTRY["url_path_rollup"] = (q_url_path_rollup, URL_PATH_ROLLUP_SQL)


def q_truss_numbers(spark, sf_dir):
    """Full truss decomposition of derived graph B: max k per edge such
    that the edge survives in the k-truss — edge-h-index fixpoint
    iteration (one static triangle-edge incidence table, one join +
    windowed h-index per round), the edge-level sibling of
    core_numbers."""
    from .algos.ktruss import truss_numbers

    out, _ = truss_numbers(edges_b(spark, sf_dir), partitions=8)
    return out.select("a", "b", F.col("trussness").cast("long").alias("trussness"))


def _truss_numbers_sql(rounds: int) -> str:
    # Round budget validated empirically against the engine's measured
    # fixpoint round count on the fixtures (test_round4c.py asserts the
    # engine converges within this unroll at sf0.001/sf0.01).
    parts = [
        EDGES_B_SQL, OE_B_SQL,
        """tri AS MATERIALIZED (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM oe_b e1
  JOIN oe_b e2 ON e1.a = e2.a AND e1.b < e2.b
  JOIN oe_b e3 ON e3.a = e1.b AND e3.b = e2.b)""",
        """inc AS MATERIALIZED (
  SELECT x AS ea, y AS eb, x AS o1a, z AS o1b, y AS o2a, z AS o2b FROM tri
  UNION ALL
  SELECT x AS ea, z AS eb, x AS o1a, y AS o1b, y AS o2a, z AS o2b FROM tri
  UNION ALL
  SELECT y AS ea, z AS eb, x AS o1a, y AS o1b, x AS o2a, z AS o2b FROM tri)""",
        """t0 AS MATERIALIZED (
  SELECT e.a, e.b, CAST(coalesce(s.c, 0) AS BIGINT) AS t
  FROM oe_b e LEFT JOIN (
    SELECT ea, eb, count(*) AS c FROM inc GROUP BY ea, eb) s
  ON s.ea = e.a AND s.eb = e.b)""",
    ]
    for i in range(1, rounds + 1):
        parts.append(f"""v{i} AS (
  SELECT i.ea, i.eb, least(t1.t, t2.t) AS v,
         row_number() OVER (PARTITION BY i.ea, i.eb
                            ORDER BY least(t1.t, t2.t) DESC) AS rn
  FROM inc i
  JOIN t{i - 1} t1 ON t1.a = i.o1a AND t1.b = i.o1b
  JOIN t{i - 1} t2 ON t2.a = i.o2a AND t2.b = i.o2b)""")
        parts.append(f"""h{i} AS (
  SELECT ea, eb, max(CASE WHEN v >= rn THEN rn ELSE 0 END) AS h
  FROM v{i} GROUP BY ea, eb)""")
        parts.append(f"""t{i} AS MATERIALIZED (
  SELECT e.a, e.b, CAST(coalesce(h.h, 0) AS BIGINT) AS t
  FROM t{i - 1} e LEFT JOIN h{i} h ON h.ea = e.a AND h.eb = e.b)""")
    return (
        "WITH " + ",\n".join(parts)
        + f"\nSELECT a, b, CAST(t + 2 AS BIGINT) AS trussness FROM t{rounds}"
    )


TRUSS_NUMBERS_SQL = _truss_numbers_sql(16)

REGISTRY["truss_numbers"] = (q_truss_numbers, TRUSS_NUMBERS_SQL)


# ---------------------------------------------------------------------------
# node2vec second-order biased walks (round 4)
# ---------------------------------------------------------------------------

N2V_STARTS, N2V_LEN = 15, 6


def q_node2vec_walks(spark, sf_dir):
    """Deterministic node2vec SECOND-ORDER walk corpus: 15 walks of length
    6 over the undirected derived graph, step weights (return=1, dist-1=2,
    dist-2=4) picked by cumulative-weight hash over the dst-sorted
    neighbor list — bit-reproducible in any engine (Grover & Leskovec
    KDD'16 semantics with integer weights; the reference's seeded
    estimator-sampling analogue, /root/reference/src/ZGraphInstance.cpp:300)."""
    from .algos.paths import node2vec_walks

    walks = node2vec_walks(
        edges_b(spark, sf_dir),
        starts=spark.createDataFrame([(i,) for i in range(N2V_STARTS)], "id long"),
        length=N2V_LEN, directed=False, partitions=8,
    )
    return walks.select(
        F.col("walk_id").cast("long").alias("walk_id"),
        F.col("step").cast("long").alias("step"),
        F.col("v").cast("long").alias("v"),
    )


def _node2vec_sql(n_starts: int, length: int) -> str:
    from .algos.paths import (
        N2V_BFS_W, N2V_DFS_W, N2V_RET_W, WALK_A, WALK_B, WALK_C, WALK_D,
    )

    parts = [
        EDGES_B_SQL, UND_B_SQL,
        f"""w0 AS MATERIALIZED (
             SELECT CAST(range AS BIGINT) AS walk_id,
                    CAST(range AS BIGINT) AS prev,
                    CAST(range AS BIGINT) AS v
             FROM range({n_starts}))""",
    ]
    for s in range(1, length + 1):
        p = f"w{s - 1}"
        parts.append(
            f"""cand{s} AS MATERIALIZED (
                 SELECT w.walk_id, w.prev, w.v, a.dst,
                        CAST(CASE WHEN a.dst = w.prev THEN {N2V_RET_W}
                                  WHEN nb.src IS NOT NULL THEN {N2V_BFS_W}
                                  ELSE {N2V_DFS_W} END AS BIGINT) AS wt
                 FROM {p} w
                 JOIN und_b a ON a.src = w.v
                 LEFT JOIN und_b nb ON nb.src = w.prev AND nb.dst = a.dst)"""
        )
        parts.append(
            f"""w{s} AS MATERIALIZED (
                 SELECT walk_id, v AS prev, dst AS v FROM (
                   SELECT walk_id, prev, v, dst, wt,
                          sum(wt) OVER (PARTITION BY walk_id
                                        ORDER BY dst) AS cum,
                          sum(wt) OVER (PARTITION BY walk_id) AS tot
                   FROM cand{s}
                 ) x
                 WHERE (walk_id * {WALK_A} + v * {WALK_B} + {s} * {WALK_C}
                        + prev * {WALK_D}) % tot
                       BETWEEN cum - wt AND cum - 1)"""
        )
    union = "\nUNION ALL\n".join(
        f"SELECT walk_id, {s} AS step, v FROM w{s}" for s in range(length + 1)
    )
    return (
        "WITH " + ",\n".join(parts)
        + f"\nSELECT CAST(walk_id AS BIGINT) AS walk_id,"
          f" CAST(step AS BIGINT) AS step, CAST(v AS BIGINT) AS v"
          f" FROM ({union}) t"
    )


NODE2VEC_SQL = _node2vec_sql(N2V_STARTS, N2V_LEN)

REGISTRY["node2vec_walks"] = (q_node2vec_walks, NODE2VEC_SQL)


# ---------------------------------------------------------------------------
# temporal triangles (round 4)
# ---------------------------------------------------------------------------

TEMPORAL_WINDOW_DAYS = 45


def edges_t(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal edge table: edges_b endpoints with the earliest order date
    (epoch day) per unordered pair, plus a strictly-unique composite event
    key ``ek = day*V_B² + a*V_B + b`` giving a deterministic total order
    on edge events in any engine."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    s = (F.col("o_orderkey").cast("long") * 13 + 7) % V_B
    d = (F.col("o_custkey").cast("long") * 17 + 5) % V_B
    day = F.datediff(
        F.col("o_orderdate").cast("date"), F.to_date(F.lit("1970-01-01"))
    ).cast("long")
    return (
        o.filter(F.col("o_orderkey") % 10 < 2)
        .select(s.alias("s"), d.alias("d"), day.alias("day"))
        .filter(F.col("s") != F.col("d"))
        .select(
            F.least("s", "d").alias("a"),
            F.greatest("s", "d").alias("b"),
            F.col("day"),
        )
        .groupBy("a", "b")
        .agg(F.min("day").alias("day"))
        .select(
            "a", "b", "day",
            (F.col("day") * V_B * V_B + F.col("a") * V_B + F.col("b"))
            .alias("ek"),
        )
    )


EDGES_T_SQL = f"""
edges_t AS (
  SELECT a, b, day, day * {V_B * V_B} + a * {V_B} + b AS ek FROM (
    SELECT least(s, d) AS a, greatest(s, d) AS b, min(day) AS day FROM (
      SELECT CAST((o_orderkey * 13 + 7) % {V_B} AS BIGINT) AS s,
             CAST((o_custkey * 17 + 5) % {V_B} AS BIGINT) AS d,
             CAST(date_diff('day', DATE '1970-01-01',
                            CAST(o_orderdate AS DATE)) AS BIGINT) AS day
      FROM orders WHERE o_orderkey % 10 < 2
    ) raw WHERE s <> d GROUP BY 1, 2
  ) e
)"""


def q_temporal_triangle_count(spark, sf_dir):
    """Temporal triangle count (Paranjape–Benson–Leskovec WSDM'17 motif
    M_triangle): edge events e1 < e2 < e3 under the strict ek order forming
    a closed u→v→w→u walk with day(e3) − day(e1) ≤ 45.  Three shuffle-hash
    equi-joins on shared vertices with the time predicates applied on top
    — each temporal triangle has exactly one time-ordered path orientation,
    so the count is exact with no automorphism division."""
    t = edges_t(spark, sf_dir)
    und = t.select("a", "b", "day", "ek").union(
        t.select(
            F.col("b").alias("a"), F.col("a").alias("b"), "day", "ek"
        )
    )
    e1 = und.select(
        F.col("a").alias("u"), F.col("b").alias("v"),
        F.col("day").alias("d1"), F.col("ek").alias("k1"),
    )
    e2 = und.select(
        F.col("a").alias("v"), F.col("b").alias("w"),
        F.col("day").alias("d2"), F.col("ek").alias("k2"),
    )
    e3 = und.select(
        F.col("a").alias("w"), F.col("b").alias("u"),
        F.col("day").alias("d3"), F.col("ek").alias("k3"),
    )
    n = (
        e1.join(e2.hint("shuffle_hash"), "v")
        .filter((F.col("k2") > F.col("k1")) & (F.col("w") != F.col("u")))
        .join(e3.hint("shuffle_hash"), ["w", "u"])
        .filter(
            (F.col("k3") > F.col("k2"))
            & (F.col("d3") - F.col("d1") <= TEMPORAL_WINDOW_DAYS)
        )
        .count()
    )
    return _scalar_df(spark, "temporal_triangles", n)


TEMPORAL_TRIANGLE_SQL = f"""
WITH {EDGES_T_SQL},
und_t AS (
  SELECT a, b, day, ek FROM edges_t
  UNION ALL
  SELECT b AS a, a AS b, day, ek FROM edges_t
)
SELECT CAST(count(*) AS BIGINT) AS temporal_triangles
FROM und_t e1
JOIN und_t e2 ON e2.a = e1.b AND e2.ek > e1.ek AND e2.b <> e1.a
JOIN und_t e3 ON e3.a = e2.b AND e3.b = e1.a AND e3.ek > e2.ek
             AND e3.day - e1.day <= {TEMPORAL_WINDOW_DAYS}
"""

REGISTRY["temporal_triangle_count"] = (
    q_temporal_triangle_count, TEMPORAL_TRIANGLE_SQL)


# ---------------------------------------------------------------------------
# context-window sequence packing (round 4)
# ---------------------------------------------------------------------------


def q_context_pack(spark, sf_dir):
    """Next-fit whole-document packing into 256-token context windows,
    8 parallel pack groups — the sequence-packing step producing LLM
    training rows (docs never split; contrast shard_pack's running-total
    shards).  Sequential fold per group inside one applyInPandas task;
    groups are the parallel unit — see corpus.context_pack."""
    from . import corpus

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return corpus.context_pack(docs, capacity=256, n_groups=8)


def _register_round4d() -> None:
    from . import corpus

    REGISTRY["context_pack"] = (
        q_context_pack, corpus.context_pack_sql(capacity=256, n_groups=8))


_register_round4d()


def q_stream_sliding(spark, sf_dir):
    """Sliding-window streaming counts (1h window / 15m slide, watermarked,
    availableNow drain) — each event lands in exactly 4 overlapping
    windows; the closed-form batch twin needs only a 4-row range join.
    See streaming.stream_sliding_counts."""
    from . import streaming

    return streaming.stream_sliding_counts(
        spark, f"{sf_dir}/events.parquet", sink_table="q_stream_sliding"
    )


STREAM_SLIDING_SQL = """
SELECT make_timestamp((CAST(floor(epoch(ts) / 900) AS BIGINT) - k) * 900
                      * 1000000) AS win_start,
       event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(round(sum(value) * 1e4) AS BIGINT) AS sum_value_e4
FROM events, range(4) r(k)
GROUP BY 1, 2
"""

REGISTRY["stream_sliding_counts"] = (q_stream_sliding, STREAM_SLIDING_SQL)


# ---------------------------------------------------------------------------
# hub-removal robustness curve (round 4)
# ---------------------------------------------------------------------------

ROBUSTNESS_KS = (0, 5, 25)


def q_robustness_curve(spark, sf_dir):
    """Attack-tolerance curve (Albert–Jeong–Barabási Nature'00): remove the
    top-k undirected-degree hubs (ties → min id, the deterministic
    TakeOrdered rule) for k ∈ {0, 5, 25} and report the surviving largest
    connected-component size and component count.  Hub selection is
    sort+limit (TakeOrdered — never a global row_number window); the
    filtered edge set anti-joins the k-row hub list (broadcast at any
    scale); components reuse the engine's min-label CC."""
    from .algos import connected_components

    eb = edges_b(spark, sf_dir)
    und = eb.select("src", "dst").union(
        eb.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    deg = und.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    rows = []
    for k in ROBUSTNESS_KS:
        if k == 0:
            hubs = spark.createDataFrame([], "id long")
        else:
            hubs = (
                deg.orderBy(F.desc("deg"), F.asc("id")).limit(k).select("id")
            )
        vs = verts(spark, V_B).join(F.broadcast(hubs), "id", "left_anti")
        fe = (
            eb.join(
                F.broadcast(hubs.select(F.col("id").alias("src"))), "src",
                "left_anti",
            )
            .join(
                F.broadcast(hubs.select(F.col("id").alias("dst"))), "dst",
                "left_anti",
            )
        )
        labels, _ = connected_components(fe, vertices=vs, partitions=8)
        sizes = labels.groupBy("component").agg(F.count(F.lit(1)).alias("n"))
        agg = sizes.agg(
            F.max("n").cast("long").alias("largest_cc"),
            F.count(F.lit(1)).cast("long").alias("n_components"),
        ).collect()[0]
        rows.append((k, int(agg["largest_cc"]), int(agg["n_components"])))
    return spark.createDataFrame(
        rows, "k long, largest_cc long, n_components long"
    )


def _robustness_sql() -> str:
    parts = [EDGES_B_SQL, VERTS_B_SQL, UND_B_SQL,
             """degs AS (SELECT src AS id, count(*) AS deg
                 FROM und_b GROUP BY src)"""]
    selects = []
    for k in ROBUSTNESS_KS:
        parts.append(
            f"""hubs{k} AS (SELECT id FROM degs
                 ORDER BY deg DESC, id ASC LIMIT {k})"""
        )
        parts.append(
            f"""v{k} AS (SELECT id FROM verts_b
                 WHERE id NOT IN (SELECT id FROM hubs{k}))"""
        )
        parts.append(
            f"""e{k} AS (SELECT src, dst FROM und_b
                 WHERE src NOT IN (SELECT id FROM hubs{k})
                   AND dst NOT IN (SELECT id FROM hubs{k}))"""
        )
        parts.append(
            f"""reach{k}(id, comp) AS (
                 SELECT id, id FROM v{k}
                 UNION
                 SELECT e.dst, r.comp FROM reach{k} r
                 JOIN e{k} e ON e.src = r.id)"""
        )
        parts.append(
            f"""lab{k} AS (SELECT id, min(comp) AS comp
                 FROM reach{k} GROUP BY id)"""
        )
        selects.append(
            f"""SELECT CAST({k} AS BIGINT) AS k,
                 CAST(max(n) AS BIGINT) AS largest_cc,
                 CAST(count(*) AS BIGINT) AS n_components
               FROM (SELECT comp, count(*) AS n FROM lab{k} GROUP BY comp) s{k}"""
        )
    return (
        "WITH RECURSIVE " + ",\n".join(parts)
        + "\n" + "\nUNION ALL\n".join(selects)
    )


ROBUSTNESS_SQL = _robustness_sql()

REGISTRY["robustness_curve"] = (q_robustness_curve, ROBUSTNESS_SQL)


# ---------------------------------------------------------------------------
# cross-source duplication matrix (round 4)
# ---------------------------------------------------------------------------


def q_cross_source_dup_matrix(spark, sf_dir):
    """Contamination-between-sources report: the verified MinHash near-dup
    pairs (same family/params as `minhash_lsh_dedup`) rolled up by the
    (source of id_a, source of id_b) pair — the per-source-pair duplicate
    mass a corpus owner reads before deciding which source to drop.
    Output: (source_a, source_b, n_pairs, sum_jaccard_e6); pair
    orientation follows id_a < id_b (deterministic, documented)."""
    from .dedup import minhash_lsh_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = minhash_lsh_pairs(docs)
    src = docs.select(F.col("doc_id"), F.col("source"))
    return (
        pairs.join(
            F.broadcast(src.select(F.col("doc_id").alias("id_a"),
                                   F.col("source").alias("source_a"))),
            "id_a",
        )
        .join(
            F.broadcast(src.select(F.col("doc_id").alias("id_b"),
                                   F.col("source").alias("source_b"))),
            "id_b",
        )
        .groupBy("source_a", "source_b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum("jaccard_e6").cast("long").alias("sum_jaccard_e6"),
        )
    )


def _cross_source_sql() -> str:
    from .dedup import minhash_lsh_pairs_sql

    inner = minhash_lsh_pairs_sql()
    return f"""
WITH pairs AS ({inner})
SELECT da.source AS source_a, db.source AS source_b,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(sum(p.jaccard_e6) AS BIGINT) AS sum_jaccard_e6
FROM pairs p
JOIN documents da ON da.doc_id = p.id_a
JOIN documents db ON db.doc_id = p.id_b
GROUP BY 1, 2
"""


REGISTRY["cross_source_dup_matrix"] = (
    q_cross_source_dup_matrix, _cross_source_sql())


def _register_clf() -> None:
    from . import corpus

    def q_train_quality_classifier(spark, sf_dir):
        """Distributed hard-sigmoid logistic training — 5 full-batch GD
        iterations, each ONE map-side-combinable aggregation; weights are
        BIGINT-exact (see corpus.train_quality_classifier)."""
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        return corpus.train_quality_classifier(docs, iters=5)

    REGISTRY["train_quality_classifier"] = (
        q_train_quality_classifier,
        corpus.train_quality_classifier_sql(iters=5),
    )


_register_clf()


# ---------------------------------------------------------------------------
# categorical (language) assortativity (round 4)
# ---------------------------------------------------------------------------


def q_lang_assortativity(spark, sf_dir):
    """Newman (PRE'03 §II) categorical mixing over the undirected derived
    graph with vertex language lifted from the documents table
    (lang(v) = lang of doc v mod |documents| — the deterministic
    attribute fixture).  Output is EXACT integers — (same_lang_edges,
    total_edges, sum_out_in) with Σ_i out_i·in_i over the directed und
    edge classes — so the assortativity coefficient
    r = (trace·M − Σab) / (M² − Σab) is reproducible with no float
    rounding to disagree on.  One broadcast attribute join per endpoint
    + two map-side-combinable aggregations."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_docs = docs.count()
    lang = docs.select(F.col("doc_id"), F.col("lang"))
    eb = edges_b(spark, sf_dir)
    und = eb.union(
        eb.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    e = (
        und.join(
            F.broadcast(lang.select(F.col("doc_id").alias("sk"),
                                    F.col("lang").alias("lang_s"))),
            (F.col("src") % n_docs) == F.col("sk"),
        )
        .join(
            F.broadcast(lang.select(F.col("doc_id").alias("dk"),
                                    F.col("lang").alias("lang_d"))),
            (F.col("dst") % n_docs) == F.col("dk"),
        )
        .select("lang_s", "lang_d")
        .persist()
    )
    m = e.count()
    trace = e.filter(F.col("lang_s") == F.col("lang_d")).count()
    cls = e.groupBy("lang_s", "lang_d").agg(F.count(F.lit(1)).alias("n"))
    outs = cls.groupBy(F.col("lang_s").alias("l")).agg(
        F.sum("n").alias("o"))
    ins = cls.groupBy(F.col("lang_d").alias("l")).agg(
        F.sum("n").alias("i"))
    ab = (
        outs.join(ins, "l", "full")
        .select(
            (F.coalesce("o", F.lit(0)) * F.coalesce("i", F.lit(0))).alias("p")
        )
        .agg(F.sum("p").alias("s"))
        .collect()[0]["s"]
    )
    e.unpersist()
    return spark.createDataFrame(
        [(int(trace), int(m), int(ab))],
        "same_lang_edges long, total_edges long, sum_out_in long",
    )


LANG_ASSORT_SQL = f"""
WITH {EDGES_B_SQL}, {UND_B_SQL},
nd AS (SELECT count(*) AS c FROM documents),
e AS (
  SELECT ds.lang AS lang_s, dd.lang AS lang_d
  FROM und_b u CROSS JOIN nd
  JOIN documents ds ON ds.doc_id = u.src % nd.c
  JOIN documents dd ON dd.doc_id = u.dst % nd.c
),
cls AS (SELECT lang_s, lang_d, count(*) AS n FROM e GROUP BY 1, 2),
outs AS (SELECT lang_s AS l, sum(n) AS o FROM cls GROUP BY 1),
ins AS (SELECT lang_d AS l, sum(n) AS i FROM cls GROUP BY 1)
SELECT
  (SELECT count(*) FROM e WHERE lang_s = lang_d) AS same_lang_edges,
  (SELECT count(*) FROM e) AS total_edges,
  (SELECT CAST(sum(coalesce(o, 0) * coalesce(i, 0)) AS BIGINT)
   FROM outs FULL JOIN ins USING (l)) AS sum_out_in
"""

REGISTRY["lang_assortativity"] = (q_lang_assortativity, LANG_ASSORT_SQL)


# ---------------------------------------------------------------------------
# approximate PPR by synchronized forward push (round 4)
# ---------------------------------------------------------------------------

PPR_PUSH_ROUNDS, PPR_PUSH_EPS = 8, 10_000


def q_ppr_push(spark, sf_dir):
    """Andersen–Chung–Lang forward-push PPR from seed 7 — the local,
    mass-proportional-work alternative to power iteration ("related
    pages" at web scale: support O(1/eps) regardless of |V|).  All mass
    e9-BIGINT with explicit floors; 8 synchronized rounds.  See
    algos/pprpush.py."""
    from .algos.pprpush import ppr_push

    return ppr_push(
        edges_b(spark, sf_dir), seed=7,
        rounds=PPR_PUSH_ROUNDS, eps_per_edge=PPR_PUSH_EPS,
        directed=False, partitions=8,
    ).select("id", F.col("p").cast("long").alias("p"),
             F.col("r").cast("long").alias("r"))


def _ppr_push_sql(rounds: int, eps: int) -> str:
    from .algos.pprpush import ALPHA_DEN, ALPHA_NUM, SCALE

    parts = [
        EDGES_B_SQL, UND_B_SQL,
        "degs AS (SELECT src AS id, count(*) AS deg FROM und_b GROUP BY src)",
        f"s0 AS (SELECT CAST(7 AS BIGINT) AS id, CAST(0 AS BIGINT) AS p,"
        f" CAST({SCALE} AS BIGINT) AS r)",
    ]
    for k in range(1, rounds + 1):
        p = f"s{k - 1}"
        parts.append(f"""c{k} AS (
  SELECT s.id, s.p, s.r, coalesce(d.deg, 0) AS deg,
         (coalesce(d.deg, 0) > 0 AND s.r >= coalesce(d.deg, 0) * {eps})
           AS act,
         CAST(floor(s.r * {ALPHA_NUM}.0 / {ALPHA_DEN}) AS BIGINT) AS a
  FROM {p} s LEFT JOIN degs d ON d.id = s.id)""")
        parts.append(f"""u{k} AS (
  SELECT id, CASE WHEN act THEN p + a ELSE p END AS p,
         CASE WHEN act THEN
           CAST(floor((r - a) / 2.0) AS BIGINT)
           + ((r - a) - CAST(floor((r - a) / 2.0) AS BIGINT)
              - CAST(floor(((r - a) - CAST(floor((r - a) / 2.0) AS BIGINT))
                           * 1.0 / deg) AS BIGINT) * deg)
         ELSE r END AS r,
         CASE WHEN act THEN
           CAST(floor(((r - a) - CAST(floor((r - a) / 2.0) AS BIGINT))
                      * 1.0 / deg) AS BIGINT)
         ELSE CAST(0 AS BIGINT) END AS per_nb
  FROM c{k})""")
        parts.append(f"""s{k} AS (
  SELECT id, CAST(sum(p) AS BIGINT) AS p, CAST(sum(r) AS BIGINT) AS r
  FROM (
    SELECT id, p, r FROM u{k}
    UNION ALL
    SELECT e.dst AS id, CAST(0 AS BIGINT), u.per_nb
    FROM u{k} u JOIN und_b e ON e.src = u.id WHERE u.per_nb > 0
  ) z GROUP BY id)""")
    return (
        "WITH " + ",\n".join(parts)
        + f"\nSELECT id, p, r FROM s{rounds} WHERE p > 0 OR r > 0"
    )


PPR_PUSH_SQL = _ppr_push_sql(PPR_PUSH_ROUNDS, PPR_PUSH_EPS)

REGISTRY["ppr_push"] = (q_ppr_push, PPR_PUSH_SQL)
