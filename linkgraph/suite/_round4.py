"""linkgraph.suite.round4 — mechanical split of the former monolithic suite.py.

round-4+5 additions: embedding-training data ops, node2vec, temporal triangles, context packing, robustness, assortativity, PPR push, graphlet orbits, grid-layout PageRank gate.

Imported (in order) by suite/__init__.py; registers its queries into the
shared REGISTRY defined in _base.  Pure move: definitions and registration
order are byte-identical to the monolith.
"""

from __future__ import annotations

from ._base import *  # noqa: F401,F403
from ._round1b import *  # noqa: F401,F403
from ._round1e import *  # noqa: F401,F403
from ._corpus2 import *  # noqa: F401,F403
from ._round3 import *  # noqa: F401,F403

# round 4: embedding-training data ops — skip-gram pairs from walks,
# GloVe co-occurrence counts, word2vec negative-sampling table
# ---------------------------------------------------------------------------


def q_skipgram_pairs(spark, sf_dir):
    """Skip-gram (center, context) pair counts from the deterministic
    hash-walk corpus (20 walks × length 8, window 2) — DeepWalk training
    data over graph B."""
    from ..algos.paths import random_walks, skipgram_pairs

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
    from .. import text

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return text.cooccurrence_counts(d, window=4, min_count=3)


REGISTRY["cooccurrence_counts"] = (
    q_cooccurrence_counts, _text.cooccurrence_sql(window=4, min_count=3)
)


def q_negsample_table(spark, sf_dir):
    """word2vec unigram^0.75 negative-sampling table with exact cumulative
    BIGINT ranges (two-phase bounded-state prefix sum; sqrt∘sqrt for a
    bit-identical cross-engine power)."""
    from .. import text

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return text.negsample_table(d, min_count=5)


REGISTRY["negsample_table"] = (q_negsample_table, _text.negsample_sql(min_count=5))


def q_bm25_top20(spark, sf_dir):
    """Top-20 documents by BM25 (k1=1.2, b=0.75) for the fixed query
    {spark, join, merge} — retrieval-scored topical subset mining with
    exact per-term e6-quantized integer score sums."""
    from .. import text

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return text.bm25_topk(d, ["spark", "join", "merge"], k=20)


REGISTRY["bm25_top20"] = (
    q_bm25_top20, _text.bm25_sql(["spark", "join", "merge"], k=20)
)


def q_vocab_growth(spark, sf_dir):
    """Heaps-law vocabulary-growth curve: cumulative distinct-token count
    per corpus decile (ascending doc_id; two-phase distributed rank, one
    tokenization pass)."""
    from .. import text

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
    from .. import dedup

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return dedup.minhash_index_probe(
        d.filter(F.col("doc_id") % 5 != 0),
        d.filter(F.col("doc_id") % 5 == 0),
        jaccard_threshold=0.35,
    )


from .. import dedup as _dedup  # noqa: E402

REGISTRY["minhash_index_probe"] = (
    q_minhash_index_probe,
    _dedup.minhash_index_probe_sql(jaccard_threshold=0.35),
)


def q_graphlet_orbits(spark, sf_dir):
    """Per-vertex 3-node graphlet orbit counts (GDV-3: degree / induced
    2-path end / 2-path center / triangle) over derived graph A — the
    role-mining feature vector, from closed forms over degree,
    neighbor-degree sums and per-vertex triangle participation."""
    from ..algos.motifs import graphlet_orbits

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
    from ..ingest import path_prefix_rollup

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
    from ..algos.ktruss import truss_numbers

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
    from ..algos.paths import node2vec_walks

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
    from ..algos.paths import (
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
    from .. import corpus

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return corpus.context_pack(docs, capacity=256, n_groups=8)


def _register_round4d() -> None:
    from .. import corpus

    REGISTRY["context_pack"] = (
        q_context_pack, corpus.context_pack_sql(capacity=256, n_groups=8))


_register_round4d()


def q_stream_sliding(spark, sf_dir):
    """Sliding-window streaming counts (1h window / 15m slide, watermarked,
    availableNow drain) — each event lands in exactly 4 overlapping
    windows; the closed-form batch twin needs only a 4-row range join.
    See streaming.stream_sliding_counts."""
    from .. import streaming

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
    from ..algos import connected_components

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
    from ..dedup import minhash_lsh_pairs

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
    from ..dedup import minhash_lsh_pairs_sql

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
    from .. import corpus

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
    from ..algos.pprpush import ppr_push

    return ppr_push(
        edges_b(spark, sf_dir), seed=7,
        rounds=PPR_PUSH_ROUNDS, eps_per_edge=PPR_PUSH_EPS,
        directed=False, partitions=8,
    ).select("id", F.col("p").cast("long").alias("p"),
             F.col("r").cast("long").alias("r"))


def _ppr_push_sql(rounds: int, eps: int) -> str:
    from ..algos.pprpush import ALPHA_DEN, ALPHA_NUM, SCALE

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


# ---------------------------------------------------------------------------
# degree-capped Adamic–Adar (round 5) — the scale form of adamic_adar_topk
# ---------------------------------------------------------------------------

AA_CAP = 64  # max common-neighbor degree that may generate candidate pairs


def q_adamic_adar_capped(spark, sf_dir):
    """Degree-CAPPED Adamic–Adar top-20 — the web-scale form of
    ``adamic_adar_topk``: only centers with 2 <= deg <= AA_CAP generate
    candidate pairs.

    Why: the uncapped score enumerates C(d, 2) pairs per common neighbor
    c — a 10^7-degree hub alone contributes ~5·10^13 candidate rows while
    its per-pair weight 1e6/ln(d) is the SMALLEST possible, so the hub
    dominates the cost and almost never the ranking.  Capping the center
    degree is the standard web-scale link-prediction trade (drop the
    near-zero-information quadratic mass); total wedge work becomes
    Σ_{d(c)<=CAP} C(d, 2) <= CAP·m/2 — linear in edges for fixed CAP.
    Same integer-quantized weights and deterministic total order as the
    exact query; the DuckDB twin applies the identical cap, so the gate
    hash-checks the capped semantics end-to-end.
    """
    eb = edges_b(spark, sf_dir)
    und = (
        eb.union(eb.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
    )
    deg = und.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    w = deg.filter((F.col("d") >= 2) & (F.col("d") <= AA_CAP)).select(
        F.col("src").alias("c"),
        F.round(F.lit(1e6) / F.log(F.col("d").cast("double")))
        .cast("long")
        .alias("w"),
    )
    e1 = und.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    e2 = und.select(F.col("src").alias("c"), F.col("dst").alias("b"))
    scores = (
        # join the (already degree-filtered) weight table FIRST so capped-out
        # hub centers never generate their C(d,2) pair explosion at all
        e1.join(w, "c")
        .join(e2, "c")
        .filter(F.col("a") < F.col("b"))
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


ADAMIC_ADAR_CAPPED_SQL = f"""
WITH {EDGES_B_SQL}, {UND_B_SQL},
deg AS (SELECT src, count(*) AS d FROM und_b GROUP BY src),
w AS (SELECT src AS c, CAST(round(1e6 / ln(CAST(d AS DOUBLE))) AS BIGINT) AS w
      FROM deg WHERE d >= 2 AND d <= {AA_CAP}),
sc AS (
  SELECT e1.src AS a, e2.dst AS b, sum(w.w) AS score_e6
  FROM und_b e1 JOIN w ON w.c = e1.dst JOIN und_b e2 ON e1.dst = e2.src
  WHERE e1.src < e2.dst
    AND NOT EXISTS (SELECT 1 FROM und_b u WHERE u.src = e1.src AND u.dst = e2.dst)
  GROUP BY e1.src, e2.dst
)
SELECT a, b, CAST(score_e6 AS BIGINT) AS score_e6
FROM sc ORDER BY score_e6 DESC, a, b LIMIT 20
"""

REGISTRY["adamic_adar_capped"] = (q_adamic_adar_capped, ADAMIC_ADAR_CAPPED_SQL)


# re-export everything (incl. underscore helpers) to the next
# module in the suite package chain and to suite/__init__.py
__all__ = [_n for _n in dir() if not _n.startswith('__')]
