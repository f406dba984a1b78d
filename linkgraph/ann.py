"""Approximate nearest-neighbor search over an embedding column.

Two paths:
  * ``cosine_topk`` — exact brute-force baseline (cross join + window top-k),
    the verifier for everything else.
  * ``lsh_topk`` — the scale path: random-hyperplane LSH. Each vector gets
    ``bands`` signature bytes (sign bits of ``planes_per_band`` seeded fixed
    hyperplanes); candidates are vectors sharing at least one band with the
    query, exact cosine re-rank within candidates.  At 100 TB the bucket
    join replaces the O(N*Q) cross join with an equi-join on (band, sig) —
    hash-partitioned, broadcastable query side, no skew (signatures are
    ~uniform under random hyperplanes).

Hyperplane constants are generated from a fixed numpy seed and embedded as
literals in BOTH the Spark plan and the DuckDB oracle SQL, so results are
value-exact reproducible across engines.

Reference parity: nearest-neighbor is new training-data-pipeline capability;
the bucket-then-verify shape mirrors the reference's sample-then-close
estimator structure (/root/reference/src/ZGraphInstance.cpp:127-222) —
cheap candidate generation + exact verification.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SEED = 1234


def hyperplanes(dim: int, n_planes: int, seed: int = SEED) -> list[list[float]]:
    """Deterministic unit-free hyperplanes, rounded so SQL literals are exact."""
    rng = np.random.RandomState(seed)
    return [[round(float(x), 6) for x in rng.randn(dim)] for _ in range(n_planes)]


def _dot_lit(vec_col, plane: list[float]):
    arr = F.array(*[F.lit(x) for x in plane])
    return F.aggregate(
        F.zip_with(vec_col, arr, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
    )


def _cos(va, vb):
    dot = F.aggregate(F.zip_with(va, vb, lambda x, y: x * y), F.lit(0.0),
                      lambda a, x: a + x)
    n = lambda c: F.sqrt(F.aggregate(c, F.lit(0.0), lambda a, x: a + x * x))  # noqa: E731
    return dot / (n(va) * n(vb))


def cosine_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k: (query_id, neighbor_id, sim_e6, rank). Brute force."""
    e = emb.select(F.col(id_col).alias("neighbor_id"),
                   F.col(vec_col).cast("array<double>").alias("v"))
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).cast("array<double>").alias("qv"))
    pairs = (
        F.broadcast(q).crossJoin(e)
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id",
                _cos(F.col("qv"), F.col("v")).alias("sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id",
                F.round(F.col("sim") * 1e6).cast("long").alias("sim_e6"),
                F.col("rank").cast("long").alias("rank"))
    )


def signatures(
    emb: DataFrame,
    bands: int = 3,
    planes_per_band: int = 4,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = SEED,
) -> DataFrame:
    """(id, v, band, sig) — one row per (vector, band); sig is the integer
    formed by the band's hyperplane sign bits."""
    planes = hyperplanes(dim, bands * planes_per_band, seed)
    e = emb.select(F.col(id_col).alias("id"),
                   F.col(vec_col).cast("array<double>").alias("v"))
    rows = []
    for b in range(bands):
        sig = F.lit(0)
        for j in range(planes_per_band):
            p = planes[b * planes_per_band + j]
            sig = sig + F.when(_dot_lit(F.col("v"), p) >= 0, F.lit(1 << j)).otherwise(F.lit(0))
        rows.append(F.struct(F.lit(b).alias("band"), sig.cast("long").alias("sig")))
    return (
        e.select("id", "v", F.explode(F.array(*rows)).alias("bs"))
        .select("id", "v", F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig"))
    )


def lsh_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    bands: int = 3,
    planes_per_band: int = 4,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = SEED,
) -> DataFrame:
    """LSH-bucketed approximate top-k: candidates share >=1 signature band
    with the query; exact cosine re-rank among candidates."""
    s_all = signatures(emb, bands, planes_per_band, dim, vec_col, id_col, seed)
    s_q = signatures(queries, bands, planes_per_band, dim, vec_col, id_col, seed)
    cand = (
        s_q.select(F.col("id").alias("query_id"), F.col("v").alias("qv"),
                   "band", "sig")
        .join(s_all.select(F.col("id").alias("neighbor_id"), F.col("v").alias("v"),
                           "band", "sig"),
              ["band", "sig"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cand.select(
        "query_id", "neighbor_id", _cos(F.col("qv"), F.col("v")).alias("sim")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id",
                F.round(F.col("sim") * 1e6).cast("long").alias("sim_e6"),
                F.col("rank").cast("long").alias("rank"))
    )


# ---------------------------------------------------------------------------
# DuckDB oracle SQL
# ---------------------------------------------------------------------------


def _plane_lit_sql(plane: list[float]) -> str:
    return "[" + ", ".join(repr(x) for x in plane) + "]"


def lsh_topk_sql(
    table: str = "embeddings",
    query_where: str = "vec_id < 20",
    k: int = 5,
    bands: int = 3,
    planes_per_band: int = 4,
    dim: int = 64,
    vec_expr: str = "embedding",
    id_expr: str = "vec_id",
    seed: int = SEED,
) -> str:
    planes = hyperplanes(dim, bands * planes_per_band, seed)
    band_structs = []
    for b in range(bands):
        bits = " + ".join(
            f"(CASE WHEN list_dot_product(v, {_plane_lit_sql(planes[b * planes_per_band + j])}) >= 0 "
            f"THEN {1 << j} ELSE 0 END)"
            for j in range(planes_per_band)
        )
        band_structs.append(f"{{'band': {b}, 'sig': CAST({bits} AS BIGINT)}}")
    structs = ", ".join(band_structs)
    return f"""
WITH e AS (SELECT {id_expr} AS id, CAST({vec_expr} AS DOUBLE[]) AS v FROM {table}),
sigs AS (
  SELECT id, v, u.band AS band, u.sig AS sig
  FROM e, unnest([{structs}]) AS t(u)
),
cand AS (
  SELECT DISTINCT q.id AS query_id, q.v AS qv, s.id AS neighbor_id, s.v AS v
  FROM sigs q JOIN sigs s ON q.band = s.band AND q.sig = s.sig
  WHERE q.id IN (SELECT {id_expr} FROM {table} WHERE {query_where})
    AND s.id <> q.id
),
scored AS (
  SELECT query_id, neighbor_id,
         list_dot_product(qv, v)
           / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(v, v))) AS sim
  FROM cand
),
ranked AS (
  SELECT query_id, neighbor_id, sim,
         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, CAST(round(sim * 1e6) AS BIGINT) AS sim_e6,
       CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= {k}
"""


def ivf_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 8,
    nprobe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF-style approximate top-k: coarse quantizer + probed-cluster rerank.

    The coarse codebook is the ``n_centroids`` lowest-id vectors (a
    deterministic stand-in for k-means so the DuckDB oracle is value-exact;
    a production build would plug trained centroids into the same plan).
    Every vector is assigned to its nearest centroid (broadcast cross join,
    K tiny); a query probes its ``nprobe`` nearest centroids and exact
    cosine re-ranks ONLY those clusters' members.  At scale: the inverted
    lists are the cluster-id hash partitioning, the query side broadcasts,
    and the scan prunes to nprobe/K of the data.
    """
    c = (
        emb.orderBy(id_col)
        .limit(n_centroids)
        .select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cvec"))
    )
    wv = Window.partitionBy("_id").orderBy(F.desc("_cos"), F.asc("cid"))

    def nearest(df, n):
        scored = (
            df.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
            .crossJoin(F.broadcast(c))
            .withColumn("_cos", _cos(F.col("_v"), F.col("cvec")))
        )
        return (
            scored.withColumn("_rn", F.row_number().over(wv))
            .filter(F.col("_rn") <= n)
            .select("_id", "_v", "cid")
        )

    assign = nearest(emb, 1).select(
        F.col("_id").alias("neighbor_id"), F.col("_v").alias("v"), "cid"
    )
    probes = nearest(queries, nprobe).select(
        F.col("_id").alias("query_id"), F.col("_v").alias("qv"), "cid"
    )
    cand = (
        probes.join(assign, "cid")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cand.select(
        "query_id", "neighbor_id", _cos(F.col("qv"), F.col("v")).alias("sim")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id",
                F.round(F.col("sim") * 1e6).cast("long").alias("sim_e6"),
                F.col("rank").cast("long").alias("rank"))
    )


def ivf_topk_sql(
    table: str = "embeddings",
    query_where: str = "vec_id < 20",
    k: int = 5,
    n_centroids: int = 8,
    nprobe: int = 2,
    vec_expr: str = "embedding",
    id_expr: str = "vec_id",
) -> str:
    return f"""
WITH e AS (SELECT {id_expr} AS id, CAST({vec_expr} AS DOUBLE[]) AS v FROM {table}),
c AS (SELECT id AS cid, v AS cvec FROM e ORDER BY id LIMIT {n_centroids}),
ac AS (
  SELECT e.id, e.v, c.cid,
         list_dot_product(e.v, c.cvec)
           / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cvec, c.cvec))) AS cs,
         row_number() OVER (PARTITION BY e.id ORDER BY list_dot_product(e.v, c.cvec)
           / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cvec, c.cvec))) DESC,
           c.cid ASC) AS rn
  FROM e CROSS JOIN c
),
assign AS (SELECT id AS neighbor_id, v, cid FROM ac WHERE rn = 1),
probes AS (
  SELECT id AS query_id, v AS qv, cid FROM ac
  WHERE rn <= {nprobe} AND id IN (SELECT {id_expr} FROM {table} WHERE {query_where})
),
cand AS (
  SELECT DISTINCT p.query_id, p.qv, a.neighbor_id, a.v
  FROM probes p JOIN assign a ON p.cid = a.cid
  WHERE a.neighbor_id <> p.query_id
),
scored AS (
  SELECT query_id, neighbor_id,
         list_dot_product(qv, v)
           / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(v, v))) AS sim
  FROM cand
),
ranked AS (
  SELECT query_id, neighbor_id, sim,
         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, CAST(round(sim * 1e6) AS BIGINT) AS sim_e6,
       CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= {k}
"""


def kmeans_lloyd(
    vectors: DataFrame,
    k: int = 4,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    partitions: int | None = None,
) -> DataFrame:
    """Deterministic Lloyd k-means over an embedding column — the trainer
    whose centroids plug into :func:`ivf_topk`'s coarse quantizer.

    Integer-exact recipe: embeddings are e6-quantized to BIGINT arrays up
    front, so squared-L2 distances are EXACT integer sums (no float
    accumulation order anywhere); assignment ties break by centroid id
    via struct-min; centroid updates re-quantize per dimension
    (``round(sum/n)``, one double division over exact integers).  Init is
    the k lowest-id vectors (same convention as ivf_topk's codebook).
    A cluster that loses all members keeps its previous centroid.

    Per iteration: one broadcast cross-join (K tiny) + grouped struct-min
    for assignment, one posexplode + grouped sum for the update — the
    standard scalable k-means shape (state per task bounded by K·dim).
    Returns the final assignment ``(vec_id, cluster, dist)``.
    """
    spark = vectors.sparkSession
    P = int(partitions or spark.conf.get("spark.sql.shuffle.partitions"))

    xq = (
        vectors.select(
            F.col(id_col).alias("vid"),
            F.transform(F.col(vec_col),
                        lambda e: F.round(e.cast("double") * 1e6)
                        .cast("long")).alias("x"),
        )
        .repartition(P, "vid").localCheckpoint(eager=True)
    )
    cents = (
        xq.orderBy("vid").limit(k)
        .select(F.row_number().over(Window.orderBy("vid")).alias("cid"),
                F.col("x").alias("c"))
        .localCheckpoint(eager=True)
    )

    dist = F.aggregate(
        F.zip_with("x", "c", lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"), lambda acc, v: acc + v)
    assigned = None
    for _ in range(iters):
        assigned = (
            xq.crossJoin(F.broadcast(cents))
            .select("vid", "x",
                    F.struct(dist.alias("d"), F.col("cid")).alias("s"))
            .groupBy("vid")
            .agg(F.min("s").alias("s"), F.first("x").alias("x"))
            .select("vid", "x", F.col("s.cid").alias("cluster"),
                    F.col("s.d").alias("dist"))
            .repartition(P, "vid").localCheckpoint(eager=True)
        )
        upd = (
            assigned.select("cluster", F.posexplode("x").alias("dim", "val"))
            .groupBy("cluster", "dim")
            .agg(F.round(F.sum("val").cast("double")
                         / F.count(F.lit(1))).cast("long").alias("cv"))
            .groupBy("cluster")
            .agg(F.transform(
                F.sort_array(F.collect_list(F.struct("dim", "cv"))),
                lambda s: s.getField("cv")).alias("c"))
            .select(F.col("cluster").alias("cid"), "c")
        )
        cents = (
            cents.alias("o")
            .join(upd.alias("n"), "cid", "left")
            .select("cid", F.coalesce("n.c", "o.c").alias("c"))
            .localCheckpoint(eager=True)
        )

    return assigned.select(F.col("vid").alias(id_col), "cluster", "dist")
