"""Bounded-state frequency and sampling sketches.

Count-min sketch (Cormode & Muthukrishnan, J. Algorithms '05): a D x W
integer table replaces the full per-key count table — the standard
bounded-memory frequency structure for token / host / url streams whose
key cardinality (web-scale vocab, 10^9+ hosts) dwarfs executor memory.
The sketch NEVER underestimates (est = min over D row buckets >= exact),
and overestimates by at most e/W * N with prob 1 - e^-D — both properties
regression-tested.

Sequential Poisson sampling (Ohlsson, '98; the PPS estimator used for
survey/corpus subsampling): rank every item by priority u_i / p_i with
u_i uniform and p_i proportional to a size weight, keep the n smallest —
an unequal-probability sample whose inclusion odds track the weight.
The uniform is the deterministic 60-bit md5 hash, so the sample (and its
SQL twin) is bit-reproducible; ranking is a global top-n (TakeOrdered,
no full sort at scale).

Mirrors the reference's estimator-vs-exact-oracle testing pattern
(/root/reference/naive_implementation/) applied to frequency and
sampling sketches; both are pure column expressions, no Python on the
hot path.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import h60, h60_sql, tokens

CMS_DEPTH = 4
CMS_WIDTH = 128


def _bucket(key, d):
    """Row-d bucket of a key: h60(key || ':' || d) % W — one independent
    hash family member per sketch row."""
    return h60(F.concat(key, F.lit(":"), F.lit(str(d)))) % CMS_WIDTH


def count_min_build(counts: DataFrame, key_col: str, cnt_col: str) -> DataFrame:
    """Build the D x W sketch from an exact (key, count) table.

    Summing pre-aggregated counts into buckets is identical to streaming
    the raw occurrences (addition is associative), so the build composes
    with any upstream partial aggregation — at 100 TB the only shuffled
    rows are the D x W = 512 bucket partials per map task, never the keys.
    """
    rows = [
        counts.select(
            F.lit(d).alias("d"),
            _bucket(F.col(key_col), d).alias("bucket"),
            F.col(cnt_col).alias("c"),
        )
        for d in range(CMS_DEPTH)
    ]
    return (
        reduce(DataFrame.unionByName, rows)
        .groupBy("d", "bucket")
        .agg(F.sum("c").cast("long").alias("c"))
    )


def count_min_probe(sketch: DataFrame, keys: DataFrame, key_col: str) -> DataFrame:
    """Estimated count per key: min over the D bucket sums.

    The sketch is O(D x W) rows — always broadcast; the probe is a keyed
    equi-join, one row per (key, d), then a grouped min."""
    probes = reduce(
        DataFrame.unionByName,
        [
            keys.select(
                F.col(key_col),
                F.lit(d).alias("d"),
                _bucket(F.col(key_col), d).alias("bucket"),
            )
            for d in range(CMS_DEPTH)
        ],
    )
    return (
        probes.join(F.broadcast(sketch), ["d", "bucket"])
        .groupBy(key_col)
        .agg(F.min("c").cast("long").alias("cms_est"))
    )


def cms_heavy_hitters(docs: DataFrame, text_col: str = "text",
                      k: int = 20) -> DataFrame:
    """Exact top-k tokens with their count-min estimates.

    Returns (tok, exact, cms_est, overestimate); CMS guarantees
    overestimate >= 0 for every key.  The exact side exists only to
    grade the sketch at test scale — production keeps just the D x W
    table and probes it."""
    t = (
        docs.filter(F.length(F.trim(F.col(text_col))) > 0)
        .select(F.explode(tokens(F.col(text_col))).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("exact"))
    )
    t = t.persist()
    sketch = count_min_build(t, "tok", "exact")
    top = t.orderBy(F.col("exact").desc(), F.col("tok").asc()).limit(k)
    est = count_min_probe(sketch, top.select("tok"), "tok")
    out = (
        top.join(est, "tok")
        .select(
            "tok", "exact", "cms_est",
            (F.col("cms_est") - F.col("exact")).cast("long")
            .alias("overestimate"),
        )
    )
    out = out.localCheckpoint(eager=True)
    t.unpersist()
    return out


def cms_heavy_hitters_sql(k: int = 20, table: str = "documents",
                          text_expr: str = "text") -> str:
    b = h60_sql("tok || ':' || CAST(d AS VARCHAR)")
    return f"""
WITH tc AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS exact
  FROM (SELECT unnest(regexp_split_to_array(trim(lower({text_expr})), '\\s+'))
          AS tok
        FROM {table} WHERE len(trim({text_expr})) > 0)
  GROUP BY tok),
sk AS (
  SELECT d, {b} % {CMS_WIDTH} AS bucket, CAST(sum(exact) AS BIGINT) AS c
  FROM tc CROSS JOIN range({CMS_DEPTH}) t(d)
  GROUP BY d, {b} % {CMS_WIDTH}),
top AS (
  SELECT tok, exact FROM tc ORDER BY exact DESC, tok ASC LIMIT {k}),
est AS (
  SELECT p.tok, CAST(min(sk.c) AS BIGINT) AS cms_est
  FROM (SELECT tok, d, {b} % {CMS_WIDTH} AS bucket
        FROM top CROSS JOIN range({CMS_DEPTH}) t(d)) p
  JOIN sk ON sk.d = p.d AND sk.bucket = p.bucket
  GROUP BY p.tok)
SELECT top.tok, top.exact, est.cms_est,
       CAST(est.cms_est - top.exact AS BIGINT) AS overestimate
FROM top JOIN est ON est.tok = top.tok
"""


# ---------------------------------------------------------------------------
# sequential Poisson (PPS) sampling
# ---------------------------------------------------------------------------

def pps_sample(docs: DataFrame, n: int, weight: F.Column,
               id_col: str = "doc_id") -> DataFrame:
    """Weight-proportional sample of n rows: priority = u div w with u the
    deterministic 60-bit hash of the id (uniform on [0, 2^60)) and w >= 1
    the size weight; keep the n smallest (ties by id).  Heavier rows get
    smaller priorities, so inclusion probability tracks w (sequential
    Poisson).  Integer `div` keeps the priority BIGINT-exact in both
    engines (float division of 2^60-scale values rounds past the 53-bit
    double mantissa and is not engine-portable).

    Scale: priority is one column expression; selection is a global
    top-n (per-partition heap + driver merge of n rows), never a full
    sort."""
    d = docs.select(
        F.col(id_col),
        F.greatest(weight.cast("long"), F.lit(1)).alias("weight"),
        h60(F.col(id_col).cast("string")).alias("_u"),
    )
    return (
        d.select(id_col, "weight",
                 F.expr("_u div weight").cast("long").alias("priority"))
        .orderBy(F.col("priority").asc(), F.col(id_col).asc())
        .limit(n)
    )


def pps_sample_sql(n: int, weight_sql: str, table: str = "documents",
                   id_col: str = "doc_id") -> str:
    u = h60_sql(f"CAST({id_col} AS VARCHAR)")
    return f"""
SELECT {id_col}, weight, CAST({u} // weight AS BIGINT) AS priority
FROM (SELECT {id_col}, greatest(CAST({weight_sql} AS BIGINT), 1) AS weight
      FROM {table})
ORDER BY priority ASC, {id_col} ASC
LIMIT {n}
"""


# ---------------------------------------------------------------------------
# Bloom filter (bounded-state set membership)
# ---------------------------------------------------------------------------

BLOOM_WORDS = 64       # filter = 64 x 32-bit words = 2048 bits
BLOOM_WORD_BITS = 32   # bits stay below 2^31: no sign-bit portability traps
BLOOM_K = 3            # hash functions
BLOOM_BITS = BLOOM_WORDS * BLOOM_WORD_BITS


def _bloom_pos(key, i):
    return h60(F.concat(key, F.lit("#"), F.lit(str(i)))) % BLOOM_BITS


def bloom_build(keys: DataFrame, key_col: str) -> DataFrame:
    """Build the filter as (word, bits) rows via a bit_or aggregation —
    O(BLOOM_WORDS) rows regardless of key-set size, always broadcastable.
    At 100 TB this carries a benchmark / blocklist key set to every
    executor when the raw set is too big to broadcast: no false
    negatives, false positives bounded by (1 - e^{-Kn/M})^K."""
    rows = [
        keys.select(_bloom_pos(F.col(key_col), i).alias("p"))
        for i in range(BLOOM_K)
    ]
    return (
        reduce(DataFrame.unionByName, rows)
        .select(
            F.expr(f"p div {BLOOM_WORD_BITS}").cast("long").alias("word"),
            F.expr(f"shiftleft(cast(1 as bigint), cast(p % {BLOOM_WORD_BITS} as int))")
            .alias("b"),
        )
        .groupBy("word")
        .agg(F.bit_or("b").cast("long").alias("bits"))
    )


def bloom_probe(bloom: DataFrame, keys: DataFrame, key_col: str) -> DataFrame:
    """Membership test: a key is `maybe` iff ALL K probed bits are set.
    The filter side is broadcast; the probe is a word-keyed equi-join +
    grouped count — one row per (key, hash)."""
    probes = reduce(
        DataFrame.unionByName,
        [
            keys.select(F.col(key_col),
                        _bloom_pos(F.col(key_col), i).alias("p"))
            for i in range(BLOOM_K)
        ],
    ).select(
        key_col,
        F.expr(f"p div {BLOOM_WORD_BITS}").cast("long").alias("word"),
        F.expr(f"shiftleft(cast(1 as bigint), cast(p % {BLOOM_WORD_BITS} as int))")
        .alias("m"),
    )
    hit = (F.col("bits").bitwiseAND(F.col("m")) != 0).cast("long")
    return (
        probes.join(F.broadcast(bloom), "word", "left")
        .select(key_col, F.coalesce(hit, F.lit(0)).alias("h"))
        .groupBy(key_col)
        .agg((F.sum("h") == BLOOM_K).cast("long").alias("maybe"))
    )


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) distinct-count sketch
# ---------------------------------------------------------------------------

KMV_K = 64                       # sketch size: k smallest hashes per scope
KMV_SPACE = 1 << 60              # h60 hash space
KMV_OVERSAMPLE = 8               # pre-filter survivor budget multiplier


def kmv_build(pairs: DataFrame, group_col: str, key_col: str,
              k: int = KMV_K) -> DataFrame:
    """KMV distinct-count sketch per group (Bar-Yossef et al., RANDOM'02):
    keep the k smallest 60-bit hashes of the distinct keys in each group.
    Returns the sketch ROWS (scope, h, n) — n is the group's exact
    distinct-hash count, carried so the estimator can report exact vs
    estimated side by side.

    Scale plan: a naive per-group rank sorts every distinct key —
    unbounded window state at web scale.  Instead the exact per-group
    count n (one keyed aggregation, map-side combined) sets a hash
    threshold t ~= OVERSAMPLE * k/n * 2^60 under which ~OVERSAMPLE*k
    uniform hashes survive, so the rank window runs over O(k) survivors
    per group regardless of group size — the same bounded-window trick
    as `corpus.stratified_sample`.  Survivor shortfall (k smallest not
    all under t) has probability < e^-ck and is regression-tested.

    Mirrors the reference's estimator-vs-exact-counter oracle pattern
    (/root/reference/naive_implementation/) for distinct counting."""
    from pyspark.sql import Window

    dk = (
        pairs.select(F.col(group_col).alias("scope"),
                     F.col(key_col).cast("string").alias("kk"))
        .distinct()
        .select("scope", h60(F.col("kk")).alias("h"))
        .distinct()                      # h60-collision collapse IS the sketch semantic
        .persist()
    )
    n = dk.groupBy("scope").agg(F.count(F.lit(1)).cast("long").alias("n"))
    cap = KMV_OVERSAMPLE * k
    thr = n.select(
        "scope", "n",
        # explicit floor on BOTH engines (Spark here, CAST(floor(..)) in
        # kmv_sql) — a bare cast truncates in Spark but rounds in DuckDB,
        # so the threshold could differ by 1 at a measure-zero boundary
        F.when(F.col("n") <= cap, F.lit(KMV_SPACE))
        .otherwise(F.floor(F.lit(KMV_SPACE) / F.col("n") * F.lit(cap))
                   .cast("long"))
        .alias("t"),
    )
    surv = dk.join(F.broadcast(thr), "scope").filter(F.col("h") <= F.col("t"))
    w = Window.partitionBy("scope").orderBy("h")
    out = (
        surv.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= k)
        .select("scope", "h", "n")
        .localCheckpoint(eager=True)
    )
    dk.unpersist()
    # Runtime shortfall guard: the oversampled pre-filter keeps the k
    # smallest hashes with probability > 1 - e^-ck, but if a scope ever
    # comes back with m < least(k, n) the estimator would silently take
    # the m<k "exact" branch and report ~m for an arbitrarily large true
    # count.  The sketch is O(scopes * k) rows and already checkpointed,
    # so this check is one cheap aggregation over materialized rows.
    # driven from the pre-filter per-scope n table, so a scope whose
    # survivors ALL fell above the threshold (m=0, absent from the
    # sketch) is caught too
    short = (
        thr.select("scope", F.col("n").alias("nn"))
        .join(out.groupBy("scope").agg(F.count(F.lit(1)).alias("m")),
              "scope", "left")
        .withColumn("m", F.coalesce("m", F.lit(0)))
        .filter(F.col("m") < F.least(F.lit(k), F.col("nn")))
        .limit(1)
        .collect()
    )
    if short:
        r = short[0]
        raise RuntimeError(
            f"kmv_build survivor shortfall: scope={r['scope']!r} kept "
            f"m={r['m']} < least(k={k}, n={r['nn']}) hashes — raise "
            f"KMV_OVERSAMPLE (p < e^-ck event, or a non-uniform hash)"
        )
    return out


def _kmv_est(m, hk, k):
    """(k-1)*2^60/h_k as ONE IEEE-double expression identical in Spark
    and DuckDB: the constant is exactly representable, BIGINT->DOUBLE
    rounding and the correctly-rounded divide agree bit-for-bit; exact
    count when the sketch never filled (m < k)."""
    return (
        F.when(m < k, m)
        .otherwise(F.floor(F.lit(float((k - 1) * KMV_SPACE)) / hk)
                   .cast("long"))
        .cast("long")
    )


def kmv_estimate(sketch: DataFrame, k: int = KMV_K) -> DataFrame:
    """Per-scope distinct estimate from sketch rows:
    (scope, m, hk, est, exact)."""
    agg = sketch.groupBy("scope").agg(
        F.count(F.lit(1)).cast("long").alias("m"),
        F.max("h").cast("long").alias("hk"),
        F.max("n").cast("long").alias("exact"),
    )
    return agg.select(
        "scope", "m", "hk",
        _kmv_est(F.col("m"), F.col("hk"), k).alias("est"), "exact",
    )


def kmv_merge(sketch: DataFrame, scope: str, exact: DataFrame,
              k: int = KMV_K) -> DataFrame:
    """Union of per-scope sketches: every one of the union's k smallest
    hashes is inside its own scope's k-smallest list, so re-ranking the
    merged rows reproduces the union sketch EXACTLY — the mergeability
    that makes KMV a partial-aggregatable distinct counter at 100 TB
    (per-partition sketches, tiny shuffle, one re-rank).  `exact` is a
    1-row (n) DataFrame with the union's true distinct count (not
    derivable from sketches — that is the point of them)."""
    from pyspark.sql import Window

    w = Window.orderBy("h")  # merged rows are O(#scopes * k): bounded window
    topk = (
        sketch.select("h").distinct()
        .withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= k)
    )
    return (
        topk.agg(
            F.count(F.lit(1)).cast("long").alias("m"),
            F.max("h").cast("long").alias("hk"),
        )
        .crossJoin(F.broadcast(exact.select(F.col("n").cast("long").alias("exact"))))
        .select(
            F.lit(scope).alias("scope"), "m", "hk",
            _kmv_est(F.col("m"), F.col("hk"), k).alias("est"), "exact",
        )
    )


def kmv_sql(group_expr: str, key_expr: str, table: str,
            k: int = KMV_K) -> str:
    """DuckDB twin of kmv_build+kmv_estimate over the same (group, key)
    pairs — identical hash, threshold pre-filter, rank, and estimate
    formula — plus the union row, which the twin computes as a direct
    global build (provably equal to the Spark side's sketch MERGE: both
    are the k smallest distinct hashes of the union)."""
    h = h60_sql(f"CAST({key_expr} AS VARCHAR)")
    cap = KMV_OVERSAMPLE * k
    est_c = float((k - 1) * KMV_SPACE)
    return f"""
dk AS MATERIALIZED (
  SELECT DISTINCT {group_expr} AS scope, {h} AS h FROM {table}),
n_ AS (SELECT scope, CAST(count(*) AS BIGINT) AS n FROM dk GROUP BY scope),
thr AS (
  SELECT scope, n,
         CASE WHEN n <= {cap} THEN CAST({KMV_SPACE} AS BIGINT)
              ELSE CAST(floor(CAST({KMV_SPACE} AS DOUBLE) / n * {cap}) AS BIGINT)
         END AS t
  FROM n_),
topk AS (
  SELECT dk.scope, dk.h, thr.n FROM dk JOIN thr ON thr.scope = dk.scope
  WHERE dk.h <= thr.t
  QUALIFY row_number() OVER (PARTITION BY dk.scope ORDER BY dk.h) <= {k}),
per_scope AS (
  SELECT scope, CAST(count(*) AS BIGINT) AS m, CAST(max(h) AS BIGINT) AS hk,
         CAST(max(n) AS BIGINT) AS exact
  FROM topk GROUP BY scope),
gd AS (SELECT DISTINCT h FROM dk),
gn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM gd),
gthr AS (
  SELECT CASE WHEN n <= {cap} THEN CAST({KMV_SPACE} AS BIGINT)
              ELSE CAST(floor(CAST({KMV_SPACE} AS DOUBLE) / n * {cap}) AS BIGINT)
         END AS t, n
  FROM gn),
gtopk AS (
  SELECT h, gthr.n FROM gd CROSS JOIN gthr WHERE h <= gthr.t
  QUALIFY row_number() OVER (ORDER BY h) <= {k}),
gsk AS (
  SELECT CAST('__all__' AS VARCHAR) AS scope,
         CAST(count(*) AS BIGINT) AS m, CAST(max(h) AS BIGINT) AS hk,
         CAST(max(n) AS BIGINT) AS exact
  FROM gtopk),
allsk AS (
  SELECT * FROM per_scope UNION ALL SELECT * FROM gsk)
SELECT scope, m, hk,
       CAST(CASE WHEN m < {k} THEN m
                 ELSE floor(CAST({est_c!r} AS DOUBLE) / hk)
            END AS BIGINT) AS est,
       exact
FROM allsk"""


def bucket_min_estimate(sketch_df: DataFrame, buckets: int = 16) -> DataFrame:
    """Distinct-count estimate from a bucket-min sketch (streaming.
    stream_bucket_min_distinct): with sub-space S' = 2^60/B and n
    distinct keys, E[sum over B buckets of min_i] ~ B^2*S'/(n+B), so
    n_hat = B^2*S'/sum - B.  Empty buckets contribute S' (the min of
    zero samples).  One IEEE-double expression on exact integer sums —
    engine-deterministic (B^2*S' = 2^60*B is a power of two, exactly
    representable)."""
    sub_space = KMV_SPACE // buckets
    agg = sketch_df.agg(
        F.count(F.lit(1)).cast("long").alias("filled"),
        F.sum("minh").cast("long").alias("s"),
    )
    total = (
        F.col("s") + (F.lit(buckets) - F.col("filled")) * F.lit(sub_space)
    ).cast("long")
    return agg.select(
        "filled",
        total.alias("s_total"),
        F.greatest(
            F.lit(0),
            (F.floor(F.lit(float(buckets * buckets * sub_space)) / total)
             - F.lit(buckets)).cast("long"),
        ).cast("long").alias("est"),
    )
