"""Training-corpus assembly operators: token-budget shard packing,
PII detection/scrubbing statistics, exact-k stratified sampling, and
domain-mixture reweighting.

These are the corpus-construction steps downstream of the dedup / quality
layer in an LLM data pipeline: pack the filtered documents into
fixed-token training shards, account for PII before release, draw
balanced per-language samples for evaluation sets, and compute the
per-source sampling weights that reshape the natural domain mix into a
target mix.

All operators are pure built-in column expressions (JVM-side, no Python
UDFs) with exact DuckDB SQL twins, and each documents its 100-TB plan:
the only global-order primitive (shard packing's running token total) is
computed with the same two-phase bounded-state pattern as
``ingest.dense_ids`` — per-bucket partial sums plus a broadcast prefix —
never a single-partition window.

Reference parity: the reference has no corpus layer (it consumes prebuilt
edge lists); these extend the engine along the training-data axis the
same way dedup.py / text.py / ann.py do.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import h60, h60_sql

# ---------------------------------------------------------------------------
# shared: whitespace token count (same token definition as q_doc_token_stats)
# ---------------------------------------------------------------------------


def n_tokens(text: Column) -> Column:
    return F.size(F.split(F.trim(F.lower(text)), r"\s+")).cast("long")


N_TOKENS_SQL = r"CAST(len(regexp_split_to_array(trim(lower(text)), '\s+')) AS BIGINT)"


# ---------------------------------------------------------------------------
# token-budget shard packing
# ---------------------------------------------------------------------------


def shard_pack(
    docs: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 32,
) -> DataFrame:
    """Assign every document (in ascending ``id_col`` order) to a training
    shard of ~``budget`` tokens: ``shard_id = floor(tokens_before / budget)``
    where ``tokens_before`` is the running token total of all earlier docs.
    A document therefore lands in the shard that was open when it arrived;
    shards are contiguous id ranges and every shard except the last holds
    >= budget tokens once closed.  Returns (doc_id, n_tokens, shard_id).

    100-TB plan: the running total is NOT a global-order window (which
    would be one task).  Two phases, both bounded:
      1. bucket documents by deterministic id-range boundaries (a pure
         hash-sample of ids, xxhash64(id) % s == 0, reduced to ``buckets``
         quantile boundaries — data-deterministic, unlike
         repartitionByRange's per-run reservoir sample);
      2. per-bucket token sums -> driver cumsum over ``buckets`` rows ->
         broadcast prefix offsets; within each bucket an ORDER BY id
         window (partitioned, so max state = one bucket) adds the local
         running total to the bucket's offset.
    Same pattern as ingest.dense_ids (two-phase rank); the collect is
    ``buckets`` rows, independent of corpus size.
    """
    d = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        n_tokens(F.col(text_col)).alias("n_tokens"),
    )
    d = d.persist()
    try:
        # phase 1: deterministic boundary sample -> `buckets` range bounds
        n = d.count()
        s = max(1, n // max(1, buckets * 32))
        cand = sorted(
            r["doc_id"]
            for r in d.select("doc_id")
            .filter(F.xxhash64(F.col("doc_id"), F.lit(7)) % s == 0)
            .collect()
        )
        step = max(1, len(cand) // buckets)
        bounds = cand[step::step][: buckets - 1]
        bucket = sum(
            (F.col("doc_id") >= F.lit(b)).cast("int") for b in bounds
        ) if bounds else F.lit(0)
        b = d.withColumn("_b", bucket.cast("int"))

        # phase 2: per-bucket sums -> broadcast prefix offsets
        sums = {
            r["_b"]: r["s"]
            for r in b.groupBy("_b").agg(F.sum("n_tokens").alias("s")).collect()
        }
        off, acc = {}, 0
        for i in range(len(bounds) + 1):
            off[i] = acc
            acc += sums.get(i, 0)
        offset = F.element_at(
            F.create_map(*[F.lit(x) for kv in off.items() for x in kv]),
            F.col("_b"),
        )
        w = (
            Window.partitionBy("_b")
            .orderBy("doc_id")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        before = offset + F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
        return b.select(
            "doc_id",
            "n_tokens",
            F.floor(before / F.lit(budget)).cast("long").alias("shard_id"),
        )
    finally:
        d.unpersist()


def shard_pack_sql(budget: int, table: str = "documents") -> str:
    return f"""
WITH t AS (
  SELECT doc_id, {N_TOKENS_SQL} AS n_tokens FROM {table}
)
SELECT doc_id, n_tokens,
       CAST(floor(coalesce(sum(n_tokens) OVER (
           ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
       ), 0) / {budget}) AS BIGINT) AS shard_id
FROM t
"""


# ---------------------------------------------------------------------------
# PII detection / scrub statistics
# ---------------------------------------------------------------------------

# dialect-shared regexes (same semantics under Java regex and RE2)
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+"
IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
PHONE_RE = r"\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b"


def pii_scrub(docs: DataFrame, id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """Per-document PII accounting + the fingerprint of the scrubbed text:
    (doc_id, n_emails, n_ipv4, n_phones, masked_fp).  Masking replaces
    emails, then IPv4s, then phone numbers with typed placeholder tokens
    (the release-audit step of a corpus pipeline); ``masked_fp`` is the
    cross-engine h60 content hash of the masked text so a manifest can
    prove which byte-level variant shipped.  Pure column expressions —
    embarrassingly parallel, no shuffle at all."""
    t = F.col(text_col)
    masked = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, EMAIL_RE, "<EMAIL>"), IPV4_RE, "<IP>"
        ),
        PHONE_RE,
        "<PHONE>",
    )
    return docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.size(F.regexp_extract_all(t, F.lit(EMAIL_RE), 0)).cast("long").alias("n_emails"),
        F.size(F.regexp_extract_all(t, F.lit(IPV4_RE), 0)).cast("long").alias("n_ipv4"),
        F.size(F.regexp_extract_all(t, F.lit(PHONE_RE), 0)).cast("long").alias("n_phones"),
        h60(masked).alias("masked_fp"),
    )


def pii_scrub_sql(table: str = "documents") -> str:
    masked = (
        f"regexp_replace(regexp_replace(regexp_replace(text, "
        f"'{EMAIL_RE}', '<EMAIL>', 'g'), "
        f"'{IPV4_RE}', '<IP>', 'g'), "
        f"'{PHONE_RE}', '<PHONE>', 'g')"
    )
    return f"""
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(len(regexp_extract_all(text, '{EMAIL_RE}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(text, '{IPV4_RE}')) AS BIGINT) AS n_ipv4,
       CAST(len(regexp_extract_all(text, '{PHONE_RE}')) AS BIGINT) AS n_phones,
       {h60_sql(masked)} AS masked_fp
FROM {table}
"""


# ---------------------------------------------------------------------------
# exact-k stratified sampling
# ---------------------------------------------------------------------------


def stratified_sample(
    docs: DataFrame,
    k: int,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    seed: int = 7,
    oversample: int = 4,
) -> DataFrame:
    """Exactly ``k`` documents per stratum, chosen as the k smallest
    deterministic hash ranks (h60(seed || id)) — a reproducible uniform
    sample (the eval-set / holdout draw of a data pipeline).  Returns
    (doc_id, stratum).

    100-TB plan: never rank a whole stratum.  A broadcast per-stratum
    count sets a pre-filter keep probability p = min(1, oversample*k/n);
    only the ~oversample*k hash-smallest survivors per stratum reach the
    per-stratum ORDER BY window, so window state is O(oversample*k), not
    O(n).  The pre-filter keeps every true top-k member unless fewer than
    k of a stratum's docs hash below p — probability exp(-Theta(k)) by a
    Chernoff bound at oversample=4 (and shrinking as strata grow); the
    shortfall assert below turns that tail case into a loud error rather
    than a silently short sample."""
    d = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(stratum_col).alias("stratum"),
        (
            h60(F.concat(F.lit(f"s{seed}:"), F.col(id_col).cast("string")))
        ).alias("_r"),
    )
    counts = {
        r["stratum"]: r["c"]
        for r in d.groupBy("stratum").agg(F.count("*").alias("c")).collect()
    }
    m = 1 << 60
    thresh = F.create_map(
        *[
            F.lit(x)
            for s, n in sorted(counts.items())
            for x in (s, min(m, int(m * min(1.0, oversample * k / max(1, n)))))
        ]
    )
    surv = d.filter(F.col("_r") < F.element_at(thresh, F.col("stratum")))
    w = Window.partitionBy("stratum").orderBy("_r", "doc_id")
    out = (
        surv.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select("doc_id", "stratum")
    )
    out = out.persist()
    short = [
        r["stratum"]
        for r in out.groupBy("stratum").count().filter(F.col("count") < k).collect()
        if counts.get(r["stratum"], 0) >= k
    ]
    if short:  # pragma: no cover - probability exp(-Theta(k))
        raise ValueError(
            f"stratified_sample pre-filter shortfall in strata {short}; "
            f"raise oversample (={oversample})"
        )
    return out


def stratified_sample_sql(
    k: int,
    seed: int = 7,
    oversample: int = 4,
    table: str = "documents",
    stratum_col: str = "lang",
) -> str:
    m = 1 << 60
    r = h60_sql(f"'s{seed}:' || CAST(doc_id AS VARCHAR)")
    return f"""
WITH d AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id, {stratum_col} AS stratum, {r} AS r,
         count(*) OVER (PARTITION BY {stratum_col}) AS n
  FROM {table}
),
surv AS (
  SELECT * FROM d
  WHERE r < least({m}, CAST(floor({m} * least(1.0, {oversample * k}.0 / n)) AS BIGINT))
)
SELECT doc_id, stratum FROM surv
QUALIFY row_number() OVER (PARTITION BY stratum ORDER BY r, doc_id) <= {k}
"""


# ---------------------------------------------------------------------------
# domain-mixture reweighting
# ---------------------------------------------------------------------------


def domain_mix_weights(
    docs: DataFrame, source_col: str = "source"
) -> DataFrame:
    """Per-source sampling weights that reshape the corpus's natural
    domain mix into a target mix: weight = target_share / actual_share
    (>1 upsample, <1 downsample) — the mixture knob of corpus assembly
    (e.g. boosting under-represented domains before training).  The
    target here is the deterministic literal mix
    share(source) ∝ 1 + (numeric suffix of source) % 3, so both engines
    compute it from the data alone.  Returns one row per source with
    e6-quantized shares/weights (hash-stable).  Single groupBy over the
    corpus -> a |sources|-row table; everything after is broadcast-sized.
    """
    agg = docs.groupBy(F.col(source_col).alias("source")).agg(
        F.count("*").alias("n_docs")
    )
    t_raw = 1 + F.regexp_extract("source", r"([0-9]+)$", 1).cast("long") % 3
    a = agg.withColumn("_t", t_raw)
    tot = a.agg(
        F.sum("n_docs").alias("nd"), F.sum("_t").alias("tt")
    ).collect()[0]
    actual = F.col("n_docs") / F.lit(int(tot["nd"]))
    target = F.col("_t") / F.lit(int(tot["tt"]))
    return a.select(
        "source",
        "n_docs",
        F.round(actual * 1e6).cast("long").alias("actual_e6"),
        F.round(target * 1e6).cast("long").alias("target_e6"),
        F.round(target / actual * 1e6).cast("long").alias("weight_e6"),
    )


def domain_mix_weights_sql(table: str = "documents") -> str:
    return f"""
WITH a AS (
  SELECT source, count(*) AS n_docs,
         1 + CAST(regexp_extract(source, '([0-9]+)$', 1) AS BIGINT) % 3 AS t
  FROM {table} GROUP BY source
),
tot AS (SELECT sum(n_docs) AS nd, sum(t) AS tt FROM a)
SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
       CAST(round(n_docs * 1e6 / nd) AS BIGINT) AS actual_e6,
       CAST(round(t * 1e6 / tt) AS BIGINT) AS target_e6,
       CAST(round((t / CAST(tt AS DOUBLE)) / (n_docs / CAST(nd AS DOUBLE)) * 1e6) AS BIGINT) AS weight_e6
FROM a, tot
"""


# ---------------------------------------------------------------------------
# context-window chunking
# ---------------------------------------------------------------------------


def chunk_docs(
    docs: DataFrame,
    chunk: int,
    stride: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split every document into overlapping ``chunk``-token windows that
    start every ``stride`` tokens (stride < chunk => overlapping training
    examples; stride == chunk => disjoint) — the context-window sample
    construction step of an LLM pipeline.  Tail windows shorter than
    ``chunk`` are kept.  Returns (doc_id, chunk_id, chunk_tokens,
    chunk_fp) where chunk_fp is the cross-engine h60 fingerprint of the
    space-joined window (what a manifest would store per sample).

    100-TB plan: pure per-row array expressions (split -> sequence ->
    explode -> slice) — embarrassingly parallel, zero shuffle, whole-stage
    codegen end to end; output size = ~(chunk/stride)x input tokens, the
    unavoidable cost of overlap."""
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    d = docs.select(
        F.col(id_col).cast("long").alias("doc_id"), toks.alias("_toks")
    )
    n = F.size("_toks")
    d = d.select(
        "doc_id",
        "_toks",
        F.explode(
            F.sequence(F.lit(0), n - 1, F.lit(stride))
        ).alias("_s"),
    )
    window = F.slice("_toks", F.col("_s") + 1, chunk)
    return d.select(
        "doc_id",
        (F.col("_s") / stride).cast("long").alias("chunk_id"),
        F.size(window).cast("long").alias("chunk_tokens"),
        h60(F.array_join(window, " ")).alias("chunk_fp"),
    )


def chunk_docs_sql(chunk: int, stride: int, table: str = "documents") -> str:
    win = f"list_slice(toks, s + 1, s + {chunk})"
    return f"""
WITH t AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         regexp_split_to_array(trim(lower(text)), '\\s+') AS toks
  FROM {table}
),
c AS (
  SELECT doc_id, toks, unnest(range(0, greatest(len(toks), 1), {stride})) AS s
  FROM t
)
SELECT doc_id,
       CAST(s / {stride} AS BIGINT) AS chunk_id,
       CAST(len({win}) AS BIGINT) AS chunk_tokens,
       {h60_sql(f"array_to_string({win}, ' ')")} AS chunk_fp
FROM c
"""


# ---------------------------------------------------------------------------
# bigram-LM cross-entropy (perplexity) scoring
# ---------------------------------------------------------------------------


def bigram_xent(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Score every document by its cross-entropy under an add-one-smoothed
    bigram LM trained on the WHOLE corpus — the classic LM-quality filter
    (high xent = unusual/garbled text, low = repetitive boilerplate).
    p(w2|w1) = (C(w1,w2) + 1) / (C(w1,*) + V); xent = -mean log2 p over
    the doc's bigrams.  Docs with < 2 tokens have no bigrams and are
    omitted.  Returns (doc_id, n_bigrams, xent_e6) with the mean
    e6-quantized (1-ulp libm differences are ~1e-15 relative — far below
    the quantization step).

    100-TB plan: two shuffles build the model (bigram counts, first-token
    counts — both token-keyed groupBys with map-side partial agg), two
    equi-joins score the corpus against it.  The model tables scale with
    vocab^2 worst case, NOT corpus size; hot tokens are classic AQE
    skew-join territory.  No Python anywhere — log2/sum/count are
    whole-stage codegen."""
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    t = docs.select(
        F.col(id_col).cast("long").alias("doc_id"), toks.alias("_toks")
    )
    b = t.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(_toks) - 1), "
                "i -> struct(element_at(_toks, i) AS w1, "
                "element_at(_toks, i + 1) AS w2))"
            )
        ).alias("_bg"),
    ).select("doc_id", F.col("_bg.w1").alias("w1"), F.col("_bg.w2").alias("w2"))
    b = b.persist()
    try:
        c2 = b.groupBy("w1", "w2").agg(F.count("*").alias("n2"))
        c1 = b.groupBy("w1").agg(F.count("*").alias("n1"))
        v = (
            t.select(F.explode("_toks").alias("w"))
            .agg(F.countDistinct("w").alias("v"))
            .collect()[0]["v"]
        )
        scored = (
            b.join(c2, ["w1", "w2"])
            .join(c1, ["w1"])
            .withColumn(
                "_lp",
                F.log2((F.col("n2") + 1) / (F.col("n1") + F.lit(int(v)))),
            )
        )
        return scored.groupBy("doc_id").agg(
            F.count("*").cast("long").alias("n_bigrams"),
            F.round(-F.avg("_lp") * 1e6).cast("long").alias("xent_e6"),
        )
    finally:
        b.unpersist()


def bigram_xent_sql(table: str = "documents") -> str:
    return f"""
WITH t AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         regexp_split_to_array(trim(lower(text)), '\\s+') AS toks
  FROM {table}
),
b AS (
  SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
  FROM t, unnest(range(1, len(toks))) AS u(i)
),
c2 AS (SELECT w1, w2, count(*) AS n2 FROM b GROUP BY 1, 2),
c1 AS (SELECT w1, count(*) AS n1 FROM b GROUP BY 1),
v AS (SELECT count(DISTINCT tok) AS v FROM t, unnest(toks) AS z(tok))
SELECT b.doc_id,
       CAST(count(*) AS BIGINT) AS n_bigrams,
       CAST(round(-avg(log2((n2 + 1) / (n1 + v.v))) * 1e6) AS BIGINT) AS xent_e6
FROM b JOIN c2 USING (w1, w2) JOIN c1 USING (w1), v
GROUP BY b.doc_id
"""


# ---------------------------------------------------------------------------
# mixture materialization (apply domain weights -> replicated/filtered corpus)
# ---------------------------------------------------------------------------


def materialize_mixture(
    docs: DataFrame,
    seed: int = 11,
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Materialize the reweighted corpus that ``domain_mix_weights``
    prescribes: every document is emitted ``floor(w)`` times plus one
    more with probability ``frac(w)`` — decided by an EXACT integer
    compare of a hash draw against ``weight_e6 % 1e6`` (no floats, no
    RNG), so the output is bit-identical across engines, partitionings
    and reruns, and E[copies] = w exactly (the corpus the training run
    actually consumes).  Returns (doc_id, source, copy_id).

    100-TB plan: the weight table is |sources| rows (broadcast join);
    replication is explode(sequence) — output sized sum(w_i), the
    unavoidable cost of upsampling; no shuffle beyond the one groupBy
    inside the weight computation."""
    w = domain_mix_weights(docs, source_col=source_col).select(
        "source", "weight_e6"
    )
    d = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(source_col).alias("source"),
    )
    j = d.join(F.broadcast(w), "source")
    base = (F.col("weight_e6") / 1_000_000).cast("long")
    frac = F.col("weight_e6") % 1_000_000
    hmod = (
        h60(F.concat(F.lit(f"mix{seed}:"), F.col("doc_id").cast("string")))
        % 1_000_000
    )
    k = (base + (hmod < frac).cast("long")).alias("k")
    n = j.select("doc_id", "source", k)
    # sequence(1, 0) would step BACKWARDS in Spark; clamp then filter
    return (
        n.withColumn(
            "copy_id",
            F.explode(F.sequence(F.lit(1), F.greatest(F.col("k"), F.lit(1)))),
        )
        .filter(F.col("copy_id") <= F.col("k"))
        .select("doc_id", "source", F.col("copy_id").cast("long").alias("copy_id"))
    )


def materialize_mixture_sql(seed: int = 11, table: str = "documents") -> str:
    h = h60_sql(f"'mix{seed}:' || CAST(doc_id AS VARCHAR)")
    return f"""
WITH a AS (
  SELECT source, count(*) AS n_docs,
         1 + CAST(regexp_extract(source, '([0-9]+)$', 1) AS BIGINT) % 3 AS t
  FROM {table} GROUP BY source
),
tot AS (SELECT sum(n_docs) AS nd, sum(t) AS tt FROM a),
w AS (
  SELECT source,
         CAST(round((t / CAST(tt AS DOUBLE)) / (n_docs / CAST(nd AS DOUBLE)) * 1e6) AS BIGINT) AS weight_e6
  FROM a, tot
),
j AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id, d.source,
         weight_e6 // 1000000 AS base,
         weight_e6 % 1000000 AS frac,
         {h} % 1000000 AS hmod
  FROM {table} d JOIN w USING (source)
),
n AS (
  SELECT doc_id, source,
         base + CASE WHEN hmod < frac THEN 1 ELSE 0 END AS k
  FROM j
)
SELECT doc_id, source, CAST(u.c AS BIGINT) AS copy_id
FROM n, unnest(range(1, k + 1)) AS u(c)
"""


# ---------------------------------------------------------------------------
# cross-document boilerplate flagging (CCNet-style repeated-paragraph removal)
# ---------------------------------------------------------------------------


def boilerplate_flags(
    docs: DataFrame,
    seg: int = 4,
    min_df: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document boilerplate accounting: split every document into
    disjoint ``seg``-token segments (via ``chunk_docs`` with
    stride == seg), flag segments whose fingerprint occurs in >= ``min_df``
    DISTINCT documents (navigation chrome / footers / licence blurbs
    repeat across pages; body text doesn't), and report
    (doc_id, n_segments, n_boiler, boiler_permille) — the CCNet-style
    paragraph-dedup signal used to strip template text before training.

    100-TB plan: one fingerprint-keyed groupBy builds the df table
    (segment-vocabulary sized, NOT corpus sized after the distinct), one
    equi-join flags segments, one per-doc agg; hot fingerprints (the
    boilerplate itself!) are exactly the keys AQE skew-split handles."""
    segs = chunk_docs(docs, chunk=seg, stride=seg,
                      id_col=id_col, text_col=text_col)
    segs = segs.persist()
    try:
        df_tab = segs.groupBy("chunk_fp").agg(
            F.countDistinct("doc_id").alias("_df")
        )
        flagged = segs.join(df_tab, "chunk_fp").select(
            "doc_id", (F.col("_df") >= min_df).cast("long").alias("_b")
        )
        return flagged.groupBy("doc_id").agg(
            F.count("*").cast("long").alias("n_segments"),
            F.sum("_b").cast("long").alias("n_boiler"),
            F.round(F.sum("_b") * 1000 / F.count("*")).cast("long")
            .alias("boiler_permille"),
        )
    finally:
        segs.unpersist()


def boilerplate_flags_sql(
    seg: int = 4, min_df: int = 2, table: str = "documents"
) -> str:
    chunks = chunk_docs_sql(chunk=seg, stride=seg, table=table)
    return f"""
WITH segs AS ({chunks}),
dfreq AS (
  SELECT chunk_fp, count(DISTINCT doc_id) AS df FROM segs GROUP BY chunk_fp
)
SELECT s.doc_id,
       CAST(count(*) AS BIGINT) AS n_segments,
       CAST(sum(CASE WHEN d.df >= {min_df} THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler,
       CAST(round(sum(CASE WHEN d.df >= {min_df} THEN 1 ELSE 0 END) * 1000.0
                  / count(*)) AS BIGINT) AS boiler_permille
FROM segs s JOIN dfreq d USING (chunk_fp)
GROUP BY s.doc_id
"""


# ---------------------------------------------------------------------------
# per-stratum quality-cutoff filtering (score-ranked keep list)
# ---------------------------------------------------------------------------

_QF_STOPWORDS = ("the", "a", "and", "of", "to", "in")


def quality_score(docs: DataFrame, text_col: str = "text") -> Column:
    """Stopword-ratio quality heuristic, e6-quantized (higher = more
    natural text) — the same formula as the `doc_quality` gate."""
    words = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    stops = F.size(F.filter(words, lambda w: w.isin(*_QF_STOPWORDS)))
    return F.round(stops / F.size(words) * 1e6).cast("long")


def quality_filter(
    docs: DataFrame,
    keep_permille: int = 800,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Keep EXACTLY ceil(n * keep_permille/1000) documents per stratum,
    ranked by (quality score DESC, doc_id ASC) — the per-language
    quality-cutoff filter of a corpus pipeline (drop the worst 20% of
    each language rather than a global cutoff that would empty
    low-resource strata).  Returns (doc_id, stratum, score_e6).

    100-TB plan: never rank a stratum, and never collect anything
    corpus- or granularity-sized.  Phase 1 finds the per-stratum
    threshold score t (and tie_keep = how many score==t docs still fit)
    with a TWO-LEVEL histogram: a coarse (stratum, score//1024) count —
    <= strata x 978 rows to the driver regardless of corpus size — walks
    to the coarse bucket containing rank k, then a fine histogram is
    collected ONLY for that boundary bucket (<= strata x 1024 rows).
    Phase 2 keeps score > t with a pure broadcast-map filter; the
    score==t tie group is selected by the SMALLEST tie_keep doc_ids via
    the same two-phase bounded-state prefix-rank as `shard_pack`:
    deterministic doc_id boundary sample -> range buckets -> per-bucket
    counts cumsum'd on the driver (strata x buckets rows) -> broadcast
    offsets + per-bucket row_number.  Max window state = one bucket of
    one stratum's tie group, so the degenerate single-score stratum no
    longer degrades to one ranked partition."""
    COARSE = 1024
    TIE_BUCKETS = 32
    d = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(stratum_col).alias("stratum"),
        quality_score(docs, text_col).alias("score_e6"),
    ).persist()
    try:
        # phase 1a: coarse histogram (bounded by granularity/COARSE)
        coarse = (
            d.groupBy("stratum", (F.col("score_e6") / COARSE).cast("long")
                      .alias("cb"))
            .count().collect()
        )
        by_s: dict = {}
        for r in coarse:
            by_s.setdefault(r["stratum"], []).append((r["cb"], r["count"]))
        k_s, cb_s, acc_s = {}, {}, {}
        for s, pairs in by_s.items():
            n = sum(c for _, c in pairs)
            k = (n * keep_permille + 999) // 1000
            acc = 0
            for cb, c in sorted(pairs, reverse=True):
                if acc + c >= k:
                    k_s[s], cb_s[s], acc_s[s] = k, cb, acc
                    break
                acc += c
        # phase 1b: fine histogram of ONLY each stratum's boundary bucket
        cb_m = F.create_map(*[F.lit(x) for s in sorted(cb_s)
                              for x in (s, cb_s[s])])
        fine = (
            d.filter((F.col("score_e6") / COARSE).cast("long")
                     == F.element_at(cb_m, F.col("stratum")))
            .groupBy("stratum", "score_e6").count().collect()
        )
        fine_s: dict = {}
        for r in fine:
            fine_s.setdefault(r["stratum"], []).append(
                (r["score_e6"], r["count"]))
        thr, tie = {}, {}
        for s, pairs in fine_s.items():
            acc = acc_s[s]
            for score, c in sorted(pairs, reverse=True):
                if acc + c >= k_s[s]:
                    thr[s] = score
                    tie[s] = k_s[s] - acc
                    break
                acc += c
        strata = sorted(thr)
        thr_m = F.create_map(*[F.lit(x) for s in strata for x in (s, thr[s])])
        tie_m = F.create_map(*[F.lit(x) for s in strata for x in (s, tie[s])])
        t_col = F.element_at(thr_m, F.col("stratum"))
        above = d.filter(F.col("score_e6") > t_col)

        # phase 2: tie group = smallest tie_keep doc_ids at score == t,
        # via two-phase bounded prefix rank (shard_pack pattern)
        tg = d.filter(F.col("score_e6") == t_col).persist()
        try:
            n_tie = {r["stratum"]: r["c"] for r in
                     tg.groupBy("stratum").agg(F.count("*").alias("c"))
                     .collect()}
            cand: dict = {s: [] for s in n_tie}
            n_all = sum(n_tie.values())
            samp = max(1, n_all // max(1, TIE_BUCKETS * 32 * len(n_tie)))
            for r in (tg.select("stratum", "doc_id")
                      .filter(F.xxhash64(F.col("doc_id"), F.lit(11)) % samp
                              == 0).collect()):
                cand[r["stratum"]].append(r["doc_id"])
            bounds = {}
            for s, ids in cand.items():
                ids.sort()
                step = max(1, len(ids) // TIE_BUCKETS)
                bounds[s] = ids[step::step][: TIE_BUCKETS - 1]
            bnd_m = F.create_map(*[
                F.lit(x) for s in sorted(bounds)
                for x in (s, F.array(*[F.lit(b) for b in bounds[s]])
                          if bounds[s] else F.array().cast("array<long>"))
            ])
            bcol = F.size(F.filter(
                F.element_at(bnd_m, F.col("stratum")),
                lambda b: F.col("doc_id") >= b,
            ))
            tb = tg.withColumn("_b", bcol.cast("int"))
            sums = {(r["stratum"], r["_b"]): r["c"] for r in
                    tb.groupBy("stratum", "_b").agg(F.count("*").alias("c"))
                    .collect()}
            off = {}
            for s in sorted(n_tie):
                acc = 0
                for i in range(len(bounds.get(s, [])) + 1):
                    off[f"{s}\x00{i}"] = acc
                    acc += sums.get((s, i), 0)
            off_m = F.create_map(*[F.lit(x) for kv in sorted(off.items())
                                   for x in kv])
            okey = F.concat(F.col("stratum"), F.lit("\x00"),
                            F.col("_b").cast("string"))
            w = Window.partitionBy("stratum", "_b").orderBy("doc_id")
            at = (
                tb.withColumn("_rk", F.element_at(off_m, okey)
                              + F.row_number().over(w))
                .filter(F.col("_rk") <= F.element_at(tie_m, F.col("stratum")))
                .select("doc_id", "stratum", "score_e6")
            )
            out = above.unionByName(at).localCheckpoint(eager=True)
        finally:
            tg.unpersist()
        return out
    finally:
        d.unpersist()


def quality_filter_sql(
    keep_permille: int = 800, table: str = "documents",
    stratum_col: str = "lang",
) -> str:
    sw = _QF_STOPWORDS
    return f"""
WITH d AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id, {stratum_col} AS stratum,
         CAST(round(len(list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
                                     x -> x IN {sw!r}))
                    / len(regexp_split_to_array(trim(lower(text)), '\\s+')) * 1e6)
              AS BIGINT) AS score_e6
  FROM {table}
),
r AS (
  SELECT *, count(*) OVER (PARTITION BY stratum) AS n,
         row_number() OVER (PARTITION BY stratum
                            ORDER BY score_e6 DESC, doc_id ASC) AS rn
  FROM d
)
SELECT doc_id, stratum, score_e6
FROM r WHERE rn <= (n * {keep_permille} + 999) // 1000
"""


# ---------------------------------------------------------------------------
# hashed-feature linear classifier scoring (fastText-style quality model)
# ---------------------------------------------------------------------------

# Hashing-trick dimensionality and the deterministic weight formula.
# w(b) = ((b * KNUTH + 12345) % 2001) - 1000, an integer in [-1000, 1000]
# (e3 fixed point).  b < HC_DIM = 512, so b*KNUTH < 2^41: no int64
# overflow in either engine, and both operands of every % are positive,
# so Spark's and DuckDB's % agree.
HC_DIM = 512
_HC_KNUTH = 2654435761


def hash_classifier_scores(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_tokens, score_e3, keep): score every document with a
    hashed-bag-of-words linear classifier — the fastText-style quality
    model of GPT-3/LLaMA-class pipelines (score against a
    reference-corpus classifier, keep docs scoring positive).  Token t
    maps to bucket h60(t) % HC_DIM; the document score is the sum of the
    bucket weights, e3-quantized integers end to end so the gate is
    exact.

    The weight vector here is a deterministic arithmetic formula rather
    than trained parameters (training is out of scope — the SCORING pass
    is the part that must scale, and its plan is identical whatever the
    weights): a per-row higher-order-function fold over the token array,
    whole-stage codegen, ZERO shuffle and no Python — at 100 TB this is
    a pure map over document splits, embarrassingly parallel.  Swapping
    in trained weights = one broadcast array lookup in the same fold."""
    from .dedup import h60, tokens

    def w_of(t):
        b = h60(t) % HC_DIM
        return (b * _HC_KNUTH + 12345) % 2001 - 1000

    toks = tokens(F.col(text_col))
    score = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + w_of(t)
    )
    return docs.select(
        F.col(id_col).cast("long").alias("id"),
        F.size(toks).cast("long").alias("n_tokens"),
        score.alias("score_e3"),
        (score > 0).cast("long").alias("keep"),
    )


def hash_classifier_sql(table: str = "documents",
                        text_expr: str = "text") -> str:
    """DuckDB twin of :func:`hash_classifier_scores`."""
    from .dedup import h60_sql

    w = f"regexp_split_to_array(trim(lower({text_expr})), '\\s+')"
    wexpr = (f"(({h60_sql('t')} % {HC_DIM}) * {_HC_KNUTH} + 12345) "
             f"% 2001 - 1000")
    return f"""
WITH s AS (
  SELECT CAST(doc_id AS BIGINT) AS id,
         CAST(len({w}) AS BIGINT) AS n_tokens,
         CAST(COALESCE(list_sum(list_transform({w}, t -> {wexpr})), 0)
              AS BIGINT) AS score_e3
  FROM {table}
)
SELECT id, n_tokens, score_e3,
       CAST(CASE WHEN score_e3 > 0 THEN 1 ELSE 0 END AS BIGINT) AS keep
FROM s
"""


# ---------------------------------------------------------------------------
# BPE merge-rule learning (tokenizer training)
# ---------------------------------------------------------------------------

BPE_ROUNDS = 6


def bpe_train(docs: DataFrame, rounds: int = BPE_ROUNDS,
              text_col: str = "text") -> DataFrame:
    """Learn byte-pair-encoding merge rules (Sennrich et al., ACL'16)
    from the corpus: per round, the corpus-frequency-weighted most
    common adjacent symbol pair becomes a merge rule and is applied
    greedily left-to-right (non-overlapping) across the vocabulary.
    Returns (round, lsym, rsym, pair_count) — the learned tokenizer.

    Spark-first plan: training runs on the WORD-FREQUENCY VOCAB, not
    the corpus — one corpus-sized aggregation up front, then every
    round touches only the vocab's symbol table (word, freq, pos, sym),
    which is orders of magnitude smaller than the corpus at any scale.
    All per-word operations (adjacent-pair lead, run grouping, reindex)
    are windows PARTITIONED BY word — state bounded by word length,
    never a global sort.  The winning rule per round is a 1-row
    driver scalar (bounded, like the adaptive estimator loop); ties
    break deterministically by (count DESC, lsym, rsym) so the learned
    rules are engine- and partitioning-exact.

    Greedy non-overlap is positional: candidate pair positions that
    form a consecutive run (only possible when lsym == rsym, e.g.
    'aaaa') overlap pairwise, so greedy left-to-right keeps exactly
    the even offsets within each run — reproduced verbatim in the SQL
    twin, making the merge semantics identical by construction."""
    words = (
        docs.select(
            F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+"))
            .alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )
    syms = words.select(
        "word", "freq",
        F.explode(F.sequence(F.lit(1), F.length("word"))).alias("pos"),
    ).select(
        "word", "freq", F.col("pos").cast("long").alias("pos"),
        F.expr("substring(word, pos, 1)").alias("sym"),
    ).localCheckpoint(eager=True)

    spark = docs.sparkSession
    w_word = Window.partitionBy("word").orderBy("pos")
    rules = []
    for rnd in range(1, rounds + 1):
        pairs = (
            syms.withColumn("nsym", F.lead("sym").over(w_word))
            .filter(F.col("nsym").isNotNull())
        )
        top = (
            pairs.groupBy(F.col("sym").alias("l"), F.col("nsym").alias("r"))
            .agg(F.sum("freq").cast("long").alias("c"))
            .orderBy(F.col("c").desc(), "l", "r")
            .limit(1)
            .collect()
        )
        if not top:
            break
        l, r, c = top[0]["l"], top[0]["r"], top[0]["c"]
        rules.append((rnd, l, r, int(c)))
        cand = pairs.filter(
            (F.col("sym") == l) & (F.col("nsym") == r)).select("word", "pos")
        runs = cand.withColumn(
            "grp", F.col("pos") - F.row_number().over(w_word))
        kept = (
            runs.withColumn(
                "off",
                F.row_number().over(
                    Window.partitionBy("word", "grp").orderBy("pos")),
            )
            .filter(F.col("off") % 2 == 1)
            .select("word", "pos")
        )
        covered = kept.unionByName(
            kept.select("word", (F.col("pos") + 1).alias("pos")))
        merged = (
            syms.join(kept, ["word", "pos"])
            .select("word", "freq", "pos", F.lit(l + r).alias("sym"))
        )
        unchanged = syms.join(covered, ["word", "pos"], "left_anti")
        # localCheckpoint (not persist): each round's plan references the
        # previous round's symbol table in THREE branches (pairs, merged,
        # unchanged), so without lineage truncation the logical plan grows
        # ~3^rounds and analysis/persist dies with a JVM stack overflow.
        # Eager checkpoint bounds the plan to one round and also stops the
        # winner-collect from recomputing the whole history each round.
        syms = (
            unchanged.unionByName(merged)
            .withColumn("pos", F.row_number().over(w_word).cast("long"))
            .localCheckpoint(eager=True)
        )
    return spark.createDataFrame(
        rules, "round long, lsym string, rsym string, pair_count long")


def bpe_train_sql(rounds: int = BPE_ROUNDS, table: str = "documents") -> str:
    """DuckDB twin of bpe_train: the same rounds unrolled as generated
    CTEs — identical pair counting, tie-break, greedy-run merge, and
    positional reindex."""
    finals = "\nUNION ALL\n".join(
        f"SELECT CAST({i} AS BIGINT) AS round, l AS lsym, r AS rsym, "
        f"c AS pair_count FROM rule_{i}"
        for i in range(1, rounds + 1))
    return "WITH " + ",".join(_bpe_ctes(rounds, table)) + "\n" + finals


def _bpe_ctes(rounds: int, table: str) -> list[str]:
    """The unrolled BPE round CTEs shared by the train and encode twins:
    syms_1 is the character-split vocab, rule_i / kept_i / syms_{i+1}
    replay round i's pair count, winner, greedy-run keep set, and merged
    symbol table."""
    ctes = [f"""
words AS MATERIALIZED (
  SELECT word, CAST(count(*) AS BIGINT) AS freq
  FROM (SELECT unnest(regexp_split_to_array(trim(lower(text)), '\\s+'))
          AS word FROM {table})
  WHERE word <> '' GROUP BY word),
syms_1 AS MATERIALIZED (
  SELECT word, freq, CAST(pos AS BIGINT) AS pos,
         substring(word, CAST(pos AS INT), 1) AS sym
  FROM words, unnest(range(1, CAST(len(word) AS BIGINT) + 1)) t(pos))"""]
    for i in range(1, rounds + 1):
        ctes.append(f"""
pairs_{i} AS MATERIALIZED (
  SELECT word, freq, pos, sym AS l,
         lead(sym) OVER (PARTITION BY word ORDER BY pos) AS r
  FROM syms_{i}),
rule_{i} AS MATERIALIZED (
  SELECT l, r, CAST(sum(freq) AS BIGINT) AS c
  FROM pairs_{i} WHERE r IS NOT NULL GROUP BY l, r
  ORDER BY c DESC, l, r LIMIT 1),
kept_{i} AS MATERIALIZED (
  SELECT word, pos FROM (
    SELECT word, pos,
           pos - row_number() OVER (PARTITION BY word ORDER BY pos) AS grp
    FROM pairs_{i} p
    WHERE EXISTS (SELECT 1 FROM rule_{i} ru
                  WHERE ru.l = p.l AND ru.r = p.r))
  QUALIFY row_number() OVER (PARTITION BY word, grp ORDER BY pos) % 2 = 1),
syms_{i + 1} AS MATERIALIZED (
  SELECT word, freq,
         CAST(row_number() OVER (PARTITION BY word ORDER BY pos) AS BIGINT)
           AS pos,
         sym
  FROM (
    SELECT s.word, s.freq, s.pos, ru.l || ru.r AS sym
    FROM syms_{i} s
    JOIN kept_{i} k ON k.word = s.word AND k.pos = s.pos
    CROSS JOIN rule_{i} ru
    UNION ALL
    SELECT s.word, s.freq, s.pos, s.sym
    FROM syms_{i} s
    WHERE NOT EXISTS (SELECT 1 FROM kept_{i} k
                      WHERE k.word = s.word
                        AND (k.pos = s.pos OR k.pos + 1 = s.pos))))""")
    return ctes


# ---------------------------------------------------------------------------
# BPE encode (tokenizer application)
# ---------------------------------------------------------------------------


def bpe_apply_word(word: str, rules: list[tuple[str, str]]) -> list[str]:
    """Encode one word with an ordered BPE merge-rule list: for each rule
    in training order, one greedy left-to-right non-overlapping pass over
    the current symbol list (merges created by a pass are NOT re-matched
    within the same pass — exactly the per-round window semantics of
    :func:`bpe_train`).  Pure Python; shared by the vectorized encoder's
    pandas UDF and the tests' independent oracle."""
    syms = list(word)
    for left, right in rules:
        out: list[str] = []
        i = 0
        n = len(syms)
        while i < n:
            if i + 1 < n and syms[i] == left and syms[i + 1] == right:
                out.append(left + right)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def bpe_encode(docs: DataFrame, rules: list[tuple[str, str]],
               text_col: str = "text") -> DataFrame:
    """Tokenize the corpus with a trained BPE merge table and return
    per-token statistics (token, n_occurrences, n_words): the encode /
    apply counterpart of :func:`bpe_train` (Sennrich et al., ACL'16).

    Spark-first plan, vocab-bounded like training: the corpus is touched
    ONCE for the word-frequency vocab; the Python merge fold then runs on
    DISTINCT words only (an Arrow-batched pandas UDF — the per-word
    iterative merge is inherently sequential so this is the sanctioned
    non-JVM path, and its input is the vocab, orders of magnitude smaller
    than the corpus at any scale).  The tiny rule list (``rounds`` rows)
    ships to executors by closure — the broadcast-small-side pattern.
    Token stats weight each (word, token-position) by the word's corpus
    frequency, so the output equals tokenizing every document directly.

    At 100 TB: one corpus-sized groupBy(word) shuffle + a vocab-sized
    map + a vocab-sized groupBy(token) shuffle.  No per-document Python,
    no state beyond the vocab."""
    rules = [(str(l), str(r)) for l, r in rules]

    words = (
        docs.select(
            F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+"))
            .alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )

    @F.pandas_udf("array<string>")
    def enc(col: pd.Series) -> pd.Series:
        return col.map(lambda w: bpe_apply_word(w, rules))

    toks = words.select(
        "word", "freq", F.explode(enc("word")).alias("token"))
    return toks.groupBy("token").agg(
        F.sum("freq").cast("long").alias("n_occurrences"),
        F.countDistinct("word").cast("long").alias("n_words"),
    )


def bpe_encode_sql(rounds: int = BPE_ROUNDS, table: str = "documents") -> str:
    """DuckDB twin of train-then-encode: replay the identical unrolled
    training rounds (shared CTEs with :func:`bpe_train_sql`) and
    aggregate the FINAL symbol table — one row per (word, position), so
    sum(freq) counts token occurrences with in-word multiplicity and the
    distinct-word count matches the encoder's explode exactly."""
    return (
        "WITH " + ",".join(_bpe_ctes(rounds, table)) + f"""
SELECT sym AS token, CAST(sum(freq) AS BIGINT) AS n_occurrences,
       CAST(count(DISTINCT word) AS BIGINT) AS n_words
FROM syms_{rounds + 1}
GROUP BY sym
""")


# ---------------------------------------------------------------------------
# context-window sequence packing (next-fit, no document splitting)
# ---------------------------------------------------------------------------


def context_pack(
    docs: DataFrame,
    capacity: int,
    n_groups: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Pack whole documents into fixed-capacity context windows (the
    sequence-packing step that turns a filtered corpus into LLM training
    rows): within each pack group, docs are taken in ascending id order
    and NEXT-FIT packed — a doc goes into the currently-open bin if it
    fits, else the bin is closed and a new one opened.  Documents are
    never split (contrast ``shard_pack``, whose running-total shards cut
    across doc boundaries); a doc longer than ``capacity`` gets a bin to
    itself.  Returns (doc_id, grp, bin_id, offset, n_tokens) where
    ``offset`` is the doc's first token slot in its bin.

    Next-fit is inherently a sequential fold (bin state depends on every
    earlier doc), so the parallel unit is the PACK GROUP
    (``grp = doc_id % n_groups`` — in production, the output shard): the
    fold runs per group inside one applyInPandas task, groups run in
    parallel, and state per task is one group's (doc_id, n_tokens) pairs
    — at 100 TB you size n_groups to the target shard count (thousands),
    so each task holds one shard's manifest, never the corpus.  Only the
    (id, n_tokens) projection enters the shuffle — text stays behind.

    DuckDB twin: the same fold as a recursive CTE stepping row-rank
    within every group in parallel (see ``context_pack_sql``).
    """
    d = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        (F.col(id_col).cast("long") % n_groups).alias("grp"),
        n_tokens(F.col(text_col)).alias("n_tokens"),
    )

    schema = (
        "doc_id long, grp long, bin_id long, offset long, n_tokens long"
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        fill, b = 0, 0
        bins, offs = [], []
        for n in pdf["n_tokens"]:
            n = int(n)
            if fill > 0 and fill + n > capacity:
                b += 1
                fill = 0
            bins.append(b)
            offs.append(fill)
            fill += n
        pdf["bin_id"] = pd.Series(bins, dtype="int64")
        pdf["offset"] = pd.Series(offs, dtype="int64")
        return pdf[["doc_id", "grp", "bin_id", "offset", "n_tokens"]]

    return d.groupBy("grp").applyInPandas(pack, schema)


def context_pack_sql(
    capacity: int, n_groups: int = 8, table: str = "documents"
) -> str:
    """Recursive-CTE twin of :func:`context_pack`: one recursion advances
    row-rank ``rn`` in every group simultaneously; the new-bin condition
    ``prev_offset + prev_n + n > capacity`` is exactly the Spark fold's
    (the open bin's fill is ``offset + n_tokens`` of the previous doc,
    always > 0)."""
    return f"""
WITH RECURSIVE t AS (
  SELECT doc_id, doc_id % {n_groups} AS grp, {N_TOKENS_SQL} AS n_tokens,
         row_number() OVER (PARTITION BY doc_id % {n_groups}
                            ORDER BY doc_id) AS rn
  FROM {table}
),
walk(grp, rn, doc_id, n_tokens, bin_id, off) AS (
  SELECT grp, rn, doc_id, n_tokens, CAST(0 AS BIGINT), CAST(0 AS BIGINT)
  FROM t WHERE rn = 1
  UNION ALL
  SELECT t.grp, t.rn, t.doc_id, t.n_tokens,
         CASE WHEN w.off + w.n_tokens + t.n_tokens > {capacity}
              THEN w.bin_id + 1 ELSE w.bin_id END,
         CASE WHEN w.off + w.n_tokens + t.n_tokens > {capacity}
              THEN CAST(0 AS BIGINT) ELSE w.off + w.n_tokens END
  FROM walk w JOIN t ON t.grp = w.grp AND t.rn = w.rn + 1
)
SELECT doc_id, CAST(grp AS BIGINT) AS grp, bin_id,
       off AS offset, n_tokens
FROM walk
"""


# ---------------------------------------------------------------------------
# distributed quality-classifier TRAINING (hard-sigmoid logistic GD)
# ---------------------------------------------------------------------------

# probe-token presence features over the whitespace tokenization; the
# bias + probes + length flag give dim = len(tokens) + 2
CLF_PROBE_TOKENS = ("the", "value", "table", "fast", "spark", "row")
CLF_DIM = len(CLF_PROBE_TOKENS) + 2


def _clf_feature_cols(text_col: Column) -> list[Column]:
    toks = F.split(F.trim(F.lower(text_col)), r"\s+")
    feats = [F.lit(1).cast("long")]
    for t in CLF_PROBE_TOKENS:
        feats.append(F.array_contains(toks, t).cast("long"))
    feats.append((F.size(toks) > 30).cast("long"))
    return feats


def train_quality_classifier(
    docs: DataFrame,
    iters: int = 5,
    text_col: str = "text",
    label_col: str = "lang",
    positive: str = "en",
) -> DataFrame:
    """Distributed TRAINING of a linear quality classifier by full-batch
    gradient descent with a HARD sigmoid — every quantity is a BIGINT, so
    the learned weights are bit-identical across engines (no transcendental
    exp whose last ulp could differ between JVM and C).

    Model: p_e6 = clamp(5e5 + floor(z/4), 0, 1e6) with z = Σ_f w_f·x_f
    (weights e6-scaled, features ∈ {0,1}: bias, probe-token presence,
    length>30) — the "hard sigmoid" (σ̃(z) = clip(0.5 + z/4)), whose GD
    update is the perceptron-smoothed rule
    ``w_f ← w_f − floor(Σ_docs (p_e6 − y·1e6)·x_f / n)`` (unit learning
    rate, explicit floor on BOTH engines).  Label: ``label_col ==
    positive``.  Returns (feature, weight_e6), ``CLF_DIM`` rows.

    Scale: each iteration is ONE map-side-combinable aggregation over the
    corpus (dim partial sums per task — a dim-row shuffle); the weight
    vector is a dim-element driver scalar folded into the next iteration's
    literal expression — bounded state, the classic distributed-GD layout
    (parameter vector small, data never moves).  The corpus projection is
    computed once and persisted; iters × one-pass cost, no lineage growth.
    """
    feats = _clf_feature_cols(F.col(text_col))
    d = docs.select(
        *[f.alias(f"x{i}") for i, f in enumerate(feats)],
        (F.col(label_col) == positive).cast("long").alias("y"),
    ).persist()
    try:
        n = d.count()
        w = [0] * CLF_DIM
        for _it in range(iters):
            z = sum(
                (F.col(f"x{i}") * F.lit(int(w[i])) for i in range(CLF_DIM)),
                F.lit(0).cast("long"),
            )
            p = F.greatest(
                F.lit(0).cast("long"),
                F.least(
                    F.lit(1_000_000).cast("long"),
                    F.lit(500_000) + F.floor(z / F.lit(4.0)).cast("long"),
                ),
            )
            err = p - F.col("y") * F.lit(1_000_000)
            row = d.agg(
                *[F.sum(err * F.col(f"x{i}")).alias(f"g{i}") for i in range(CLF_DIM)]
            ).collect()[0]
            w = [w[i] - (int(row[f"g{i}"]) // n) for i in range(CLF_DIM)]
    finally:
        d.unpersist()
    return docs.sparkSession.createDataFrame(
        [(i, int(w[i])) for i in range(CLF_DIM)], "feature long, weight_e6 long"
    )


def train_quality_classifier_sql(
    iters: int = 5, table: str = "documents",
    label_col: str = "lang", positive: str = "en",
) -> str:
    """Unrolled SQL twin of :func:`train_quality_classifier`: per-iteration
    CTEs compute the gradient aggregate against the previous scalar weight
    row (CROSS JOIN), with the identical clamp/floor arithmetic."""
    toks = r"regexp_split_to_array(trim(lower(text)), '\s+')"
    xs = ["CAST(1 AS BIGINT) AS x0"]
    for i, t in enumerate(CLF_PROBE_TOKENS):
        xs.append(
            f"CAST(list_contains({toks}, '{t}') AS BIGINT) AS x{i + 1}"
        )
    xs.append(f"CAST(len({toks}) > 30 AS BIGINT) AS x{CLF_DIM - 1}")
    dim = CLF_DIM
    parts = [
        f"t AS MATERIALIZED (SELECT {', '.join(xs)},"
        f" CAST({label_col} = '{positive}' AS BIGINT) AS y FROM {table})",
        "nn AS (SELECT count(*) AS c FROM t)",
        "w0 AS (SELECT "
        + ", ".join(f"CAST(0 AS BIGINT) AS w{i}" for i in range(dim))
        + ")",
    ]
    for k in range(1, iters + 1):
        z = " + ".join(f"w.w{i} * t.x{i}" for i in range(dim))
        p = (
            f"greatest(CAST(0 AS BIGINT), least(CAST(1000000 AS BIGINT),"
            f" 500000 + CAST(floor(({z}) / 4.0) AS BIGINT)))"
        )
        gs = ", ".join(
            f"sum(({p} - t.y * 1000000) * t.x{i}) AS g{i}" for i in range(dim)
        )
        parts.append(
            f"g{k} AS (SELECT {gs} FROM t CROSS JOIN w{k - 1} w)"
        )
        # exact integer floor division (Python `g // n` twin): subtract the
        # sign-corrected remainder, then integer-divide the now exactly
        # divisible numerator.  The earlier CAST(g AS DOUBLE)/n + floor
        # form was only bit-exact while |g| < 2^53 (~9e9 docs at err=1e6);
        # this form is exact at any BIGINT magnitude — the 100TB design
        # point's 'bit-identical across engines' claim holds unconditionally
        ws = ", ".join(
            f"w.w{i} - ((g.g{i} - ((g.g{i} % nn.c) + nn.c) % nn.c) // nn.c)"
            f" AS w{i}"
            for i in range(dim)
        )
        parts.append(
            f"w{k} AS (SELECT {ws} FROM w{k - 1} w CROSS JOIN g{k} g"
            f" CROSS JOIN nn)"
        )
    union = "\nUNION ALL\n".join(
        f"SELECT CAST({i} AS BIGINT) AS feature, w{i} AS weight_e6"
        f" FROM w{iters}"
        for i in range(dim)
    )
    return "WITH " + ",\n".join(parts) + "\n" + union
