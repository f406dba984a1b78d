"""Text-analysis operators: document fingerprinting (rolling polynomial
hash) and BPE-ish regex token counting.

All pure built-in column expressions (JVM-side) with exact DuckDB oracles.
Language-ID, quality scoring and whitespace token counting live in
suite.py (q_lang_guess / q_doc_quality / q_doc_token_stats); this module
adds the content-fingerprint and tokenizer-statistics operators of a
training-data pipeline.

Reference parity: fingerprint-dedup generalizes the reference's
preprocessing dedup (/root/reference/datasets/wiki-vote/scripts/process.cpp:83-86)
from exact-row to content-hash identity.
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .dedup import h60, h60_sql, tokens

# Karp-Rabin parameters: base B, modulus M = 2^31 - 1.
# Accumulator < 2^31, token hash < 2^31  =>  acc*B + th < 2^51 + 2^31: no
# int64 overflow in either engine.
KR_BASE = 1_000_003
KR_MOD = (1 << 31) - 1

# BPE-ish tokenizer: letter runs | digit runs | single non-alnum-non-space
BPE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def fingerprint(text: Column) -> Column:
    """Order-sensitive rolling hash over whitespace tokens (Karp-Rabin)."""
    th = lambda w: h60(w) % KR_MOD  # noqa: E731
    return F.aggregate(
        tokens(text),
        F.lit(0).cast("long"),
        lambda acc, w: (acc * KR_BASE + th(w)) % KR_MOD,
    )


def fingerprint_sql(text_expr: str) -> str:
    w = f"regexp_split_to_array(trim(lower({text_expr})), '\\s+')"
    hashes = f"list_transform({w}, w -> ({h60_sql('w')}) % {KR_MOD})"
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), {hashes}), "
        f"(acc, h) -> (acc * {KR_BASE} + h) % {KR_MOD})"
    )


def doc_fingerprints(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """(doc_id, fingerprint, keep_id, is_dup) — fingerprint-identity dedup."""
    f = docs.select(F.col(id_col).alias("doc_id"),
                    fingerprint(F.col(text_col)).alias("fingerprint"))
    keep = f.groupBy("fingerprint").agg(F.min("doc_id").alias("keep_id"))
    return f.join(keep, "fingerprint").select(
        "doc_id", "fingerprint", F.col("keep_id").cast("long").alias("keep_id"),
        (F.col("doc_id") != F.col("keep_id")).alias("is_dup"),
    )


def doc_fingerprints_sql(table: str = "documents", text_expr: str = "text",
                         id_expr: str = "doc_id") -> str:
    return f"""
WITH f AS (
  SELECT {id_expr} AS doc_id, {fingerprint_sql(text_expr)} AS fingerprint
  FROM {table}
),
keep AS (SELECT fingerprint, min(doc_id) AS keep_id FROM f GROUP BY fingerprint)
SELECT f.doc_id, f.fingerprint, CAST(k.keep_id AS BIGINT) AS keep_id,
       f.doc_id <> k.keep_id AS is_dup
FROM f JOIN keep k ON f.fingerprint = k.fingerprint
"""


def bpe_token_stats(docs: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_bpe, n_alpha, n_num, n_punct) via regex token classes."""
    toks = F.regexp_extract_all(F.col(text_col), F.lit(BPE_RE), 0)
    cls = lambda pat: F.size(F.filter(toks, lambda t: t.rlike(pat)))  # noqa: E731
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).cast("long").alias("n_bpe"),
        cls("^[A-Za-z]+$").cast("long").alias("n_alpha"),
        cls("^[0-9]+$").cast("long").alias("n_num"),
        (F.size(toks) - cls("^[A-Za-z]+$") - cls("^[0-9]+$")).cast("long").alias("n_punct"),
    )


def collocations_topk(docs: DataFrame, text_col: str = "text",
                      min_count: int = 5, k: int = 20) -> DataFrame:
    """Top-k bigram collocations by Dice coefficient over the corpus.

    Dice(w1, w2) = 2·c(w1w2) / (c(w1) + c(w2)) — the integer-exact
    collocation measure (PMI needs N² products that overflow BIGINT at
    corpus scale; Dice's single division of exact counts is
    engine-deterministic).  Emitted e6-quantized with a total order
    (dice desc, w1, w2), so top-k is unambiguous.

    Scale: bigrams come from an arrays_zip of two slices (no per-token
    self-join); the unigram table is broadcast (min-support keeps the
    candidate pairs bounded; a web-scale corpus would pre-filter the
    vocabulary by the same support threshold before the broadcast).
    """
    w = tokens(F.col(text_col))
    t = docs.filter(F.length(F.trim(F.col(text_col))) > 0).select(w.alias("w"))
    uni = (
        t.select(F.explode("w").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    pairs = (
        t.filter(F.size("w") >= 2)
        .select(
            F.explode(
                F.arrays_zip(
                    F.slice("w", 1, F.size("w") - 1).alias("w1"),
                    F.slice("w", 2, F.size("w") - 1).alias("w2"),
                )
            ).alias("p")
        )
        .select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    )
    cnt = (
        pairs.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("cxy"))
        .filter(F.col("cxy") >= min_count)
    )
    return (
        cnt.join(
            F.broadcast(uni.select(F.col("tok").alias("w1"), F.col("c").alias("c1"))),
            "w1",
        )
        .join(
            F.broadcast(uni.select(F.col("tok").alias("w2"), F.col("c").alias("c2"))),
            "w2",
        )
        .select(
            "w1", "w2", F.col("cxy").cast("long").alias("cxy"),
            F.round(F.lit(2e6) * F.col("cxy") / (F.col("c1") + F.col("c2")))
            .cast("long")
            .alias("dice_e6"),
        )
        .orderBy(F.col("dice_e6").desc(), "w1", "w2")
        .limit(k)
    )


def collocations_sql(table: str = "documents", text_expr: str = "text",
                     min_count: int = 5, k: int = 20) -> str:
    return rf"""
WITH t AS (
  SELECT regexp_split_to_array(trim(lower({text_expr})), '\s+') AS w
  FROM {table} WHERE length(trim({text_expr})) > 0),
toks AS (SELECT unnest(w) AS tok FROM t),
uni AS (SELECT tok, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY tok),
big AS (SELECT unnest(list_zip(w[:len(w)-1], w[2:])) AS p FROM t WHERE len(w) >= 2),
cnt AS (SELECT p[1] AS w1, p[2] AS w2, CAST(count(*) AS BIGINT) AS cxy
        FROM big GROUP BY 1, 2)
SELECT b.w1, b.w2, b.cxy,
       CAST(round(2e6 * b.cxy / (u1.c + u2.c)) AS BIGINT) AS dice_e6
FROM cnt b JOIN uni u1 ON u1.tok = b.w1 JOIN uni u2 ON u2.tok = b.w2
WHERE b.cxy >= {min_count}
ORDER BY dice_e6 DESC, w1, w2 LIMIT {k}
"""


def tfidf_topk(docs: DataFrame, text_col: str = "text",
               id_col: str = "doc_id", k: int = 3) -> DataFrame:
    """Top-k TF-IDF terms per document: (doc_id, term, tf, score).

    idf is quantized PER TERM before the product — idf_e6 =
    round(1e6·ln(N/df)) of exact integer counts, score = tf·idf_e6 —
    so every value is an exact BIGINT product (no float accumulation;
    the one ln/round is a single IEEE double expression both engines
    evaluate identically, the adamic_adar precedent).  Ties break on
    term asc for a total order.

    Scale: tf is one (doc, term) groupBy; df one term groupBy over the
    distinct pairs (map-side combinable); the df table joins back on the
    term key (broadcast-able once min-df pruning bounds the vocabulary).
    The top-k window partitions by doc_id — V-doc parallelism, no
    global sort.
    """
    from pyspark.sql import Window

    base = (
        docs.filter(F.length(F.trim(F.col(text_col))) > 0)
        .select(F.col(id_col).alias("doc_id"),
                F.explode(tokens(F.col(text_col))).alias("term"))
    )
    tf = base.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = base.select("doc_id").distinct().count()
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        tf.join(df_, "term")
        .select(
            "doc_id", "term", F.col("tf").cast("long").alias("tf"),
            (
                F.col("tf")
                * F.round(F.lit(1e6) * F.log(F.lit(float(n_docs)) / F.col("df")))
                .cast("long")
            ).alias("score"),
        )
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("doc_id", "term", "tf", "score",
                F.col("rnk").cast("long").alias("rnk"))
    )


def tfidf_sql(table: str = "documents", text_expr: str = "text",
              id_expr: str = "doc_id", k: int = 3) -> str:
    return rf"""
WITH base AS (
  SELECT {id_expr} AS doc_id,
         unnest(regexp_split_to_array(trim(lower({text_expr})), '\s+')) AS term
  FROM {table} WHERE length(trim({text_expr})) > 0),
tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
       FROM base GROUP BY doc_id, term),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
n AS (SELECT count(DISTINCT doc_id) AS n FROM base),
scored AS (
  SELECT t.doc_id, t.term, t.tf,
         t.tf * CAST(round(1e6 * ln(CAST(n.n AS DOUBLE) / d.df)) AS BIGINT)
           AS score
  FROM tf t JOIN df d ON t.term = d.term, n)
SELECT doc_id, term, tf, score, rnk FROM (
  SELECT *, CAST(row_number() OVER (
      PARTITION BY doc_id ORDER BY score DESC, term ASC) AS BIGINT) AS rnk
  FROM scored) WHERE rnk <= {k}
"""


def bpe_token_stats_sql(table: str = "documents", text_expr: str = "text",
                        id_expr: str = "doc_id") -> str:
    toks = f"regexp_extract_all({text_expr}, '{BPE_RE}')"
    return f"""
WITH t AS (SELECT {id_expr} AS doc_id, {toks} AS toks FROM {table})
SELECT doc_id,
       CAST(len(toks) AS BIGINT) AS n_bpe,
       CAST(len(list_filter(toks, x -> regexp_matches(x, '^[A-Za-z]+$'))) AS BIGINT) AS n_alpha,
       CAST(len(list_filter(toks, x -> regexp_matches(x, '^[0-9]+$'))) AS BIGINT) AS n_num,
       CAST(len(toks)
            - len(list_filter(toks, x -> regexp_matches(x, '^[A-Za-z]+$')))
            - len(list_filter(toks, x -> regexp_matches(x, '^[0-9]+$'))) AS BIGINT) AS n_punct
FROM t
"""


def repetition_stats(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id", k: int = 3) -> DataFrame:
    """(id, total_grams, distinct_grams, rep_e6): intra-document word
    k-gram repetition ratio ``1 - distinct/total`` — the C4-style "mostly
    repeated boilerplate" quality gate (drop docs with rep above a
    threshold before training).  Pure per-row array expressions: no
    shuffle at all, whole-stage codegen end to end."""
    from .dedup import tokens, word_shingles

    w = tokens(F.col(text_col))
    total = F.greatest(F.size(w) - (k - 1), F.lit(0))
    distinct = F.size(word_shingles(F.col(text_col), k))
    return docs.select(
        F.col(id_col).alias("id"),
        total.cast("long").alias("total_grams"),
        distinct.cast("long").alias("distinct_grams"),
        F.when(total > 0,
               F.round((total - distinct).cast("double") * 1e6 / total))
        .otherwise(F.lit(0)).cast("long").alias("rep_e6"),
    )


def inverted_index(docs: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """(term, df, postings): the search-index construction pass — explode
    distinct terms per doc, group to document-frequency + a sorted
    posting list (comma-joined string so the value is engine-portable).

    One explode + one grouped agg; the posting `collect_list` is the
    only per-term state and is bounded by df — for web-scale vocabularies
    the standard mitigation is posting-list sharding (group key (term,
    doc_id mod S)), which this plan accepts unchanged since the sort and
    join keys already include the term."""
    terms = docs.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(tokens(F.col(text_col)))).alias("term"),
    ).filter(F.col("term") != "")
    return (
        terms.groupBy("term")
        .agg(
            F.count(F.lit(1)).cast("long").alias("df"),
            F.concat_ws(",", F.sort_array(F.collect_list("id"))
                        .cast("array<string>")).alias("postings"),
        )
    )


# ---------------------------------------------------------------------------
# Unicode NFC normalization (pre-dedup canonicalization)
# ---------------------------------------------------------------------------


@F.pandas_udf(T.StringType())
def nfc_normalize_udf(texts: pd.Series) -> pd.Series:
    """Vectorized Unicode NFC normalization (Arrow batches)."""
    return texts.map(
        lambda t: unicodedata.normalize("NFC", t) if t is not None else None
    )


def nfc_stats(docs: DataFrame, id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """Unicode NFC canonicalization accounting: (doc_id, changed,
    nfc_fp) where ``changed`` flags documents whose text was not already
    NFC (decomposed accents, compatibility forms composed differently)
    and ``nfc_fp`` is the content hash of the normalized text — the
    canonicalization step that MUST run before any hash-based dedup, or
    'Café' (composed) and 'Café' (e + combining acute) count as
    different documents.

    Python's unicodedata (a vectorized Arrow-batched pandas UDF — the
    sanctioned slow path, since Spark has no NFC builtin) matches
    DuckDB's utf8proc ``nfc_normalize`` byte-for-byte; the gate proves
    it on the fixture and the unit test on decomposed/ligature forms."""
    nfc = nfc_normalize_udf(F.col(text_col))
    return docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        (nfc != F.col(text_col)).cast("long").alias("changed"),
        h60(nfc).alias("nfc_fp"),
    )


def nfc_stats_sql(table: str = "documents") -> str:
    return f"""
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(CASE WHEN nfc_normalize(text) <> text THEN 1 ELSE 0 END AS BIGINT) AS changed,
       {h60_sql("nfc_normalize(text)")} AS nfc_fp
FROM {table}
"""


def topgram_char_mass(docs: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """(id, n_grams, top2_mass, dup2_mass): Gopher-style word-bigram
    repetition signals — ``top2_mass`` is the largest character mass any
    single bigram accounts for (count x chars, the "fraction of characters
    in the most common 2-gram" numerator) and ``dup2_mass`` sums the
    character mass of every bigram occurring 2+ times (the "characters in
    duplicate n-grams" numerator).  Masses are exact integers; callers
    divide by their own denominator, so no float crosses the gate.

    Complements :func:`repetition_stats` (distinct/total ratio): a doc
    that repeats ONE phrase a thousand times and a doc with uniformly
    mild repetition can share a distinct/total ratio but differ wildly
    here.  Plan: explode bigrams -> two aggregations keyed by (id, gram)
    then id — both partial-aggregate map-side, no skew (keys are spread
    per document), left join restores gram-less docs.  Scales linearly
    in corpus size; nothing is per-vocabulary or per-corpus global."""
    from .dedup import bind1

    def build(w):
        gram = F.transform(
            F.sequence(F.lit(1), F.size(w) - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(w, i.cast("int")),
                F.element_at(w, (i + 1).cast("int")),
            ),
        )
        # sequence(1, 0) DESCENDS in Spark: guard docs with < 2 words
        return F.when(F.size(w) >= 2, gram).otherwise(
            F.array().cast("array<string>")
        )

    # bind the token split once per row (see dedup.bind1: an unbound
    # split re-evaluates per gram element — quadratic in doc length)
    grams = bind1(tokens(F.col(text_col)), build)
    base = docs.select(F.col(id_col).cast("long").alias("id"),
                       grams.alias("grams"))
    g = base.select("id", F.explode("grams").alias("g"))
    c = g.groupBy("id", "g").agg(F.count("*").alias("cnt"))
    mass = (F.col("cnt") * F.length("g")).cast("long")
    a = c.groupBy("id").agg(
        F.sum("cnt").cast("long").alias("n_grams"),
        F.max(mass).alias("top2_mass"),
        F.sum(F.when(F.col("cnt") >= 2, mass).otherwise(F.lit(0)))
        .cast("long").alias("dup2_mass"),
    )
    return base.select("id").join(a, "id", "left").select(
        "id",
        F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
        F.coalesce("top2_mass", F.lit(0)).cast("long").alias("top2_mass"),
        F.coalesce("dup2_mass", F.lit(0)).cast("long").alias("dup2_mass"),
    )


def topgram_char_mass_sql(table: str = "documents",
                          text_expr: str = "text") -> str:
    """DuckDB twin of :func:`topgram_char_mass` (1-indexed lists; word
    split mirrors dedup.tokens: split(trim(lower(text)), '\\s+'))."""
    return f"""
WITH t AS (
  SELECT CAST(doc_id AS BIGINT) AS id,
         regexp_split_to_array(trim(lower({text_expr})), '\\s+') AS w
  FROM {table}
),
g AS (
  SELECT id,
         unnest(list_transform(range(1, len(w)),
                               i -> w[i] || ' ' || w[i + 1])) AS g
  FROM t
),
c AS (SELECT id, g, count(*) AS cnt FROM g GROUP BY 1, 2),
a AS (
  SELECT id,
         SUM(cnt) AS n_grams,
         MAX(cnt * len(g)) AS top2_mass,
         SUM(CASE WHEN cnt >= 2 THEN cnt * len(g) ELSE 0 END) AS dup2_mass
  FROM c GROUP BY 1
)
SELECT t.id,
       CAST(COALESCE(a.n_grams, 0) AS BIGINT) AS n_grams,
       CAST(COALESCE(a.top2_mass, 0) AS BIGINT) AS top2_mass,
       CAST(COALESCE(a.dup2_mass, 0) AS BIGINT) AS dup2_mass
FROM t LEFT JOIN a ON t.id = a.id
"""


# ---------------------------------------------------------------------------
# GloVe-style windowed co-occurrence counts
# ---------------------------------------------------------------------------


def cooccurrence_counts(docs: DataFrame, text_col: str = "text",
                        window: int = 4, min_count: int = 3) -> DataFrame:
    """Left-to-right windowed co-occurrence counts with GloVe's 1/d
    distance weighting — the X_ij matrix a GloVe/embedding trainer
    consumes.  Returns (w1, w2, cnt, weight_e6) where weight_e6 is the
    exact BIGINT sum of round(1e6/d) over every occurrence of w2 at
    distance d∈[1, window] to the right of w1 (per-occurrence quantize
    then integer sum — no float accumulation, engine-deterministic).

    Scale: NO per-token self-join — for each fixed offset d the
    (token_i, token_{i+d}) pairs are an arrays_zip of two slices of the
    already-split token array (the collocations_topk idiom), so the
    corpus is scanned once per offset (window is a small constant) with
    zero shuffle until the final map-side-combinable (w1, w2) groupBy;
    min_count prunes the hapax tail that dominates pair cardinality.
    Extends the engine along the training-data axis (the reference has
    no text layer; its preprocessing stage is
    /root/reference/datasets/wiki-vote/scripts/process.cpp).
    """
    w = tokens(F.col(text_col))
    t = (
        docs.filter(F.length(F.trim(F.col(text_col))) > 0)
        .select(w.alias("w"))
    )
    parts = []
    for d in range(1, window + 1):
        w_e6 = round(1e6 / d)
        parts.append(
            t.filter(F.size("w") > d)
            .select(
                F.explode(
                    F.arrays_zip(
                        F.slice("w", 1, F.size("w") - d).alias("w1"),
                        F.slice("w", 1 + d, F.size("w") - d).alias("w2"),
                    )
                ).alias("p")
            )
            .select(
                F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"),
                F.lit(w_e6).cast("long").alias("w_e6"),
            )
        )
    allp = parts[0]
    for p in parts[1:]:
        allp = allp.unionByName(p)
    return (
        allp.groupBy("w1", "w2")
        .agg(
            F.count(F.lit(1)).cast("long").alias("cnt"),
            F.sum("w_e6").cast("long").alias("weight_e6"),
        )
        .filter(F.col("cnt") >= min_count)
    )


def cooccurrence_sql(table: str = "documents", text_expr: str = "text",
                     window: int = 4, min_count: int = 3) -> str:
    branches = []
    for d in range(1, window + 1):
        w_e6 = round(1e6 / d)
        branches.append(
            f"SELECT unnest(list_zip(w[:len(w)-{d}], w[{1 + d}:])) AS p,"
            f" CAST({w_e6} AS BIGINT) AS w_e6 FROM t WHERE len(w) > {d}"
        )
    union = "\n  UNION ALL\n  ".join(branches)
    return rf"""
WITH t AS (
  SELECT regexp_split_to_array(trim(lower({text_expr})), '\s+') AS w
  FROM {table} WHERE length(trim({text_expr})) > 0),
p AS (
  {union}
)
SELECT p[1] AS w1, p[2] AS w2,
       CAST(count(*) AS BIGINT) AS cnt,
       CAST(sum(w_e6) AS BIGINT) AS weight_e6
FROM p GROUP BY 1, 2 HAVING count(*) >= {min_count}
"""


# ---------------------------------------------------------------------------
# word2vec negative-sampling table (unigram^0.75, cumulative BIGINT ranges)
# ---------------------------------------------------------------------------


def negsample_table(docs: DataFrame, text_col: str = "text",
                    min_count: int = 5) -> DataFrame:
    """word2vec negative-sampling table: the support-pruned unigram
    vocabulary with weight w_e6 = round(1e6·c^0.75) and exact cumulative
    BIGINT ranges [cum_lo, cum_hi) in ascending token order — a trainer
    draws a uniform integer in [0, total) and binary-searches the range
    (Mikolov et al. 2013's unigram^(3/4) table, distributed).

    c^0.75 is computed as sqrt(sqrt(c·c·c)) over doubles: multiply and
    sqrt are correctly-rounded IEEE-754 ops, bit-identical across JVM and
    DuckDB (pow/exp/ln are libm-dependent; sqrt∘sqrt is not), so the e6
    quantization never straddles an engine boundary.

    Scale: the cumulative sum is NOT a global single-partition window —
    shard_pack's two-phase bounded-state pattern: tokens bucket by their
    leading character (order-aligned with the ascending-token sort since
    both engines compare strings bytewise), per-bucket sums collect to
    the driver (≤ distinct-first-characters rows, independent of corpus
    and vocabulary size), and the within-bucket prefix window is
    partitioned by bucket.
    """
    from pyspark.sql import Window

    spark = docs.sparkSession
    uni = (
        docs.filter(F.length(F.trim(F.col(text_col))) > 0)
        .select(F.explode(tokens(F.col(text_col))).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= min_count)
    )
    cd = F.col("c").cast("double")
    w = uni.select(
        "tok", F.col("c").cast("long").alias("c"),
        F.round(F.lit(1e6) * F.sqrt(F.sqrt(cd * cd * cd)))
        .cast("long").alias("w_e6"),
        F.substring("tok", 1, 1).alias("b"),
    ).persist()
    btot = w.groupBy("b").agg(F.sum("w_e6").alias("bsum")).collect()
    run, off = 0, {}
    for row in sorted(btot, key=lambda r: r["b"]):
        off[row["b"]] = run
        run += row["bsum"]
    offdf = spark.createDataFrame(
        [(b, o) for b, o in off.items()], "b string, boff long"
    )
    win = Window.partitionBy("b").orderBy("tok")
    local = F.sum("w_e6").over(win) - F.col("w_e6")
    out = (
        w.join(F.broadcast(offdf), "b")
        .select(
            "tok", "c", "w_e6",
            (F.col("boff") + local).cast("long").alias("cum_lo"),
            (F.col("boff") + local + F.col("w_e6")).cast("long")
            .alias("cum_hi"),
        )
    )
    return out


def negsample_sql(table: str = "documents", text_expr: str = "text",
                  min_count: int = 5) -> str:
    return rf"""
WITH toks AS (
  SELECT unnest(regexp_split_to_array(trim(lower({text_expr})), '\s+')) AS tok
  FROM {table} WHERE length(trim({text_expr})) > 0),
uni AS (SELECT tok, CAST(count(*) AS BIGINT) AS c FROM toks
        GROUP BY tok HAVING count(*) >= {min_count}),
w AS (SELECT tok, c,
             CAST(round(1e6 * sqrt(sqrt(CAST(c AS DOUBLE) * c * c)))
               AS BIGINT) AS w_e6
      FROM uni)
SELECT tok, c, w_e6,
       CAST(COALESCE(sum(w_e6) OVER (ORDER BY tok
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         AS BIGINT) AS cum_lo,
       CAST(sum(w_e6) OVER (ORDER BY tok
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS BIGINT) AS cum_hi
FROM w
"""


# ---------------------------------------------------------------------------
# BM25 retrieval scoring (Robertson-Sparck Jones; k1/b standard params)
# ---------------------------------------------------------------------------


def bm25_topk(docs: DataFrame, query_terms: list, text_col: str = "text",
              id_col: str = "doc_id", k: int = 20,
              k1: float = 1.2, b: float = 0.75) -> DataFrame:
    """Top-k documents by BM25 for a fixed term set — the retrieval score
    a data-curation pipeline uses to mine topical training subsets.
    Returns (doc_id, score_e6, rnk) with score_e6 = Σ_t round(1e6·bm25_t):
    each term's contribution is e6-quantized BEFORE the sum, so the total
    is an exact BIGINT sum (float addition is not associative; integer
    addition is — the collocations/tfidf determinism discipline).  idf
    uses one ln per (term, corpus) pair (the adamic_adar single-libm-call
    precedent); every other factor is IEEE-correctly-rounded *, /, + that
    both engines evaluate identically from the same literals.

    Scale: one (doc, term) groupBy for tf over docs filtered to query
    terms only (the explode is pruned by an isin BEFORE the shuffle, so
    pair cardinality is |docs|·|query|, not |tokens|); df and avgdl are
    broadcast scalars; top-k is one TakeOrdered, never a full sort.
    """
    q = sorted(set(query_terms))
    toks = tokens(F.col(text_col))
    base = (
        docs.filter(F.length(F.trim(F.col(text_col))) > 0)
        .select(F.col(id_col).alias("doc_id"), toks.alias("w"))
        .select("doc_id", F.size("w").alias("dl"), F.explode("w").alias("term"))
    )
    n_avg = base.groupBy("doc_id").agg(F.first("dl").alias("dl")).agg(
        F.count(F.lit(1)).alias("n"), F.sum("dl").alias("tot")
    ).collect()[0]
    # avgdl from two exact BIGINTs via ONE double division — engine avg()
    # implementations differ in summation path; this is bit-identical.
    n_docs, avgdl = int(n_avg["n"]), int(n_avg["tot"]) / int(n_avg["n"])
    hit = base.filter(F.col("term").isin(q))
    tf = hit.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).alias("tf"), F.first("dl").alias("dl")
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
        + F.lit(1.0)
    )
    contrib = (
        F.col("tf") * F.lit(k1 + 1.0)
        / (
            F.col("tf")
            + F.lit(k1)
            * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.lit(avgdl))
        )
    )
    scored = (
        tf.join(F.broadcast(df_), "term")
        .select(
            "doc_id",
            F.round(F.lit(1e6) * idf * contrib).cast("long").alias("c_e6"),
        )
        .groupBy("doc_id")
        .agg(F.sum("c_e6").cast("long").alias("score_e6"))
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.col("score_e6").desc(), F.col("doc_id").asc())
    return (
        scored.orderBy(F.col("score_e6").desc(), F.col("doc_id").asc())
        .limit(k)
        .withColumn("rnk", F.row_number().over(w).cast("long"))
    )


def bm25_sql(query_terms: list, table: str = "documents",
             text_expr: str = "text", id_expr: str = "doc_id",
             k: int = 20, k1: float = 1.2, b: float = 0.75) -> str:
    q = sorted(set(query_terms))
    qlist = ", ".join(f"'{t}'" for t in q)
    return rf"""
WITH t AS (
  SELECT {id_expr} AS doc_id,
         regexp_split_to_array(trim(lower({text_expr})), '\s+') AS w
  FROM {table} WHERE length(trim({text_expr})) > 0),
base AS (
  SELECT doc_id, len(w) AS dl, unnest(w) AS term FROM t),
stats AS (
  SELECT CAST(count(*) AS DOUBLE) AS n,
         CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
  FROM (SELECT doc_id, any_value(dl) AS dl FROM base GROUP BY doc_id)),
tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf, any_value(dl) AS dl
  FROM base WHERE term IN ({qlist}) GROUP BY doc_id, term),
df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id,
         CAST(sum(CAST(round(
           1e6 * ln((stats.n - df.df + 0.5) / (df.df + 0.5) + 1.0)
               * (tf.tf * {k1 + 1.0!r}
                  / (tf.tf + {k1!r} * ({1.0 - b!r} + {b!r} * tf.dl / stats.avgdl)))
         ) AS BIGINT)) AS BIGINT) AS score_e6
  FROM tf JOIN df USING (term), stats
  GROUP BY tf.doc_id)
SELECT doc_id, score_e6,
       CAST(row_number() OVER (ORDER BY score_e6 DESC, doc_id ASC) AS BIGINT) AS rnk
FROM scored ORDER BY score_e6 DESC, doc_id ASC LIMIT {k}
"""


# ---------------------------------------------------------------------------
# Heaps-law vocabulary growth curve
# ---------------------------------------------------------------------------


def vocab_growth(docs: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id", deciles: int = 10) -> DataFrame:
    """Vocabulary-growth (Heaps' law) curve: distinct-token count after
    each corpus decile in ascending doc_id order — (decile, n_docs,
    vocab).  The curve's flattening rate is the standard corpus-diversity
    diagnostic (a dedup'd corpus grows vocabulary faster per token).

    Scale: one token-keyed min-agg finds each token's FIRST decile (the
    decile of the smallest doc_id containing it — doc deciles come from
    ``ingest.dense_ids``'s deterministic two-phase distributed rank, NOT
    a global row_number window), then the cumulative sum runs over
    ≤ ``deciles`` rows.  No distinct-per-prefix rescans: the corpus is
    tokenized exactly once.
    """
    from pyspark.sql import Window

    from .ingest import dense_ids

    n_docs = docs.filter(
        F.length(F.trim(F.col(text_col))) > 0
    ).count()
    base = (
        docs.filter(F.length(F.trim(F.col(text_col))) > 0)
        .select(F.col(id_col).alias("doc_id"),
                F.explode(tokens(F.col(text_col))).alias("tok"))
    )
    # decile of a doc = ceil(rank·deciles/n); rank = dense ascending
    # doc_id order via the two-phase bounded-state rank.
    dec = dense_ids(base.select("doc_id"), "doc_id").select(
        "doc_id",
        F.least(
            F.lit(deciles),
            F.ceil((F.col("id") + 1) * deciles / F.lit(n_docs))
            .cast("long"),
        ).alias("decile"),
    )
    first_dec = (
        base.join(dec, "doc_id")
        .groupBy("tok")
        .agg(F.min("decile").alias("d"))
        .groupBy("d")
        .agg(F.count(F.lit(1)).alias("new_toks"))
    )
    wcum = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    docs_per = dec.groupBy("decile").agg(F.count(F.lit(1)).alias("nd"))
    return (
        docs_per.join(first_dec, docs_per.decile == first_dec.d, "left")
        .select(
            F.col("decile").cast("long").alias("decile"),
            F.col("nd").alias("nd"),
            F.coalesce(F.col("new_toks"), F.lit(0)).alias("new_toks"),
        )
        .withColumn("n_docs", F.sum("nd").over(
            Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
        ).cast("long"))
        .withColumn("vocab", F.sum("new_toks").over(
            Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
        ).cast("long"))
        .select("decile", "n_docs", "vocab")
    )


def vocab_growth_sql(table: str = "documents", text_expr: str = "text",
                     id_expr: str = "doc_id", deciles: int = 10) -> str:
    return rf"""
WITH nn AS (
  SELECT CAST(count(*) AS BIGINT) AS n FROM {table}
  WHERE length(trim({text_expr})) > 0),
dec AS (
  SELECT {id_expr} AS doc_id,
         least({deciles}, CAST(ceil(
           row_number() OVER (ORDER BY {id_expr}) * {deciles}
           / (SELECT CAST(n AS DOUBLE) FROM nn)) AS BIGINT)) AS decile
  FROM {table} WHERE length(trim({text_expr})) > 0),
base AS (
  SELECT d.decile, unnest(regexp_split_to_array(trim(lower(t.{text_expr})), '\s+')) AS tok
  FROM {table} t JOIN dec d ON t.{id_expr} = d.doc_id
  WHERE length(trim(t.{text_expr})) > 0),
firstd AS (
  SELECT tok, min(decile) AS d FROM base GROUP BY tok),
newt AS (SELECT d, CAST(count(*) AS BIGINT) AS new_toks FROM firstd GROUP BY d),
per AS (SELECT decile, CAST(count(*) AS BIGINT) AS nd FROM dec GROUP BY decile)
SELECT p.decile,
       CAST(sum(p.nd) OVER (ORDER BY p.decile
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS n_docs,
       CAST(sum(COALESCE(n.new_toks, 0)) OVER (ORDER BY p.decile
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS vocab
FROM per p LEFT JOIN newt n ON p.decile = n.d
"""
