"""linkgraph.suite.corpus2 — mechanical split of the former monolithic suite.py.

corpus-assembly operators (shard packing, mixtures, quality classifier, BPE, PII, chunking).

Imported (in order) by suite/__init__.py; registers its queries into the
shared REGISTRY defined in _base.  Pure move: definitions and registration
order are byte-identical to the monolith.
"""

from __future__ import annotations

from ._base import *  # noqa: F401,F403
from ._round1b import *  # noqa: F401,F403
from ._round1e import *  # noqa: F401,F403

# corpus-assembly operators (linkgraph/corpus.py)
# ---------------------------------------------------------------------------


def q_shard_pack(spark, sf_dir):
    """Token-budget training-shard packing: shard_id = floor(running token
    total BEFORE the doc / 2000), docs in doc_id order.  Two-phase
    bounded-state running sum (per-bucket partials + broadcast prefix),
    never a global single-partition window — see corpus.shard_pack."""
    from .. import corpus

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return corpus.shard_pack(docs, budget=2000)


def q_pii_scrub_stats(spark, sf_dir):
    """Per-document PII accounting (emails / IPv4s / phone numbers) plus
    the cross-engine content hash of the scrubbed text — the release
    audit step.  Pure column expressions, zero shuffle."""
    from .. import corpus

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return corpus.pii_scrub(docs)


def q_stratified_sample(spark, sf_dir):
    """Exactly 10 docs per language by deterministic hash rank — the
    reproducible eval-set draw.  Pre-filter keeps window state at
    O(oversample*k) per stratum, not O(stratum)."""
    from .. import corpus

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return corpus.stratified_sample(docs, k=10, seed=7)


def q_domain_mix_weights(spark, sf_dir):
    """Per-source sampling weights reshaping the natural domain mix into
    a deterministic target mix (share ∝ 1 + suffix % 3) — the mixture
    knob of corpus assembly.  One groupBy; output is |sources| rows."""
    from .. import corpus

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return corpus.domain_mix_weights(docs)


def _register_corpus() -> None:
    from .. import corpus

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
    from .. import joins

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
    from .. import joins

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
    from .. import joins

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
    from .. import corpus

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return corpus.chunk_docs(docs, chunk=128, stride=64)


def q_bigram_xent(spark, sf_dir):
    """Bigram-LM cross-entropy quality score per document (add-one
    smoothing, corpus-trained) — see corpus.bigram_xent."""
    from .. import corpus

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return corpus.bigram_xent(docs)


def _register_corpus2() -> None:
    from .. import corpus

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
    from .. import ingest

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
    from .. import corpus

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return corpus.materialize_mixture(docs, seed=11)


def _register_corpus3() -> None:
    from .. import corpus

    REGISTRY["mixture_materialize"] = (
        q_mixture_materialize, corpus.materialize_mixture_sql(seed=11))


_register_corpus3()


def q_redirect_resolution(spark, sf_dir):
    """Redirect-chain canonicalization: every url resolved to its final
    target + hop count via POINTER DOUBLING (log2(depth) self-joins, not
    depth sequential walks) — see ingest.resolve_redirects.  Fixture:
    doc_id redirects to doc_id-1 unless divisible by 16 (chains up to 15
    hops; multiples of 16 are terminal)."""
    from .. import ingest

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
    from .. import corpus

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return corpus.boilerplate_flags(docs, seg=4, min_df=2)


def _register_corpus4() -> None:
    from .. import corpus

    REGISTRY["boilerplate_flags"] = (
        q_boilerplate_flags, corpus.boilerplate_flags_sql(seg=4, min_df=2))


_register_corpus4()


def q_link_prediction_pairs(spark, sf_dir):
    """Link-prediction training pairs: every edge (label 1) + 3
    deterministic hash negatives per source (label 0, anti-joined
    against the symmetric edge set) — see graph.link_prediction_pairs."""
    from ..graph import link_prediction_pairs

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
    from ..graph import feature_propagation

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
    from .. import corpus

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return corpus.quality_filter(docs, keep_permille=800)


def _register_corpus5() -> None:
    from .. import corpus

    REGISTRY["quality_filter"] = (
        q_quality_filter, corpus.quality_filter_sql(keep_permille=800))


_register_corpus5()


def q_url_filter_features(spark, sf_dir):
    """URL structural features + C4-style crawl keep/drop verdict over a
    deterministic varied-url fixture (schemes, tlds, depths, asset
    extensions, query strings from doc ids) — see ingest.url_features.
    Pure regexp column expressions, zero shuffle."""
    from .. import ingest

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
    from .. import text

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return text.nfc_stats(docs)


def _register_text2() -> None:
    from .. import text

    REGISTRY["nfc_stats"] = (q_nfc_stats, text.nfc_stats_sql())


_register_text2()


def q_topgram_char_mass(spark, sf_dir):
    """Gopher-style bigram repetition signals (most-common-bigram char
    mass + duplicated-bigram char mass, exact integer numerators) — see
    text.topgram_char_mass.  Explode -> (id,gram) -> id aggregations,
    map-side partial combine on both."""
    from .. import text

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return text.topgram_char_mass(docs)


def q_hash_classifier_scores(spark, sf_dir):
    """fastText-style hashed-bag-of-words classifier scoring pass — see
    corpus.hash_classifier_scores.  Pure per-row higher-order fold,
    whole-stage codegen, zero shuffle."""
    from .. import corpus

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return corpus.hash_classifier_scores(docs)


def _register_text3() -> None:
    from .. import corpus, text

    REGISTRY["topgram_char_mass"] = (
        q_topgram_char_mass, text.topgram_char_mass_sql())
    REGISTRY["hash_classifier_scores"] = (
        q_hash_classifier_scores, corpus.hash_classifier_sql())


_register_text3()


# ---------------------------------------------------------------------------


# re-export everything (incl. underscore helpers) to the next
# module in the suite package chain and to suite/__init__.py
__all__ = [_n for _n in dir() if not _n.startswith('__')]
