"""Count-min sketch and sequential Poisson (PPS) sampling."""

import hashlib
from collections import Counter

from pyspark.sql import functions as F

from linkgraph import sketch

SF = "/root/testdata/sf0.001"


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_cms_matches_python(spark):
    """Sketch build + probe is bit-identical to a pure-Python count-min
    over the same token stream and md5 hash family."""
    rows = _docs(spark).select("text").collect()
    counts = Counter()
    for r in rows:
        t = r["text"].strip().lower()
        if not t:
            continue
        counts.update(t.split())
    cms = [[0] * sketch.CMS_WIDTH for _ in range(sketch.CMS_DEPTH)]
    for tok, c in counts.items():
        for d in range(sketch.CMS_DEPTH):
            cms[d][_h60(f"{tok}:{d}") % sketch.CMS_WIDTH] += c
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    want = {
        tok: min(cms[d][_h60(f"{tok}:{d}") % sketch.CMS_WIDTH]
                 for d in range(sketch.CMS_DEPTH))
        for tok, _ in top
    }
    got = {r["tok"]: r["cms_est"]
           for r in sketch.cms_heavy_hitters(_docs(spark), k=20).collect()}
    assert got == want


def test_cms_never_underestimates_any_key(spark):
    """est >= exact for EVERY key, not just the top-20 (the one-sided CMS
    guarantee), and the overestimate respects the e/W * N bound for the
    min-of-4 probe on this corpus."""
    docs = _docs(spark)
    t = (
        docs.filter(F.length(F.trim("text")) > 0)
        .select(F.explode(sketch.tokens(F.col("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("exact"))
    ).persist()
    sk = sketch.count_min_build(t, "tok", "exact")
    est = sketch.count_min_probe(sk, t.select("tok"), "tok")
    rows = t.join(est, "tok").collect()
    n_total = sum(r["exact"] for r in rows)
    assert all(r["cms_est"] >= r["exact"] for r in rows)
    bound = 2.718281828 / sketch.CMS_WIDTH * n_total
    bad = [r for r in rows if r["cms_est"] - r["exact"] > bound]
    # the e/W bound holds per-key with prob 1 - e^-D = 98.2%; allow the tail
    assert len(bad) <= max(2, len(rows) * 0.05), (len(bad), len(rows))
    t.unpersist()


def test_cms_sketch_size_is_bounded(spark):
    """The sketch is at most D x W rows regardless of vocabulary size."""
    docs = _docs(spark)
    t = (
        docs.select(F.explode(sketch.tokens(F.col("text"))).alias("tok"))
        .groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    )
    n = sketch.count_min_build(t, "tok", "c").count()
    assert n <= sketch.CMS_DEPTH * sketch.CMS_WIDTH


def test_pps_matches_python(spark):
    """Sample = the n smallest (h60(id) div weight, id) pairs — verified
    against a pure-Python reimplementation."""
    from linkgraph import corpus

    rows = _docs(spark).select(
        "doc_id", corpus.n_tokens(F.col("text")).alias("w")).collect()
    # exactly as the operator: u div w, w >= 1, ties by id
    pri = sorted(
        (_h60(str(r["doc_id"])) // max(r["w"], 1), r["doc_id"])
        for r in rows
    )
    want = {doc for _, doc in pri[:100]}
    got = {r["doc_id"]
           for r in sketch.pps_sample(
               _docs(spark), n=100,
               weight=corpus.n_tokens(F.col("text"))).collect()}
    assert got == want


def test_pps_favors_heavy_rows(spark):
    """Planted two weight classes 100:1 — the heavy rows dominate the
    sample (inclusion odds track the weight)."""
    rows = [(i, 1000 if i % 2 == 0 else 10) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    got = sketch.pps_sample(df, n=40, weight=F.col("w")).collect()
    heavy = sum(1 for r in got if r["weight"] == 1000)
    assert heavy >= 35, heavy


def test_pps_partition_invariant(spark):
    """Same sample regardless of input partitioning."""
    from linkgraph import corpus

    docs = _docs(spark)
    w = corpus.n_tokens(F.col("text"))
    a = {r["doc_id"] for r in sketch.pps_sample(docs, 50, w).collect()}
    b = {r["doc_id"]
         for r in sketch.pps_sample(docs.repartition(13), 50, w).collect()}
    assert a == b


def test_stream_cms_equals_batch_build(spark):
    """The drained streaming sketch equals count_min_build over the batch
    per-user counts (bucket sums are associative — stream order and
    micro-batch boundaries cannot change them)."""
    from linkgraph import streaming

    got = {
        (r["d"], r["bucket"]): r["c"]
        for r in streaming.stream_cms_user_counts(
            spark, f"{SF}/events.parquet",
            sink_table="t_stream_cms").collect()
    }
    users = (
        spark.read.parquet(f"{SF}/events.parquet")
        .select(F.col("user_id").cast("string").alias("k"))
        .groupBy("k").agg(F.count(F.lit(1)).alias("c"))
    )
    want = {
        (r["d"], r["bucket"]): r["c"]
        for r in sketch.count_min_build(users, "k", "c").collect()
    }
    assert got == want


def test_bloom_build_matches_python(spark):
    """Filter words are bit-identical to a pure-Python build."""
    keys = [f"key{i}" for i in range(200)]
    df = spark.createDataFrame([(k,) for k in keys], "s string")
    got = {r["word"]: r["bits"]
           for r in sketch.bloom_build(df, "s").collect()}
    want = {}
    for s in keys:
        for i in range(sketch.BLOOM_K):
            p = _h60(f"{s}#{i}") % sketch.BLOOM_BITS
            w = p // sketch.BLOOM_WORD_BITS
            want[w] = want.get(w, 0) | (1 << (p % sketch.BLOOM_WORD_BITS))
    assert got == want


def test_bloom_no_false_negatives(spark):
    """Every inserted key probes `maybe`; disjoint keys mostly don't."""
    ins = spark.createDataFrame([(f"in{i}",) for i in range(300)], "s string")
    out = spark.createDataFrame([(f"out{i}",) for i in range(300)], "s string")
    bloom = sketch.bloom_build(ins, "s")
    got_in = {r["s"]: r["maybe"]
              for r in sketch.bloom_probe(bloom, ins, "s").collect()}
    assert all(v == 1 for v in got_in.values())
    got_out = [r["maybe"]
               for r in sketch.bloom_probe(bloom, out, "s").collect()]
    # n=300, M=2048, K=3 -> theoretical FP ~ 4.5%; allow slack
    assert sum(got_out) <= 0.15 * len(got_out), sum(got_out)


def test_bloom_decontaminate_gate(spark):
    """Per-doc invariant: bloom_hits >= exact_hits (no false negatives)
    and both bounded by the shingle count."""
    from linkgraph import suite

    rows = suite.q_bloom_decontaminate(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 <= r["exact_hits"] <= r["bloom_hits"] <= r["shingles"]
