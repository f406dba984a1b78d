"""Duplicated n-gram span mass and deterministic neighbor fan-out."""

import hashlib
from collections import Counter

from pyspark.sql import functions as F

from linkgraph import dedup
from linkgraph.graph import neighbor_sample


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_dup_span_stats_hand_case(spark):
    """Two docs sharing one verbatim 3-gram plus a within-doc repeat."""
    rows = [
        (1, "a b c d e"),          # grams: abc bcd cde
        (2, "x y z a b c"),        # grams: xyz yza zab abc  -> abc shared
        (3, "p q r p q r p q"),    # pqr qrp rpq pqr qrp rpq -> all dup'd
        (4, "too short"),          # < 3 tokens -> 0 positions
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["positions"], r["dup_positions"], r["dup_ratio_e6"])
           for r in dedup.dup_span_stats(df, k=3).collect()}
    assert got[1] == (3, 1, 333333)
    assert got[2] == (4, 1, 250000)
    assert got[3] == (6, 6, 1000000)
    assert got[4] == (0, 0, 0)


def test_dup_span_stats_matches_python(spark):
    """Bit-identical to a pure-Python k-gram occurrence count at sf0.001."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = docs.select("doc_id", "text").collect()
    k = 8
    occ = Counter()
    grams = {}
    for r in rows:
        toks = r["text"].strip().lower().split()
        g = [" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)] \
            if len(toks) >= k else []
        grams[r["doc_id"]] = g
        occ.update(g)
    want = {}
    for doc, g in grams.items():
        dup = sum(1 for x in g if occ[x] >= 2)
        ratio = dup * 1000000 // len(g) if g else 0
        want[doc] = (len(g), dup, ratio)
    got = {r["doc_id"]: (r["positions"], r["dup_positions"],
                         r["dup_ratio_e6"])
           for r in dedup.dup_span_stats(docs, k=k).collect()}
    assert got == want


def test_neighbor_sample_matches_python(spark, edges30):
    """k smallest h60(src:dst) per vertex, undirected, ties by dst."""
    und = set()
    for r in edges30.collect():
        und.add((r["src"], r["dst"]))
        und.add((r["dst"], r["src"]))
    by_src = {}
    for s, d in und:
        by_src.setdefault(s, []).append(d)
    want = set()
    for s, ds in by_src.items():
        ds.sort(key=lambda d: (_h60(f"{s}:{d}"), d))
        for rank, d in enumerate(ds[:4], 1):
            want.add((s, d, rank))
    got = {(r["src"], r["dst"], r["draw_rank"])
           for r in neighbor_sample(edges30, k=4, directed=False).collect()}
    assert got == want


def test_neighbor_sample_caps_degree(spark, edges30):
    """No vertex emits more than k rows; low-degree vertices keep all."""
    out = neighbor_sample(edges30, k=3, directed=False)
    per = out.groupBy("src").agg(F.count(F.lit(1)).alias("n"),
                                 F.max("draw_rank").alias("mx")).collect()
    assert all(r["n"] <= 3 and r["mx"] <= 3 for r in per)
    deg = (
        edges30.select("src", "dst")
        .unionByName(edges30.select(F.col("dst").alias("src"),
                                    F.col("src").alias("dst")))
        .distinct().groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    )
    joined = {r["src"]: (r["n"], r["d"])
              for r in out.groupBy("src")
              .agg(F.count(F.lit(1)).alias("n"))
              .join(deg, "src").collect()}
    assert all(n == min(3, d) for n, d in joined.values())


def test_neighbor_sample_partition_invariant(spark, edges30):
    a = {tuple(r) for r in
         neighbor_sample(edges30, k=4, directed=False).collect()}
    b = {tuple(r) for r in
         neighbor_sample(edges30.repartition(7), k=4,
                         directed=False).collect()}
    assert a == b


def test_graphsage_fanout_structure(spark):
    """Hop-1 rows start at seeds; hop-2 sources are exactly the distinct
    hop-1 destinations; every (src, hop) group has <= 5 rows."""
    from linkgraph import suite

    rows = suite.q_graphsage_fanout(spark, "/root/testdata/sf0.001").collect()
    h1 = [r for r in rows if r["hop"] == 1]
    h2 = [r for r in rows if r["hop"] == 2]
    assert h1 and h2
    assert all(r["src"] % 50 == 0 for r in h1)
    assert {r["src"] for r in h2} == {r["dst"] for r in h1}
    per = Counter((r["src"], r["hop"]) for r in rows)
    assert all(v <= 5 for v in per.values())
