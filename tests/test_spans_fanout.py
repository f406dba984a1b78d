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


def test_gnn_training_batch_tensor_shape(spark, edges30):
    """Every seed emits exactly 1 + k + k^2 rows — one per tensor slot —
    with hop 0 carrying the seed itself and pads marked nbr_id = -1 with
    zero features."""
    from linkgraph.graph import feature_propagation, gnn_training_batch

    k = 3
    v = spark.range(30).select(F.col("id"))
    feats = feature_propagation(edges30, v, hops=2)
    seeds = v.filter(F.col("id") % 10 == 0)  # {0, 10, 20}
    rows = gnn_training_batch(edges30, seeds, feats, k=k).collect()
    per_seed = Counter(r["seed"] for r in rows)
    assert set(per_seed) == {0, 10, 20}
    assert all(n == 1 + k + k * k for n in per_seed.values())
    # slot keys are exactly the template: hop0 slot0, hop1 1..k, hop2 1..k^2
    for s in (0, 10, 20):
        got = {(r["hop"], r["slot"]) for r in rows if r["seed"] == s}
        want = {(0, 0)} | {(1, i) for i in range(1, k + 1)} | {
            (2, i) for i in range(1, k * k + 1)}
        assert got == want
    f = {r["id"]: r for r in feats.collect()}
    for r in rows:
        if r["hop"] == 0:
            assert r["nbr_id"] == r["seed"]
        if r["nbr_id"] == -1:
            assert (r["x0"], r["x1_e6"], r["x2_e6"]) == (0, 0, 0)
        else:
            fr = f[r["nbr_id"]]
            assert (r["x0"], r["x1_e6"], r["x2_e6"]) == (
                fr["x0"], fr["x1_e6"], fr["x2_e6"])


def test_gnn_training_batch_hop2_parents(spark, edges30):
    """Hop-2 slot (r1-1)*k + r2 is a sampled neighbor of the hop-1
    slot-r1 vertex (or padded when that parent is padded)."""
    from linkgraph.graph import (feature_propagation, gnn_training_batch,
                                 neighbor_sample)

    k = 3
    v = spark.range(30).select(F.col("id"))
    feats = feature_propagation(edges30, v, hops=2)
    seeds = v.filter(F.col("id") % 10 == 0)
    rows = gnn_training_batch(edges30, seeds, feats, k=k).collect()
    ns = {}
    for r in neighbor_sample(edges30, k=k, directed=False).collect():
        ns.setdefault(r["src"], {})[r["draw_rank"]] = r["dst"]
    by = {(r["seed"], r["hop"], r["slot"]): r["nbr_id"] for r in rows}
    for (seed, hop, slot), nbr in by.items():
        if hop != 2:
            continue
        r1, r2 = (slot - 1) // k + 1, (slot - 1) % k + 1
        parent = by[(seed, 1, r1)]
        if parent == -1:
            assert nbr == -1
        else:
            assert nbr == ns.get(parent, {}).get(r2, -1)


def test_gnn_training_batch_partition_invariant(spark, edges30):
    from linkgraph.graph import feature_propagation, gnn_training_batch

    v = spark.range(30).select(F.col("id"))
    seeds = v.filter(F.col("id") % 10 == 0)
    a = gnn_training_batch(
        edges30.repartition(1), seeds,
        feature_propagation(edges30.repartition(1), v, hops=2), k=3)
    b = gnn_training_batch(
        edges30.repartition(11), seeds,
        feature_propagation(edges30.repartition(5), v, hops=2), k=3)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
