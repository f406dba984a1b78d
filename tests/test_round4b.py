"""Round-4 embedding-training-data operators, each against a
pure-Python brute-force oracle:

1. skipgram_pairs — window-2 pair counts from a hand-built walk corpus.
2. cooccurrence_counts — GloVe 1/d-weighted windowed co-occurrence.
3. negsample_table — unigram^0.75 cumulative ranges: exact weights,
   contiguous [cum_lo, cum_hi) coverage of [0, total), and partition
   invariance of the two-phase prefix sum.
"""

import math
from collections import Counter

from pyspark.sql import functions as F

from linkgraph import text
from linkgraph.algos.paths import skipgram_pairs

WALKS = [
    (0, [5, 3, 7, 3]),
    (1, [2, 2, 9]),
    (2, [4]),
]

DOCS = [
    (0, "the cat sat on the mat"),
    (1, "the dog sat on the log and the dog slept"),
    (2, "cat and dog and cat"),
    (3, "   "),
    (4, "mat"),
]


def _walks_df(spark):
    rows = [
        (wid, step, v)
        for wid, vs in WALKS
        for step, v in enumerate(vs)
    ]
    return spark.createDataFrame(rows, "walk_id long, step long, v long")


def test_skipgram_pairs_brute_force(spark):
    got = {
        (r["center"], r["context"]): r["cnt"]
        for r in skipgram_pairs(_walks_df(spark), window=2).collect()
    }
    want = Counter()
    for _, vs in WALKS:
        for i, c in enumerate(vs):
            for j, x in enumerate(vs):
                if i != j and abs(i - j) <= 2:
                    want[(c, x)] += 1
    assert got == dict(want)


def test_cooccurrence_brute_force(spark):
    d = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        (r["w1"], r["w2"]): (r["cnt"], r["weight_e6"])
        for r in text.cooccurrence_counts(d, window=4, min_count=1).collect()
    }
    cnt, wsum = Counter(), Counter()
    for _, t in DOCS:
        toks = t.strip().lower().split()
        if not toks:
            continue
        for i, a in enumerate(toks):
            for dd in range(1, 5):
                if i + dd < len(toks):
                    cnt[(a, toks[i + dd])] += 1
                    wsum[(a, toks[i + dd])] += round(1e6 / dd)
    want = {k: (cnt[k], wsum[k]) for k in cnt}
    assert got == want


def test_cooccurrence_min_count_prunes(spark):
    d = spark.createDataFrame(DOCS, "doc_id long, text string")
    rows = text.cooccurrence_counts(d, window=4, min_count=2).collect()
    assert rows and all(r["cnt"] >= 2 for r in rows)


def test_negsample_table_brute_force(spark):
    d = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = sorted(
        (
            (r["tok"], r["c"], r["w_e6"], r["cum_lo"], r["cum_hi"])
            for r in text.negsample_table(d, min_count=1).collect()
        )
    )
    c = Counter()
    for _, t in DOCS:
        c.update(t.strip().lower().split())
    want, run = [], 0
    for tok in sorted(c):
        w = round(1e6 * math.sqrt(math.sqrt(float(c[tok]) ** 3)))
        want.append((tok, c[tok], w, run, run + w))
        run += w
    assert got == want
    # contiguous coverage of [0, total)
    assert got[0][3] == 0
    for prev, cur in zip(got, got[1:]):
        assert prev[4] == cur[3]


def test_negsample_partition_invariance(spark):
    d = spark.createDataFrame(DOCS, "doc_id long, text string")
    a = sorted(map(tuple, text.negsample_table(d, min_count=1).collect()))
    b = sorted(
        map(
            tuple,
            text.negsample_table(d.repartition(7), min_count=1).collect(),
        )
    )
    assert a == b


def test_skipgram_gate_matches_walk_corpus(spark):
    """The suite gate's pairs must be consistent with its own walk corpus
    (window-2 brute force over the materialized walks)."""
    from linkgraph import suite

    sf = "/root/testdata/sf0.001"
    walks = {}
    for r in suite.q_random_walks(spark, sf).collect():
        walks.setdefault(r["walk_id"], {})[r["step"]] = r["v"]
    want = Counter()
    for steps in walks.values():
        seq = [steps[s] for s in sorted(steps)]
        for i, c in enumerate(seq):
            for j, x in enumerate(seq):
                if i != j and abs(i - j) <= 2:
                    want[(c, x)] += 1
    got = {
        (r["center"], r["context"]): r["cnt"]
        for r in suite.q_skipgram_pairs(spark, sf).collect()
    }
    assert got == dict(want)


def test_bm25_brute_force(spark):
    d = spark.createDataFrame(DOCS, "doc_id long, text string")
    q = ["cat", "dog"]
    got = [
        (r["doc_id"], r["score_e6"], r["rnk"])
        for r in text.bm25_topk(d, q, k=10).collect()
    ]
    corpus = {i: t.strip().lower().split() for i, t in DOCS if t.strip()}
    n = len(corpus)
    avgdl = sum(len(v) for v in corpus.values()) / n
    df = {t: sum(1 for v in corpus.values() if t in v) for t in q}
    want = {}
    for i, toks in corpus.items():
        s = 0
        for t in q:
            tf = toks.count(t)
            if not tf:
                continue
            idf = math.log((n - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
            s += round(
                1e6 * idf * (tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * len(toks) / avgdl)))
            )
        if s:
            want[i] = s
    ranked = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))
    assert got == [(i, s, r + 1) for r, (i, s) in enumerate(ranked[:10])]


def test_vocab_growth_brute_force(spark):
    d = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = sorted(
        (r["decile"], r["n_docs"], r["vocab"])
        for r in text.vocab_growth(d, deciles=4).collect()
    )
    corpus = sorted((i, t.strip().lower().split()) for i, t in DOCS if t.strip())
    n = len(corpus)
    want, seen = [], set()
    for q in range(1, 5):
        hi = [i for r, (i, _) in enumerate(corpus, 1)
              if min(4, math.ceil(r * 4 / n)) == q]
        for i, toks in corpus:
            if i in hi:
                seen.update(toks)
        nd = sum(1 for r in range(1, n + 1) if min(4, math.ceil(r * 4 / n)) == q)
        prev = want[-1][1] if want else 0
        want.append((q, prev + nd, len(seen)))
    assert got == want


def test_vocab_growth_monotone_full_coverage(spark):
    sf = "/root/testdata/sf0.001"
    d = spark.read.parquet(f"{sf}/documents.parquet")
    rows = sorted(
        (r["decile"], r["n_docs"], r["vocab"])
        for r in text.vocab_growth(d, deciles=10).collect()
    )
    assert [r[0] for r in rows] == list(range(1, 11))
    assert all(a[2] <= b[2] and a[1] < b[1] for a, b in zip(rows, rows[1:]))
    total_vocab = (
        d.filter(F.length(F.trim("text")) > 0)
        .select(F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("t"))
        .select("t").distinct().count()
    )
    assert rows[-1][2] == total_vocab
