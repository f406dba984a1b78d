"""Round-4d operators: node2vec second-order walks, next-fit context
packing, temporal triangle counting — each vs an independent pure-Python
oracle, plus partition-invariance and conservation invariants."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from linkgraph.algos.paths import (
    N2V_BFS_W,
    N2V_DFS_W,
    N2V_RET_W,
    WALK_A,
    WALK_B,
    WALK_C,
    WALK_D,
    node2vec_walks,
)
from linkgraph import corpus


# ---------------------------------------------------------------------------
# node2vec
# ---------------------------------------------------------------------------

EDGES = [
    (0, 1), (0, 2), (1, 2), (1, 3), (2, 4), (3, 4), (4, 5), (5, 6),
    (6, 0), (3, 6), (2, 7), (7, 8), (8, 9), (9, 7),
]


def _py_node2vec(edges, starts, length):
    adj: dict[int, list[int]] = {}
    eset = set()
    for s, d in edges:
        for a, b in ((s, d), (d, s)):
            adj.setdefault(a, []).append(b)
            eset.add((a, b))
    for k in adj:
        adj[k] = sorted(set(adj[k]))
    out = []
    for w in starts:
        prev, v = w, w
        out.append((w, 0, w))
        for step in range(1, length + 1):
            cands = adj.get(v, [])
            if not cands:
                break
            wts = [
                N2V_RET_W if d == prev
                else (N2V_BFS_W if (prev, d) in eset else N2V_DFS_W)
                for d in cands
            ]
            tot = sum(wts)
            r = (w * WALK_A + v * WALK_B + step * WALK_C + prev * WALK_D) % tot
            cum = 0
            for d, wt in zip(cands, wts):
                cum += wt
                if r < cum:
                    prev, v = v, d
                    break
            out.append((w, step, v))
    return sorted(out)


def test_node2vec_matches_python_oracle(spark):
    e = spark.createDataFrame(EDGES, "src long, dst long")
    starts = spark.createDataFrame([(i,) for i in range(10)], "id long")
    got = sorted(
        tuple(r) for r in node2vec_walks(e, starts, length=5, partitions=4)
        .select("walk_id", "step", "v").collect()
    )
    assert got == _py_node2vec(EDGES, range(10), 5)


def test_node2vec_partition_invariance(spark):
    e = spark.createDataFrame(EDGES, "src long, dst long")
    starts = spark.createDataFrame([(i,) for i in range(6)], "id long")
    a = sorted(
        tuple(r) for r in node2vec_walks(e, starts, length=4, partitions=2)
        .collect()
    )
    b = sorted(
        tuple(r) for r in node2vec_walks(e, starts, length=4, partitions=7)
        .collect()
    )
    assert a == b


def test_node2vec_steps_are_graph_edges(spark):
    e = spark.createDataFrame(EDGES, "src long, dst long")
    starts = spark.createDataFrame([(i,) for i in range(10)], "id long")
    walks = node2vec_walks(e, starts, length=5, partitions=4)
    und = {(s, d) for s, d in EDGES} | {(d, s) for s, d in EDGES}
    byw: dict[tuple, list] = {}
    for r in walks.collect():
        byw.setdefault(r["walk_id"], []).append((r["step"], r["v"]))
    for w, steps in byw.items():
        steps.sort()
        assert [s for s, _ in steps] == list(range(len(steps)))
        for (s0, v0), (_s1, v1) in zip(steps, steps[1:]):
            assert (v0, v1) in und


# ---------------------------------------------------------------------------
# context packing
# ---------------------------------------------------------------------------


def _py_pack(items, capacity):
    """items: ordered (doc_id, n). Returns {doc_id: (bin, off)}."""
    fill, b = 0, 0
    out = {}
    for doc_id, n in items:
        if fill > 0 and fill + n > capacity:
            b += 1
            fill = 0
        out[doc_id] = (b, fill)
        fill += n
    return out


@pytest.fixture(scope="module")
def docs_df(spark):
    rows = [
        (i, " ".join(["tok"] * (1 + (i * 37) % 90)), "en", "s", 0)
        for i in range(120)
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).persist()


def test_context_pack_matches_python_fold(spark, docs_df):
    got = corpus.context_pack(docs_df, capacity=64, n_groups=4).collect()
    by_grp: dict[int, list] = {}
    for r in sorted(got, key=lambda r: r["doc_id"]):
        by_grp.setdefault(r["grp"], []).append(r)
    assert sorted(by_grp) == [0, 1, 2, 3]
    for grp, rows in by_grp.items():
        items = [(r["doc_id"], r["n_tokens"]) for r in rows]
        exp = _py_pack(items, 64)
        for r in rows:
            assert (r["bin_id"], r["offset"]) == exp[r["doc_id"]], r
            assert r["doc_id"] % 4 == grp


def test_context_pack_invariants(spark, docs_df):
    cap = 64
    rows = corpus.context_pack(docs_df, capacity=cap, n_groups=4).collect()
    # token mass conserved
    exp_total = sum(1 + (i * 37) % 90 for i in range(120))
    assert sum(r["n_tokens"] for r in rows) == exp_total
    # every doc packed exactly once
    assert sorted(r["doc_id"] for r in rows) == list(range(120))
    # bin fill <= capacity unless the bin is a single oversized doc
    fills: dict[tuple, list] = {}
    for r in rows:
        fills.setdefault((r["grp"], r["bin_id"]), []).append(r["n_tokens"])
    for (_g, _b), ns in fills.items():
        if len(ns) > 1:
            assert sum(ns) <= cap
    # offsets are the running sum within each bin (doc-id order)
    byb: dict[tuple, list] = {}
    for r in rows:
        byb.setdefault((r["grp"], r["bin_id"]), []).append(r)
    for rs in byb.values():
        rs.sort(key=lambda r: r["doc_id"])
        acc = 0
        for r in rs:
            assert r["offset"] == acc
            acc += r["n_tokens"]


def test_context_pack_oversized_doc_gets_own_bin(spark):
    rows = [
        (0, " ".join(["t"] * 10), "en", "s", 0),
        (4, " ".join(["t"] * 500), "en", "s", 0),  # oversized
        (8, " ".join(["t"] * 10), "en", "s", 0),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    got = {r["doc_id"]: r for r in
           corpus.context_pack(df, capacity=64, n_groups=4).collect()}
    assert got[0]["bin_id"] == 0 and got[0]["offset"] == 0
    assert got[4]["bin_id"] == 1 and got[4]["offset"] == 0
    assert got[8]["bin_id"] == 2 and got[8]["offset"] == 0


# ---------------------------------------------------------------------------
# temporal triangles
# ---------------------------------------------------------------------------


def test_temporal_triangle_brute_force(spark, monkeypatch, tmp_path):
    """Run the gate's exact join plan on a hand-built temporal edge set and
    compare to an O(E^3) brute force."""
    from linkgraph import suite

    tedges = [  # (a, b, day)
        (0, 1, 0), (1, 2, 10), (0, 2, 20),          # triangle within 45
        (2, 3, 0), (3, 4, 100), (2, 4, 110),        # spread 110 > 45
        (4, 5, 50), (5, 6, 60), (4, 6, 94),         # spread 44 <= 45
        (0, 3, 5), (1, 3, 7),                       # 0-1-3 triangle d<=45
    ]
    V = suite.V_B
    rows = [(a, b, d, d * V * V + a * V + b) for a, b, d in tedges]
    df = spark.createDataFrame(rows, "a long, b long, day long, ek long")

    monkeypatch.setattr(suite, "edges_t", lambda _s, _d: df)
    got = suite.q_temporal_triangle_count(spark, "unused").collect()[0][0]

    W = suite.TEMPORAL_WINDOW_DAYS
    es = {frozenset((a, b)): d for a, b, d in tedges}
    import itertools

    exp = 0
    for tri in itertools.combinations(es, 3):
        vs = set()
        for e in tri:
            vs |= set(e)
        if len(vs) != 3:
            continue
        # is it a triangle? every pair of vertices must be one of the edges
        if not all(frozenset(p) in tri for p in itertools.combinations(vs, 2)):
            continue
        days = sorted(es[e] for e in tri)
        if days[-1] - days[0] <= W:
            exp += 1
    # {0,1,2},{0,1,3},{0,2,3},{1,2,3},{4,5,6} in-window; {2,3,4} spread 110 > 45
    assert exp == 5
    assert got == exp


def test_temporal_edges_fixture_deterministic(spark):
    from linkgraph import suite

    sf = "/root/testdata/sf0.001"
    a = sorted(tuple(r) for r in suite.edges_t(spark, sf).collect())
    b = sorted(tuple(r) for r in suite.edges_t(spark, sf).collect())
    assert a == b
    assert len(a) == len({r[3] for r in a})  # ek strictly unique


# ---------------------------------------------------------------------------
# sliding-window streaming
# ---------------------------------------------------------------------------


def test_stream_sliding_matches_batch(spark):
    from linkgraph import streaming

    sf = "/root/testdata/sf0.001"
    got = streaming.stream_sliding_counts(
        spark, f"{sf}/events.parquet", sink_table="t_sliding_r4d"
    )
    ev = spark.read.parquet(f"{sf}/events.parquet")
    batch = (
        ev.groupBy(
            F.window(F.col("ts").cast("timestamp"), "1 hour", "15 minutes")
            .alias("w"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.sum("value") * 1e4).cast("long").alias("sum_value_e4"),
        )
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("win_start"),
            "event_type", "n", "sum_value_e4",
        )
    )
    a = sorted(tuple(r) for r in got.collect())
    b = sorted(tuple(r) for r in batch.collect())
    assert a == b
    # every event contributes to exactly window/slide = 4 windows
    assert sum(r[2] for r in a) == 4 * ev.count()
