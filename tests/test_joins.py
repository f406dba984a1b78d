"""As-of join (linkgraph/joins.py): brute-force parity, inclusive bound,
tie determinism, partition invariance."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from linkgraph import joins

T0 = dt.datetime(2024, 1, 1)


def _t(s):
    return T0 + dt.timedelta(seconds=s)


@pytest.fixture(scope="module")
def tables(spark):
    # trades (probe) and quotes (build) with a same-ts tie and a no-match key
    trades = spark.createDataFrame(
        [
            (100, 1, _t(10)),
            (101, 1, _t(5)),   # before any quote of key 1? quote at 5 exists (inclusive)
            (102, 2, _t(7)),
            (103, 3, _t(9)),   # key 3 has no quotes at all
            (104, 2, _t(3)),   # before key 2's first quote -> null
        ],
        "event_id long, user_id long, ts timestamp",
    )
    quotes = spark.createDataFrame(
        [
            (200, 1, _t(5)),
            (201, 1, _t(8)),
            (202, 1, _t(8)),   # tie at ts=8: deterministic winner = max id
            (203, 1, _t(11)),  # after every trade of key 1
            (204, 2, _t(6)),
        ],
        "event_id long, user_id long, ts timestamp",
    )
    return trades, quotes


def _brute(trades, quotes):
    out = {}
    for t in trades:
        cand = [
            q for q in quotes
            if q[1] == t[1] and q[2] <= t[2]
        ]
        best = max(cand, key=lambda q: (q[2], q[0])) if cand else None
        out[t[0]] = (best[0], best[2]) if best else (None, None)
    return out


def test_asof_matches_brute_force(tables):
    trades, quotes = tables
    res = joins.asof_join(trades, quotes, key="user_id",
                          payload=["event_id"]).collect()
    brute = _brute([tuple(r) for r in trades.collect()],
                   [tuple(r) for r in quotes.collect()])
    assert len(res) == trades.count()
    for r in res:
        want_id, want_ts = brute[r["event_id"]]
        assert r["event_id_asof"] == want_id, r
        assert r["ts_asof"] == want_ts, r


def test_asof_inclusive_and_ties(tables):
    trades, quotes = tables
    res = {r["event_id"]: r for r in joins.asof_join(
        trades, quotes, key="user_id", payload=["event_id"]).collect()}
    assert res[101]["event_id_asof"] == 200      # inclusive <= at ts=5
    assert res[100]["event_id_asof"] == 202      # tie at ts=8 -> max id wins
    assert res[103]["event_id_asof"] is None     # key with no build rows
    assert res[104]["event_id_asof"] is None     # probe before first build


def test_asof_partition_invariant(tables):
    trades, quotes = tables
    a = joins.asof_join(trades.repartition(1), quotes.repartition(7),
                        key="user_id", payload=["event_id"])
    b = joins.asof_join(trades.repartition(5), quotes.repartition(2),
                        key="user_id", payload=["event_id"])
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_asof_left_columns_preserved(tables):
    trades, quotes = tables
    res = joins.asof_join(trades, quotes, key="user_id", payload=["event_id"])
    assert res.columns == ["event_id", "user_id", "ts",
                           "ts_asof", "event_id_asof"]
    assert res.count() == 5


# ---------------------------------------------------------------------------
# interval_join
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def intervals(spark):
    # keyed intervals exercising: containment, partial overlap, exact
    # touch at a bucket boundary, disjoint, multi-bucket spans, and a
    # zero-length (point) interval
    left = spark.createDataFrame(
        [
            (1, 1, 0, 25),     # spans buckets 0..2 at w=10
            (2, 1, 30, 31),
            (3, 2, 5, 5),      # point interval
            (4, 2, 100, 120),
            (5, 1, 40, 45),
        ],
        "lid long, k long, s long, e long",
    )
    right = spark.createDataFrame(
        [
            (10, 1, 20, 40),   # overlaps lid=1 (20..25), lid=2, touches lid=5 at 40
            (11, 1, 26, 29),   # gap between lid=1 and lid=2
            (12, 2, 0, 5),     # touches the point interval lid=3
            (13, 2, 121, 130), # disjoint from lid=4
            (14, 1, 0, 200),   # covers everything of key 1
        ],
        "rid long, k long, s long, e long",
    )
    return left, right


def _brute_overlap(left, right, keyed=True):
    out = set()
    for l in left:
        for r in right:
            if keyed and l[1] != r[1]:
                continue
            if l[2] <= r[3] and r[2] <= l[3]:
                out.add((l[0], r[0]))
    return out


@pytest.mark.parametrize("w", [1, 3, 10, 1000])
def test_interval_join_matches_brute_force(intervals, w):
    left, right = intervals
    res = joins.interval_join(
        left, right, "s", "e", "s", "e", bucket_width=w, key="k"
    ).select("lid", "rid").collect()
    got = [(r["lid"], r["rid"]) for r in res]
    want = _brute_overlap(
        [tuple(r) for r in left.collect()],
        [tuple(r) for r in right.collect()],
    )
    assert len(got) == len(set(got)), "emit-once violated: duplicate pairs"
    assert set(got) == want


def test_interval_join_unkeyed(intervals):
    left, right = intervals
    res = joins.interval_join(
        left.drop("k"), right.drop("k"), "s", "e", "s", "e", bucket_width=7
    ).select("lid", "rid").collect()
    got = sorted((r["lid"], r["rid"]) for r in res)
    want = sorted(_brute_overlap(
        [(r["lid"], None, r["s"], r["e"]) for r in left.collect()],
        [(r["rid"], None, r["s"], r["e"]) for r in right.collect()],
        keyed=False,
    ))
    assert got == want


def test_interval_join_partition_invariant(intervals):
    left, right = intervals
    a = joins.interval_join(left.repartition(1), right.repartition(6),
                            "s", "e", "s", "e", bucket_width=10, key="k")
    b = joins.interval_join(left.repartition(4), right.repartition(2),
                            "s", "e", "s", "e", bucket_width=10, key="k")
    assert sorted(map(tuple, a.select("lid", "rid").collect())) == \
        sorted(map(tuple, b.select("lid", "rid").collect()))


def test_interval_join_no_cartesian_in_plan(intervals):
    left, right = intervals
    plan = joins.interval_join(
        left, right, "s", "e", "s", "e", bucket_width=10, key="k"
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
