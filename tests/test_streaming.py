"""Structured Streaming parity: streaming results == batch results."""

import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF}/events.parquet").persist()


def test_stream_hourly_equals_batch(spark, events):
    from linkgraph import streaming
    from linkgraph.suite import q_event_hourly

    got = {
        (r["hour"], r["event_type"]): (r["n"], r["sum_value_e4"])
        for r in streaming.stream_hourly_counts(
            spark, f"{SF}/events.parquet", sink_table="t_hourly"
        ).collect()
    }
    exp = {
        (r["hour"], r["event_type"]): (r["n"], r["sum_value_e4"])
        for r in q_event_hourly(spark, SF).collect()
    }
    assert got == exp


def test_stream_sessions_equals_batch(spark, events):
    from linkgraph import streaming
    from linkgraph.suite import q_event_sessions

    got = {
        r["user_id"]: (r["n_sessions"], r["n_events"])
        for r in streaming.stream_sessionize(
            spark, f"{SF}/events.parquet", sink_table="t_sessions"
        ).collect()
    }
    exp = {
        r["user_id"]: (r["n_sessions"], r["n_events"])
        for r in q_event_sessions(spark, SF).collect()
    }
    assert got == exp


def test_stream_sessions_buffered_equals_batch(spark, events):
    from linkgraph import streaming
    from linkgraph.suite import q_event_sessions

    got = {
        r["user_id"]: (r["n_sessions"], r["n_events"])
        for r in streaming.stream_sessionize_buffered(
            spark, f"{SF}/events.parquet", sink_table="t_sessions_buf"
        ).collect()
    }
    exp = {
        r["user_id"]: (r["n_sessions"], r["n_events"])
        for r in q_event_sessions(spark, SF).collect()
    }
    assert got == exp


def _run_buffered_ooo_case(spark, tmp_path, ts_tz=None, sink="t_sessions_ooo"):
    """Shared driver for the out-of-order multi-batch sessionizer cases.
    ``ts_tz=None`` writes tz-less parquet (Spark TIMESTAMP_NTZ);
    ``ts_tz='UTC'`` writes tz-aware parquet (Spark TIMESTAMP with local-tz
    semantics — the type whose pandas rendering depends on the session
    timezone)."""
    import os
    import time

    # 6 users x 30 events over ~30 hours, deterministic pseudo-random gaps
    base = 1_700_000_000
    rows = []
    for u in range(6):
        t = base + (u * 997) % 3600
        for i in range(30):
            t += 120 + ((u * 31 + i * 257) % 5000)  # 2min..~85min gaps
            rows.append((u, float(t)))
    # batch oracle: sessions with gap > 1800s
    exp = {}
    for u in range(6):
        ts = sorted(t for uu, t in rows if uu == u)
        n = 1 + sum(1 for a, b in zip(ts, ts[1:]) if b - a > 1800)
        exp[u] = (n, len(ts))

    # three files with OVERLAPPING time windows: [0,40%), [30%,70%), [60%,100%)
    # -> per-user cross-file event-time order is violated in the overlaps
    ts_all = sorted(t for _, t in rows)
    lo, hi = ts_all[0], ts_all[-1]
    span = hi - lo
    windows = [(0.0, 0.4), (0.3, 0.7), (0.6, 1.01)]
    seen = set()
    d = tmp_path / "ev"
    d.mkdir()
    import pyarrow as pa
    import pyarrow.parquet as pq

    for i, (a, b) in enumerate(windows):
        part = [
            (u, t) for (u, t) in rows
            if lo + a * span <= t < lo + b * span and (u, t) not in seen
        ]
        seen.update(part)
        part.sort(key=lambda x: x[1])
        tbl = pa.table(
            {
                "user_id": pa.array([int(u) for u, _ in part], pa.int64()),
                "ts": pa.array(
                    [int(t * 1_000_000) for _, t in part],
                    pa.timestamp("us", tz=ts_tz),  # tz=None -> TIMESTAMP_NTZ
                ),
            }
        )
        p = str(d / f"part-{i:03d}.parquet")  # flat FILE, not a Spark dir
        pq.write_table(tbl, p)
        # file source orders by modification time: pin it increasing
        os.utime(p, (base + i, base + i))
        time.sleep(0.01)
    assert len(seen) == len(rows)

    from linkgraph import streaming

    got = {
        r["user_id"]: (r["n_sessions"], r["n_events"])
        for r in streaming.stream_sessionize_buffered(
            spark, f"{d}/*.parquet", sink_table=sink
        ).collect()
    }
    assert got == exp


def test_stream_sessions_buffered_out_of_order_files(spark, tmp_path):
    """The buffered sessionizer matches the batch oracle even when a
    user's events arrive OUT OF EVENT-TIME ORDER across micro-batches
    (maxFilesPerTrigger=1 over overlapping-window files) — the exact case
    the plain sessionizer documents as a precondition violation.  Files
    cover overlapping increasing time windows; disorder stays inside the
    2h watermark slack so nothing is dropped as late, and the watermark
    advances enough across batches to exercise session FINALIZATION (not
    just end-of-stream buffering)."""
    _run_buffered_ooo_case(spark, tmp_path, ts_tz=None, sink="t_sessions_ooo")


def test_stream_sessions_buffered_non_utc_session(spark, tmp_path):
    """The finalization cutoff compares pandas wall-clock timestamps
    against the UTC watermark; for TIMESTAMP (local-tz) columns in a
    non-UTC session the naive pandas values are session-tz wall times and
    must be tz-localized first, or the cutoff is offset by the tz delta.

    Surgical three-batch fixture where the LA offset (-8 h) provably flips
    the outcome (the watermark lags one trigger, so finalization must fire
    in a batch BEFORE the session tail arrives): batch 1 (user 1 at
    t0+7000) advances the watermark to t0-200; in batch 2 user 0's open
    session [t0, t0+600] is NOT finalizable under the correct cutoff
    (t0+2400 > t0-200) but IS under the -8 h-shifted one
    (t0-26400 < t0-200); batch 3 delivers the session tail t0+1200, which
    the buggy version counts as a SECOND session (this exact failure was
    confirmed by no-op-ing the localization)."""
    import os
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    base = 1_700_000_000
    batches = [
        [(1, base + 7000)],
        [(0, base), (0, base + 600)],
        [(0, base + 1200), (1, base + 9000)],
    ]
    d = tmp_path / "ev_la"
    d.mkdir()
    for i, part in enumerate(batches):
        tbl = pa.table(
            {
                "user_id": pa.array([u for u, _ in part], pa.int64()),
                "ts": pa.array(
                    [t * 1_000_000 for _, t in part],
                    pa.timestamp("us", tz="UTC"),  # Spark TIMESTAMP (LTZ)
                ),
            }
        )
        p = str(d / f"part-{i:03d}.parquet")
        pq.write_table(tbl, p)
        os.utime(p, (base + i, base + i))  # pin source file order
        time.sleep(0.01)

    from linkgraph import streaming

    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
    try:
        got = {
            r["user_id"]: (r["n_sessions"], r["n_events"])
            for r in streaming.stream_sessionize_buffered(
                spark, f"{d}/*.parquet", sink_table="t_sessions_la"
            ).collect()
        }
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    # user 0: gaps 600/600 <= 1800 -> ONE session; user 1: gap 2000 -> two
    assert got == {0: (1, 3), 1: (2, 2)}


def test_stream_ingest_matches_batch(spark, tmp_path):
    from linkgraph import datagen, ingest, streaming
    from pyspark.sql import functions as F

    pages = datagen.synth_pages(spark, 40, partitions=4)
    p = str(tmp_path / "pages.parquet")
    pages.write.mode("overwrite").parquet(p)

    got = {
        r["src_url"]: r["n_outlinks"]
        for r in streaming.stream_ingest_edges(
            spark, p, sink_table="t_stream_ingest"
        ).collect()
    }
    batch = (
        ingest.pages_to_url_edges(spark.read.parquet(p))
        .groupBy("src_url").agg(F.count(F.lit(1)).alias("n"))
    )
    exp = {r["src_url"]: r["n"] for r in batch.collect()}
    assert got == exp


def test_stream_distinct_users_equals_batch(spark, events):
    from pyspark.sql import functions as F
    from linkgraph import streaming

    got = {
        r["event_type"]: r["n_distinct_users"]
        for r in streaming.stream_distinct_users(
            spark, f"{SF}/events.parquet", sink_table="t_distinct"
        ).collect()
    }
    exp = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").cast("long").alias("n"))
        .collect()
    }
    assert got == exp


def test_hourly_retention_hand_case(spark):
    import datetime as dt

    from linkgraph import suite
    from pyspark.sql import functions as F

    h0 = dt.datetime(2026, 1, 1, 10, 0)
    h1 = dt.datetime(2026, 1, 1, 11, 0)
    rows = [(1, h0, 100), (2, h0, 101), (3, h1, 100), (4, h1, 102)]
    ev = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long")
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        ev.write.parquet(f"{d}/events.parquet")
        got = {r["hour"]: (r["actives"], r["retained"], r["retention_e6"])
               for r in suite.q_hourly_retention(spark, d).collect()}
    # hour 10: users {100,101}, user 100 returns in hour 11 -> 1/2
    assert got[h0] == (2, 1, 500000)
    assert got[h1] == (2, 0, 0)


def test_event_funnel_hand_case(spark):
    import datetime as dt
    import tempfile

    from linkgraph import suite

    t = lambda m: dt.datetime(2026, 1, 1, 10, m)  # noqa: E731
    rows = [
        (1, t(0), 1, "view"), (2, t(5), 1, "buy"),     # view->buy converts
        (3, t(0), 2, "buy"), (4, t(5), 2, "view"),     # buy->view converts
        (5, t(0), 3, "view"),                           # view only
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string")
    with tempfile.TemporaryDirectory() as d:
        ev.write.parquet(f"{d}/events.parquet")
        got = {(r["step_a"], r["step_b"]): r["converted_users"]
               for r in suite.q_event_funnel(spark, d).collect()}
    assert got == {("view", "buy"): 1, ("buy", "view"): 1}


def test_kmeans_label_confusion_marginals(spark):
    from linkgraph import suite

    sf = "/root/testdata/sf0.001"
    rows = suite.q_kmeans_label_confusion(spark, sf).collect()
    n_emb = spark.read.parquet(f"{sf}/embeddings.parquet").count()
    assert sum(r["n"] for r in rows) == n_emb  # contingency marginal


def test_bipartite_projection_hand_case(spark):
    import datetime as dt
    import tempfile

    from linkgraph import suite

    t0 = dt.datetime(2026, 1, 1, 10, 0)
    rows = [(1, t0, 1, "a"), (2, t0, 1, "b"), (3, t0, 2, "a"),
            (4, t0, 2, "b"), (5, t0, 3, "a"), (6, t0, 1, "a")]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string")
    with tempfile.TemporaryDirectory() as d:
        ev.write.parquet(f"{d}/events.parquet")
        got = {(r["type_a"], r["type_b"]): r["shared_users"]
               for r in suite.q_bipartite_projection(spark, d).collect()}
    assert got == {("a", "b"): 2}


def test_interarrival_percentiles_hand_case(spark):
    import datetime as dt
    import tempfile

    from linkgraph import suite

    base = dt.datetime(2026, 1, 1, 10, 0, 0)
    # user 1 gaps: 10s, 20s; user 2 gap: 40s  -> gaps [10,20,40] s
    rows = [(1, base, 1), (2, base + dt.timedelta(seconds=10), 1),
            (3, base + dt.timedelta(seconds=30), 1),
            (4, base, 2), (5, base + dt.timedelta(seconds=40), 2)]
    ev = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long")
    with tempfile.TemporaryDirectory() as d:
        ev.write.parquet(f"{d}/events.parquet")
        r = suite.q_interarrival_percentiles(spark, d).collect()[0]
    assert (r["n"], r["p50"], r["p90"], r["p99"]) == (
        3, 20_000_000, 40_000_000, 40_000_000)


def test_stream_attribution_equals_batch(spark):
    """Stream-stream interval join drained with availableNow equals the
    batch interval join on a hand-built fixture."""
    import datetime as dt
    import tempfile

    from linkgraph import streaming

    base = dt.datetime(2026, 1, 1, 10, 0, 0)
    m = lambda k: base + dt.timedelta(minutes=k)  # noqa: E731
    rows = [
        (1, m(0), 1, "view", 0.0, ""),
        (2, m(30), 1, "purchase", 1.0, ""),   # attributed to view 1
        (3, m(200), 1, "purchase", 1.0, ""),  # no view within 1h
        (4, m(0), 2, "view", 0.0, ""),
        (5, m(90), 2, "purchase", 1.0, ""),   # view 4 is 90min old: no
        (6, m(85), 2, "view", 0.0, ""),       # view 6 within 5min: yes
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string")
    with tempfile.TemporaryDirectory() as d:
        # the file stream source globs on the leaf FILE name, so the
        # fixture must be a single parquet file (as in the sf dirs)
        import glob
        import shutil

        ev.repartition(1).write.parquet(f"{d}/tmp")
        shutil.copy(glob.glob(f"{d}/tmp/part-*.parquet")[0],
                    f"{d}/events.parquet")
        got = {(r["user_id"], r["view_event"], r["buy_event"])
               for r in streaming.stream_attribution(
                   spark, f"{d}/events.parquet",
                   sink_table="t_attr").collect()}
    assert got == {(1, 1, 2), (2, 6, 5)}
