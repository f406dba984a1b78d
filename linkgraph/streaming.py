"""Structured Streaming layer: incremental event analytics with watermarks.

The reference is batch-only (SURVEY.md §2.8); its closest analogue is the
anytime incremental estimation loop (/root/reference/src/ErrorLatencyProfile.cpp:25-47).
This module adds the streaming capability a web-scale event pipeline needs:

  * ``stream_hourly_counts`` — file-source ``readStream`` over the events
    table, 1-hour event-time tumbling windows with a watermark for late
    data, grouped count + sum.  Run with ``trigger(availableNow=True)``
    it drains the backlog incrementally (bounded state, many micro-batches)
    and must produce exactly the batch answer — which is how the suite
    oracle checks it (streaming/batch parity is the test).
  * ``stream_sessionize`` — stateful custom operator via
    ``applyInPandasWithState``: per-user session assembly with a
    30-minute inactivity gap, emitting (user_id, n_sessions, n_events)
    on timeout — the streaming twin of suite.q_event_sessions.

At scale the state store is RocksDB-backed per shuffle partition; keys are
user_id (hash-partitioned, skew-free for web events).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

def _events_stream(spark: SparkSession, events_path: str) -> DataFrame:
    # The file source needs a directory; select the events table inside it
    # with pathGlobFilter.  Schema comes from the parquet footer (streaming
    # sources require an explicit schema); event-time ops require TIMESTAMP,
    # so cast NTZ -> TIMESTAMP (session tz is pinned UTC: values unchanged).
    import os

    directory = os.path.dirname(events_path.rstrip("/"))
    basename = os.path.basename(events_path.rstrip("/"))
    schema = spark.read.parquet(events_path).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", basename)
        .parquet(directory)
    )
    return stream.withColumn("ts", F.col("ts").cast("timestamp"))


def stream_hourly_counts(
    spark: SparkSession,
    events_dir: str,
    watermark: str = "2 hours",
    sink_table: str = "stream_hourly",
) -> DataFrame:
    """Drain the events backlog with availableNow; return the final result.

    Output: (hour, event_type, n, sum_value_e4) — identical to the batch
    q_event_hourly (the oracle)."""
    stream = _events_stream(spark, events_dir)
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.sum("value") * 1e4).cast("long").alias("sum_value_e4"),
        )
        .select(
            # back to NTZ so the schema matches the batch table exactly
            F.col("w.start").cast("timestamp_ntz").alias("hour"),
            "event_type", "n", "sum_value_e4",
        )
    )
    ckpt = tempfile.mkdtemp(prefix="lg_stream_ckpt_")
    q = (
        agg.writeStream.format("memory")
        .queryName(sink_table)
        .outputMode("complete")
        .option("checkpointLocation", os.path.join(ckpt, "hourly"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(sink_table)


def stream_sessionize(
    spark: SparkSession,
    events_dir: str,
    gap_s: int = 1800,
    sink_table: str = "stream_sessions",
) -> DataFrame:
    """Stateful session counting per user via applyInPandasWithState.

    Emits (user_id, n_sessions, n_events) after the backlog drains —
    value-identical to the batch q_event_sessions oracle.

    PRECONDITION (documented, asserted by the batch-parity test): events
    must arrive in event-time order ACROSS micro-batches per user — true
    here because the source is a single parquet file (one micro-batch);
    within a batch the sessionizer sorts.  A deployment with out-of-order
    multi-file arrival needs the watermark+timeout form instead: buffer
    per-user events in state and emit on event-time timeout (the engine's
    stream_attribution shows the watermarked pattern); session counting is
    order-sensitive, so no incremental operator can avoid one of the two."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    stream = _events_stream(spark, events_dir).select("user_id", "ts", "event_id")

    def fn(key, pdf_iter, state: GroupState):
        # state: (last_ts_epoch float, n_sessions int, n_events int)
        if state.exists:
            last_ts, n_sessions, n_events = state.get
        else:
            last_ts, n_sessions, n_events = (-1.0, 0, 0)
        rows = pd.concat(list(pdf_iter)).sort_values(["ts", "event_id"])
        for t in rows["ts"]:
            e = t.timestamp()
            if last_ts < 0 or e - last_ts > gap_s:
                n_sessions += 1
            last_ts = e
            n_events += 1
        state.update((float(last_ts), int(n_sessions), int(n_events)))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_sessions": [n_sessions], "n_events": [n_events]}
        )

    out = stream.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType="user_id long, n_sessions long, n_events long",
        stateStructType="last_ts double, n_sessions long, n_events long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    ckpt = tempfile.mkdtemp(prefix="lg_stream_ckpt_")
    q = (
        out.writeStream.format("memory")
        .queryName(sink_table)
        .outputMode("update")
        .option("checkpointLocation", os.path.join(ckpt, "sessions"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # update-mode memory sink appends every emission; keep the final row
    # per user (max n_events is monotone within a user)
    t = spark.table(sink_table)
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.desc("n_events"))
    return (
        t.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("user_id", "n_sessions", "n_events")
    )


def stream_sessionize_buffered(
    spark: SparkSession,
    events_dir: str,
    gap_s: int = 1800,
    watermark: str = "2 hours",
    sink_table: str = "stream_sessions_buffered",
) -> DataFrame:
    """Order-robust stateful sessionizer: correct even when a user's events
    arrive OUT OF EVENT-TIME ORDER across micro-batches (the failure mode
    stream_sessionize documents as a precondition).

    Design: per-user state buffers pending event timestamps; each
    invocation merges the new batch, then FINALIZES every session that can
    no longer change — a session ending at te is immutable once
    te + gap < watermark, because any future event could only join it with
    ts <= te + gap, and the watermark guarantees no accepted event is older
    than wm.  Finalized sessions increment a closed counter and their
    events leave the buffer, so state per user is bounded by the events
    inside (wm - gap, now] — watermark slack + gap, NOT the full history.
    Emitted total = closed + sessions(pending buffer); the final emission
    per user (max emit_seq) equals the batch oracle exactly.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    # Arrow hands the UDF NAIVE pandas timestamps.  For TIMESTAMP (with
    # local-tz semantics) they are rendered in the SESSION timezone while
    # getCurrentWatermarkMs is true UTC epoch, so in a non-UTC session the
    # finalization cutoff would be offset by the tz delta (LA: -8 h, which
    # finalizes sessions early and SPLITS any session whose tail arrives in
    # a later micro-batch) — localize to the session tz before epoch
    # conversion.  For TIMESTAMP_NTZ the watermark itself treats the
    # wall-clock value as UTC, so naive-as-UTC (pandas' default) is already
    # correct and localizing to the session tz would INTRODUCE the offset.
    from pyspark.sql.types import TimestampNTZType

    stream = (
        _events_stream(spark, events_dir)
        .withWatermark("ts", watermark)
        .select("user_id", "ts")
    )
    if isinstance(stream.schema["ts"].dataType, TimestampNTZType):
        epoch_tz = "UTC"
    else:
        epoch_tz = spark.conf.get("spark.sql.session.timeZone")

    def _sessions(ts_sorted: list[float]) -> int:
        n = 0
        last = None
        for t in ts_sorted:
            if last is None or t - last > gap_s:
                n += 1
            last = t
        return n

    def fn(key, pdf_iter, state: GroupState):
        if state.exists:
            pending, closed, n_events, emit_seq = state.get
            pending = list(pending)
        else:
            pending, closed, n_events, emit_seq = [], 0, 0, 0
        new = pd.concat(list(pdf_iter))
        n_events += len(new)
        ts = new["ts"]
        if getattr(ts.dt, "tz", None) is None:
            ts = ts.dt.tz_localize(epoch_tz)
        pending.extend(t.timestamp() for t in ts)
        pending.sort()
        wm = state.getCurrentWatermarkMs() / 1000.0
        # finalize sessions whose end is gap-safely behind the watermark
        i = 0
        start = 0
        while i < len(pending):
            end_of_session = (
                i + 1 == len(pending) or pending[i + 1] - pending[i] > gap_s
            )
            if end_of_session and pending[i] + gap_s < wm:
                closed += 1
                start = i + 1
            elif end_of_session:
                break
            i += 1
        pending = pending[start:]
        emit_seq += 1
        state.update((pending, int(closed), int(n_events), int(emit_seq)))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_sessions": [closed + _sessions(pending)],
                "n_events": [n_events],
                "emit_seq": [emit_seq],
            }
        )

    out = stream.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=(
            "user_id long, n_sessions long, n_events long, emit_seq long"
        ),
        stateStructType=(
            "pending array<double>, closed long, n_events long, emit_seq long"
        ),
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    ckpt = tempfile.mkdtemp(prefix="lg_stream_ckpt_")
    q = (
        out.writeStream.format("memory")
        .queryName(sink_table)
        .outputMode("update")
        .option("checkpointLocation", os.path.join(ckpt, "sessions_buf"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    t = spark.table(sink_table)
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.desc("emit_seq"))
    return (
        t.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("user_id", "n_sessions", "n_events")
    )


def stream_ingest_edges(
    spark: SparkSession,
    pages_path: str,
    sink_table: str = "stream_ingest",
) -> DataFrame:
    """Streaming twin of the batch ingest stage: ``readStream`` over the
    web-pages table, vectorized pandas-UDF outlink extraction per
    micro-batch, aggregated to (src_url, n_outlinks).

    This is the shape a continuously-crawling pipeline uses: each arriving
    WARC batch flows through the SAME extraction UDF as the batch path
    (ingest.extract_outlinks — byte-identical semantics), so backfill and
    live ingest cannot diverge.  Output equals the batch answer on a
    drained backlog (the oracle check).
    """
    from .ingest import extract_outlinks

    schema = spark.read.parquet(pages_path).schema
    if os.path.isdir(pages_path):
        # a parquet directory of part files: stream it directly
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(pages_path)
        )
    else:
        # a single parquet file: the file source needs a directory, so
        # stream the parent filtered to this basename
        directory = os.path.dirname(pages_path.rstrip("/"))
        basename = os.path.basename(pages_path.rstrip("/"))
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .option("pathGlobFilter", basename)
            .parquet(directory)
        )
    edges = stream.select(
        F.col("url").alias("src_url"),
        F.explode(extract_outlinks(F.col("html"))).alias("dst_url"),
    ).filter(F.col("src_url") != F.col("dst_url"))
    agg = edges.groupBy("src_url").agg(
        F.count(F.lit(1)).cast("long").alias("n_outlinks")
    )
    ckpt = tempfile.mkdtemp(prefix="lg_stream_ckpt_")
    q = (
        agg.writeStream.format("memory")
        .queryName(sink_table)
        .outputMode("complete")
        .option("checkpointLocation", os.path.join(ckpt, "ingest"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(sink_table)


def stream_distinct_users(
    spark: SparkSession,
    events_dir: str,
    sink_table: str = "stream_distinct_users",
) -> DataFrame:
    """Streaming exact distinct-user count per event type — chained
    stateful operators: ``dropDuplicates`` on (user_id, event_type)
    (the streaming dedup state, first-occurrence-wins) feeding a grouped
    count.  Drained with availableNow over many micro-batches, the result
    must equal the batch COUNT(DISTINCT user_id) GROUP BY event_type —
    which is exactly how the suite oracle checks it.

    At scale the dedup state is hash-partitioned on the composite key in
    the per-partition state store (RocksDB-backed) — the streaming twin
    of the engine's exact_dedup batch operator.
    """
    stream = _events_stream(spark, events_dir).select("user_id", "event_type")
    dedup = stream.dropDuplicates(["user_id", "event_type"])
    agg = dedup.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_distinct_users")
    )
    ckpt = tempfile.mkdtemp(prefix="lg_stream_ckpt_")
    q = (
        agg.writeStream.format("memory")
        .queryName(sink_table)
        .outputMode("complete")
        .option("checkpointLocation", os.path.join(ckpt, "distinct"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(sink_table)


def stream_attribution(
    spark: SparkSession,
    events_dir: str,
    watermark: str = "2 hours",
    sink_table: str = "stream_attr",
) -> DataFrame:
    """Stream-stream interval join: attribute each purchase to the same
    user's views in the hour before it — the last uncovered Structured
    Streaming primitive (two watermarked streams, event-time-bounded
    inner join, append mode).  Inner-join results are emitted as matches
    arrive and the watermark only bounds buffered state, so draining
    with availableNow produces exactly the batch join (the oracle).

    Output: (user_id, view_event, buy_event), one row per attribution
    edge.  State is keyed on user_id per side — hash-partitioned,
    skew-free for web events; the 1-hour bound keeps per-key buffers
    small at any scale.
    """
    s = _events_stream(spark, events_dir)
    views = (
        s.filter(F.col("event_type") == "view")
        .select(F.col("user_id").alias("v_user"),
                F.col("event_id").alias("view_event"),
                F.col("ts").alias("view_ts"))
        .withWatermark("view_ts", watermark)
    )
    buys = (
        s.filter(F.col("event_type") == "purchase")
        .select(F.col("user_id").alias("b_user"),
                F.col("event_id").alias("buy_event"),
                F.col("ts").alias("buy_ts"))
        .withWatermark("buy_ts", watermark)
    )
    j = views.join(
        buys,
        F.expr("""v_user = b_user
                  AND view_ts BETWEEN buy_ts - INTERVAL 1 HOUR AND buy_ts"""),
    ).select(F.col("b_user").cast("long").alias("user_id"),
             F.col("view_event").cast("long").alias("view_event"),
             F.col("buy_event").cast("long").alias("buy_event"))
    ckpt = tempfile.mkdtemp(prefix="lg_stream_ckpt_")
    q = (
        j.writeStream.format("memory")
        .queryName(sink_table)
        .outputMode("append")
        .option("checkpointLocation", os.path.join(ckpt, "attr"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(sink_table)


def stream_cms_user_counts(
    spark: SparkSession,
    events_dir: str,
    sink_table: str = "stream_cms",
) -> DataFrame:
    """Count-min sketch maintained AS the streaming state: the running
    aggregation is keyed by (d, bucket), so state is bounded at
    D x W = 512 rows no matter how many users or events flow through —
    the canonical sketch-instead-of-keyed-state pattern for unbounded
    key domains (a per-user count would grow state linearly forever).

    Drains the backlog with availableNow (maxFilesPerTrigger=1, so the
    sketch accumulates across micro-batches); returns the final sketch
    (d, bucket, c), which the batch/DuckDB twin reproduces exactly —
    bucket sums are associative, so stream order cannot change them."""
    from .dedup import h60
    from .sketch import CMS_DEPTH, CMS_WIDTH

    stream = _events_stream(spark, events_dir)
    ds = stream.select(
        F.col("user_id").cast("string").alias("k"),
        F.explode(F.array(*[F.lit(d) for d in range(CMS_DEPTH)])).alias("d"),
    )
    bucket = h60(F.concat(F.col("k"), F.lit(":"),
                          F.col("d").cast("string"))) % CMS_WIDTH
    agg = (
        ds.groupBy(
            F.col("d").cast("long").alias("d"),
            bucket.cast("long").alias("bucket"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    ckpt = tempfile.mkdtemp(prefix="lg_stream_ckpt_")
    q = (
        agg.writeStream.format("memory")
        .queryName(sink_table)
        .outputMode("complete")
        .option("checkpointLocation", os.path.join(ckpt, "cms"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(sink_table)


def stream_bucket_min_distinct(
    spark: SparkSession,
    events_dir: str,
    buckets: int = 16,
    sink_table: str = "stream_bmin",
) -> DataFrame:
    """Bucket-min distinct-count sketch maintained AS the streaming
    state (Flajolet-Martin '85 stochastic averaging — the
    streaming-friendly sibling of ``sketch.kmv_build``): the 60-bit
    user hash splits into a bucket (low 4 bits) and a sub-hash (high 56
    bits, uniform); the running aggregation keeps only min(sub-hash)
    per bucket, so state is bounded at ``buckets`` rows for an
    unbounded user-id domain.  min is associative and
    order-insensitive, so the drained sketch equals the batch/DuckDB
    build exactly (that equality IS the parity gate) — unlike KMV's
    k-smallest list, which is not expressible as a bounded streaming
    aggregate.  E[min_i] ~ S/n for n distinct users over sub-space S,
    so sum(min_i) inverts to a distinct estimate (estimator accuracy is
    tested in tests/test_round3c.py; the gate hashes the sketch rows).

    buckets must be a power of two (bit-split keeps the arithmetic
    exact: shiftright is integer-exact where a float divide of 2^60-
    scale hashes is not)."""
    from .dedup import h60

    assert buckets & (buckets - 1) == 0, "buckets must be a power of two"
    shift = buckets.bit_length() - 1
    stream = _events_stream(spark, events_dir)
    h = h60(F.col("user_id").cast("string"))
    agg = (
        stream.select(
            (h % buckets).cast("long").alias("bucket"),
            F.shiftright(h, shift).cast("long").alias("sub"),
        )
        .groupBy("bucket")
        .agg(F.min("sub").cast("long").alias("minh"))
    )
    ckpt = tempfile.mkdtemp(prefix="lg_stream_ckpt_")
    q = (
        agg.writeStream.format("memory")
        .queryName(sink_table)
        .outputMode("complete")
        .option("checkpointLocation", os.path.join(ckpt, "bmin"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(sink_table)


def stream_sliding_counts(
    spark: SparkSession,
    events_dir: str,
    watermark: str = "2 hours",
    sink_table: str = "stream_sliding",
) -> DataFrame:
    """Sliding-window event counts over the stream: 1-hour windows sliding
    every 15 minutes (each event lands in exactly window/slide = 4
    overlapping windows), drained with availableNow.

    Output: (win_start, event_type, n, sum_value_e4).  The batch twin is
    closed-form — the 4 covering window starts of an event are
    ``floor(epoch/900)·900 − k·900, k ∈ 0..3`` — so the oracle is plain
    SQL with a 4-row range join, no streaming machinery.

    Scale note (honest): this sink runs ``outputMode("complete")`` so the
    one-shot availableNow drain emits EVERY window — in complete mode
    Structured Streaming never evicts state via the watermark, so state is
    O(all windows ever seen) × event types, not O(active windows).  State
    per window is a fixed-size aggregate (never O(events)), and for the
    bounded-horizon drains used here that is the right trade: append mode
    with the watermark WOULD bound state to windows-in-flight, but it
    withholds every window still inside the watermark at end-of-drain, so
    a continuous deployment wanting bounded state should switch to append
    mode and accept watermark-delayed emission.
    """
    stream = _events_stream(spark, events_dir)
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(
            F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type"
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
    ckpt = tempfile.mkdtemp(prefix="lg_stream_ckpt_")
    q = (
        agg.writeStream.format("memory")
        .queryName(sink_table)
        .outputMode("complete")
        .option("checkpointLocation", os.path.join(ckpt, "sliding"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(sink_table)
