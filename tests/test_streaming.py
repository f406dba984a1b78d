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
