"""Streaming twins must agree with their batch formulations once all
data is drained (availableNow trigger, complete mode)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_project_gcp_spark.operators import events as EV
from etl_project_gcp_spark.streaming import (
    read_event_stream,
    run_to_memory_sink,
    streaming_session_agg,
    streaming_tumbling_agg,
)


@pytest.fixture(scope="module")
def event_dir(spark, tmp_path_factory):
    """Events from the driver corpus, re-landed as clean micro-batch
    parquet (micros timestamps — streaming sources need a pinned
    schema, and the corpus file's TIMESTAMP(NANOS) isn't one)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    )
    out = str(tmp_path_factory.mktemp("stream") / "events")
    ev.coalesce(2).write.mode("overwrite").parquet(out)
    return out


def test_streaming_tumbling_matches_batch(spark, event_dir):
    stream = read_event_stream(spark, event_dir)
    q = run_to_memory_sink(
        streaming_tumbling_agg(stream, "1 hour", "10 minutes"), "tumbling_test"
    )
    q.awaitTermination(120)
    got = {
        (r.window_start, r.event_type): (r.n_events, round(r.total_value, 4))
        for r in spark.sql("SELECT * FROM tumbling_test").collect()
    }
    batch = EV.tumbling_window_agg(
        spark.read.parquet(event_dir),
        "ts",
        "hour",
        ("event_type",),
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("total_value"),
    )
    want = {
        (r.window_start, r.event_type): (r.n_events, round(r.total_value, 4))
        for r in batch.collect()
    }
    assert got == want


def test_streaming_sessions_match_batch(spark, event_dir):
    stream = read_event_stream(spark, event_dir)
    q = run_to_memory_sink(
        streaming_session_agg(stream, "30 minutes", "10 minutes"), "session_test"
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM session_test").collect()
    # batch twin: lag+cumsum sessionization over the same data
    batch = EV.session_summary(spark.read.parquet(event_dir), "30 minutes").collect()
    # same number of sessions per user, same total events
    def per_user(rows):
        d = {}
        for r in rows:
            d.setdefault(r.user_id, []).append(r.n_events)
        return {u: sorted(v) for u, v in d.items()}
    assert per_user(got) == per_user(batch)
