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
    schema; _events adapts to whichever physical ts layout the corpus
    file carries)."""
    from etl_project_gcp_spark.queries import _events

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = _events(spark, "/root/testdata/sf0.001")
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


def test_stateful_sessionize_emits_closed_sessions(spark, tmp_path_factory):
    """applyInPandasWithState sessionizer: sessions close when a later
    event exceeds the gap; the trailing (sentinel) session stays open in
    state and is NOT emitted by the availableNow drain."""
    import datetime as dt

    from etl_project_gcp_spark.streaming import stateful_sessionize

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def ev(eid, uid, offset_s, value):
        return (eid, t0 + dt.timedelta(seconds=offset_s), uid, "click", value, "{}")

    rows = [
        # user 1, session A: 2 events 60s apart
        ev(1, 1, 0, 1.0),
        ev(2, 1, 60, 2.0),
        # user 1, session B: 2 events starting 2h later (gap 1800s exceeded)
        ev(3, 1, 7200, 3.0),
        ev(4, 1, 7230, 4.0),
        # user 2, session C: single event
        ev(5, 2, 0, 5.0),
        # sentinels far in the future force A/B/C closed in-batch
        ev(6, 1, 360000, 0.0),
        ev(7, 2, 360000, 0.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, "
              "event_type string, value double, props string"
    )
    out = str(tmp_path_factory.mktemp("stateful") / "events")
    df.coalesce(1).write.mode("overwrite").parquet(out)

    from etl_project_gcp_spark.streaming import read_event_stream, run_to_memory_sink

    stream = read_event_stream(spark, out)
    q = run_to_memory_sink(
        stateful_sessionize(stream, gap_seconds=1800), "stateful_sessions",
        output_mode="append",
    )
    q.awaitTermination(120)
    got = {
        (r.user_id, r.session_start, r.n_events, r.total_value)
        for r in spark.table("stateful_sessions").collect()
    }
    assert got == {
        (1, t0, 2, 3.0),
        (1, t0 + dt.timedelta(seconds=7200), 2, 7.0),
        (2, t0, 1, 5.0),
    }


def test_streaming_sliding_matches_batch(spark, event_dir):
    stream = read_event_stream(spark, event_dir)
    q = run_to_memory_sink(
        streaming_tumbling_agg(
            stream, "1 hour", "10 minutes", slide="15 minutes"
        ),
        "sliding_test",
    )
    q.awaitTermination(120)
    got = {
        (r.window_start, r.event_type): (r.n_events, round(r.total_value, 4))
        for r in spark.sql("SELECT * FROM sliding_test").collect()
    }
    batch = EV.sliding_window_agg(
        spark.read.parquet(event_dir),
        "ts",
        "1 hour",
        "15 minutes",
        ("event_type",),
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("total_value"),
    )
    want = {
        (r.window_start, r.event_type): (r.n_events, round(r.total_value, 4))
        for r in batch.collect()
    }
    assert got == want


def test_incremental_rollup_processes_only_new_data(spark, tmp_path_factory):
    """Two availableNow refreshes: the second must emit only windows
    finalized by the new files (no reprocessing, no duplicates), and the
    accumulated table must match the batch rollup over closed windows."""
    import datetime as dt

    from etl_project_gcp_spark.streaming import incremental_rollup

    root = tmp_path_factory.mktemp("rollup")
    src, out, ckpt = str(root / "src"), str(root / "out"), str(root / "ckpt")

    def ev_batch(rows):
        return spark.createDataFrame(
            rows, "event_id bigint, ts timestamp, user_id bigint, "
                  "event_type string, value double, props string"
        )

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    h = lambda hours, mins=0: t0 + dt.timedelta(hours=hours, minutes=mins)
    # batch 1: events in hours 0 and 1, plus one at hour 2 to advance the
    # watermark past hour 0+1's windows... watermark = max(ts)-10min = 2:20
    b1 = [(1, h(0, 5), 1, "click", 1.0, "{}"),
          (2, h(0, 45), 1, "click", 2.0, "{}"),
          (3, h(1, 15), 2, "click", 3.0, "{}"),
          (4, h(2, 30), 2, "click", 4.0, "{}")]
    ev_batch(b1).coalesce(1).write.mode("append").parquet(src)
    q = incremental_rollup(spark, src, out, ckpt)
    q.awaitTermination(120)
    first = {
        (r.window_start, r.n_events, r.total_value)
        for r in spark.read.parquet(out).collect()
    }
    # windows [0:00,1:00) and [1:00,2:00) closed (watermark 2:20); the
    # hour-2 window is still open
    assert first == {(h(0), 2, 3.0), (h(1), 1, 3.0)}

    # batch 2: hour-4 event closes the hour-2 window
    b2 = [(5, h(4, 30), 1, "click", 5.0, "{}")]
    ev_batch(b2).coalesce(1).write.mode("append").parquet(src)
    q2 = incremental_rollup(spark, src, out, ckpt)
    q2.awaitTermination(120)
    acc = {
        (r.window_start, r.n_events, r.total_value)
        for r in spark.read.parquet(out).collect()
    }
    assert acc == first | {(h(2), 1, 4.0)}
    # exactly-once: no duplicated windows across refreshes
    rows = spark.read.parquet(out).collect()
    assert len(rows) == len({r.window_start for r in rows})


def test_streaming_interval_join_matches_batch_range_join(spark, event_dir):
    """Stream-stream interval join must produce exactly the pairs the
    batch bucketed range_join finds on the drained data."""
    from etl_project_gcp_spark.streaming import streaming_interval_join

    left = read_event_stream(spark, event_dir).filter(
        F.col("event_type") == "purchase"
    )
    right = read_event_stream(spark, event_dir).filter(
        F.col("event_type") == "click"
    )
    q = run_to_memory_sink(
        streaming_interval_join(left, right, lookback_seconds=3600),
        "interval_join_test",
        output_mode="append",
    )
    q.awaitTermination(120)
    got = {
        (r.left_id, r.right_id)
        for r in spark.sql("SELECT * FROM interval_join_test").collect()
    }
    ev = spark.read.parquet(event_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id")
    )
    want = {
        (r.event_id, r.click_id)
        for r in EV.range_join(
            purchases, clicks, ("user_id",), "ts", 3600, ("click_id",)
        ).collect()
    }
    assert got == want and len(want) > 0


def test_streaming_dedup_bounded_state_drops_in_window_dupes(spark, tmp_path_factory):
    """dropDuplicatesWithinWatermark must suppress duplicate keys that
    arrive inside the watermark horizon: the drained output carries each
    event_id exactly once, matching batch dropDuplicates."""
    from etl_project_gcp_spark.streaming import streaming_dedup
    from etl_project_gcp_spark.queries import _events

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = _events(spark, "/root/testdata/sf0.001").limit(500)
    dup = ev.union(ev.limit(200))  # 200 in-window duplicates
    out = str(tmp_path_factory.mktemp("dedup_stream") / "events")
    dup.coalesce(2).write.mode("overwrite").parquet(out)

    stream = read_event_stream(spark, out)
    q = run_to_memory_sink(
        streaming_dedup(stream, keys=("event_id",), watermark="1 hour"),
        "dedup_test",
        output_mode="append",
    )
    q.awaitTermination(120)
    got = [r.event_id for r in spark.sql("SELECT event_id FROM dedup_test").collect()]
    want = {r.event_id for r in ev.select("event_id").distinct().collect()}
    assert len(got) == len(set(got)), "duplicate event_id in deduped stream"
    assert set(got) == want


def test_streaming_merge_upsert_is_incremental_and_preserves_partitions(
    spark, tmp_path_factory
):
    """foreachBatch MERGE ingestion: arriving update files upsert into
    the partitioned target; the checkpoint makes re-runs process only
    new files, and partitions no batch touches are never rewritten."""
    import glob
    import os

    from pyspark.sql import Row

    from etl_project_gcp_spark.streaming import streaming_merge_upsert

    root = tmp_path_factory.mktemp("merge_stream")
    target = str(root / "target")
    source = str(root / "source")
    ckpt = str(root / "ckpt")
    os.makedirs(source)
    schema = "id bigint, year int, val string"

    spark.createDataFrame(
        [Row(id=1, year=2023, val="a"), Row(id=2, year=2024, val="b")],
        schema,
    ).write.partitionBy("year").parquet(target)
    frozen = {
        f: os.stat(f).st_mtime_ns
        for f in glob.glob(f"{target}/year=2023/*.parquet")
    }

    # Batch 1: update id=2, insert id=3 — both in year=2024.
    spark.createDataFrame(
        [Row(id=2, year=2024, val="B2"), Row(id=3, year=2024, val="c")],
        schema,
    ).write.mode("append").parquet(source)
    q = streaming_merge_upsert(
        spark, source, target, ["id"], ["year"], ckpt, schema
    )
    q.awaitTermination(120)
    got = {(r.id, r.year, r.val) for r in spark.read.parquet(target).collect()}
    assert got == {(1, 2023, "a"), (2, 2024, "B2"), (3, 2024, "c")}

    # Batch 2: another update lands; re-run processes ONLY the new file.
    spark.createDataFrame([Row(id=3, year=2024, val="C3")], schema).write.mode(
        "append"
    ).parquet(source)
    q2 = streaming_merge_upsert(
        spark, source, target, ["id"], ["year"], ckpt, schema
    )
    q2.awaitTermination(120)
    got2 = {(r.id, r.year, r.val) for r in spark.read.parquet(target).collect()}
    assert got2 == {(1, 2023, "a"), (2, 2024, "B2"), (3, 2024, "C3")}
    # If batch 1's files were reprocessed alongside, id=2 would flap or
    # year=2023 would churn; the untouched partition is byte-identical
    # across BOTH runs.
    assert {
        f: os.stat(f).st_mtime_ns
        for f in glob.glob(f"{target}/year=2023/*.parquet")
    } == frozen


def test_streaming_merge_upsert_collapses_in_batch_versions(
    spark, tmp_path_factory
):
    """With order_col, a micro-batch carrying several versions of one
    key compacts to the highest sequence before merging (standard CDC);
    without it the duplicate raises instead of silently landing twice."""
    import os

    from pyspark.sql import Row

    from etl_project_gcp_spark.streaming import streaming_merge_upsert

    root = tmp_path_factory.mktemp("cdc")
    target = str(root / "target")
    source = str(root / "source")
    os.makedirs(source)
    schema = "id bigint, year int, val string, seq bigint"

    spark.createDataFrame(
        [Row(id=1, year=2024, val="a", seq=0)], schema
    ).write.partitionBy("year").parquet(target)
    spark.createDataFrame(
        [
            Row(id=1, year=2024, val="v1", seq=1),
            Row(id=1, year=2024, val="v2", seq=2),
            Row(id=2, year=2024, val="b", seq=1),
        ],
        schema,
    ).write.mode("append").parquet(source)

    q = streaming_merge_upsert(
        spark, source, target, ["id"], ["year"],
        str(root / "ck1"), schema, order_col="seq",
    )
    q.awaitTermination(120)
    got = {
        (r.id, r.val, r.seq) for r in spark.read.parquet(target).collect()
    }
    assert got == {(1, "v2", 2), (2, "b", 1)}

    # Without order_col the same shape must fail loudly, not duplicate.
    q2 = streaming_merge_upsert(
        spark, source, target, ["id"], ["year"],
        str(root / "ck2"), schema,
    )
    try:
        q2.awaitTermination(120)
        raised = False
    except Exception:
        raised = True
    assert raised, "duplicate in-batch keys must fail without order_col"


def test_streaming_forward_fill_matches_batch(spark, event_dir):
    from etl_project_gcp_spark.streaming import streaming_forward_fill

    stream = read_event_stream(spark, event_dir)
    q = run_to_memory_sink(
        streaming_forward_fill(stream, observe_type="purchase"),
        "ff_test",
        output_mode="append",
    )
    q.awaitTermination(120)
    got = {
        r.event_id: r.last_obs_value
        for r in spark.sql("SELECT * FROM ff_test").collect()
    }
    batch = EV.forward_fill(
        spark.read.parquet(event_dir),
        {
            "last_obs_value": F.when(
                F.col("event_type") == "purchase", F.col("value")
            )
        },
    )
    want = {r.event_id: r.last_obs_value for r in batch.collect()}
    assert got == want
    assert any(v is not None for v in got.values())
    assert any(v is None for v in got.values())  # pre-first-purchase rows


def test_streaming_merge_upsert_bootstraps_missing_target(
    spark, tmp_path_factory
):
    """ADVICE r5: the OPENING micro-batch into a not-yet-existing target
    must create the table through the same foreachBatch MERGE path, not
    die with PATH_NOT_FOUND inside the stream."""
    import os

    from pyspark.sql import Row

    from etl_project_gcp_spark.streaming import streaming_merge_upsert

    root = tmp_path_factory.mktemp("merge_bootstrap")
    target = str(root / "target")  # never created
    source = str(root / "source")
    ckpt = str(root / "ckpt")
    os.makedirs(source)
    schema = "id bigint, year int, val string"

    spark.createDataFrame(
        [Row(id=1, year=2023, val="a"), Row(id=2, year=2024, val="b")],
        schema,
    ).write.mode("append").parquet(source)
    q = streaming_merge_upsert(
        spark, source, target, ["id"], ["year"], ckpt, schema
    )
    q.awaitTermination(120)
    got = {(r.id, r.year, r.val) for r in spark.read.parquet(target).collect()}
    assert got == {(1, 2023, "a"), (2, 2024, "b")}

    # and the NEXT batch merges into the bootstrapped table normally
    spark.createDataFrame([Row(id=2, year=2024, val="B2")], schema).write.mode(
        "append"
    ).parquet(source)
    q2 = streaming_merge_upsert(
        spark, source, target, ["id"], ["year"], ckpt, schema
    )
    q2.awaitTermination(120)
    got = {(r.id, r.year, r.val) for r in spark.read.parquet(target).collect()}
    assert got == {(1, 2023, "a"), (2, 2024, "B2")}


def _drain_to_parquet(plan, out, ckpt):
    q = (
        plan.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_stateful_sessionize_late_event_does_not_rewind_session(
    spark, tmp_path_factory
):
    """Code-review r6: a late-but-admitted cross-batch event must join
    the open session by extending it BACKWARD (min start, max end) —
    the old unconditional `last = t` rewound session_end and split the
    session spuriously."""
    import datetime as dt

    from pyspark.sql import Row

    from etl_project_gcp_spark.streaming import (
        read_event_stream,
        stateful_sessionize,
    )

    root = tmp_path_factory.mktemp("late_sess")
    source, out, ckpt = (str(root / d) for d in ("src", "out", "ckpt"))

    def land(*rows):
        spark.createDataFrame(
            [Row(event_id=i, ts=t, user_id=1, event_type="click",
                 value=1.0, props="{}")
             for i, t in enumerate(rows)],
        ).write.mode("append").parquet(source)

    def drain():
        _drain_to_parquet(
            stateful_sessionize(
                read_event_stream(spark, source), gap_seconds=1800
            ),
            out, ckpt,
        )

    base = dt.datetime(2024, 1, 1, 10, 0)
    land(base)                                     # 10:00
    drain()
    # late 09:56 (admitted: watermark 09:50) + 10:27 (27 min after the
    # TRUE last event 10:00 — must stay in the same session)
    land(base - dt.timedelta(minutes=4), base + dt.timedelta(minutes=27))
    drain()
    # 11:30: 63 min after 10:27 — closes the session
    land(base + dt.timedelta(minutes=90))
    drain()

    closed = [
        (r.session_start, r.session_end, r.n_events)
        for r in spark.read.parquet(out).collect()
    ]
    assert (
        base - dt.timedelta(minutes=4),  # extended backward to 09:56
        base + dt.timedelta(minutes=27),  # never rewound below 10:27
        3,
    ) in closed, closed
    # and no spurious split ending at the late event's time
    assert not any(end == base - dt.timedelta(minutes=4)
                   for _, end, _ in closed), closed


def test_stateful_sessionize_late_events_merge_within_gap(
    spark, tmp_path_factory
):
    """ADVICE r6: admitted late events that fall within the gap of EACH
    OTHER must close as ONE merged late session (the batch formulation's
    answer), not N singletons — while a late event a full gap away still
    closes separately."""
    import datetime as dt

    from pyspark.sql import Row

    from etl_project_gcp_spark.streaming import (
        read_event_stream,
        stateful_sessionize,
    )

    root = tmp_path_factory.mktemp("late_merge")
    source, out, ckpt = (str(root / d) for d in ("src", "out", "ckpt"))

    def land(*rows):
        spark.createDataFrame(
            [Row(event_id=i, ts=t, user_id=1, event_type="click",
                 value=1.0, props="{}")
             for i, t in enumerate(rows)],
        ).write.mode("append").parquet(source)

    def drain():
        _drain_to_parquet(
            stateful_sessionize(
                read_event_stream(spark, source),
                gap_seconds=1800,
                watermark="4 hours",  # admit the 3h-late events
            ),
            out, ckpt,
        )

    base = dt.datetime(2024, 1, 1, 13, 0)
    land(base)                                      # open session 13:00
    drain()
    # three late events, all > gap older than the open session:
    # 10:00 + 10:05 are within gap of each other (ONE late session),
    # 10:50 is 45 min after 10:05 (its own late session)
    land(base - dt.timedelta(minutes=180),
         base - dt.timedelta(minutes=175),
         base - dt.timedelta(minutes=130))
    drain()
    land(base + dt.timedelta(hours=3))              # 16:00 closes 13:00
    drain()

    closed = {
        (r.session_start, r.session_end, r.n_events, r.total_value)
        for r in spark.read.parquet(out).collect()
    }
    assert (base - dt.timedelta(minutes=180),
            base - dt.timedelta(minutes=175), 2, 2.0) in closed, closed
    assert (base - dt.timedelta(minutes=130),
            base - dt.timedelta(minutes=130), 1, 1.0) in closed, closed
    assert (base, base, 1, 1.0) in closed, closed
    # no singleton fragments of the merged pair
    assert not any(
        s == e == base - dt.timedelta(minutes=180) for s, e, _, _ in closed
    ), closed


def test_stateful_sessionize_bridged_late_group_merges_into_open(
    spark, tmp_path_factory
):
    """ADVICE r7: a late event is classified against the open session's
    start AT PROCESSING TIME, but a later event in the same sorted batch
    can backward-extend the session (s = min(s, t)) to within gap of the
    late group. Batch semantics (the lag+cumsum oracle) then make them
    ONE session — the late group must merge into the open session at
    end-of-batch, not close as a spurious singleton."""
    import datetime as dt

    from pyspark.sql import Row

    from etl_project_gcp_spark.streaming import (
        read_event_stream,
        stateful_sessionize,
    )

    root = tmp_path_factory.mktemp("late_bridge")
    source, out, ckpt = (str(root / d) for d in ("src", "out", "ckpt"))

    def land(*rows):
        spark.createDataFrame(
            [Row(event_id=i, ts=t, user_id=1, event_type="click",
                 value=1.0, props="{}")
             for i, t in enumerate(rows)],
        ).write.mode("append").parquet(source)

    def drain():
        _drain_to_parquet(
            stateful_sessionize(
                read_event_stream(spark, source),
                gap_seconds=1800,
                watermark="4 hours",  # admit the late events
            ),
            out, ckpt,
        )

    base = dt.datetime(2024, 1, 1, 13, 0)
    land(base)                                      # open session 13:00
    drain()
    # 12:10 is > gap older than s=13:00 -> provisionally late; 12:35 is
    # within gap of 13:00 and pulls s back to 12:35, bridging 12:10
    # (12:35 - 12:10 = 25 min <= gap) -> all three are ONE session
    land(base - dt.timedelta(minutes=50),
         base - dt.timedelta(minutes=25))
    drain()
    land(base + dt.timedelta(hours=3))              # 16:00 closes it
    drain()

    closed = {
        (r.session_start, r.session_end, r.n_events, r.total_value)
        for r in spark.read.parquet(out).collect()
    }
    assert (base - dt.timedelta(minutes=50), base, 3, 3.0) in closed, closed
    # no spurious singleton for the bridged late event
    assert not any(
        s == e == base - dt.timedelta(minutes=50)
        for s, e, _, _ in closed
    ), closed


def test_streaming_forward_fill_late_rows_never_see_the_future(
    spark, tmp_path_factory
):
    """Code-review r6: a late event older than the carried observation
    must emit NULL (not a value observed AFTER it), and a late
    observation must not regress the carry for subsequent rows."""
    import datetime as dt

    from pyspark.sql import Row

    from etl_project_gcp_spark.streaming import (
        read_event_stream,
        streaming_forward_fill,
    )

    root = tmp_path_factory.mktemp("late_ff")
    source, out, ckpt = (str(root / d) for d in ("src", "out", "ckpt"))

    def land(*rows):
        spark.createDataFrame(
            [Row(event_id=i, ts=t, user_id=1, event_type=et, value=v,
                 props="{}")
             for i, (t, et, v) in enumerate(rows)],
        ).write.mode("append").parquet(source)

    def drain():
        _drain_to_parquet(
            streaming_forward_fill(
                read_event_stream(spark, source), observe_type="purchase"
            ),
            out, ckpt,
        )

    base = dt.datetime(2024, 1, 1, 10, 0)
    land((base, "purchase", 50.0))                                # 10:00
    drain()
    land(
        (base + dt.timedelta(minutes=5), "click", 0.0),           # 10:05
        (base - dt.timedelta(minutes=4), "click", 0.0),           # 09:56 late
    )
    drain()
    land(
        (base - dt.timedelta(minutes=3), "purchase", 10.0),       # late obs
        (base + dt.timedelta(minutes=6), "click", 0.0),           # 10:06
    )
    drain()

    got = {
        (r.ts, r.event_type): r.last_obs_value
        for r in spark.read.parquet(out).collect()
    }
    assert got[(base + dt.timedelta(minutes=5), "click")] == 50.0
    # late row older than the carry: NULL, never the 10:00 value
    assert got[(base - dt.timedelta(minutes=4), "click")] is None
    # late observation must not regress the carry for the 10:06 row
    assert got[(base + dt.timedelta(minutes=6), "click")] == 50.0


def test_state_store_provider_env_surface(spark, monkeypatch):
    """$SPARK_GRAFT_STATE_STORE selects the state store provider class
    (alias or fully-qualified) before a stateful stream starts; unset
    leaves the session conf untouched (Spark's HDFS-backed default)."""
    from etl_project_gcp_spark.streaming.streams import (
        apply_state_store_conf,
    )

    key = "spark.sql.streaming.stateStore.providerClass"
    default = spark.conf.get(key, None)

    monkeypatch.delenv("SPARK_GRAFT_STATE_STORE", raising=False)
    apply_state_store_conf(spark)
    assert spark.conf.get(key, None) == default

    monkeypatch.setenv("SPARK_GRAFT_STATE_STORE", "rocksdb")
    apply_state_store_conf(spark)
    assert spark.conf.get(key).endswith("RocksDBStateStoreProvider")

    monkeypatch.setenv("SPARK_GRAFT_STATE_STORE", "custom.Provider")
    apply_state_store_conf(spark)
    assert spark.conf.get(key) == "custom.Provider"

    # restore: a lingering provider would rebind every later stream
    if default is None:
        spark.conf.unset(key)
    else:
        spark.conf.set(key, default)


def test_stateful_sessionize_bridged_late_group_merges_before_midbatch_close(
    spark, tmp_path_factory
):
    """Deeper variant of the r7 bridged-late case: the bridged session
    CLOSES mid-batch (a much later event in the same batch opens a new
    session), so the late-merge check must run at close time — an
    end-of-loop-only check would compare the late group against the NEW
    session and emit a spurious singleton."""
    import datetime as dt

    from pyspark.sql import Row

    from etl_project_gcp_spark.streaming import (
        read_event_stream,
        stateful_sessionize,
    )

    root = tmp_path_factory.mktemp("late_bridge_close")
    source, out, ckpt = (str(root / d) for d in ("src", "out", "ckpt"))

    def land(*rows):
        spark.createDataFrame(
            [Row(event_id=i, ts=t, user_id=1, event_type="click",
                 value=1.0, props="{}")
             for i, t in enumerate(rows)],
        ).write.mode("append").parquet(source)

    def drain():
        _drain_to_parquet(
            stateful_sessionize(
                read_event_stream(spark, source),
                gap_seconds=1800,
                watermark="4 hours",
            ),
            out, ckpt,
        )

    base = dt.datetime(2024, 1, 1, 13, 0)
    land(base)                                      # open session 13:00
    drain()
    # one batch: 12:10 provisionally late vs s=13:00; 12:35 bridges it
    # (pulls s to 12:35); 14:30 closes the bridged session IN-BATCH
    land(base - dt.timedelta(minutes=50),
         base - dt.timedelta(minutes=25),
         base + dt.timedelta(minutes=90))
    drain()
    land(base + dt.timedelta(hours=4))              # close the 14:30 one
    drain()

    closed = {
        (r.session_start, r.session_end, r.n_events, r.total_value)
        for r in spark.read.parquet(out).collect()
    }
    # batch semantics: 12:10/12:35/13:00 are ONE session
    assert (base - dt.timedelta(minutes=50), base, 3, 3.0) in closed, closed
    assert (base + dt.timedelta(minutes=90),
            base + dt.timedelta(minutes=90), 1, 1.0) in closed, closed
    assert not any(
        s == e == base - dt.timedelta(minutes=50)
        for s, e, _, _ in closed
    ), closed


def test_streaming_forward_fill_late_event_fills_from_same_batch_late_obs(
    spark, tmp_path_factory
):
    """A late event and a late observation arriving in the SAME batch:
    the event must fill from the late observation at-or-before it
    (batch semantics — both rows are in hand), while the state carry
    never regresses and rows after the carry still fill from it."""
    import datetime as dt

    from pyspark.sql import Row

    from etl_project_gcp_spark.streaming import (
        read_event_stream,
        streaming_forward_fill,
    )

    root = tmp_path_factory.mktemp("ff_late_pair")
    source, out, ckpt = (str(root / d) for d in ("src", "out", "ckpt"))

    def land(*rows):
        spark.createDataFrame(
            [Row(event_id=i, ts=t, user_id=1, event_type=et, value=v,
                 props="{}")
             for i, (t, et, v) in enumerate(rows)],
        ).write.mode("append").parquet(source)

    def drain():
        _drain_to_parquet(
            streaming_forward_fill(
                read_event_stream(spark, source), watermark="4 hours"
            ),
            out, ckpt,
        )

    base = dt.datetime(2024, 1, 1, 10, 0)
    land((base, "purchase", 50.0))                            # carry @10:00
    drain()
    land(
        (base - dt.timedelta(minutes=20), "purchase", 30.0),  # late obs 09:40
        (base - dt.timedelta(minutes=10), "click", 0.0),      # late evt 09:50
        (base - dt.timedelta(minutes=30), "click", 0.0),      # 09:30: pre-obs
        (base + dt.timedelta(minutes=5), "click", 0.0),       # 10:05
    )
    drain()

    got = {
        (r.ts, r.event_type): r.last_obs_value
        for r in spark.read.parquet(out).collect()
    }
    # late event fills from the same-batch late observation, not NULL
    assert got[(base - dt.timedelta(minutes=10), "click")] == 30.0
    # a late event BEFORE any admitted observation stays NULL
    assert got[(base - dt.timedelta(minutes=30), "click")] is None
    # the state carry is not regressed by the late observation
    assert got[(base + dt.timedelta(minutes=5), "click")] == 50.0


@pytest.mark.parametrize("seed", [11, 23, 47])
def test_stateful_sessionize_multibatch_matches_batch_replay(
    spark, tmp_path_factory, seed
):
    """Cross-batch state continuation, randomized: random per-user event
    times split into time-ordered micro-batches must yield EXACTLY the
    batch sessionization (plain-Python gap replay) once every session
    has closed — in-order arrival means the streaming fold's state
    hand-off is the only thing under test. Seeded (not hypothesis):
    each example pays real drains."""
    import datetime as dt
    import random

    from pyspark.sql import Row

    from etl_project_gcp_spark.streaming import (
        read_event_stream,
        stateful_sessionize,
    )

    rng = random.Random(seed)
    gap_s = 1800
    base = dt.datetime(2024, 1, 1, 8, 0)
    events = sorted(
        (
            base + dt.timedelta(seconds=rng.randrange(0, 6 * 3600)),
            rng.randrange(1, 4),  # 3 users
        )
        for _ in range(60)
    )

    # plain-Python replay: per user, split on gap > 30 min
    want = set()
    per_user: dict[int, list] = {}
    for ts, uid in events:
        per_user.setdefault(uid, []).append(ts)
    for uid, tss in per_user.items():
        start = prev = tss[0]
        n = 1
        for t in tss[1:]:
            if (t - prev).total_seconds() > gap_s:
                want.add((uid, start, prev, n))
                start, n = t, 0
            n += 1
            prev = t
        want.add((uid, start, prev, n))

    root = tmp_path_factory.mktemp(f"sess_prop_{seed}")
    source, out, ckpt = (str(root / d) for d in ("src", "out", "ckpt"))
    n_batches = rng.randrange(2, 5)
    cut = sorted(rng.sample(range(1, len(events)), n_batches - 1))
    batches = [
        events[a:b] for a, b in zip([0] + cut, cut + [len(events)])
    ]
    flush = base + dt.timedelta(hours=12)  # closes every open session
    batches.append([(flush, uid) for uid in per_user])
    for batch in batches:
        spark.createDataFrame(
            [Row(event_id=i, ts=t, user_id=uid, event_type="click",
                 value=1.0, props="{}")
             for i, (t, uid) in enumerate(batch)],
        ).write.mode("append").parquet(source)
        _drain_to_parquet(
            stateful_sessionize(
                read_event_stream(spark, source),
                gap_seconds=gap_s,
                watermark="10 minutes",
            ),
            out, ckpt,
        )

    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in spark.read.parquet(out).collect()
        if r.session_start != flush  # the flush singletons are scaffold
    }
    assert got == want


@pytest.mark.parametrize("seed", [7, 31])
def test_streaming_forward_fill_multibatch_matches_batch_replay(
    spark, tmp_path_factory, seed
):
    """Cross-batch carry hand-off, randomized: random in-order event
    streams (clicks interleaved with purchase observations) split into
    time-ordered micro-batches must fill exactly like a plain-Python
    last-observation replay of the full log."""
    import datetime as dt
    import random

    from pyspark.sql import Row

    from etl_project_gcp_spark.streaming import (
        read_event_stream,
        streaming_forward_fill,
    )

    rng = random.Random(seed)
    base = dt.datetime(2024, 1, 1, 8, 0)
    events = []
    for i in range(50):
        ts = base + dt.timedelta(seconds=rng.randrange(0, 4 * 3600))
        uid = rng.randrange(1, 4)
        et = "purchase" if rng.random() < 0.3 else "click"
        events.append((ts, uid, et, float(rng.randrange(1, 100))))
    events.sort(key=lambda e: e[0])

    want = {}
    carry: dict[int, float] = {}
    for i, (ts, uid, et, val) in enumerate(events):
        if et == "purchase":
            carry[uid] = val
        want[(uid, ts, i)] = carry.get(uid)

    root = tmp_path_factory.mktemp(f"ff_prop_{seed}")
    source, out, ckpt = (str(root / d) for d in ("src", "out", "ckpt"))
    n_batches = rng.randrange(2, 5)
    cut = sorted(rng.sample(range(1, len(events)), n_batches - 1))
    for a, b in zip([0] + cut, cut + [len(events)]):
        spark.createDataFrame(
            [Row(event_id=i, ts=t, user_id=uid, event_type=et, value=v,
                 props="{}")
             for i, (t, uid, et, v) in enumerate(events[a:b], start=a)],
        ).write.mode("append").parquet(source)
        _drain_to_parquet(
            streaming_forward_fill(
                read_event_stream(spark, source), watermark="10 minutes"
            ),
            out, ckpt,
        )

    got = {
        (r.user_id, r.ts, r.event_id): r.last_obs_value
        for r in spark.read.parquet(out).collect()
    }
    assert got == want


@pytest.mark.parametrize("seed", [13, 29])
def test_streaming_interval_join_multibatch_matches_replay(
    spark, tmp_path_factory, seed
):
    """Cross-batch stream-stream buffering, randomized: right-side rows
    must stay joinable to left rows that arrive in LATER micro-batches
    while still inside the lookback — in-order random streams split
    into batches must produce exactly the plain-Python interval-join
    replay of the full log (matched pairs, no drops, no duplicates)."""
    import datetime as dt
    import random

    from pyspark.sql import Row

    from etl_project_gcp_spark.streaming import (
        read_event_stream,
        streaming_interval_join,
    )

    rng = random.Random(seed)
    base = dt.datetime(2024, 1, 1, 8, 0)
    lookback = 300
    events = sorted(
        (
            base + dt.timedelta(seconds=rng.randrange(0, 3600)),
            rng.randrange(1, 4),
            "error" if rng.random() < 0.4 else "click",
        )
        for _ in range(40)
    )
    rows = [
        (i, ts, uid, et) for i, (ts, uid, et) in enumerate(events)
    ]

    want = {
        (luid, lid, rid)
        for lid, lts, luid, let in rows if let == "error"
        for rid, rts, ruid, ret in rows if ret == "click"
        if ruid == luid and rts <= lts
        and (lts - rts).total_seconds() < lookback
    }

    root = tmp_path_factory.mktemp(f"ij_prop_{seed}")
    source, out, ckpt = (str(root / d) for d in ("src", "out", "ckpt"))
    n_batches = rng.randrange(2, 5)
    cut = sorted(rng.sample(range(1, len(rows)), n_batches - 1))
    for a, b in zip([0] + cut, cut + [len(rows)]):
        spark.createDataFrame(
            [Row(event_id=i, ts=t, user_id=uid, event_type=et, value=1.0,
                 props="{}")
             for i, t, uid, et in rows[a:b]],
        ).write.mode("append").parquet(source)
        stream = read_event_stream(spark, source)
        _drain_to_parquet(
            streaming_interval_join(
                stream.filter(F.col("event_type") == "error"),
                stream.filter(F.col("event_type") == "click"),
                lookback_seconds=lookback,
                watermark="2 hours",  # in-order test: admit everything
            ),
            out, ckpt,
        )

    got = {
        (r.user_id, r.left_id, r.right_id)
        for r in spark.read.parquet(out).collect()
    }
    assert got == want


def test_streaming_dedup_suppresses_cross_batch_dupe_within_watermark(
    spark, tmp_path_factory
):
    """A duplicate key arriving in a LATER micro-batch while still
    inside the watermark horizon must be suppressed — the state store
    carries seen keys across batches, which the single-batch drain gate
    never exercises."""
    import datetime as dt

    from pyspark.sql import Row

    from etl_project_gcp_spark.streaming import streaming_dedup

    root = tmp_path_factory.mktemp("dedup_xbatch")
    source, out, ckpt = (str(root / d) for d in ("src", "out", "ckpt"))
    base = dt.datetime(2024, 1, 1, 10, 0)

    def land(*rows):
        spark.createDataFrame(
            [Row(event_id=i, ts=t, user_id=1, event_type="click",
                 value=1.0, props="{}")
             for i, t in rows],
        ).write.mode("append").parquet(source)

    def drain():
        _drain_to_parquet(
            streaming_dedup(
                read_event_stream(spark, source),
                keys=("event_id",),
                watermark="1 hour",
            ),
            out, ckpt,
        )

    land((1, base), (2, base + dt.timedelta(minutes=1)))
    drain()
    land((1, base + dt.timedelta(minutes=5)),   # dupe, in-window: drop
         (3, base + dt.timedelta(minutes=6)))
    drain()

    got = sorted(r.event_id for r in spark.read.parquet(out).collect())
    assert got == [1, 2, 3]


# ---------------------------------------------------------------------------
# _ts_to_us: serializer-agnostic timestamp de-boxing (ADVICE r11)
# ---------------------------------------------------------------------------


def test_ts_to_us_tz_naive_fast_path_matches_value_path():
    import numpy as np
    import pandas as pd

    from etl_project_gcp_spark.streaming.streams import _ts_to_us

    s = pd.Series(
        pd.to_datetime(
            ["2024-01-01 00:00:00.000001", "2024-06-15 12:34:56.789012"]
        )
    )
    got = _ts_to_us(s)
    want = np.array([t.value // 1000 for t in s], dtype="int64")
    assert got.dtype == np.int64
    assert (got == want).all()


def test_ts_to_us_tz_aware_falls_back_instead_of_raising():
    """The r11 vectorized fold assumed the applyInPandasWithState
    serializer hands tz-naive datetime64; a tz-aware (object/extension
    dtype) column made `.astype("datetime64[us]")` raise. The guarded
    helper must take the per-row .value path and return the same epoch
    microseconds the tz-naive twin would."""
    import numpy as np
    import pandas as pd

    from etl_project_gcp_spark.streaming.streams import _ts_to_us

    naive = pd.Series(
        pd.to_datetime(["2024-01-01 00:00:00", "2024-06-15 12:34:56"])
    )
    aware = naive.dt.tz_localize("UTC")
    assert aware.to_numpy().dtype.kind != "M"  # really the slow path
    got = _ts_to_us(aware)
    assert (got == _ts_to_us(naive)).all()
    assert got.dtype == np.int64

    # object-dtype Timestamps (another serializer shape) also work
    obj = pd.Series(list(naive), dtype="object")
    assert (_ts_to_us(obj) == _ts_to_us(naive)).all()


def test_drain_harness_scopes_nodata_and_width_confs(spark):
    """r16: ``_drain_stream_once`` disables no-data micro-batches for
    exactly the drain span (an availableNow drain's emissions all land
    in the data batch; the trailing 0-row batch pays a pass over every
    state store and, for the Python drains, a worker round trip) and
    restores BOTH toggled confs — shuffle width and noDataMicroBatches
    — on the normal and the raise path. Output equality across the
    flag was probed for all five drain entries at sf0.1 and sf0.01
    before the change shipped (identical drained rows)."""
    import datetime as _dt

    from etl_project_gcp_spark import queries as Q
    from etl_project_gcp_spark.streaming.streams import EVENT_SCHEMA

    landed = spark.createDataFrame(
        [(1, _dt.datetime(2024, 1, 1, 0, 0, 0), 7, "click", 1.0, "{}")],
        EVENT_SCHEMA,
    )
    ndb_key = "spark.sql.streaming.noDataMicroBatches.enabled"
    prev_ndb = spark.conf.get(ndb_key)
    spark.conf.set(ndb_key, "true")
    prev_width = spark.conf.get("spark.sql.shuffle.partitions")
    seen = {}

    def plan(stream):
        # runs inside the drain span, after both confs are applied
        seen["ndb_during"] = spark.conf.get(ndb_key)
        seen["width_during"] = spark.conf.get(
            "spark.sql.shuffle.partitions"
        )
        return stream.select("event_id", "ts", "user_id")

    try:
        out = Q._drain_stream_once(
            spark, landed, plan, "ndb_scope_sink",
            stream_shuffle_partitions=3,
        )
        assert out.count() == 1
        assert seen == {"ndb_during": "false", "width_during": "3"}
        assert spark.conf.get(ndb_key) == "true"
        assert (
            spark.conf.get("spark.sql.shuffle.partitions") == prev_width
        )

        def boom(stream):
            raise RuntimeError("mid-drain failure")

        with pytest.raises(RuntimeError, match="mid-drain"):
            Q._drain_stream_once(
                spark, landed, boom, "ndb_scope_sink_boom",
                stream_shuffle_partitions=3,
            )
        assert spark.conf.get(ndb_key) == "true"
        assert (
            spark.conf.get("spark.sql.shuffle.partitions") == prev_width
        )
    finally:
        spark.conf.set(ndb_key, prev_ndb)
        spark.conf.set("spark.sql.shuffle.partitions", prev_width)
