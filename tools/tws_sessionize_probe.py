"""transformWithStateInPandas trial for the sessionize drain
(r15 verdict ask #3): re-express streams.stateful_sessionize's per-user
fold with Spark 4.x's StatefulProcessor API, equality-gate the drained
rows against the shipped applyInPandasWithState operator, and time both
interleaved in one process.

Facts the decision must weigh:
- transformWithState REQUIRES the RocksDB state store provider; the
  r13 provider A/B already measured RocksDB as a per-partition setup
  LOSS at gate scale (state fits in memory, the HDFS-backed default
  wins). So this probe measures the successor API carrying its
  mandatory store against the incumbent on the incumbent's best store.
- Timer semantics differ (registerTimer/handleExpiredTimer vs
  GroupStateTimeout). The drain lands ONE micro-batch and the entry's
  sentinel rows close every real session in-batch, so timers never
  fire in the measured span; handleInputRows parity is the whole
  drained-output contract here.

OUTCOME (r16, recorded): NEGATIVE — not on perf, on availability.
transformWithStateInPandas' state-server protocol imports
``google.protobuf`` in a dedicated driver-side Python worker
(pyspark/sql/streaming/proto/StateMessage_pb2.py); the probe run died
in pre-init with ``ImportError: cannot import name 'descriptor' from
'google.protobuf'`` because the protobuf package is not installed in
this environment (and there is no network to install it). The API is
therefore unusable here regardless of speed; the incumbent
applyInPandasWithState sessionizer stays. If a future environment
carries protobuf, re-run this probe — the equality gate and interleaved
timing below are ready, and note the API also FORCES the RocksDB state
store, which the r13 provider A/B measured as a per-partition setup
loss at gate scale.

Usage: python tools/tws_sessionize_probe.py [reps]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from etl_project_gcp_spark import queries as Q  # noqa: E402
from etl_project_gcp_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

GAP_US = 1800 * 1_000_000

OUT_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, "
    "n_events int, total_value double"
)


def _tws_sessionize(stream, gap_seconds: int = 1800):
    """stateful_sessionize re-expressed as a StatefulProcessor."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )
    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    gap_us = gap_seconds * 1_000_000
    state_schema = StructType(
        [
            StructField("start", LongType()),
            StructField("last", LongType()),
            StructField("n", IntegerType()),
            StructField("total", DoubleType()),
        ]
    )

    class Sessionize(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("sess", state_schema)

        def close(self) -> None:
            pass

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd

            from etl_project_gcp_spark.streaming.streams import _ts_to_us

            (uid,) = key
            pdf = pd.concat(list(rows)).sort_values("ts")
            got = self._state.get() if self._state.exists() else None
            if got is not None:
                s, last, n, total = got
            else:
                s = last = None
                n, total = 0, 0.0
            closed = []
            late = None

            def fold_late(s, n, total):
                nonlocal late
                if late is not None and s is not None and s - late[1] <= gap_us:
                    s, n, total = late[0], n + late[2], total + late[3]
                    late = None
                return s, n, total

            ts_us = _ts_to_us(pdf["ts"])
            for t, val in zip(ts_us, pdf["value"].to_numpy()):
                if s is None:
                    s = last = t
                    n, total = 1, float(val)
                elif t - last > gap_us:
                    s, n, total = fold_late(s, n, total)
                    closed.append((s, last, n, total))
                    s = last = t
                    n, total = 1, float(val)
                elif t < s - gap_us:
                    if late is None:
                        late = [t, t, 1, float(val)]
                    elif t - late[1] > gap_us:
                        closed.append(tuple(late))
                        late = [t, t, 1, float(val)]
                    else:
                        late[1] = t
                        late[2] += 1
                        late[3] += float(val)
                else:
                    s = min(s, t)
                    last = max(last, t)
                    n += 1
                    total += float(val)
            s, n, total = fold_late(s, n, total)
            if late is not None:
                closed.append(tuple(late))
            self._state.update((int(s), int(last), int(n), float(total)))
            if closed:
                yield pd.DataFrame(
                    {
                        "user_id": [uid] * len(closed),
                        "session_start": pd.to_datetime(
                            [int(c[0]) for c in closed], unit="us"
                        ),
                        "session_end": pd.to_datetime(
                            [int(c[1]) for c in closed], unit="us"
                        ),
                        "n_events": pd.array(
                            [int(c[2]) for c in closed], dtype="int32"
                        ),
                        "total_value": [float(c[3]) for c in closed],
                    }
                )

    return (
        stream.select("user_id", "ts", "value")
        .withWatermark("ts", "10 minutes")
        .groupBy("user_id")
        .transformWithStateInPandas(
            Sessionize(), OUT_SCHEMA, "append", "eventTime",
        )
    )


def _drain(spark, variant):
    """The streaming_sessionize_drain entry body with the plan_fn
    swapped per variant (incumbent vs transformWithState)."""
    from etl_project_gcp_spark.streaming.streams import stateful_sessionize

    sf_dir = SF_DIR
    ev = Q._events(spark, sf_dir)
    gmax = ev.agg(F.max("ts").alias("m")).first().m
    sentinels = (
        ev.select("user_id")
        .distinct()
        .select(
            F.lit(-1).cast("bigint").alias("event_id"),
            (F.lit(gmax).cast("timestamp") + F.expr("INTERVAL 2 HOURS")).alias("ts"),
            "user_id",
            F.lit("sentinel").alias("event_type"),
            F.lit(0.0).alias("value"),
            F.lit(None).cast("string").alias("props"),
        )
    )
    landed = ev.select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    ).unionByName(sentinels)
    if variant == "tws":
        plan = lambda s: _tws_sessionize(s, 1800)  # noqa: E731
        prev = spark.conf.get(
            "spark.sql.streaming.stateStore.providerClass", None
        )
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
        try:
            out = Q._drain_stream_once(
                spark, landed, plan, f"tws_probe_{variant}",
                stream_shuffle_partitions=8,
            )
            return out.select(
                "user_id", "session_start", "session_end",
                F.col("n_events").cast("bigint").alias("n_events"),
            )
        finally:
            if prev is None:
                spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
            else:
                spark.conf.set(
                    "spark.sql.streaming.stateStore.providerClass", prev
                )
    plan = lambda s: stateful_sessionize(s, gap_seconds=1800)  # noqa: E731
    out = Q._drain_stream_once(
        spark, landed, plan, f"tws_probe_{variant}",
        stream_shuffle_partitions=8,
    )
    return out.select(
        "user_id", "session_start", "session_end",
        F.col("n_events").cast("bigint").alias("n_events"),
    )


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    os.environ["ETL_GCP_SPARK_DISABLE_PINS"] = "1"
    spark = get_spark(app_name="tws_sessionize_probe")
    registry = Q.queries()
    registry["streaming_rollup_drain"](spark, SF_DIR).write.format(
        "noop"
    ).mode("overwrite").save()

    # equality gate
    cur = {tuple(r) for r in _drain(spark, "incumbent").collect()}
    new = {tuple(r) for r in _drain(spark, "tws").collect()}
    assert cur == new, (
        f"drained session sets differ: only-cur={len(cur - new)} "
        f"only-tws={len(new - cur)}; e.g. {list(cur - new)[:3]} vs "
        f"{list(new - cur)[:3]}"
    )
    print(f"equality gate OK ({len(cur)} sessions)")

    times: dict[str, list[float]] = {}
    for rep in range(reps):
        order = (
            ["incumbent", "tws"] if rep % 2 == 0 else ["tws", "incumbent"]
        )
        for variant in order:
            t0 = time.time()
            _drain(spark, variant).write.format("noop").mode(
                "overwrite"
            ).save()
            times.setdefault(variant, []).append(time.time() - t0)
    for v in ("incumbent", "tws"):
        print(
            f"{v}: median {statistics.median(times[v]):.3f}s "
            f"runs={[round(x, 3) for x in times[v]]}"
        )


if __name__ == "__main__":
    main()
