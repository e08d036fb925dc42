"""Event-time operators (SURVEY §2.10 ST1/ST2 [EXT], §2.12 X5).

The reference is batch-only (etl_medallion.py — HTTP-triggered); these
operators give the engine the event-stream vocabulary a large-scale
pipeline needs, expressed so the SAME column expressions work in batch
and under Structured Streaming (streaming variants in
etl_project_gcp_spark/streaming/).

Scale notes:
- tumbling windows: a plain groupBy on (bucket, keys) — partial agg
  map-side, no per-event shuffle amplification.
- sessionization: one shuffle on user_id for the lag window + one
  partial-agg'd groupBy; state never materializes on the driver. Under
  streaming the same semantics come from F.session_window.
- JSON extraction: get_json_object is JVM-side codegen (no Python);
  for hot paths at 100 TB prefer from_json with a pinned schema once —
  repeated get_json_object calls re-parse per call.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T


def tumbling_window_agg(
    events: DataFrame,
    ts_col: str = "ts",
    width: str = "hour",
    keys: tuple[str, ...] = ("event_type",),
    *aggs: F.Column,
) -> DataFrame:
    """Tumbling-window aggregate (ST1) as a batch groupBy.

    Emits the window start as a flat ``window_start`` timestamp column
    (date_trunc) rather than Spark's struct-typed ``F.window`` so results
    are plain-SQL comparable; under streaming the struct variant in
    streaming/ is used instead.
    """
    bucket = F.date_trunc(width, F.col(ts_col)).alias("window_start")
    return events.groupBy(bucket, *keys).agg(*aggs)


def sliding_window_agg(
    events: DataFrame,
    ts_col: str = "ts",
    width: str = "1 hour",
    slide: str = "15 minutes",
    keys: tuple[str, ...] = ("event_type",),
    *aggs: F.Column,
) -> DataFrame:
    """Sliding-window aggregate: each event lands in width/slide
    overlapping windows (F.window with a slide duration — Spark expands
    the event into its windows before the groupBy, so the shuffle
    carries width/slide× the rows; keep the ratio small at scale).
    Emits the struct window's ``start`` flat for SQL comparability.
    """
    win = F.window(F.col(ts_col), width, slide)
    return (
        events.groupBy(win.alias("w"), *keys)
        .agg(*aggs)
        .withColumn("window_start", F.col("w.start"))
        .drop("w")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: tuple[str, ...],
    ts_col: str,
    right_value_cols: tuple[str, ...],
) -> DataFrame:
    """As-of join (left): for each left row, attach the right row with
    the greatest ``ts_col`` ≤ the left row's (inclusive), per key.

    Spark has no ASOF JOIN operator; the naive formulation (range join +
    per-left-row max) explodes to O(|L|·|R|) per key. This is the
    scalable union trick: interleave both sides sorted by (key, ts) and
    carry the latest right payload forward with last(ignorenulls) — ONE
    shuffle on the key, linear in |L|+|R|, no row amplification. Ties at
    equal ts resolve right-before-left, giving the inclusive (>=)
    semantics of DuckDB/kdb ASOF.

    Determinism: duplicate right rows at the same (key, ts) are broken
    by the right-value struct itself (max payload wins — the window
    orders by it, so the carried row never depends on partition or
    input order; every sibling operator carries an explicit tiebreak
    and this one is no exception). Requires orderable value columns —
    true of every call site; wrap unorderable payloads before joining.

    ``right_value_cols`` must not collide with left column names.
    """
    rv = F.struct(*[F.col(c) for c in right_value_cols]).alias("_rv")
    r = right.select(*key_cols, ts_col, rv, F.lit(0).alias("_side"))
    l = left.withColumn("_rv", F.lit(None).cast(r.schema["_rv"].dataType)).withColumn(
        "_side", F.lit(1)
    )
    unioned = l.unionByName(r, allowMissingColumns=True)
    w = (
        W.partitionBy(*key_cols)
        # "_rv" last: among duplicate right (key, ts) rows the MAX value
        # struct sorts last and last() carries it — deterministic under
        # any partitioning (left rows order with NULL _rv, which cannot
        # affect the ignorenulls fill)
        .orderBy(ts_col, "_side", "_rv")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    filled = unioned.withColumn("_rv", F.last("_rv", ignorenulls=True).over(w))
    out = filled.filter(F.col("_side") == 1).drop("_side")
    for c in right_value_cols:
        out = out.withColumn(c, F.col(f"_rv.{c}"))
    return out.drop("_rv")


def range_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: tuple[str, ...],
    ts_col: str,
    lookback_seconds: int,
    right_value_cols: tuple[str, ...],
) -> DataFrame:
    """Interval range join: pairs (l, r) with same keys and ``r.ts`` in
    ``(l.ts - lookback, l.ts]``.

    The naive theta-join is a BroadcastNestedLoopJoin (O(|L|·|R|) per
    key). This buckets time into lookback-sized cells: a left row's
    matches can only sit in its own or the previous cell, so it explodes
    into exactly 2 bucket candidates and the join becomes an EQUALITY
    join on (keys, bucket) + an exact range filter — hash-joinable,
    2|L|+|R| rows through the shuffle, skew bounded by cell population.
    """
    us = lookback_seconds * 1_000_000
    r_bucket = F.floor(F.unix_micros(F.col(ts_col)) / us).cast("long")
    r = right.select(
        *key_cols,
        F.col(ts_col).alias("_rts"),
        r_bucket.alias("_b"),
        *[F.col(c) for c in right_value_cols],
    )
    l_bucket = F.floor(F.unix_micros(F.col(ts_col)) / us).cast("long")
    l = left.withColumn(
        "_b", F.explode(F.array(l_bucket - 1, l_bucket))
    )
    joined = l.join(r, [*key_cols, "_b"]).filter(
        (F.col("_rts") <= F.col(ts_col))
        & (F.col("_rts") > F.col(ts_col) - F.expr(f"INTERVAL {lookback_seconds} SECOND"))
    )
    return joined.drop("_b", "_rts")


def sessionize(
    events: DataFrame,
    gap: str = "30 minutes",
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """Gap-based sessionization (ST2): assign a per-user session_id.

    Classic lag + cumulative-sum formulation: a row starts a new session
    iff it is the user's first event or follows the previous event by
    more than ``gap``. Exact on microseconds (interval comparison, no
    epoch truncation). Returns the input plus ``session_id`` (1-based
    per user).
    """
    w_order = W.partitionBy(user_col).orderBy(ts_col, order_tiebreak)
    prev_ts = F.lag(ts_col).over(w_order)
    is_new = F.when(
        prev_ts.isNull() | (F.col(ts_col) > prev_ts + F.expr(f"INTERVAL {gap}")),
        F.lit(1),
    ).otherwise(F.lit(0))
    return events.withColumn("_is_new", is_new).withColumn(
        "session_id",
        F.sum("_is_new").over(
            w_order.rowsBetween(W.unboundedPreceding, W.currentRow)
        ),
    ).drop("_is_new")


def session_summary(
    events: DataFrame,
    gap: str = "30 minutes",
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-session rollup: event count + span bounds."""
    sess = sessionize(events, gap, user_col, ts_col)
    return sess.groupBy(user_col, "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
    )


def extract_json_prop(
    events: DataFrame,
    prop_path: str = "$.k",
    props_col: str = "props",
    out_col: str = "k",
    out_type: str = "int",
) -> DataFrame:
    """JSON property extraction (X5 — events.props is a JSON string)."""
    return events.withColumn(
        out_col, F.get_json_object(F.col(props_col), prop_path).cast(out_type)
    )


def parse_props(events: DataFrame, schema: str = "k INT", props_col: str = "props") -> DataFrame:
    """Pinned-schema JSON parse (from_json) — the 100 TB-preferred form:
    one parse per row regardless of how many fields are consumed."""
    return events.withColumn("_props", F.from_json(F.col(props_col), schema))


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    granularity: str = "week",
) -> DataFrame:
    """Cohort retention matrix: users grouped by the period of their
    FIRST event (cohort), counted in every later period they were
    active — ``(cohort_week, week_offset, n_users)``, the standard
    product-analytics retention triangle.

    ``count(*)`` on the final aggregate IS the distinct-user count: the
    activity relation is pre-deduped to one row per (user, period), and
    the offset is a function of the period, so no user can contribute
    twice to a cell — a countDistinct (exact distinct aggregate, extra
    expand) would be redundant work. Shuffles: the (user, period)
    dedup, the per-user min, a user-keyed join, one final rollup — all
    key-partitioned, nothing driver-bound.

    The period offset is computed PER granularity (day/week/month) —
    ``datediff`` for day, ``datediff/7`` for week, ``months_between``
    for month (calendar months are not a fixed day count). Output
    columns are ``cohort_{granularity}`` / ``{granularity}_offset``.
    """
    if granularity not in ("day", "week", "month"):
        raise ValueError(
            f"granularity={granularity!r} not in ('day', 'week', "
            f"'month') — offsets are only defined for these periods"
        )
    cohort_col = f"cohort_{granularity}"
    offset_col = f"{granularity}_offset"
    # kept as TIMESTAMP (midnight of the period start) — the engine's
    # window_start convention, and plain-SQL comparable
    wk = F.date_trunc(granularity, F.col(ts_col))
    first = events.groupBy(user_col).agg(F.min(wk).alias(cohort_col))
    act = events.select(
        F.col(user_col), wk.alias("_activity_period")
    ).distinct()
    if granularity == "day":
        offset = F.datediff("_activity_period", F.col(cohort_col))
    elif granularity == "week":
        offset = F.datediff("_activity_period", F.col(cohort_col)) / 7
    else:  # month — both sides are truncated month starts, so
        # months_between is an exact integer
        offset = F.months_between("_activity_period", F.col(cohort_col))
    return (
        act.join(first, user_col)
        .groupBy(cohort_col, offset.cast("int").alias(offset_col))
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def rolling_active_users(
    events: DataFrame,
    window_days: int = 7,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Exact rolling N-day active users per day (the WAU-by-day metric):
    for each day with ≥1 event, how many distinct users were active in
    the trailing ``window_days`` window ending that day.

    Sliding COUNT(DISTINCT) does not decompose over a window, so the
    scalable formulation inverts it: dedup activity to (user, day),
    explode each activity day into the ``window_days`` report days it
    contributes to, dedup (user, report_day), then a plain count — three
    key-partitioned shuffles, linear ×N row expansion, no per-day
    re-scan and no unbounded window state. Report days with no event
    anywhere in the corpus are not emitted (join to the active-day set
    keeps the output bounded by observed days).
    """
    day = F.date_trunc("day", F.col(ts_col))
    user_days = events.select(
        F.col(user_col), day.alias("_day")
    ).distinct()
    contribute = user_days.select(
        user_col,
        F.explode(
            F.sequence(
                F.col("_day"),
                F.col("_day") + F.expr(f"INTERVAL {window_days - 1} DAYS"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("report_day"),
    ).distinct()
    active_days = user_days.select(
        F.col("_day").alias("report_day")
    ).distinct()
    return (
        contribute.join(active_days, "report_day")
        .groupBy("report_day")
        .agg(F.count(F.lit(1)).alias("n_active_users"))
    )


def forward_fill(
    events: DataFrame,
    fill_cols: dict[str, F.Column],
    keys: tuple[str, ...] = ("user_id",),
    order_cols: tuple[str, ...] = ("ts", "event_id"),
) -> DataFrame:
    """Last-observation-carried-forward per key: for each entry in
    ``fill_cols`` (name → an observation Column that is NULL on rows
    where the signal is absent), append a column holding the latest
    non-null observation at or before the row — the time-series
    gap-fill / state-propagation primitive (e.g. "last purchase amount
    as of each event").

    ``order_cols`` must be a total order within a key (include a
    unique id as the tiebreak) or the fill is nondeterministic under
    ties. One running window per key — shuffles once by ``keys``; at
    100 TB keys are user-grained (high cardinality), so the shuffle is
    balanced and each partition's running state is a single value per
    fill column, never a buffered frame (Spark evaluates
    last(ignorenulls) incrementally over the running frame).
    """
    w = (
        W.partitionBy(*keys)
        .orderBy(*order_cols)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    out = events
    for name, obs in fill_cols.items():
        out = out.withColumn(name, F.last(obs, ignorenulls=True).over(w))
    return out


__all__ = [
    "tumbling_window_agg",
    "sliding_window_agg",
    "asof_join",
    "range_join",
    "sessionize",
    "session_summary",
    "extract_json_prop",
    "parse_props",
    "forward_fill",
    "cohort_retention",
    "rolling_active_users",
]
