"""Event-stream operators over the events table (SURVEY.md §2 D7/D8
family): gap-based sessionization — the classic web-analytics /
training-telemetry rollup every large-scale event pipeline needs.

Scale shape: ONE shuffle on the user key; the session boundary is a
lag-window flag + running sum inside each user partition (bounded
per-group state), and the closing per-session aggregate reuses the same
hash partitioning (HashPartitioning(user) satisfies the (user, session)
clustering requirement — no second Exchange; plan test pins it).
All gap arithmetic is INTEGER microseconds (`unix_micros`), so an
external engine computing `epoch_us` binds exactly — no float-epoch
tie hazards at the gap boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    gap_s: int = 3600,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-user gap sessionization: a new session starts at the first
    event and whenever the gap to the previous event exceeds ``gap_s``
    seconds. Returns one row per session:
    (user, session_idx [1-based per user], n_events, start_us, end_us).

    Event order within a user is (ts, event_id) — total, so equal
    timestamps cannot reorder across engines or partitionings. The
    driver parquet is TIMESTAMP_NTZ; the timestamp_ltz cast (UTC
    session) makes unix_micros well-defined (CLAUDE.md epoch rule)."""
    us = F.unix_micros(F.col(ts_col).cast("timestamp_ltz"))
    e = events.select(F.col(user_col), F.col(id_col), us.alias("_us"))
    w = Window.partitionBy(user_col).orderBy(
        F.col("_us").asc(), F.col(id_col).asc()
    )
    gap_us = int(gap_s) * 1_000_000
    prev = F.lag("_us").over(w)
    new_sess = F.when(
        prev.isNull() | ((F.col("_us") - prev) > F.lit(gap_us)), F.lit(1)
    ).otherwise(F.lit(0))
    sess = F.sum(new_sess).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        e.withColumn("session_idx", sess.cast("long"))
        .groupBy(user_col, "session_idx")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.min("_us").cast("long").alias("start_us"),
            F.max("_us").cast("long").alias("end_us"),
        )
    )


def event_funnel(
    events: DataFrame,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered k-step funnel: for every user who performed ``steps[0]``,
    the earliest chain of step timestamps where each step happens
    STRICTLY after (microsecond ``>``) the previous step's chosen time
    — the classic product-analytics conversion query. Returns
    (user, t1_us … tk_us [nullable], stage_reached).

    The chosen chain is the greedy earliest one (min t1, then min t2
    among events after t1, …) — greedy-earliest maximizes the reachable
    stage, so stage_reached is exact, not an artifact of the pick.

    Scale shape: k-1 cascaded SLIM min-aggregates — step i's events
    join the (user, t_{i-1}) frame on the user key, filter ts strictly
    after, and take a map-side-combined min; every shuffled row is two
    longs, the raw event stream is scanned once per step WITH the step
    predicate pushed to the scan, and there is no per-user sort,
    collect_list, or lambda state. All comparisons in integer
    microseconds (no float-epoch ties)."""
    us = F.unix_micros(F.col(ts_col).cast("timestamp_ltz"))
    e = events.select(
        F.col(user_col), F.col(type_col).alias("_type"), us.alias("_us")
    )
    cur = (
        e.filter(F.col("_type") == steps[0])
        .groupBy(user_col)
        .agg(F.min("_us").cast("long").alias("t1_us"))
    )
    for i, step in enumerate(steps[1:], start=2):
        ti = (
            e.filter(F.col("_type") == step)
            .join(cur.select(user_col, f"t{i - 1}_us"), user_col)
            .filter(F.col("_us") > F.col(f"t{i - 1}_us"))
            .groupBy(user_col)
            .agg(F.min("_us").cast("long").alias(f"t{i}_us"))
        )
        cur = cur.join(ti, user_col, "left_outer")
    reached = F.lit(1)
    for i in range(2, len(steps) + 1):
        reached = reached + F.col(f"t{i}_us").isNotNull().cast("int")
    return cur.withColumn("stage_reached", reached.cast("long"))
