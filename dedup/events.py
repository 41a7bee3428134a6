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
