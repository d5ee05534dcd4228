"""Event sessionization: gap-based sessions per user.

Classic large-scale pipeline operator (beyond the reference, prompt
scope): assign session ids where a gap > threshold starts a new
session. Pure window functions — one shuffle on user_id, no UDF:

    lag(ts) over (user order by ts)  →  new_session flag
    sum(flag) over (user order by ts) →  session ordinal

At 100 TB this is the standard pattern: the shuffle is keyed by
user_id (uniform), windows evaluate within partitions after a single
sort. The streaming analog would be applyInPandasWithState with a
processing-time timeout; batch form is canonical here.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _epoch(c):
    # TIMESTAMP_NTZ can't cast straight to long under ANSI; go through
    # timestamp (session tz = UTC, matching DuckDB's naive epoch())
    return c.cast("timestamp").cast("long")


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
    tiebreak_col: str | None = None,
) -> DataFrame:
    order = [ts_col] + ([tiebreak_col] if tiebreak_col else [])
    w = Window.partitionBy(user_col).orderBy(*order)
    # explicit ROWS frame: the default RANGE frame groups tied
    # timestamps, which breaks the running-sum session ordinal
    w_sum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev_ts = F.lag(ts_col).over(w)
    gap_s = _epoch(F.col(ts_col)) - _epoch(prev_ts)
    new_session = F.when(
        prev_ts.isNull() | (gap_s > gap_minutes * 60), 1
    ).otherwise(0)
    flagged = events.withColumn("_new", new_session)
    session_ord = F.sum("_new").over(w_sum)
    return flagged.withColumn("session_id", session_ord.cast("int")).drop("_new")


def session_stats(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
    tiebreak_col: str | None = None,
) -> DataFrame:
    s = sessionize(events, user_col, ts_col, gap_minutes, tiebreak_col)
    return s.groupBy(user_col, "session_id").agg(
        F.count("*").alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        (
            F.max(_epoch(F.col(ts_col))) - F.min(_epoch(F.col(ts_col)))
        ).alias("duration_s"),
    )
