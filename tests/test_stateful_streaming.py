"""Streaming sessionization (applyInPandasWithState): feed events
through a file stream and check emitted sessions against expectations.

Note: processAllAvailable can block while state timeouts are pending,
so the test polls the memory sink with a deadline instead."""
import time

from pyspark.sql import functions as F


def test_streaming_sessionize(spark, tmp_path):
    from newspaper_spark.streaming.stateful import streaming_sessionize

    in_dir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")

    base = spark.createDataFrame(
        [
            (1, "2024-01-01 10:00:00"),
            (1, "2024-01-01 10:10:00"),
            (1, "2024-01-01 12:00:00"),  # >30min gap → new session
            (2, "2024-01-01 09:00:00"),
        ],
        "user_id long, ts_str string",
    ).select("user_id", F.to_timestamp("ts_str").alias("ts"))
    base.coalesce(1).write.parquet(in_dir)

    stream = spark.readStream.schema("user_id long, ts timestamp").parquet(in_dir)
    sessions = streaming_sessionize(stream, gap_minutes=30)
    q = (
        sessions.writeStream.format("memory")
        .queryName("sessions_out")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .start()
    )
    rows = []
    try:
        deadline = time.time() + 180
        while time.time() < deadline:
            rows = spark.sql("select * from sessions_out").collect()
            if len(rows) >= 3:
                break
            time.sleep(2)
    finally:
        q.stop()

    closed = [r for r in rows if r.closed]
    open_ = [r for r in rows if not r.closed]
    assert any(r.user_id == 1 and r.n_events == 2 for r in closed)
    assert any(r.user_id == 1 and r.n_events == 1 for r in open_)
    assert any(r.user_id == 2 and r.n_events == 1 for r in open_)


def test_event_time_sessionize_drops_late_events(spark, tmp_path):
    """Event-time variant: an event older than the watermark must be
    DROPPED — it cannot reopen or extend a session — while the
    watermark-driven timeout still closes sessions deterministically."""
    from newspaper_spark.streaming.stateful import streaming_sessionize_event_time

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    ckpt = str(tmp_path / "ckpt")

    def write_batch(name, rows):
        spark.createDataFrame(rows, "user_id long, ts_str string").select(
            "user_id", F.to_timestamp("ts_str").alias("ts")
        ).coalesce(1).write.parquet(str(in_dir / name))

    # batch 1: user 1's session + a clock event pushing the watermark
    # to 13:00 - 10min = 12:50, far past user 1's last event + gap
    write_batch("b1", [
        (1, "2024-01-01 10:00:00"),
        (1, "2024-01-01 10:10:00"),
        (9, "2024-01-01 13:00:00"),
    ])

    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(in_dir) + "/*")
    )
    sessions = streaming_sessionize_event_time(
        stream, gap_minutes=30, watermark_minutes=10
    )
    q = (
        sessions.writeStream.format("memory")
        .queryName("sessions_et")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        deadline = time.time() + 120
        rows = []
        while time.time() < deadline:
            rows = spark.sql("select * from sessions_et").collect()
            if any(r.user_id == 1 and r.closed for r in rows):
                break
            time.sleep(2)
        assert any(
            r.user_id == 1 and r.closed and r.n_events == 2 for r in rows
        ), f"watermark timeout never closed user 1's session: {rows}"

        # batch 2: a LATE event for user 1 (10:05 < watermark 12:50) —
        # must be dropped, not reopen the closed session; plus a fresh
        # clock event so the batch definitely processes
        write_batch("b2", [
            (1, "2024-01-01 10:05:00"),
            (9, "2024-01-01 14:00:00"),
        ])
        time.sleep(1)
        deadline = time.time() + 120
        while time.time() < deadline:
            rows = spark.sql("select * from sessions_et").collect()
            # wait until the 14:00 clock event shows up for user 9
            if any(r.user_id == 9 and r.n_events == 2 for r in rows) or any(
                r.user_id == 9 and r.closed for r in rows
            ):
                break
            time.sleep(2)
        user1 = [r for r in spark.sql("select * from sessions_et").collect()
                 if r.user_id == 1]
        # no new session started at the late timestamp, no count bump
        assert not any(
            str(r.session_start).startswith("2024-01-01 10:05") for r in user1
        ), f"late event reopened a session: {user1}"
        assert not any(r.n_events > 2 for r in user1), user1
    finally:
        q.stop()


def test_event_time_sessionize_rejects_watermark_over_gap(spark):
    """watermark_minutes > gap_minutes would let a late in-watermark
    event silently merge two true sessions (the bound-stretch is only
    safe within one gap of the open session's start) — must raise."""
    import pytest

    from newspaper_spark.streaming.stateful import (
        streaming_sessionize_event_time,
    )

    events = (
        spark.readStream.format("rate").option("rowsPerSecond", 1).load()
        .selectExpr("value as user_id", "timestamp as ts")
    )
    with pytest.raises(ValueError, match="must be <="):
        streaming_sessionize_event_time(
            events, gap_minutes=10, watermark_minutes=30
        )
