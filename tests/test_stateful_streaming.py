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
