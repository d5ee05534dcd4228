"""Structured Streaming wrapper test: file source → extraction →
parquet sink with checkpoint."""
import time

from tests.conftest import SF0001


def test_streaming_extraction(spark, tmp_path):
    from newspaper_spark.sources.transcripts import synthetic_transcripts
    from newspaper_spark.streaming.stream import start_extraction_stream

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    t = synthetic_transcripts(spark, SF0001).limit(20)
    n = t.count()
    t.coalesce(2).write.parquet(in_dir)

    q = start_extraction_stream(spark, in_dir, out_dir, ckpt)
    try:
        deadline = time.time() + 120
        done = False
        while time.time() < deadline:
            q.processAllAvailable()
            try:
                if spark.read.parquet(out_dir).count() >= n:
                    done = True
                    break
            except Exception:
                pass
            time.sleep(1)
        assert done, "stream did not produce all rows in time"
    finally:
        q.stop()

    out = spark.read.parquet(out_dir)
    assert out.count() == n
    assert out.filter("status = 'ok'").count() == n
