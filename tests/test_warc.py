"""WARC source: assembly/parse round-trip + framing-fault hardening.

The parser walk is Content-Length-driven (never separator search), so
the delimiter-bomb test (a payload containing "\r\n\r\nWARC/1.0\r\n")
is the load-bearing one — a naive splitter shreds that file.
"""
import pandas as pd
import pytest
from pyspark.sql import functions as F

from newspaper_spark.sources.warc import (
    WARCINFO_FIELDS,
    _parse_warc_bytes,
    parse_warc_files,
    warc_response_record_col,
    warcinfo_record_col,
)


def _mk_response(uri: str, date: str, rid: str, body: str) -> bytes:
    b = body.encode("utf-8")
    head = (
        "HTTP/1.1 200 OK\r\n"
        "Content-Type: text/html; charset=utf-8\r\n"
        f"Content-Length: {len(b)}\r\n\r\n"
    ).encode()
    block = head + b
    return (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        + f"WARC-Record-ID: {rid}\r\nWARC-Date: {date}\r\n".encode()
        + f"WARC-Target-URI: {uri}\r\n".encode()
        + b"Content-Type: application/http;msgtype=response\r\n"
        + f"Content-Length: {len(block)}\r\n\r\n".encode()
        + block
        + b"\r\n\r\n"
    )


def test_parse_roundtrip_multibyte_and_delimiter_bomb():
    bodies = [
        "plain ascii body",
        "multibyte éü中文 body",   # octet ≠ char count
        "bomb \r\n\r\nWARC/1.0\r\nWARC-Type: response\r\n\r\n tail",
        "",
    ]
    data = b"".join(
        _mk_response(f"http://s.com/{i}", "2026-01-01T00:00:00Z", f"<urn:{i}>", t)
        for i, t in enumerate(bodies)
    )
    recs = list(_parse_warc_bytes(data))
    assert [r["error"] for r in recs] == [None] * 4
    assert [r["payload_text"] for r in recs] == bodies
    assert [r["target_uri"] for r in recs] == [
        f"http://s.com/{i}" for i in range(4)
    ]
    assert all(r["http_status"] == 200 for r in recs)
    assert all(
        r["http_content_type"] == "text/html; charset=utf-8" for r in recs
    )


def test_parse_header_folding_and_case_insensitivity():
    body = b"x"
    block = b"HTTP/1.1 404 Not Found\r\ncontent-type: text/plain\r\n\r\n" + body
    rec = (
        b"WARC/1.0\r\nwarc-type: response\r\n"
        b"WARC-Target-URI: http://a\r\n b/c\r\n"    # obs-fold
        b"CONTENT-TYPE: application/http;msgtype=response\r\n"
        + f"content-length: {len(block)}\r\n\r\n".encode()
        + block
        + b"\r\n\r\n"
    )
    (r,) = _parse_warc_bytes(rec)
    assert r["error"] is None
    assert r["warc_type"] == "response"
    assert r["target_uri"] == "http://a b/c"
    assert r["http_status"] == 404
    assert r["http_content_type"] == "text/plain"
    assert r["payload_text"] == "x"


@pytest.mark.parametrize(
    "mutate, msg",
    [
        (lambda d: d[:-2], "not terminated"),
        (lambda d: d[: len(d) - 30], "truncated block"),
        (lambda d: d.replace(b"WARC/1.0", b"WBRC/1.0", 1), "version line"),
        (
            lambda d: d.replace(b"Content-Length: ", b"Content-Length: x", 1),
            "malformed Content-Length",
        ),
    ],
)
def test_framing_faults_emit_one_error_row_and_stop(mutate, msg):
    good = _mk_response("http://s.com/0", "2026-01-01T00:00:00Z", "<u:0>", "ok")
    bad = mutate(
        _mk_response("http://s.com/1", "2026-01-01T00:00:00Z", "<u:1>", "body")
    )
    recs = list(_parse_warc_bytes(good + bad))
    assert recs[0]["error"] is None and recs[0]["payload_text"] == "ok"
    assert len(recs) == 2, "must stop after the framing fault"
    assert msg in recs[1]["error"]


def test_warcinfo_and_column_assembly_match_python_model(spark):
    rows = [(i, f"doc body {i} é") for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    rec = warc_response_record_col(
        F.concat(F.lit("http://site.com/"), F.col("doc_id").cast("string")),
        F.lit("2026-01-02T03:04:05Z"),
        F.concat(F.lit("<urn:uuid:"), F.md5(F.col("doc_id").cast("string")), F.lit(">")),
        F.col("text"),
    )
    files = (
        df.select((F.col("doc_id") % 2).alias("file_id"), F.col("doc_id"), rec.alias("r"))
        .groupBy("file_id")
        .agg(
            F.concat_ws(
                "",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("doc_id", "r"))),
                    lambda x: x["r"],
                ),
            ).alias("recs")
        )
        .select(
            "file_id",
            F.concat(
                warcinfo_record_col(
                    F.concat(
                        F.lit("<urn:uuid:"),
                        F.md5(F.concat(F.lit("info"), F.col("file_id").cast("string"))),
                        F.lit(">"),
                    ),
                    F.lit("2026-01-02T03:04:05Z"),
                ),
                F.col("recs"),
            ).alias("warc"),
        )
    )
    out = parse_warc_files(files).toPandas()
    assert out["error"].isna().all()
    assert len(out) == 6 + 2
    info = out[out.warc_type == "warcinfo"]
    assert len(info) == 2 and (info.rec_idx == 0).all()
    assert (info.payload_text == WARCINFO_FIELDS).all()
    resp = out[out.warc_type == "response"].sort_values(["file_id", "rec_idx"])
    assert list(resp.rec_idx) == [1, 2, 3, 1, 2, 3]
    # doc_ids 0,2,4 → file 0; 1,3,5 → file 1 (sorted within file)
    assert list(resp.payload_text) == [
        f"doc body {i} é" for i in (0, 2, 4, 1, 3, 5)
    ]
    assert (resp.http_status == 200).all()


def test_streaming_warc_parse_batch_equal(spark, tmp_path):
    """parse_warc_files is a stateless map-only stage, so it must run
    unchanged on an availableNow stream of WARC files (the archive-
    ingest side of a streaming crawl loop) and produce bit-for-bit
    the batch parse — including the error row for a truncated file."""
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    files = []
    for fid in range(6):
        recs = b"".join(
            _mk_response(
                f"http://s.com/{fid}/{i}",
                "2026-01-01T00:00:00Z",
                f"<urn:{fid}-{i}>",
                f"body {fid}-{i} é",
            )
            for i in range(3)
        )
        if fid == 5:
            recs = recs[:-20]  # truncated final record → error row
        files.append((fid, recs.decode("utf-8")))
    df = spark.createDataFrame(files, "file_id long, warc string")
    df.write.parquet(in_dir)

    stream = spark.readStream.schema("file_id long, warc string").parquet(in_dir)
    parsed = parse_warc_files(stream)
    assert parsed.isStreaming
    q = (
        parsed.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    key = ["file_id", "rec_idx"]
    streamed = {
        tuple(getattr(r, k) for k in key): (
            r.target_uri, r.payload_text, r.http_status, r.error
        )
        for r in spark.read.parquet(out_dir).collect()
    }
    batch = {
        tuple(getattr(r, k) for k in key): (
            r.target_uri, r.payload_text, r.http_status, r.error
        )
        for r in parse_warc_files(spark.read.parquet(in_dir)).collect()
    }
    assert streamed == batch
    assert len(streamed) == 5 * 3 + 2 + 1  # full files + 2 good + error
    assert streamed[(5, 2)][3] is not None and "truncated" in streamed[(5, 2)][3]


def test_offsets_support_cdx_style_range_reads():
    """offset/record_bytes must be exact enough that slicing the raw
    file at (offset, record_bytes) and parsing JUST that slice
    reproduces every record — the Common Crawl CDX range-GET contract
    — and offsets must chain (next = prev + prev_bytes)."""
    from newspaper_spark.sources.warc import read_record_at

    bodies = ["a", "multibyte é中", "bomb \r\n\r\nWARC/1.0\r\n x", ""]
    data = b"".join(
        _mk_response(f"http://s.com/{i}", "2026-01-01T00:00:00Z", f"<urn:{i}>", t)
        for i, t in enumerate(bodies)
    )
    recs = list(_parse_warc_bytes(data))
    assert [r["error"] for r in recs] == [None] * 4
    for prev, nxt in zip(recs, recs[1:]):
        assert nxt["offset"] == prev["offset"] + prev["record_bytes"]
    assert recs[-1]["offset"] + recs[-1]["record_bytes"] == len(data)
    for r in recs:
        one = read_record_at(data, r["offset"], r["record_bytes"])
        assert one["error"] is None
        assert one["payload_text"] == r["payload_text"]
        assert one["target_uri"] == r["target_uri"]
        assert one["record_bytes"] == r["record_bytes"]


def test_warc_parse_roundtrip_property():
    """Property: ANY sequence of records with arbitrary unicode bodies
    (including CRLF runs, WARC magic, NULs) assembles → parses back
    exactly, offsets chain, and a trailing-garbage mutation yields
    exactly one error row after the good records."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    body = st.text(
        alphabet=st.characters(
            codec="utf-8", exclude_categories=("Cs",)
        ),
        max_size=200,
    )

    @settings(max_examples=60, deadline=None)
    @given(st.lists(body, min_size=1, max_size=6), st.booleans())
    def check(bodies, truncate):
        data = b"".join(
            _mk_response(
                f"http://h.com/{i}", "2026-01-01T00:00:00Z", f"<urn:{i}>", t
            )
            for i, t in enumerate(bodies)
        )
        if truncate:
            data += b"WARC/1.0\r\nContent-Length: 5\r\n\r\nab"
        recs = list(_parse_warc_bytes(data))
        good = [r for r in recs if r["error"] is None]
        assert [r["payload_text"] for r in good] == bodies
        for prev, nxt in zip(recs, recs[1:]):
            if nxt["error"] is None:
                assert nxt["offset"] == prev["offset"] + prev["record_bytes"]
        if truncate:
            assert recs[-1]["error"] is not None
            assert len(recs) == len(bodies) + 1
        else:
            assert len(recs) == len(bodies)

    check()
