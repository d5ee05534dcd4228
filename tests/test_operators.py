"""Operator tests with known-answer synthetic inputs: dedup families,
similarity search, text stats, multimodal plumbing, relational ops."""
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "the quick brown fox jumps over the lazy dog again and again"),  # exact dup of 1
        (3, "the quick brown fox jumps over the lazy cat again and again"),  # near dup
        (4, "completely different content about database engines and joins"),
        (5, "THE QUICK  brown fox jumps over the lazy dog again and again"),  # case/ws dup of 1
    ]
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_dedup_exact(spark, docs):
    from newspaper_spark.operators.dedup import dedup_exact

    reps = dedup_exact(docs).collect()
    kept = {r.doc_id for r in reps}
    assert kept == {1, 3, 4}  # 2 and 5 fold into 1


def test_minhash_finds_near_dups(spark, docs):
    from newspaper_spark.operators.dedup import minhash_lsh_pairs

    pairs = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_pairs(docs, num_hashes=8, bands=4).collect()
    }
    assert (1, 2) in pairs
    assert (1, 5) in pairs
    assert (1, 3) in pairs or (2, 3) in pairs  # near-dup caught by some band
    assert not any(4 in p for p in pairs)


def test_lsh_group_size_cap_on_exact_dup_cluster(spark, caplog):
    """1k byte-identical docs would emit ~500k pairs per band without
    the cap; with max_group_size the mega-group is skipped (logged, not
    silent) while normal-sized collision groups still pair."""
    import logging

    from newspaper_spark.operators.dedup import (
        minhash_lsh_pairs,
        simhash_near_dups,
    )

    boiler = "identical boilerplate page repeated across the whole crawl"
    rows = [(i, boiler) for i in range(1_000)] + [
        (2_001, "the quick brown fox jumps over the lazy dog again and again"),
        (2_002, "the quick brown fox jumps over the lazy dog again and again"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")

    with caplog.at_level(logging.WARNING, "newspaper_spark.operators.dedup"):
        mh = {
            (r.id_a, r.id_b)
            for r in minhash_lsh_pairs(
                df, num_hashes=8, bands=4, max_group_size=100
            ).collect()
        }
    assert mh == {(2_001, 2_002)}  # mega-cluster skipped, small pair kept
    assert any("minhash_lsh_pairs: skipping" in r.message for r in caplog.records)

    caplog.clear()
    with caplog.at_level(logging.WARNING, "newspaper_spark.operators.dedup"):
        sh = {
            (r.id_a, r.id_b)
            for r in simhash_near_dups(
                df, max_hamming=3, max_group_size=100
            ).collect()
        }
    assert sh == {(2_001, 2_002)}
    assert any("simhash_near_dups: skipping" in r.message for r in caplog.records)

    # cap high enough to bind nothing → exhaustive behavior, no warning
    caplog.clear()
    small = spark.createDataFrame(rows[-4:], "doc_id int, text string")
    with caplog.at_level(logging.WARNING, "newspaper_spark.operators.dedup"):
        uncapped = minhash_lsh_pairs(
            small, num_hashes=8, bands=4, max_group_size=10_000
        ).collect()
    assert (2_001, 2_002) in {(r.id_a, r.id_b) for r in uncapped}
    assert not caplog.records


def test_ngram_jaccard_verification(spark, docs):
    from newspaper_spark.operators.dedup import minhash_lsh_pairs, ngram_jaccard_pairs

    cand = minhash_lsh_pairs(docs, num_hashes=8, bands=4)
    verified = ngram_jaccard_pairs(docs, cand, threshold=0.99).collect()
    exact = {(r.id_a, r.id_b) for r in verified}
    assert (1, 2) in exact and (1, 5) in exact
    assert (1, 3) not in exact  # near-dup is below 0.99


def test_simhash_hamming(spark, docs):
    from newspaper_spark.operators.dedup import simhash_near_dups

    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in simhash_near_dups(docs, max_hamming=10).collect()
    }
    assert pairs.get((1, 2)) == 0
    assert pairs.get((1, 5)) == 0
    near = pairs.get((1, 3))
    assert near is not None and near <= 10


def test_simhash_blocking_recall_at_radius(spark):
    """Pigeonhole blocking must guarantee recall at the CONFIGURED
    radius: this pair sits at hamming distance 5 — guaranteed found
    with max_hamming=8 (9 chunks), missable under 4-chunk blocking."""
    from newspaper_spark.operators.dedup import simhash_near_dups

    rows = [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "the quick brown fox jumps over the stone cat again and again"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in simhash_near_dups(df, max_hamming=8).collect()
    }
    assert pairs.get((1, 2)) == 5


def test_brute_force_topk(spark):
    from newspaper_spark.operators.similarity import brute_force_topk

    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.9, 0.1, 0.0]),
        (3, [0.0, 1.0, 0.0]),
        (4, [-1.0, 0.0, 0.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    q = emb.filter("vec_id = 1")
    out = brute_force_topk(q, emb, k=2).collect()
    ranked = [r.neighbor_id for r in sorted(out, key=lambda r: r.rank)]
    assert ranked == [2, 3]


def test_lsh_recall_against_brute(spark):
    from newspaper_spark.operators.similarity import brute_force_topk, lsh_topk

    import math

    rows = []
    for i in range(60):
        angle = (i % 12) / 12 * 2 * math.pi
        rows.append((i, [math.cos(angle), math.sin(angle), (i % 5) * 0.01]))
    emb = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    q = emb.filter("vec_id < 5")
    brute = {
        (r.query_id, r.neighbor_id)
        for r in brute_force_topk(q, emb, k=3).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in lsh_topk(q, emb, k=3, dim=3, n_planes=4, bands=4).collect()
    }
    recall = len(brute & approx) / len(brute)
    assert recall >= 0.5, f"LSH recall too low: {recall}"


def test_embedding_dedup(spark):
    from newspaper_spark.operators.similarity import embedding_dedup_pairs

    rows = [
        (1, [1.0, 0.0]),
        (2, [0.999, 0.001]),
        (3, [0.0, 1.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    pairs = {
        (r.id_a, r.id_b) for r in embedding_dedup_pairs(emb, 0.99, dim=2).collect()
    }
    assert (1, 2) in pairs
    assert (1, 3) not in pairs


def test_lang_id(spark):
    from newspaper_spark.operators.textstats import lang_id_col

    rows = [
        (1, "the cat and the dog is in the house of the king"),
        (2, "el gato y la casa que los perros para una persona"),
        (3, "der hund und die katze ist nicht ein problem mit"),
        (4, "xyzzy plugh"),
        (5, "这是一个中文网页我们的文章不是在这里的吗"),          # no spaces
        (6, "これは日本語のページです。記事はここにあります。"),  # no spaces
        (7, "и в лесу не было на что смотреть как обычно"),
        (8, "il gatto non è che una parte del problema per ora sono qui"),
    ]
    df = spark.createDataFrame(rows, "id int, text string")
    out = {r.id: r.lang for r in df.select("id", lang_id_col(F.col("text")).alias("lang")).collect()}
    assert out[1] == "en"
    assert out[2] == "es"
    assert out[3] == "de"
    assert out[4] == "und"
    assert out[5] == "zh"
    assert out[6] == "ja"
    assert out[7] == "ru"
    assert out[8] == "it"


def test_bpe_ish_token_count(spark):
    from newspaper_spark.operators.textstats import bpe_ish_token_count_col

    rows = [
        (1, "cat dog"),            # 1 + 1
        (2, "extraordinary!"),     # ceil(13/4)=4 + 1 symbol
        (3, ""),                   # 0
        (4, "a b,c"),              # 1 + 1 + 1 + 1
    ]
    df = spark.createDataFrame(rows, "id int, text string")
    out = {r.id: r.n for r in df.select("id", bpe_ish_token_count_col(F.col("text")).alias("n")).collect()}
    assert out[1] == 2
    assert out[2] == 5
    assert out[3] == 0
    assert out[4] == 4


def test_quality_and_tokens(spark):
    from newspaper_spark.operators.textstats import text_stats

    df = spark.createDataFrame(
        [(1, "The quick brown fox jumps over the lazy dog. " * 10)],
        "id int, text string",
    )
    row = text_stats(df).first()
    assert row.n_tokens == 90
    assert 0.5 <= row.quality <= 1.0
    assert len(row.fingerprint) == 32


def test_multimodal_plumbing(spark):
    from newspaper_spark.operators.multimodal import attach_media, extract_media_features

    df = spark.createDataFrame([(1, "hello media")], "id int, text string")
    media = attach_media(df)
    feats = extract_media_features(media).collect()
    assert len(feats) == 1
    r = feats[0]
    assert r.error is None
    assert r.width is not None and r.n_frames == 1
    assert len(r.feature) == 8


def test_multimodal_real_decoder_unsupported_format(spark):
    """With the real-decoder flag, payloads that aren't a container the
    stdlib decoders handle must surface ValueError in the error column
    (the PIL/opencv plug-in slot), not crash the job."""
    from newspaper_spark.operators.multimodal import attach_media, extract_media_features

    df = spark.createDataFrame([(1, "hello media")], "id int, text string")
    feats = extract_media_features(attach_media(df), real_decode=True).collect()
    assert feats[0].error is not None and "ValueError" in feats[0].error


def test_valid_url_udf(spark):
    from newspaper_spark.operators.urlops import valid_url_udf

    rows = [
        (1, "http://www.cnn.com/2013/11/27/travel/weather-thanksgiving/index.html"),
        (2, "http://www.cnn.com/about"),
    ]
    df = spark.createDataFrame(rows, "id int, url string")
    out = {r.id: r.v for r in df.select("id", valid_url_udf(F.col("url")).alias("v")).collect()}
    assert out[1] is True
    assert out[2] is False


def test_decode_html_bytes(spark):
    from newspaper_spark.operators.decode import decode_html

    rows = [
        (1, "héllo utf8".encode("utf-8")),
        (2, '<meta charset="iso-8859-1"><p>caf\xe9</p>'.encode("latin-1")),
        (3, "bom text".encode("utf-8-sig")),
        (4, b"\x93smart quotes\x94 cp1252 \xe9"),
    ]
    df = spark.createDataFrame(rows, "id int, payload binary")
    out = {r.id: r.text for r in decode_html(df, "payload").collect()}
    assert out[1] == "héllo utf8"
    assert "café" in out[2]
    assert out[3] == "bom text"
    assert "smart quotes" in out[4] and "é" in out[4]


def test_charset_detection_undeclared():
    """Statistical fallback: undeclared legacy CJK encodings decode to
    the right script instead of cp1252 mojibake."""
    from newspaper_spark.operators.decode import decode_html_bytes

    cases = [
        ("shift_jis", "<p>日本語のページです。漢字とひらがなとカタカナ。</p>"),
        ("euc_kr", "<p>한국어 페이지입니다. 이것은 한국어 문서다.</p>"),
        ("gbk", "<p>这是一个中文网页，我们的文章在这里。</p>"),
        ("big5", "<p>這是一個中文網頁，我們的文章在這裡。</p>"),
        ("cp1252", "<p>Voilà — “l’été” canción möglich €99.</p>"),
    ]
    for enc, text in cases:
        assert decode_html_bytes(text.encode(enc)) == text, enc


def test_image_candidate_scoring(spark):
    """calculate_area semantics (reference images.py:198-220): tiny,
    narrow and over-elongated candidates score 0; logo penalized 10x;
    argmax per doc."""
    from newspaper_spark.operators.images import top_image_by_area

    rows = [
        (1, "http://x/a.jpg", 100, 100),       # area 10000
        (1, "http://x/b.jpg", 160, 100),       # area 16000, ratio 1.6 → winner
        (1, "http://x/logo.jpg", 300, 300),    # 90000/10 = 9000
        (1, "http://x/tiny.jpg", 60, 60),      # area < 5000 → 0
        (1, "http://x/narrow.jpg", 80, 400),   # width < 90 → 0
        (1, "http://x/banner.jpg", 900, 100),  # ratio 9 > 16/9 → 0
        (2, "http://x/only-logo.jpg", 100, 100),
    ]
    df = spark.createDataFrame(rows, "doc_id int, img_url string, width int, height int")
    out = {r.id: (r.img_url, r.score) for r in top_image_by_area(df).collect()}
    assert out[1] == ("http://x/b.jpg", 16000.0)
    assert out[2] == ("http://x/only-logo.jpg", 1000.0)


def test_histogram_entropy_matches_relational(spark):
    """The relational text_entropy equals the reference's histogram
    formula (images.py:49-55) computed in Python."""
    from collections import Counter

    from newspaper_spark.operators.images import histogram_entropy, text_entropy

    texts = ["aabb", "hello world", "你好你好吗"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    got = {r.id: r.entropy for r in text_entropy(df).collect()}
    for i, t in enumerate(texts):
        expect = round(histogram_entropy(list(Counter(t).values())), 6)
        assert abs(got[i] - expect) < 1e-6, (t, got[i], expect)


def test_meta_refresh_target_column():
    from newspaper_spark.kernel.article import extract_article

    html = (
        '<html><head><title>T - S</title>'
        '<meta http-equiv="refresh" content="0;url=http://next.example/p">'
        "</head><body><p>hello world text</p></body></html>"
    )
    rec = extract_article(html)
    assert rec["meta_refresh_target"] == "http://next.example/p"
    assert extract_article("<html><body><p>x</p></body></html>")["meta_refresh_target"] is None


def test_simhash_pigeonhole_recall_property(spark):
    """Guaranteed-recall property: EVERY pair within the configured
    hamming radius must appear in simhash_near_dups — cross-checked
    against a brute-force all-pairs computation of the same simhash
    values (deterministic random corpus of mutated documents)."""
    import random

    from newspaper_spark.operators.dedup import simhash_near_dups, simhash_table

    rng = random.Random(42)
    vocab = [f"w{i}" for i in range(50)]
    base = [rng.choice(vocab) for _ in range(40)]
    docs = []
    for i in range(30):
        toks = list(base)
        for _ in range(rng.randrange(0, 4)):  # 0-3 token mutations
            toks[rng.randrange(len(toks))] = rng.choice(vocab)
        docs.append((i, " ".join(toks)))
    df = spark.createDataFrame(docs, "doc_id int, text string")

    MAX_H = 8
    sims = {r.id: r.sim for r in simhash_table(df).collect()}
    expected = set()
    for a in sims:
        for b in sims:
            if a < b:
                ham = bin((sims[a] ^ sims[b]) & (2**64 - 1)).count("1")
                if ham <= MAX_H:
                    expected.add((a, b))
    got = {
        (r.id_a, r.id_b) for r in simhash_near_dups(df, max_hamming=MAX_H).collect()
    }
    assert got == expected, (expected - got, got - expected)
    assert len(expected) > 0, "property test vacuous: no close pairs generated"


def test_table_ref_dispatch(spark, tmp_path):
    """tables.read_table: parquet path works; iceberg: refs dispatch to
    the Iceberg DataSource (absent in this sandbox — the error must
    name the missing source, proving the dispatch)."""
    from newspaper_spark.sources.tables import read_table, write_table

    df = spark.createDataFrame([(1, "x")], "id int, v string")
    p = str(tmp_path / "t")
    write_table(df, p, mode="overwrite")
    assert read_table(spark, p).count() == 1

    import pytest as _pytest

    with _pytest.raises(Exception) as ei:
        read_table(spark, "iceberg:cat.db.t").count()
    assert "iceberg" in str(ei.value).lower()


def test_reassembly_segmented_equals_single_level(spark):
    from newspaper_spark.operators.reassemble import (
        reassemble_conversations,
        reassemble_conversations_segmented,
    )

    rows = [
        (f"c{c}", t, f"text-{c}-{t}") for c in range(3) for t in range(7)
    ] + [("solo", 0, "only")]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
    single = {r.conv_id: (r.n_turns, r.conversation_text)
              for r in reassemble_conversations(df).collect()}
    for seg in (1, 2, 3, 100):
        segd = {r.conv_id: (r.n_turns, r.conversation_text)
                for r in reassemble_conversations_segmented(df, segment=seg).collect()}
        assert segd == single, f"segment={seg}"


def test_winnowing_shared_substring_guarantee(spark):
    """Winnowing invariant: documents sharing a substring of length
    >= k + window - 1 share at least one fingerprint; disjoint content
    shares none (w.h.p.)."""
    from newspaper_spark.operators.textstats import winnowing_fingerprints

    shared = "the identical plagiarized passage appears here verbatim"
    rows = [
        (1, "intro text one. " + shared + " tail one."),
        (2, "completely different opening. " + shared + " other ending."),
        (3, "nothing in common with the others at all, truly disjoint words"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    fps = {}
    for r in winnowing_fingerprints(df, k=8, window=16).collect():
        fps.setdefault(r.id, set()).add(r.fingerprint)
    assert fps[1] & fps[2], "shared passage must yield a shared fingerprint"
    assert not (fps[1] & fps[3])
    assert not (fps[2] & fps[3])


def test_media_resize_and_frame_sampling(spark):
    from newspaper_spark.operators.multimodal import (
        attach_media,
        attach_video,
        resize_media,
        sample_frame_indices,
    )

    df = spark.createDataFrame([(1, "hello media resize")], "id int, text string")
    r = resize_media(attach_media(df), target=128).first()
    assert r.error is None
    assert max(r.resized_w, r.resized_h) <= 128 or (
        r.width <= 128 and r.height <= 128
    )
    # aspect preserved within integer truncation
    if r.width > 128 or r.height > 128:
        assert r.resized_w == 128 or r.resized_h == 128

    v = attach_video(df)
    out = v.select(
        "n_frames",
        sample_frame_indices(v.n_frames, every_n=4, max_frames=8).alias("idx"),
    ).first()
    assert out.idx[0] == 0
    assert len(out.idx) <= 8
    assert all(b - a == 4 for a, b in zip(out.idx, out.idx[1:]))

    # honesty: real decode of a non-image payload surfaces the error,
    # job survives
    err = resize_media(attach_media(df), real_decode=True).first()
    assert err.error and "ValueError" in err.error


def test_ivf_recall_against_brute(spark):
    import math

    from newspaper_spark.operators.similarity import brute_force_topk, ivf_topk

    rows = []
    for i in range(80):
        angle = (i % 16) / 16 * 2 * math.pi
        rows.append((i, [math.cos(angle), math.sin(angle), (i % 7) * 0.01, 0.1]))
    emb = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    q = emb.filter("vec_id < 6")
    brute = {
        (r.query_id, r.neighbor_id) for r in brute_force_topk(q, emb, k=3).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in ivf_topk(q, emb, k=3, dim=4, n_cells=8, n_probe=3).collect()
    }
    recall = len(brute & approx) / len(brute)
    assert recall >= 0.5, f"IVF recall too low: {recall}"


def test_ppm_decoder_real():
    """Pure-stdlib PPM (P6) decode: dims from the header, 8-band
    mean-intensity features from the raster bytes."""
    from newspaper_spark.operators.multimodal import _decode_image

    raster = bytes(range(96))  # 8x4 RGB
    payload = b"P6\n8 4\n255\n" + raster
    w, h, nf, feat = _decode_image(payload, real_decode=True)
    assert (w, h, nf) == (8, 4, 1)
    assert len(feat) == 8
    assert feat[0] == sum(range(12)) / (12 * 255)
    assert feat[7] == sum(range(84, 96)) / (12 * 255)
    # comment in header + maxval scaling
    payload2 = b"P6\n# a comment\n2 1\n127\n" + bytes([127, 0, 0, 0, 0, 127])
    w2, h2, _, feat2 = _decode_image(payload2, real_decode=True)
    assert (w2, h2) == (2, 1)
    import pytest

    with pytest.raises(ValueError):
        _decode_image(b"P6\n8 4\n255\nshort", real_decode=True)


def test_bmp_decoder_real():
    """Uncompressed BMP decode: header geometry honored, rows padded to
    4 bytes, top-down (negative height) normalized."""
    import struct

    from newspaper_spark.operators.multimodal import _decode_image

    w, h, bpp = 3, 2, 24
    row = (w * bpp // 8 + 3) & ~3  # 12 bytes (9 + 3 pad)
    raster = bytes(range(row * h))
    header = (
        b"BM"
        + struct.pack("<IHHI", 54 + len(raster), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, w, -h, 1, bpp, 0, len(raster), 0, 0, 0, 0)
    )
    wd, hd, nf, feat = _decode_image(header + raster, real_decode=True)
    assert (wd, hd, nf) == (w, h, 1)
    assert len(feat) == 8
    import pytest

    with pytest.raises(ValueError):
        _decode_image(header[:-1], real_decode=True)  # truncated header


def test_bmp_8bit_palette():
    """8-bit BMP maps indices through the BGRX color table (raw indices
    are NOT gray values); out-of-range index hits the error channel."""
    import struct

    import pytest

    from newspaper_spark.operators.multimodal import (
        _decode_image,
        _raster_feature,
    )

    w, h = 4, 2
    palette = b"".join(
        bytes([b, g, r, 0]) for r, g, b in
        [(255, 0, 0), (0, 255, 0), (0, 0, 255), (10, 20, 30)]
    )
    row = (w + 3) & ~3
    idx_rows = [bytes([0, 1, 2, 3]), bytes([3, 2, 1, 0])]
    raster = b"".join(r.ljust(row, b"\x00") for r in idx_rows)
    off = 14 + 40 + len(palette)
    header = (
        b"BM"
        + struct.pack("<IHHI", off + len(raster), 0, 0, off)
        + struct.pack("<IiiHHIIiiII", 40, w, -h, 1, 8, 0, len(raster), 0, 0, 4, 0)
    )
    wd, hd, nf, feat = _decode_image(header + palette + raster, real_decode=True)
    assert (wd, hd, nf) == (w, h, 1)
    expected = b"".join(
        palette[4 * i : 4 * i + 3] for r in idx_rows for i in r[:w]
    )
    assert feat == _raster_feature(expected)

    bad = header + palette + (b"\x09" + raster[1:])  # index 9 > 3 colors
    with pytest.raises(ValueError, match="palette range"):
        _decode_image(bad, real_decode=True)


def test_avi_mjpeg_decoder_real():
    """RIFF/AVI walk + real JPEG frame decode: sampling picks frames
    0 and 2 of 4; feature over their concatenated rasters; dimension
    mismatches and frameless containers hit the error channel."""
    import pytest

    from newspaper_spark.operators.multimodal import (
        _decode_image,
        _raster_feature,
        avi_mjpeg_payload_hex,
        jpeg_dc_gray_payload_hex,
    )

    ds_all = [[130 + 8 * j, 170, 201, 253] for j in range(4)]
    frames = [
        jpeg_dc_gray_payload_hex(*[f"{d:02X}" for d in ds]) for ds in ds_all
    ]
    payload = bytes.fromhex(avi_mjpeg_payload_hex(frames))
    w, h, nf, feat = _decode_image(payload, real_decode=True)
    assert (w, h, nf) == (16, 16, 4)

    def raster(ds):
        px = [128 + (d + 4) // 8 for d in ds]
        out = bytearray()
        for pair in ((0, 1), (2, 3)):
            a, b = px[pair[0]], px[pair[1]]
            out += bytes(([a] * 8 + [b] * 8) * 8)
        return bytes(out)

    assert feat == _raster_feature(raster(ds_all[0]) + raster(ds_all[2]))

    # header/frame dim mismatch: patch avih width
    bad = bytearray(payload)
    i = bad.index(b"avih")
    bad[i + 8 + 32] = 99  # dwWidth
    with pytest.raises(ValueError, match="dimension mismatch"):
        _decode_image(bytes(bad), real_decode=True)

    # container without frames
    from newspaper_spark.operators.multimodal import (
        JPEG_DC_FRAME_BYTES,
        _avi_header_hex,
    )

    empty = bytes.fromhex(_avi_header_hex(0, 16, 16, JPEG_DC_FRAME_BYTES))
    with pytest.raises(ValueError, match="frame"):
        _decode_image(empty, real_decode=True)


def test_wav_decoder_real():
    """Pure-stdlib RIFF/PCM decode: 8-bit mono, 16-bit stereo (high
    bytes unsigned-shifted), odd-length chunk padding honored, non-PCM
    and truncated payloads on the error channel."""
    import struct

    import pytest

    from newspaper_spark.operators.multimodal import (
        _decode_wav,
        _raster_feature,
        _wav_header,
    )

    samples = bytes((i * 37) & 0xFF for i in range(96))
    n, r, c, feat = _decode_wav(_wav_header(96) + samples)
    assert (n, r, c) == (96, 8000, 1)
    assert feat == _raster_feature(samples)

    # 16-bit stereo: 4 frames; amplitude = high byte + 128
    frames = [(-32768, 0), (0, 16384), (256, -256), (32767, 1)]
    data = b"".join(struct.pack("<hh", l_, r_) for l_, r_ in frames)
    wav16 = (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, 2, 44100, 44100 * 4, 4, 16)
        + b"data" + struct.pack("<I", len(data)) + data
    )
    n, r, c, feat = _decode_wav(wav16)
    assert (n, r, c) == (4, 44100, 2)
    amp = bytes((data[i + 1] + 128) & 0xFF for i in range(0, len(data), 2))
    assert feat == _raster_feature(amp)

    # odd-length junk chunk before data must be word-aligned-skipped
    junk = b"LIST" + struct.pack("<I", 3) + b"abc\x00"
    wav_j = (
        b"RIFF" + struct.pack("<I", 36 + 12 + 96) + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 8000, 1, 8)
        + junk + b"data" + struct.pack("<I", 96) + samples
    )
    assert _decode_wav(wav_j)[0] == 96

    ieee_float = bytearray(_wav_header(96) + samples)
    struct.pack_into("<H", ieee_float, 20, 3)  # WAVE_FORMAT_IEEE_FLOAT
    with pytest.raises(ValueError, match="non-PCM"):
        _decode_wav(bytes(ieee_float))
    with pytest.raises(ValueError):
        _decode_wav(b"RIFFxxxx")  # too short / bad signature


def test_media_decode_real_end_to_end(spark):
    """attach_ppm → real decode: the whole mapInPandas path runs a REAL
    container parse (no md5 fake) with no errors."""
    from newspaper_spark.operators.multimodal import attach_ppm, extract_media_features

    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over a lazy dog near the river bank today")],
        "id int, text string",
    )
    r = extract_media_features(attach_ppm(df), real_decode=True).first()
    assert r.error is None
    assert (r.width, r.height, r.n_frames) == (8, 4, 1)
    # band 0 = mean of the first 12 text bytes / 255 (float32 storage)
    expected = sum(b"the quick br") / (12 * 255)
    assert abs(r.feature[0] - expected) < 1e-6


def test_kmeans_train_deterministic_and_recall(spark):
    """Trained centroids must be bit-deterministic across runs (exact
    integer sums) and never hurt recall vs the pseudo-random baseline
    on clustered data."""
    import math

    from newspaper_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
        kmeans_train,
    )

    rows = []
    for i in range(120):
        angle = (i % 6) / 6 * 2 * math.pi  # 6 tight clusters
        rows.append(
            (i, [math.cos(angle) + (i % 5) * 0.01, math.sin(angle), 0.3, 0.1])
        )
    emb = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    c1 = kmeans_train(emb, dim=4, n_cells=6, n_iter=2)
    c2 = kmeans_train(emb, dim=4, n_cells=6, n_iter=2)
    assert c1 == c2, "trained centroids must be bit-identical run-to-run"

    q = emb.filter("vec_id < 6")
    brute = {
        (r.query_id, r.neighbor_id) for r in brute_force_topk(q, emb, k=3).collect()
    }

    def recall(cents):
        approx = {
            (r.query_id, r.neighbor_id)
            for r in ivf_topk(
                q, emb, k=3, dim=4, n_cells=6, n_probe=2, centroids=cents
            ).collect()
        }
        return len(brute & approx) / len(brute)

    r_trained = recall(c1)
    r_untrained = recall(None)
    assert r_trained >= r_untrained, (
        f"training hurt recall: {r_trained} < {r_untrained}"
    )
    assert r_trained >= 0.8, f"trained IVF recall too low: {r_trained}"


def test_drop_tree_keeps_tail():
    """Killed subtrees must not eat the text after them (lxml drop_tree
    semantics): '<p>Read more <iframe/> after the video.</p>' keeps
    ' after the video.'."""
    from newspaper_spark.dom import parse_document
    from newspaper_spark.kernel.formatter import convert_to_html

    doc = parse_document(
        "<html><body><div><p>Read more <iframe src='x'></iframe>"
        " after the video.</p></div></body></html>"
    )
    div = next(n for n in doc.iterdescendants() if n.tag == "div")
    html = convert_to_html(div)
    assert "after the video." in html
    assert "iframe" not in html


def test_decode_sample_boundary_truncation():
    """A multibyte char split at the 64 KiB detection-sample boundary
    must not eliminate the correct encoding."""
    from newspaper_spark.operators.decode import decode_html_bytes

    unit = "한국어 페이지 내용 ".encode("euc-kr")  # 19 bytes, 2-byte hangul
    # choose a prefix length so byte 65536 falls INSIDE a 2-byte char:
    # (65536 - p) % 19 == 1 → one byte into the first hangul of a unit
    p = (65536 - 1) % len(unit)
    raw = b"x" * p + unit * 4000
    assert len(raw) > 65536
    # sanity: the sample boundary splits a character → strict decode of
    # the sample fails exactly at the tail
    try:
        raw[:65536].decode("euc-kr")
        assert False, "expected the boundary to split a character"
    except UnicodeDecodeError as e:
        assert e.start >= 65536 - 4
    txt = decode_html_bytes(raw)
    assert "한국어" in txt


def test_write_table_iceberg_mode_guard(spark):
    """Non-append/overwrite modes must fail loudly on the Iceberg path
    instead of silently replacing the table."""
    import pytest

    from newspaper_spark.sources.tables import write_table

    df = spark.range(1)
    with pytest.raises(ValueError, match="unsupported mode"):
        write_table(df, "iceberg:cat.db.t", mode="error")


def test_sentence_features_on_punctuated_text():
    """Kernel sentence scoring on sentence-rich text: the splitter honors
    '. '+capital boundaries, features carry the nlp.py:164-208 blend."""
    from newspaper_spark.kernel.nlp import (
        keywords,
        sentence_features,
        split_sentences,
        split_words,
    )

    text = (
        "Spark table scans run fast on columnar data today. "
        "Hash joins shuffle rows between query stages. "
        "Window functions sort partitions for running aggregates."
    )
    sents = split_sentences(text)
    assert len(sents) == 3
    kws = keywords(text, "en")
    feats = sentence_features(sents, split_words("Spark query stages"), kws, "en")
    assert len(feats) == 3
    for f in feats:
        assert 0 <= f["position_score"] <= 0.23
        assert f["total"] == (
            f["title_score"] * 1.5
            + (f["sbs"] + f["dbs"]) / 2.0 * 10.0 * 2.0
            + f["length_score"]
            + f["position_score"]
        ) / 4.0
    # the title words hit sentence 1 ('spark') and 2/3 ('query'/'stages')
    assert feats[0]["title_score"] > 0


def test_png_decoder_real():
    """zlib-only PNG decode: IHDR geometry + full unfiltering. Built
    against a PNG assembled by hand with every filter type."""
    import struct
    import zlib

    import pytest

    from newspaper_spark.operators.multimodal import _decode_image

    w, h, ch = 4, 5, 3  # RGB
    rows = [bytes((x * 7 + y * 31 + c) & 0xFF for x in range(w) for c in range(ch))
            for y in range(h)]

    # filter each scanline with types 0..4 (one per row)
    stride = w * ch
    filtered = bytearray()
    prev = bytes(stride)
    for y, line in enumerate(rows):
        f = y % 5
        filtered.append(f)
        if f == 0:
            filtered += line
        elif f == 1:
            filtered += bytes((line[x] - (line[x - ch] if x >= ch else 0)) & 0xFF
                              for x in range(stride))
        elif f == 2:
            filtered += bytes((line[x] - prev[x]) & 0xFF for x in range(stride))
        elif f == 3:
            filtered += bytes(
                (line[x] - (((line[x - ch] if x >= ch else 0) + prev[x]) >> 1)) & 0xFF
                for x in range(stride))
        else:  # Paeth
            out = bytearray()
            for x in range(stride):
                a = line[x - ch] if x >= ch else 0
                b = prev[x]
                c = prev[x - ch] if x >= ch else 0
                pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                out.append((line[x] - pred) & 0xFF)
            filtered += out
        prev = line

    def chunk(ctype, data):
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data)))

    png = (b"\x89PNG\r\n\x1a\n"
           + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
           + chunk(b"IDAT", zlib.compress(bytes(filtered)))
           + chunk(b"IEND", b""))

    wd, hd, nf, feat = _decode_image(png, real_decode=True)
    assert (wd, hd, nf) == (w, h, 1)
    # unfiltered raster must equal the original pixel bytes exactly
    raster = b"".join(rows)
    from newspaper_spark.operators.multimodal import _raster_feature

    assert feat == _raster_feature(raster)


def test_pgm_p5_grayscale():
    """P5 (grayscale netpbm): single-channel raster, probe and decoder
    agree on dims."""
    from newspaper_spark.operators.multimodal import (
        _decode_image,
        _raster_feature,
        probe_image_dims,
    )

    w, h = 6, 3
    raster = bytes((x * 13 + y * 7) & 0xFF for y in range(h) for x in range(w))
    payload = f"P5\n{w} {h}\n255\n".encode() + raster
    wd, hd, nf, feat = _decode_image(payload, real_decode=True)
    assert (wd, hd, nf) == (w, h, 1)
    assert feat == _raster_feature(raster)
    assert probe_image_dims(payload) == (w, h, "ppm")


def test_png_palette():
    """Colour-type-3 PNG: PLTE-mapped indices decode to the same RGB
    raster as the truecolour encoding of the same image; missing PLTE
    and out-of-range indices hit the error channel."""
    import struct
    import zlib

    import pytest

    from newspaper_spark.operators.multimodal import (
        _decode_image,
        _raster_feature,
    )

    def chunk(ctype, data):
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data)))

    w, h = 6, 4
    palette = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 17, 34, 51])
    indices = [(x + y) % 4 for y in range(h) for x in range(w)]
    stream = bytearray()
    for y in range(h):
        stream.append(0)
        stream += bytes(indices[y * w : (y + 1) * w])
    png = (b"\x89PNG\r\n\x1a\n"
           + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0))
           + chunk(b"PLTE", palette)
           + chunk(b"IDAT", zlib.compress(bytes(stream)))
           + chunk(b"IEND", b""))
    wd, hd, nf, feat = _decode_image(png, real_decode=True)
    assert (wd, hd, nf) == (w, h, 1)
    rgb = b"".join(palette[3 * i : 3 * i + 3] for i in indices)
    assert feat == _raster_feature(rgb)

    no_plte = (b"\x89PNG\r\n\x1a\n"
               + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0))
               + chunk(b"IDAT", zlib.compress(bytes(stream)))
               + chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="PLTE"):
        _decode_image(no_plte, real_decode=True)


def test_png_rejects_huge_declared_dims():
    """A crafted Adam7 IHDR declaring 0xFFFF×0xFFFF must fail with a
    cheap ValueError BEFORE the full-resolution grid allocates."""
    import struct
    import zlib

    import pytest

    from newspaper_spark.operators.multimodal import _decode_image

    def chunk(ctype, data):
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data)))

    png = (b"\x89PNG\r\n\x1a\n"
           + chunk(b"IHDR", struct.pack(">IIBBBBB", 0xFFFF, 0xFFFF, 8, 2, 0, 0, 1))
           + chunk(b"IDAT", zlib.compress(b"\x00"))
           + chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="too large"):
        _decode_image(png, real_decode=True)


def test_png_adam7_interlaced():
    """Adam7 PNG: the same pixels packed as 7 independently-filtered
    pass sub-images decode to the identical raster as the sequential
    encoding (each non-empty pass exercised: 13×11 hits all 7)."""
    import struct
    import zlib

    from newspaper_spark.operators.multimodal import (
        _PNG_ADAM7,
        _decode_image,
        _raster_feature,
    )

    w, h, ch = 13, 11, 3
    px = [
        [bytes(((x * 5 + y * 11 + c * 3) & 0xFF) for c in range(ch))
         for x in range(w)]
        for y in range(h)
    ]
    stream = bytearray()
    for x0, y0, dx, dy in _PNG_ADAM7:
        pw = (w - x0 + dx - 1) // dx
        ph = (h - y0 + dy - 1) // dy
        if pw <= 0 or ph <= 0:
            continue
        prev = bytes(pw * ch)
        for ry in range(ph):
            line = b"".join(px[y0 + ry * dy][x0 + rx * dx] for rx in range(pw))
            stream.append(2)  # Up filter: exercises cross-row state per pass
            stream += bytes((line[i] - prev[i]) & 0xFF for i in range(len(line)))
            prev = line

    def chunk(ctype, data):
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data)))

    png = (b"\x89PNG\r\n\x1a\n"
           + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 1))
           + chunk(b"IDAT", zlib.compress(bytes(stream)))
           + chunk(b"IEND", b""))
    wd, hd, nf, feat = _decode_image(png, real_decode=True)
    assert (wd, hd, nf) == (w, h, 1)
    raster = b"".join(b"".join(row) for row in px)
    assert feat == _raster_feature(raster)

    # interlaced / 16-bit variants must raise (honest plug-in slot)
    bad = (b"\x89PNG\r\n\x1a\n"
           + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 16, 2, 0, 0, 0)))
    with pytest.raises(ValueError):
        _decode_image(bad, real_decode=True)


def test_cosine_udf_parity_with_hof(spark):
    """cosine_udf must reproduce cosine_col exactly, including the
    degenerate semantics: NULL vector → 0.0 (null condition is falsy →
    otherwise), length mismatch → NULL, empty/zero-norm → 0.0."""
    from newspaper_spark.operators.similarity import cosine_col, cosine_udf

    rows = [
        (1, [1.0, 2.0, 3.0], [4.0, 5.0, 6.0]),     # normal
        (2, [1.0, 0.0], [0.0, 1.0]),               # orthogonal
        (3, None, [1.0, 2.0]),                     # null side
        (4, [1.0, 2.0, 3.0], [1.0, 2.0]),          # length mismatch
        (5, [0.0, 0.0], [1.0, 1.0]),               # zero norm
        (6, [0.12, -7.5, 3.25], [9.0, 0.5, -2.0]), # negative cosine
    ]
    df = spark.createDataFrame(
        rows, "id int, a array<double>, b array<double>"
    )
    got = {
        r.id: (r.hof, r.udf)
        for r in df.select(
            "id",
            cosine_col(F.col("a"), F.col("b")).alias("hof"),
            cosine_udf()(F.col("a"), F.col("b")).alias("udf"),
        ).collect()
    }
    for i, (hof, udf) in got.items():
        assert hof == udf, f"id {i}: hof={hof} udf={udf}"


def test_corpus_purity_invariant():
    """The nlp_sentence_scores / nlp_summary oracles exploit corpus
    properties (letters+space only, no sentence terminators). Fail
    LOUDLY here if the driver ever regenerates testdata differently,
    before the correctness gate turns red without explanation."""
    import duckdb

    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        n_bad = duckdb.sql(
            "SELECT count(*) FROM "
            f"read_parquet('/root/testdata/{sf}/documents.parquet') "
            "WHERE NOT regexp_full_match(text, '[a-z ]+')"
        ).fetchone()[0]
        assert n_bad == 0, f"{sf}: {n_bad} docs break the [a-z ]+ charset invariant"


def test_ppm_rejects_two_byte_maxval():
    import pytest

    from newspaper_spark.operators.multimodal import _decode_image

    payload = b"P6\n2 1\n65535\n" + bytes(12)
    with pytest.raises(ValueError):
        _decode_image(payload, real_decode=True)


def test_bmp_features_exclude_padding_and_flip_rows():
    """Band features must come from top-down pixel bytes without the
    4-byte row padding, so BMP features are comparable to PPM/PNG."""
    import struct

    from newspaper_spark.operators.multimodal import _decode_image, _raster_feature

    w, h, bpp = 3, 2, 24
    row = (w * bpp // 8 + 3) & ~3  # 12 (9 data + 3 pad)
    top = bytes(range(100, 109))
    bottom = bytes(range(9))
    # bottom-up storage: file carries bottom row first, pad bytes 0xEE
    raster = bottom + b"\xee" * 3 + top + b"\xee" * 3
    header = (
        b"BM"
        + struct.pack("<IHHI", 54 + len(raster), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, bpp, 0, len(raster), 0, 0, 0, 0)
    )
    _, _, _, feat = _decode_image(header + raster, real_decode=True)
    assert feat == _raster_feature(top + bottom)


def test_stateful_sessionize_late_event_never_regresses_bounds():
    """A cross-batch out-of-order event inside an open session must not
    move session_end (or start) backward — the timeout is computed from
    last_s and would otherwise fire early, splitting a real session."""
    from newspaper_spark.streaming.stateful import make_event_time_session_fn
    import pandas as pd

    class FakeState:
        def __init__(self):
            self._v = None
            self.hasTimedOut = False
            self.timeout_ms = None

        @property
        def exists(self):
            return self._v is not None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v

        def remove(self):
            self._v = None

        def setTimeoutTimestamp(self, ms):
            self.timeout_ms = ms

        def getCurrentWatermarkMs(self):
            return 0

    fn = make_event_time_session_fn(gap_minutes=30)
    st = FakeState()
    t0 = 1_700_000_000
    # batch 1: events at t0 and t0+1800 (same session, 30-min gap edge)
    list(fn((1,), [pd.DataFrame({"ts": pd.to_datetime([t0, t0 + 1500], unit="s")})], st))
    assert st.get == (t0, t0 + 1500, 2)
    # batch 2: a LATE event at t0+600 — joins the session, bounds keep
    list(fn((1,), [pd.DataFrame({"ts": pd.to_datetime([t0 + 600], unit="s")})], st))
    start_s, last_s, n = st.get
    assert (start_s, last_s, n) == (t0, t0 + 1500, 3)
    assert st.timeout_ms >= (t0 + 1500 + 1800) * 1000


def test_connected_components(spark):
    """Min-label propagation over a pair graph: chains, cliques, and
    singletons all land on their component's min id."""
    from newspaper_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        # component {1,2,3,4} as a CHAIN (worst diameter), clique {10,11,12}
        [(1, 2), (2, 3), (3, 4), (10, 11), (10, 12), (11, 12)],
        "id_a long, id_b long",
    )
    nodes = spark.createDataFrame([(i,) for i in [1, 2, 3, 4, 10, 11, 12, 99]],
                                  "id long")
    got = {r.id: r.rep for r in connected_components(pairs, nodes=nodes).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 99: 99}


def test_stratified_sample_deterministic(spark):
    """Hash-based sampling: reproducible across runs and repartitioning,
    rate roughly honored per stratum, zero-rate strata dropped."""
    from newspaper_spark.operators.sampling import sample_stratified

    rows = [(i, "en" if i % 2 == 0 else ("de" if i % 4 == 1 else "xx"))
            for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    rates = {"en": 0.5, "de": 0.2}
    s1 = {r.doc_id for r in sample_stratified(df, "lang", rates, "doc_id").collect()}
    s2 = {r.doc_id for r in
          sample_stratified(df.repartition(13), "lang", rates, "doc_id").collect()}
    assert s1 == s2, "sample must be repartition-stable"
    langs = dict(rows)
    en = sum(1 for i in s1 if langs[i] == "en")
    de = sum(1 for i in s1 if langs[i] == "de")
    assert not any(langs[i] == "xx" for i in s1), "default rate 0 must drop"
    assert 60 <= en <= 140   # 200 en rows @ 0.5
    assert 5 <= de <= 45     # 100 de rows @ 0.2


def test_sampling_null_key_drops_row(spark):
    """NULL sampling keys must hash to NULL and be DROPPED — matching
    the DuckDB oracle's NULL-propagating `||` — not silently hash just
    the salt and keep every null-keyed row."""
    from newspaper_spark.operators.sampling import sample_fraction

    df = spark.createDataFrame(
        [(str(i),) for i in range(50)] + [(None,), (None,)], "k string"
    )
    kept = sample_fraction(df, 1.0, "k").collect()
    assert len(kept) == 50
    assert all(r.k is not None for r in kept)


def test_connected_components_nonconvergence_raises(spark):
    """Hitting max_iterations without a fixpoint must raise, never
    return partially propagated (silently wrong) labels."""
    import pytest

    from newspaper_spark.operators.dedup import connected_components

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(8)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain, max_iterations=1)
    # and with enough rounds the same chain resolves to min-id 0
    got = {r.id: r.rep for r in connected_components(chain).collect()}
    assert set(got.values()) == {0}


def test_pii_scrub_patterns(spark):
    """Email/IPv4/phone redaction with fixed scrub order and
    counts on the original text."""
    from newspaper_spark.operators.pii import pii_scrub

    rows = [
        (1, "mail me at jo.doe+x@news-site.co.uk or 192.168.1.200 now"),
        (2, "call +1 (555) 010-4242 after 2024"),
        (3, "nothing sensitive here, year 2014, v1.2"),
        (4, "two mails: a@b.io c_d%e@f.org; ip 10.0.0.1"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in pii_scrub(df).collect()}

    r1 = got[1]
    assert r1.scrubbed_text == "mail me at <EMAIL> or <IP> now"
    assert (r1.n_emails, r1.n_ips, r1.n_phones) == (1, 1, 0)

    r2 = got[2]
    assert r2.scrubbed_text == "call <PHONE> after 2024"
    assert (r2.n_emails, r2.n_ips, r2.n_phones) == (0, 0, 1)

    r3 = got[3]
    assert r3.scrubbed_text == rows[2][1]          # untouched
    assert (r3.n_emails, r3.n_ips, r3.n_phones) == (0, 0, 0)

    r4 = got[4]
    assert r4.scrubbed_text == "two mails: <EMAIL> <EMAIL>; ip <IP>"
    assert (r4.n_emails, r4.n_ips, r4.n_phones) == (2, 1, 0)


def test_repetition_stats_hand_computed(spark):
    from newspaper_spark.operators.textstats import repetition_stats

    df = spark.createDataFrame(
        [
            (1, "a b a b c"),     # bigrams: ab, ba, ab, bc
            (2, "Solo"),          # single token: no bigrams
            (3, "x y"),           # one bigram, no dups
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in repetition_stats(df).collect()}

    r1 = got[1]
    assert (r1.n_tokens, r1.n_distinct_tokens) == (5, 3)
    assert r1.ttr == 0.6
    assert r1.dup_bigram_frac == 0.5               # 2 of 4 occurrences dup
    assert r1.top_bigram == "a b"
    assert r1.top_bigram_frac == round(2 * 3 / 9, 6)

    r2 = got[2]
    assert (r2.n_tokens, r2.n_distinct_tokens) == (1, 1)
    assert r2.ttr == 1.0
    assert r2.dup_bigram_frac == 0.0
    assert r2.top_bigram == ""                     # lowercased norm, no bigram
    assert r2.top_bigram_frac == 0.0

    r3 = got[3]
    assert r3.dup_bigram_frac == 0.0
    assert r3.top_bigram == "x y"
    assert r3.top_bigram_frac == 1.0


def test_unigram_logprob_hand_computed(spark):
    import math

    from newspaper_spark.operators.textstats import unigram_logprob

    df = spark.createDataFrame(
        [(1, "a a b"), (2, "b c")], "doc_id long, text string"
    )
    got = {r.doc_id: r for r in unigram_logprob(df).collect()}

    # vocab: a:2 b:2 c:1, N=5
    def r6(x):
        return math.floor(x * 1000000.0 + 0.5) / 1000000.0

    lp = {t: math.log10(c / 5.0) for t, c in {"a": 2, "b": 2, "c": 1}.items()}
    assert got[1].n_tokens == 3
    assert got[1].mean_logprob == r6((2 * lp["a"] + lp["b"]) / 3)
    assert got[2].n_tokens == 2
    assert got[2].mean_logprob == r6((lp["b"] + lp["c"]) / 2)


def test_pii_scrub_cross_engine_parity(spark):
    """Spark (Java regex) vs DuckDB (RE2) on adversarial codepoints —
    the bpe_tokens round-2 driver failure was exactly this divergence
    class, invisible on the plain-ASCII synthetic corpus."""
    import duckdb

    from newspaper_spark.operators.pii import (
        EMAIL_RX,
        IPV4_RX,
        PHONE_RX,
        pii_scrub,
    )

    nasty = [
        "plain a@b.co text",
        "vt\x0bsep a@b.co\x0btail",                    # \x0B: Java \s has it, RE2 \s doesn't
        "nbsp a@b.co end",                   # U+00A0 must NOT be word/space-class
        "line sep 10.1.2.3 para",            # unicode line separators
        "arabic digits ٠١٢ not [0-9]",  # ٠١٢ must not match [0-9]
        "full-width ＠ not at: user＠example.com",     # U+FF20 is not '@'
        "combining émail a@b.co",
        "+44 020 7946 0958 and +1 (555) 010-9999",
        "v1.2.3.4 release",                            # version string matches IPv4 shape (recall-first)
        "trailing dot a@b.co.",
        "emoji 😀 a@b.co 😀 10.0.0.1",
    ]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(nasty)], "doc_id long, text string"
    )
    got = {r.doc_id: r for r in pii_scrub(df).collect()}

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, ?)" for i in range(len(nasty)))
        + ") v(doc_id, text)",
        nasty,
    )
    oracle = con.execute(
        f"""
        SELECT doc_id,
               regexp_replace(regexp_replace(regexp_replace(text,
                 '{EMAIL_RX}', '<EMAIL>', 'g'),
                 '{IPV4_RX}', '<IP>', 'g'),
                 '{PHONE_RX}', '<PHONE>', 'g') AS scrubbed,
               len(regexp_extract_all(text, '{EMAIL_RX}')) AS n_emails,
               len(regexp_extract_all(text, '{IPV4_RX}')) AS n_ips,
               len(regexp_extract_all(text, '{PHONE_RX}')) AS n_phones
        FROM t
        """
    ).fetchall()
    for doc_id, scrubbed, n_e, n_i, n_p in oracle:
        g = got[doc_id]
        assert g.scrubbed_text == scrubbed, f"doc {doc_id}: {g.scrubbed_text!r} != {scrubbed!r}"
        assert (g.n_emails, g.n_ips, g.n_phones) == (n_e, n_i, n_p), f"doc {doc_id}"


def test_span_dedup_c4_semantics(spark):
    """Repeated 3-sentence spans are removed everywhere except the
    canonical (min doc_id, seq) occurrence — cross-doc AND within-doc."""
    from newspaper_spark.operators.span_dedup import span_dedup

    df = spark.createDataFrame(
        [
            (1, "A one. B two. C three. D four"),
            (2, "Z zed. B two. C three. D four"),   # shares (B,C,D) with doc 1
            (3, "P. Q. R. P. Q. R"),                # internal repeat
            (4, "Solo sentence"),                   # < span sentences
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in span_dedup(df, span=3).collect()}

    r1 = got[1]   # canonical owner of (B,C,D): untouched
    assert r1.cleaned_text == "A one. B two. C three. D four"
    assert (r1.n_sentences, r1.n_removed) == (4, 0)

    r2 = got[2]   # loses the duplicated span, keeps its own lead
    assert r2.cleaned_text == "Z zed"
    assert (r2.n_sentences, r2.n_removed) == (4, 3)

    r3 = got[3]   # second (P,Q,R) occurrence removed, first kept
    assert r3.cleaned_text == "P. Q. R"
    assert (r3.n_sentences, r3.n_removed) == (6, 3)

    r4 = got[4]   # too short for any span: untouched
    assert r4.cleaned_text == "Solo sentence"
    assert (r4.n_sentences, r4.n_removed) == (1, 0)


def test_exact_substring_dedup_lee2021(spark):
    """ExactSubstr (Lee et al. 2021): a duplicated run of k=4 tokens
    is removed from every occurrence except the canonical (min doc_id,
    position) one; covering windows drop every token they touch;
    whitespace variants tokenize identically; null text survives."""
    from newspaper_spark.operators.span_dedup import exact_substring_dedup

    shared = "the quick brown fox"          # the duplicated 4-gram
    df = spark.createDataFrame(
        [
            (1, f"alpha {shared} beta"),     # canonical owner: untouched
            (2, f"gamma\t{shared}\ndelta"),  # tab/newline WS, same tokens
            (3, "tiny doc"),                 # < k tokens: untouched
            (4, None),                       # null text → (0, 0, '') row
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in exact_substring_dedup(df, k=4).collect()}
    assert set(got) == {1, 2, 3, 4}

    r1 = got[1]
    assert r1.cleaned_text == f"alpha {shared} beta"
    assert (r1.n_tokens, r1.n_removed_tokens) == (6, 0)

    r2 = got[2]   # loses the 4 shared tokens, keeps its own frame
    assert r2.cleaned_text == "gamma delta"
    assert (r2.n_tokens, r2.n_removed_tokens) == (6, 4)

    r3 = got[3]
    assert r3.cleaned_text == "tiny doc"
    assert (r3.n_tokens, r3.n_removed_tokens) == (2, 0)

    r4 = got[4]
    assert (r4.cleaned_text, r4.n_tokens, r4.n_removed_tokens) == ("", 0, 0)


def test_bigram_backoff_logprob_brants2007(spark):
    """Stupid Backoff: seen bigrams score c2/c1(w1); unseen bigrams
    fall back to 0.4·(c1(w2)+1)/(N+V); per-doc mean is the portable
    6dp floor-round; docs with <2 tokens get a (0, 0.0) row."""
    import math

    from newspaper_spark.operators.textstats import bigram_backoff_logprob

    df = spark.createDataFrame(
        [(0, "a b a c"), (1, "a b z"), (2, "a b"), (3, None)],
        "doc_id long, text string",
    )
    train = df.filter(F.col("doc_id") % 2 == 0)
    got = {r.doc_id: r for r in bigram_backoff_logprob(df, train).collect()}
    assert set(got) == {0, 1, 2, 3}

    def rnd(x):
        return math.floor(x * 1e6 + 0.5) / 1e6

    # train counts: c1 = {a:3, b:2, c:1}, N=6, V=3
    # c2 = {(a,b):2, (b,a):1, (a,c):1}
    r0 = got[0]   # all three bigrams seen
    exp0 = rnd((math.log10(2 / 3) + math.log10(1 / 2) + math.log10(1 / 3)) / 3)
    assert (r0.n_bigrams, r0.sb_logprob) == (3, exp0)

    r1 = got[1]   # (a,b) seen; (b,z) unseen → backoff with c1(z)=0
    exp1 = rnd((math.log10(2 / 3) + math.log10(0.4 * (0 + 1) / (6 + 3))) / 2)
    assert (r1.n_bigrams, r1.sb_logprob) == (2, exp1)

    r2 = got[2]
    assert (r2.n_bigrams, r2.sb_logprob) == (1, rnd(math.log10(2 / 3)))

    r3 = got[3]   # null text → one empty token → no bigrams
    assert (r3.n_bigrams, r3.sb_logprob) == (0, 0.0)


def test_dsir_scores_rank_target_like_docs_higher(spark):
    """DSIR (Xie et al. 2023): documents sharing the target corpus's
    n-gram profile get higher importance log-ratios than off-profile
    documents; every raw doc gets a row; null text survives."""
    from newspaper_spark.operators.dsir import dsir_scores

    science = "quantum physics experiment measures particle spin states"
    sports = "football team wins the championship game on penalties"
    rows = (
        [(i, science + f" run {i}") for i in range(0, 40, 10)]   # targets
        + [(i, science + f" trial {i}") for i in (3, 7, 13)]     # on-profile
        + [(i, sports + f" match {i}") for i in (5, 9, 11)]      # off-profile
        + [(99, None)]
    )
    df = spark.createDataFrame(rows, "doc_id long, text string")
    target = df.filter(F.col("doc_id") % 10 == 0)
    got = {r.doc_id: r for r in dsir_scores(df, target, n_buckets=512).collect()}
    assert set(got) == {r[0] for r in rows}
    on = [got[i].dsir_logratio for i in (3, 7, 13)]
    off = [got[i].dsir_logratio for i in (5, 9, 11)]
    assert min(on) > max(off), (on, off)
    assert got[99].n_feats == 1  # null text = one empty-token feature


def test_paragraph_dedup_massivetext(spark):
    """Exact paragraph dedup: a paragraph repeated across (or within)
    docs survives only at its canonical (min doc, min position)
    occurrence; unique paragraphs untouched; newline reassembly."""
    from newspaper_spark.operators.span_dedup import paragraph_dedup

    boiler = "Subscribe to our newsletter"
    df = spark.createDataFrame(
        [
            (1, f"Unique lead one\n{boiler}\nUnique tail one"),
            (2, f"{boiler}\nUnique body two"),
            (3, f"Only unique content\n\n\nhere"),   # empty segments drop
            (4, f"{boiler}"),                        # nothing left after dedup
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in paragraph_dedup(df).collect()}
    assert got[1].cleaned_text == f"Unique lead one\n{boiler}\nUnique tail one"
    assert got[1].n_removed == 0
    assert got[2].cleaned_text == "Unique body two"
    assert (got[2].n_sentences, got[2].n_removed) == (2, 1)
    assert got[3].cleaned_text == "Only unique content\nhere"
    assert got[3].n_sentences == 2
    assert got[4].cleaned_text == "" and got[4].n_removed == 1


def test_span_dedup_hot_span_key(spark):
    """10^4 occurrences of ONE boilerplate span (the newsletter-tail
    shape): the groupBy(h) + join-back plan must produce the exact
    keep-one-canonical result.  With the old W.partitionBy(span_hash)
    window this key was a single hot reducer; now it arrives at its
    reducer as map-side partial aggregates."""
    from newspaper_spark.operators.span_dedup import span_dedup

    tail = "Subscribe now. Follow us. All rights reserved"
    rows = [(i, f"Body {i} here. {tail}") for i in range(10_000)]
    df = spark.createDataFrame(rows, "doc_id long, text string").repartition(32)
    out = span_dedup(df, span=3).collect()
    got = {r.doc_id: r for r in out}
    assert len(got) == 10_000
    # doc 0 is canonical: keeps everything
    assert got[0].cleaned_text == f"Body 0 here. {tail}"
    assert got[0].n_removed == 0
    # every other doc loses exactly the 3-sentence boilerplate tail
    for i in (1, 17, 9_999):
        assert got[i].cleaned_text == f"Body {i} here"
        assert (got[i].n_sentences, got[i].n_removed) == (4, 3)
    assert sum(r.n_removed for r in out) == 3 * 9_999


def test_c4_filters_rules(spark):
    from newspaper_spark.operators.filters import c4_filters

    df = spark.createDataFrame(
        [
            (1, "Good one. Two here. Three more. Four now. And five words done."),
            (2, "Code sample { return 0; }. Two. Three. Four. Five."),
            (3, "Please enable JavaScript to view. Two. Three. Four. Five."),
            (4, "Lorem Ipsum dolor sit. Two. Three. Four. Five."),
            (5, "Too. Few. Sentences."),
            (6, "ok"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in c4_filters(df).collect()}
    assert got[1].keep and got[1].n_sentences == 5
    assert got[2].has_curly and not got[2].keep
    assert got[3].has_javascript and not got[3].keep
    assert got[4].has_lorem and not got[4].keep
    assert not got[5].enough_sentences and not got[5].keep
    assert not got[6].enough_words and not got[6].keep


def test_url_blocklist_suffix_matching(spark):
    """Domain-suffix semantics: exact host, parent-domain, and
    deeper-subdomain matches all block; lookalike suffixes that are
    not label-aligned do NOT; null URLs pass clean."""
    from newspaper_spark.operators.urlops import url_blocklist_filter

    rows = [
        (1, "http://ads.tracker.net/x"),        # exact host match
        (2, "http://sub.deep.tracker.net/y"),   # parent-domain match
        (3, "http://nottracker.net/z"),         # NOT a suffix match
        (4, "http://clean.example.org/a"),      # clean
        (5, None),                              # null url
        (6, "https://tracker.net"),             # no path, https
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    got = {
        r.doc_id: r
        for r in url_blocklist_filter(df, ["tracker.net"]).collect()
    }
    assert got[1].blocked and got[1].blocked_domain == "tracker.net"
    assert got[2].blocked
    assert not got[3].blocked and got[3].blocked_domain is None
    assert not got[4].blocked
    assert not got[5].blocked
    assert got[6].blocked
    # blocklist as a DataFrame relation (the large-blocklist path)
    bl_df = spark.createDataFrame([("tracker.net",)], "domain string")
    got2 = {r.doc_id: r.blocked
            for r in url_blocklist_filter(df, bl_df).collect()}
    assert got2 == {k: v.blocked for k, v in got.items()}


def test_gopher_filters_rules(spark):
    """Each Gopher rule attributed independently (Rae et al. §A1.1);
    thresholds integer-exact."""
    from newspaper_spark.operators.filters import gopher_filters

    good = ("the data and the model that we have built with care "
            + "word " * 45).strip()
    rows = [
        (1, good),                                     # passes everything
        (2, "too few words here"),                     # word_count fails
        (3, good + " ####################"),           # symbol ratio fails
        (4, good + "\n" + "\n".join("- item" for _ in range(30))),  # bullets
        (5, good.replace("word", "1234")),             # alpha-word ratio fails
        (6, ("xylophone " * 60).strip()),              # no stopwords
        (7, None),                                     # null text
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in gopher_filters(df).collect()}
    assert got[1].keep and got[1].word_count_ok and got[1].stopword_ok
    assert not got[2].word_count_ok and not got[2].keep
    assert not got[3].symbol_ratio_ok and not got[3].keep
    assert not got[4].bullet_ok and not got[4].keep
    assert got[4].n_lines == 31
    assert not got[5].alpha_ok and not got[5].keep
    assert not got[6].stopword_ok and not got[6].keep
    assert got[7].n_words == 0 and not got[7].keep


def test_extract_page_links(spark):
    """DOM-mode get_urls(titles=True) parity (extractors.py:591-605):
    document order, href-less anchors skipped, anchor text is lxml's
    .text (text BEFORE the first child element — None when the anchor
    starts with markup, the reference's own quirk), zero-link pages
    emit no rows."""
    from newspaper_spark.operators.source_build import extract_page_links

    html = (
        "<html><body><a href='/a'>first</a><a name='x'>no-href</a>"
        "<a href='/b'><b>bold</b> tail</a><a href='/c'>plain</a>"
        "</body></html>"
    )
    df = spark.createDataFrame(
        [("c1", 0, html), ("c1", 1, "<html><body><p>no links</p></body></html>")],
        "conv_id string, turn_idx int, text string",
    )
    got = extract_page_links(df).orderBy("turn_idx", "link_idx").collect()
    assert [(r.link_idx, r.href, r.anchor) for r in got] == [
        (0, "/a", "first"),
        (1, "/b", None),  # starts with <b> -> .text is None
        (2, "/c", "plain"),
    ]
    assert all(r.turn_idx == 0 for r in got)  # link-less page: no rows


def test_bpe_train_and_apply(spark):
    """Classic Sennrich corpus learns the textbook merge sequence;
    distributed apply reproduces the trained segmentation; repeated
    adjacent pairs follow the documented single-pass semantics;
    exhausted vocabularies raise instead of silently under-training."""
    import pytest as _pytest

    from newspaper_spark.operators.bpe import (
        bpe_apply,
        bpe_train,
        bpe_word_counts,
    )

    df = spark.createDataFrame(
        [(1, "low low low lower lowest new newer"), (2, "low newer newer")],
        "doc_id long, text string",
    )
    wc = bpe_word_counts(df)
    merges = bpe_train(wc, 6)
    assert merges == [
        ("l", "o"), ("lo", "w"), ("e", "r"),
        ("e", "w"), ("n", "ew"), ("new", "er"),
    ]
    seg = {r.word: (r.tokens, r.n_tokens)
           for r in bpe_apply(wc, merges).collect()}
    assert seg["low"] == ("low", 1)
    assert seg["lower"] == ("low er", 2)
    assert seg["lowest"] == ("low e s t", 4)
    assert seg["newer"] == ("newer", 1)

    # single-pass sentinel replacement: 'papa' with merge (p,a) merges
    # the FIRST occurrence only in that round (module-docstring
    # divergence from canonical BPE) — and token boundaries never break
    pa = spark.createDataFrame([("papa",)], "word string")
    one = {r.word: r.tokens for r in bpe_apply(pa, [("p", "a")]).collect()}
    assert one["papa"] == "pa p a"
    two = {r.word: r.tokens
           for r in bpe_apply(pa, [("p", "a"), ("p", "a")]).collect()}
    assert two["papa"] == "pa pa"

    # vocabulary with a single 1-char word has zero pairs -> raises
    tiny = spark.createDataFrame([(1, "a a a")], "doc_id long, text string")
    with _pytest.raises(ValueError):
        bpe_train(bpe_word_counts(tiny), 1)

    # max_vocab guard: training on the top-2 words by (freq, word)
    # (low x4, newer x3) sees only l/o/w/n/e/r pairs
    capped = bpe_train(wc, 2, max_vocab=2)
    assert capped == [("l", "o"), ("lo", "w")]

    # the guard is ON BY DEFAULT (VERDICT r5 "what's wrong" #1): the
    # no-kwargs path must bound its driver-side collect — the executed
    # plan carries a limit, not a full-vocabulary collect
    import inspect

    from newspaper_spark.operators.bpe import DEFAULT_MAX_VOCAB

    default = inspect.signature(bpe_train).parameters["max_vocab"].default
    assert default == DEFAULT_MAX_VOCAB and default is not None
    assert 2**16 <= default <= 2**20
    # and the default path trains identically to the explicit cap on a
    # vocabulary smaller than the cap (the no-op regime real text is in)
    assert bpe_train(wc, 2) == bpe_train(wc, 2, max_vocab=default)

    # doc-level encoding: token counts follow the trained segmentation
    from newspaper_spark.operators.bpe import bpe_encode_docs

    enc = {r.doc_id: r for r in bpe_encode_docs(df, merges).collect()}
    # doc 1: low(1)*3 + lower(2) + lowest(4) + new(1) + newer(1) = 11
    assert enc[1].n_words == 7 and enc[1].n_bpe_tokens == 11
    # doc 2: low(1) + newer(1)*2 = 3
    assert enc[2].n_words == 3 and enc[2].n_bpe_tokens == 3


def test_frontier_schedule(spark):
    """Per-host wave assignment: priority DESC then id, 0-based per
    host, null priority last, n_host per host; wave < K is the
    per-host depth cap."""
    from newspaper_spark.operators.frontier import frontier_schedule

    rows = [
        (1, "a.com", 5), (2, "a.com", 9), (3, "a.com", 9),
        (4, "a.com", None), (5, "b.com", 1),
    ]
    df = spark.createDataFrame(rows, "doc_id long, host string, priority int")
    got = {r.doc_id: r for r in frontier_schedule(
        df, priority_col="priority", id_col="doc_id").collect()}
    assert [got[i].wave for i in (2, 3, 1, 4)] == [0, 1, 2, 3]  # 9,9-tie→id,5,null
    assert got[5].wave == 0 and got[5].n_host == 1
    assert all(got[i].n_host == 4 for i in (1, 2, 3, 4))
    assert got[1].host_rank == got[1].wave

    # without a priority column: plain id order
    got2 = {r.doc_id: r.wave for r in frontier_schedule(
        df.drop("priority")).collect()}
    assert [got2[i] for i in (1, 2, 3, 4)] == [0, 1, 2, 3]


def test_robots_gate_matches_stdlib(spark):
    """Property check: robots_gate verdicts == urllib.robotparser
    can_fetch over bodies exercising named-beats-star selection,
    first-match-wins order (a later more-specific Allow does NOT
    rescue), empty-Disallow allow-all, multi-UA groups, comments,
    agent normalization, and no-applicable-group defaults — for BOTH
    a named agent and one that only the '*' groups cover."""
    import urllib.robotparser as rp

    from newspaper_spark.operators.robots import parse_robots, robots_gate

    bodies = {
        "a.com": ("# comment\nUser-agent: newsbot\nDisallow: /private/\n"
                  "Allow: /private/ok.html\n\nUser-agent: *\n"
                  "Disallow: /tmp/\nDisallow:\n"),
        "b.com": "User-agent: *\nDisallow: /\n",
        "c.com": "",
        "d.com": ("User-agent: crawler\nUser-agent: newsbot\n"
                  "Allow: /news/\nDisallow: /\n"),
        "e.com": "User-agent: other\nDisallow: /\n",
        # ADVICE r5 cases:
        # indented directives parse (robotparser strips each line)
        "f.com": "User-agent: *\n  Disallow: /tmp/\n\tDisallow: /private/\n",
        # a group listing BOTH '*' and the agent is demoted to the
        # default entry — the LATER named-only group must win for
        # newsbot, and the mixed group serves everyone else
        "g.com": ("User-agent: *\nUser-agent: newsbot\nDisallow: /\n\n"
                  "User-agent: newsbot\nDisallow: /private/\n"),
        # a second '*' group is discarded (default_entry set once)
        "h.com": ("User-agent: *\nDisallow: /tmp/\n\n"
                  "User-agent: *\nDisallow: /\n"),
    }
    paths = ["/private/ok.html", "/private/no.html", "/tmp/a",
             "/news/x.html", "/open",
             ""]  # no path component: probes as '/' (Disallow: / hits)

    robots = spark.createDataFrame(
        list(bodies.items()), "host string, robots string"
    )
    rules = parse_robots(robots, robots_col="robots", host_col="host")

    for agent in ("NewsBot/1.0", "somebody-else"):
        expected = {}
        for h, b in bodies.items():
            r = rp.RobotFileParser()
            r.parse(b.splitlines())
            for p in paths:
                expected[(h, p)] = r.can_fetch(agent, f"http://{h}{p}")
        rows = [
            (i, f"http://{h}{p}", h)
            for i, (h, p) in enumerate((h, p) for h in bodies for p in paths)
        ]
        urls = spark.createDataFrame(rows, "doc_id long, url string, host string")
        got = robots_gate(urls, rules, agent).collect()
        assert len(got) == len(rows)
        for r in got:
            p = r.url.split(r.host, 1)[1]
            assert r.allowed == expected[(r.host, p)], (agent, r)


def test_bloom_matches_python_model(spark):
    """bloom_seen_filter vs an independent hashlib model of the exact
    bit layout (md5-derived probe positions, membership = all k bits)
    — pins the filter semantics independently of the DuckDB oracle,
    including which non-members false-positive at a tight m."""
    import hashlib

    from newspaper_spark.operators.bloom import bloom_seen_filter

    m, k = 512, 4

    def pos(i, v):
        return int(hashlib.md5(f"{i}:{v}".encode()).hexdigest()[:15], 16) % m

    urls = [f"http://h{i % 5}.com/p{i}" for i in range(240)]
    seen = [u for i, u in enumerate(urls) if i % 3 == 0]
    bits = {pos(i, s) for s in seen for i in range(k)}

    def model(u):
        return all(pos(i, u) in bits for i in range(k))

    df = spark.createDataFrame(list(enumerate(urls)), "doc_id long, url string")
    got = {r.url: r.possibly_seen for r in bloom_seen_filter(
        df, df.filter("doc_id % 3 = 0").select("url"), m=m, k=k).collect()}
    want = {u: model(u) for u in urls}
    assert got == want
    # the tight m must actually produce false positives for this to
    # have exercised the interesting branch
    assert any(want[u] for i, u in enumerate(urls) if i % 3 != 0)


def test_line_filters_matches_python_model(spark):
    """line_filters vs an independent sequential model on random
    corpora mixing every line class (numeric, counter, all-caps,
    boilerplate markers, padded/tabbed, empty, plain prose)."""
    import random
    import re

    from newspaper_spark.operators.filters import LINE_BOILERPLATE, line_filters

    ws = re.compile(r"[ \t\n\x0B\f\r]+")
    trim = re.compile(r"^[ \t\r]+|[ \t\r]+$")
    num = re.compile(r"^[0-9 .,:%/+-]+$")
    cnt = re.compile(
        r"^[0-9]+ (likes?|comments?|shares?|views?|retweets?|replies)$"
    )

    def wc(line):
        col = ws.sub(" ", line.lower()).strip(" ")
        return 0 if col == "" else len(col.split(" "))

    def bad(line):
        low = line.lower()
        return bool(
            (num.search(line) and re.search("[0-9]", line))
            or cnt.search(low)
            or (re.search("[A-Z]", line) and not re.search("[a-z]", line))
            or (wc(line) <= 10 and any(m in low for m in LINE_BOILERPLATE))
        )

    def model(text):
        lines = [trim.sub("", l) for l in (text or "").split("\n")]
        flags = [bad(l) for l in lines]
        removed = sum(wc(l) for l, b in zip(lines, flags) if b)
        total = sum(wc(l) for l in lines)
        return (
            "\n".join(l for l, b in zip(lines, flags) if not b),
            len(lines), sum(flags), removed, total,
            20 * removed <= total,
        )

    pool = [
        "NAV MENU", "42", "12.5%", "2 / 10", "37 likes", "9 comments",
        "Subscribe now", "please read more again today and tomorrow",
        "plain words in a line here", "", "  padded line  ",
        "\tTabbed words\t", "mixed Case Words", "10 likes and counting",
        "%%..,", "sign in", "terms of use apply to all visitors of "
        "this site and every page within it always",
    ]
    for seed in range(5):
        rng = random.Random(300 + seed)
        rows = [
            (i, "\n".join(rng.choice(pool)
                          for _ in range(rng.randint(0, 8))))
            for i in range(rng.randint(3, 7))
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r.doc_id: (r.cleaned_text, r.n_lines, r.n_removed_lines,
                       r.removed_words, r.total_words, r.keep)
            for r in line_filters(df).collect()
        }
        want = {i: model(t) for i, t in rows}
        assert got == want, f"seed {seed}"


def test_exact_substring_dedup_model_equivalence(spark):
    """exact_substring_dedup vs an independent O(n·k) Python model on
    random corpora over a 5-token alphabet (dense cross- and
    within-doc k-gram collisions, mixed whitespace separators) — pins
    the keep-one/covered-token semantics independently of the DuckDB
    oracle."""
    import random
    import re

    from newspaper_spark.operators.span_dedup import exact_substring_dedup

    ws = re.compile(r"[ \t\n\x0B\f\r]+")
    K = 3

    def model(corpus):
        toks = {
            i: [t for t in ws.split(txt or "") if t != ""]
            for i, txt in corpus
        }
        occ = {}   # gram tuple -> list[(id, start)] in scan order
        for i, ts in sorted(toks.items()):
            for s in range(len(ts) - K + 1):
                occ.setdefault(tuple(ts[s:s + K]), []).append((i, s))
        covered = {i: set() for i, _ in corpus}
        for places in occ.values():
            if len(places) > 1:
                canon = min(places)
                for (i, s) in places:
                    if (i, s) != canon:
                        covered[i].update(range(s, s + K))
        out = {}
        for i, ts in toks.items():
            kept = [t for p, t in enumerate(ts) if p not in covered[i]]
            out[i] = (" ".join(kept), len(ts), len(ts) - len(kept))
        return out

    seps = [" ", "  ", "\t", "\n", " \t "]
    alphabet = ["a", "b", "c", "d", "e"]
    for seed in range(5):
        rng = random.Random(700 + seed)
        rows = [
            (
                i,
                "".join(
                    rng.choice(alphabet) + rng.choice(seps)
                    for _ in range(rng.randint(0, 12))
                ),
            )
            for i in range(rng.randint(3, 7))
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r.doc_id: (r.cleaned_text, r.n_tokens, r.n_removed_tokens)
            for r in exact_substring_dedup(df, k=K).collect()
        }
        assert got == model(rows), f"seed {seed}"


def test_crawl_prep_composition_invariants(spark):
    """The composed crawl gate (q_crawl_prep): kept ⇔ wave assigned,
    waves dense 0..n-1 per host among kept rows, dropped rows carry a
    NULL wave and at least one failing gate flag."""
    import __spark_entry__ as E
    from tests.conftest import SF0001

    rows = E.queries()["crawl_prep"](spark, SF0001).collect()
    assert rows
    by_host = {}
    for r in rows:
        assert r.kept == (not r.blocked and r.allowed and not r.possibly_seen)
        if r.kept:
            assert r.wave is not None
            by_host.setdefault(r.host, []).append(r.wave)
        else:
            assert r.wave is None
    for host, waves in by_host.items():
        assert sorted(waves) == list(range(len(waves))), host


def test_quality_buckets(spark):
    """CCNet tertile split: exact thirds on distinct bins, tie mass
    follows its bin's starting bucket, integer-exact thresholds for
    uneven weights, mismatched weights/labels rejected."""
    import pytest as _pytest

    from newspaper_spark.operators.textstats import quality_buckets

    df = spark.createDataFrame(
        [(i, -3.0 + i * 0.001) for i in range(30)],
        "doc_id long, mean_logprob double",
    )
    got = {r.doc_id: r.bucket for r in quality_buckets(df).collect()}
    assert [got[i] for i in (0, 9, 10, 19, 20, 29)] == [
        "head", "head", "middle", "middle", "tail", "tail"]

    # all rows share one bin -> the bin starts at rank 0 -> all head
    ties = spark.createDataFrame(
        [(i, -2.5) for i in range(9)], "doc_id long, mean_logprob double"
    )
    assert {r.bucket for r in quality_buckets(ties).collect()} == {"head"}

    # 1:2:1 weights over 8 bins -> 2/4/2
    df8 = spark.createDataFrame(
        [(i, float(i)) for i in range(8)], "doc_id long, mean_logprob double"
    )
    got8 = [r.bucket for r in
            quality_buckets(df8, weights=(1, 2, 1)).orderBy("doc_id").collect()]
    assert got8 == ["head"] * 2 + ["middle"] * 4 + ["tail"] * 2

    with _pytest.raises(ValueError):
        quality_buckets(df8, weights=(1, 1))


def test_feed_operators(spark):
    """parse_feed_entries: real ET parse (entities + CDATA resolved,
    RSS and Atom shapes, empty/malformed/not-a-feed channels).
    feed_urls: the reference's regex-mode scrape, including the
    faithful quirk that Atom href attributes are invisible
    (extractors.py:607-621)."""
    from newspaper_spark.operators.feeds import feed_urls, parse_feed_entries

    rss = (
        '<?xml version="1.0"?><rss version="2.0"><channel><title>F</title>'
        "<item><title>Story 1 &amp; more</title>"
        "<link>http://site1.com/feed/item-1-0.html</link>"
        "<pubDate>Tue, 30 Dec 2014 10:05:00 GMT</pubDate></item>"
        "<item><title><![CDATA[Raw <b> title]]></title>"
        "<link>http://site1.com/feed/item-1-1.html</link></item>"
        "</channel></rss>"
    )
    atom = (
        '<feed xmlns="http://www.w3.org/2005/Atom"><title>F</title>'
        '<entry><title>T &amp; u</title><link href="http://site2.com/a-0"/>'
        "<updated>2014-12-30T10:05:00Z</updated></entry></feed>"
    )
    df = spark.createDataFrame(
        [
            (1, rss),
            (2, atom),
            (3, "<rss><channel><item><title>oops"),
            (4, '<rss version="2.0"><channel><title>E</title></channel></rss>'),
            (5, "<html><body>hi</body></html>"),
            (6, None),
            # entity-expansion bomb: must hit the dtd-rejected channel
            # WITHOUT being parsed (stdlib ET has no expansion budget)
            (7, '<?xml version="1.0"?><!DOCTYPE lolz [<!ENTITY a "ha">'
                '<!ENTITY b "&a;&a;&a;&a;&a;&a;&a;&a;&a;&a;">]>'
                "<rss><channel><item><title>&b;&b;</title></item>"
                "</channel></rss>"),
        ],
        "feed_id long, xml string",
    )

    ent = {(r.feed_id, r.entry_idx): r
           for r in parse_feed_entries(df).collect()}
    assert ent[(1, 0)].title == "Story 1 & more"  # entity resolved
    assert ent[(1, 0)].link == "http://site1.com/feed/item-1-0.html"
    assert ent[(1, 0)].published == "Tue, 30 Dec 2014 10:05:00 GMT"
    assert ent[(1, 1)].title == "Raw <b> title"  # CDATA resolved
    assert ent[(1, 1)].published is None
    assert ent[(2, 0)].fmt == "atom"
    assert ent[(2, 0)].link == "http://site2.com/a-0"  # href attribute
    assert ent[(3, None)].error == "malformed-xml"
    assert ent[(4, None)].fmt == "empty" and ent[(4, None)].error is None
    assert ent[(5, None)].error == "not-a-feed"
    assert ent[(6, None)].error == "malformed-xml"
    assert ent[(7, None)].error == "dtd-rejected"

    urls = [(r.feed_id, r.url_idx, r.url)
            for r in feed_urls(df).orderBy("feed_id", "url_idx").collect()]
    assert urls == [
        (1, 0, "http://site1.com/feed/item-1-0.html"),
        (1, 1, "http://site1.com/feed/item-1-1.html"),
    ]  # Atom href stripped with its tag — reference quirk preserved


def test_bloom_seen_filter_invariants(spark):
    """Bloom gate invariants: ZERO false negatives at any sizing (the
    correctness property crawl dedup relies on), zero false positives
    when m is sized generously, filter relation bounded by m/32 rows,
    and null URLs probe as not-seen."""
    from newspaper_spark.operators.bloom import bloom_build, bloom_seen_filter

    cand = spark.createDataFrame(
        [(i, f"http://site{i % 7}.com/p{i}") for i in range(300)]
        + [(998, None)],
        "doc_id long, url string",
    )
    seen = cand.filter("doc_id % 3 = 0 AND url IS NOT NULL").select("url")

    # tight filter: every truly-seen URL MUST flag (no false negatives)
    tight = {r.doc_id: r.possibly_seen
             for r in bloom_seen_filter(cand, seen, m=256, k=4).collect()}
    assert all(tight[i] for i in range(0, 300, 3))
    assert tight[998] is False  # null URL

    # generous filter: no false positives either at 2^20 bits / 100 keys
    wide = {r.doc_id: r.possibly_seen
            for r in bloom_seen_filter(cand, seen, m=1 << 20, k=4).collect()}
    assert all(wide[i] for i in range(0, 300, 3))
    assert not any(v for i, v in wide.items() if i % 3 != 0)

    # the only distributed state is the word relation, <= m/32 rows
    assert bloom_build(seen, "url", m=256, k=4).count() <= 256 // 32


def test_line_filters_classes_and_drop_rule(spark):
    """Each RefinedWeb line-removal class triggers independently;
    empty lines survive; the 5% whole-doc drop rule is integer-exact
    (Penedo et al. 2023 §G.2)."""
    from newspaper_spark.operators.filters import line_filters

    body = ("plain prose line with quite a few ordinary words here "
            "so removal stays under five percent of the document")
    long_body = " ".join([body] * 8)  # 152 words: 7 removed stays <5%
    rows = [
        # one line per removal class around a long body: all removed,
        # body + empty line kept, removed_words small enough to keep
        (1, "NAV MENU\n42\n37 likes\n" + long_body + "\n\nSubscribe now"),
        # numeric punctuation forms: "12.5%", "2 / 10"
        (2, "12.5%\n2 / 10\n" + body),
        # counter plurals and variants
        (3, "9 comments\n1 like\n104 views\n" + body),
        # >10-word line containing a marker is NOT boilerplate-short
        (4, "please subscribe to the weekly letter we send out on "
            "mondays and thursdays\n" + body),
        # mostly-chrome doc: removed words > 5% -> keep=False
        (5, "READ THE FULL STORY HERE NOW\nshort line"),
        (6, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in line_filters(df).collect()}

    r1 = got[1]
    assert r1.n_lines == 6 and r1.n_removed_lines == 4
    assert r1.cleaned_text == long_body + "\n"  # empty line preserved
    assert r1.removed_words == 7 and r1.keep
    r2 = got[2]
    assert r2.n_removed_lines == 2 and r2.cleaned_text == body
    r3 = got[3]
    assert r3.n_removed_lines == 3 and r3.cleaned_text == body
    r4 = got[4]  # 13-word marker line survives the short-line gate
    assert r4.n_removed_lines == 0 and not r4.keep is None
    assert r4.cleaned_text.endswith(body)
    r5 = got[5]
    assert r5.n_removed_lines == 1 and r5.removed_words == 6
    assert r5.total_words == 8 and not r5.keep
    r6 = got[6]  # null text behaves like empty text
    assert r6.n_lines == 1 and r6.n_removed_lines == 0
    assert r6.cleaned_text == "" and r6.keep


def test_normalize_text_nfc_and_controls(spark):
    from newspaper_spark.operators.normalize import normalize_text

    df = spark.createDataFrame(
        [
            (1, "café"),           # NFD -> composes
            (2, "a\x00b\x0bc\x7fd\x9fe"),     # controls stripped
            (3, "가"),              # jamo -> syllable
            (4, "plain"),                     # untouched
            (5, "tab\tand\nnewline kept"),    # \t \n survive
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in normalize_text(df).collect()}
    assert got[1].norm_text == "café" and got[1].changed
    assert got[1].n_controls_removed == 0
    assert got[2].norm_text == "abcde" and got[2].n_controls_removed == 4
    assert got[3].norm_text == "가" and got[3].changed
    assert not got[4].changed and got[4].n_controls_removed == 0
    assert got[5].norm_text == "tab\tand\nnewline kept" and not got[5].changed


def test_new_operators_null_and_empty_text(spark):
    """Null text behaves like empty text everywhere: every input doc
    yields exactly one output row with definite (non-null) values —
    explode-based plans must not silently drop documents."""
    from newspaper_spark.operators.filters import c4_filters
    from newspaper_spark.operators.normalize import normalize_text
    from newspaper_spark.operators.pii import pii_scrub
    from newspaper_spark.operators.span_dedup import span_dedup
    from newspaper_spark.operators.textstats import (
        repetition_stats,
        unigram_logprob,
    )

    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "ok text here")], "doc_id long, text string"
    )
    for fn in (pii_scrub, repetition_stats, unigram_logprob, span_dedup,
               c4_filters, normalize_text):
        rows = fn(df).collect()
        assert len(rows) == 3, f"{fn.__name__} dropped rows: {len(rows)}"
        for r in rows:
            for field, v in r.asDict().items():
                assert v is not None, f"{fn.__name__} doc {r[0]}: {field} is null"
    s = {r.doc_id: r for r in span_dedup(df).collect()}
    assert (s[1].cleaned_text, s[1].n_sentences, s[1].n_removed) == ("", 0, 0)


def test_pack_offsets_prefix_sum_and_spans(spark):
    """Distributed prefix sum must equal the sequential one regardless
    of partitioning, and span math must handle boundary crossings and
    empty docs."""
    from newspaper_spark.operators.packing import pack_offsets

    rows = [(i, (i * 37) % 150) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long").repartition(7)
    got = {r.doc_id: r for r in pack_offsets(df, seq_len=64, num_partitions=5).collect()}
    assert len(got) == 200

    off = 0
    for i, n in rows:
        r = got[i]
        assert r.offset == off, f"doc {i}: {r.offset} != {off}"
        assert r.start_seq == off // 64
        assert r.start_pos == off % 64
        if n > 0:
            assert r.n_seqs == (off + n - 1) // 64 - off // 64 + 1
        else:
            assert r.n_seqs == 0
        off += n


def test_add_nlp_fused_udf_matches_unfused(spark):
    """The fused _nlp_batch must be row-identical to the two original
    single-column UDFs (keywords_udf / summary_udf) — including the
    fallback paths: null/empty title, null/empty text, no-terminator
    single-sentence text, and multi-sentence prose."""
    from newspaper_spark.operators.nlp_ops import (
        add_nlp,
        keywords_udf,
        summary_udf,
    )

    rows = [
        (0, "A Title", "First sentence is long enough here. Second one "
            "follows with more words. Third sentence closes it out."),
        (1, None, "Text with a title missing entirely from this row."),
        (2, "Title only", None),
        (3, "", ""),
        (4, "T", "no terminators at all just one run of words " * 8),
        (5, "Dr. Smith", "Dr. Smith spoke at 3 p.m. about results. "
            "The audience, i.e. students, listened closely."),
    ]
    df = spark.createDataFrame(rows, "id long, title string, text string")

    fused = {
        r.id: (r.keywords, r.summary) for r in add_nlp(df).collect()
    }
    unfused = {
        r.id: (r.keywords, r.summary)
        for r in df.withColumns(
            {
                "keywords": keywords_udf(F.col("text"), F.lit("en")),
                "summary": summary_udf(
                    F.col("title"), F.col("text"), F.lit("en")
                ),
            }
        ).collect()
    }
    assert fused == unfused


def test_packing_adaptive_width_is_output_identical(spark):
    """num_partitions=None (scale-adaptive: conf-derived range width +
    AQE coalescing) must be bit-identical to any explicit width — the
    prefix sum's partitioning-invariance through the adaptive path."""
    from newspaper_spark.operators.packing import pack_offsets, shard_assign

    rows = [(i, (i * 37) % 150) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long").repartition(7)

    fixed = sorted(pack_offsets(df, seq_len=64, num_partitions=5).collect())
    auto = sorted(pack_offsets(df, seq_len=64).collect())
    assert auto == fixed

    fixed_s = sorted(shard_assign(df, shard_tokens=512, num_partitions=8).collect())
    auto_s = sorted(shard_assign(df, shard_tokens=512).collect())
    assert auto_s == fixed_s


def test_span_dedup_matches_python_model(spark):
    """Operator vs an independent sequential model on random small-
    alphabet corpora (heavy span collisions, including overlapping and
    adjacent duplicate spans within one doc)."""
    import random
    from collections import defaultdict

    from newspaper_spark.operators.span_dedup import span_dedup

    def model(rows, span=3):
        sent = {
            i: [s for s in (x.strip() for x in t.split(".")) if s]
            for i, t in rows
        }
        occ = defaultdict(list)
        for i in sorted(sent):
            ss = sent[i]
            for j in range(len(ss) - span + 1):
                occ[tuple(ss[j : j + span])].append((i, j))
        removed = defaultdict(set)
        for occs in occ.values():
            if len(occs) > 1:
                for i, j in occs[1:]:
                    removed[i].update(range(j, j + span))
        return {
            i: (
                ". ".join(s for k, s in enumerate(ss) if k not in removed[i]),
                len(ss),
                len(removed[i] & set(range(len(ss)))),
            )
            for i, ss in sent.items()
        }

    for seed in range(5):
        rng = random.Random(seed)
        words = ["aa", "bb", "cc"]
        rows = [
            (
                i,
                ". ".join(
                    " ".join(rng.choices(words, k=rng.randint(1, 2)))
                    for _ in range(rng.randint(0, 8))
                ),
            )
            for i in range(rng.randint(3, 7))
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r.doc_id: (r.cleaned_text, r.n_sentences, r.n_removed)
            for r in span_dedup(df, span=3).collect()
        }
        assert got == model(rows), f"seed {seed}: {got} != {model(rows)}"


def test_paragraph_dedup_matches_python_model(spark):
    """paragraph_dedup (span=1, newline separator) vs an independent
    sequential model on random small-alphabet corpora with heavy
    cross-doc paragraph collisions."""
    import random
    from collections import defaultdict

    from newspaper_spark.operators.span_dedup import paragraph_dedup

    def model(rows):
        paras = {
            i: [p for p in (x.strip() for x in t.split("\n")) if p]
            for i, t in rows
        }
        occ = defaultdict(list)
        for i in sorted(paras):
            for j, p in enumerate(paras[i]):
                occ[p].append((i, j))
        removed = defaultdict(set)
        for occs in occ.values():
            if len(occs) > 1:
                for i, j in occs[1:]:
                    removed[i].add(j)
        return {
            i: (
                "\n".join(p for k, p in enumerate(ps) if k not in removed[i]),
                len(ps),
                len(removed[i]),
            )
            for i, ps in paras.items()
        }

    for seed in range(5):
        rng = random.Random(100 + seed)
        paras_pool = ["alpha beta", "gamma", "delta epsilon", "zeta"]
        rows = [
            (
                i,
                "\n".join(
                    rng.choice(paras_pool) for _ in range(rng.randint(0, 6))
                ),
            )
            for i in range(rng.randint(3, 7))
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r.doc_id: (r.cleaned_text, r.n_sentences, r.n_removed)
            for r in paragraph_dedup(df).collect()
        }
        assert got == model(rows), f"seed {seed}"


def test_url_blocklist_matches_python_model(spark):
    """url_blocklist_filter vs a direct suffix-set model over random
    multi-label hosts."""
    import random
    from urllib.parse import urlparse

    from newspaper_spark.operators.urlops import url_blocklist_filter

    labels = ["a", "bb", "news", "cdn"]
    tlds = ["com", "net", "org"]
    rng = random.Random(42)
    rows = []
    for i in range(60):
        host = ".".join(
            rng.choices(labels, k=rng.randint(1, 3)) + [rng.choice(tlds)]
        )
        rows.append((i, f"http://{host}/p{i}"))
    blocklist = ["bb.com", "news.cdn.net", "org"]

    def model(url):
        host = urlparse(url).hostname
        parts = host.split(".")
        sufs = {".".join(parts[i:]) for i in range(len(parts))}
        hits = sorted(s for s in blocklist if s in sufs)
        return (bool(hits), hits[0] if hits else None)

    df = spark.createDataFrame(rows, "doc_id long, url string")
    got = {
        r.doc_id: (r.blocked, r.blocked_domain)
        for r in url_blocklist_filter(df, blocklist).collect()
    }
    want = {i: model(u) for i, u in rows}
    assert got == want


def test_tfidf_topk_hand_computed(spark):
    import math

    from newspaper_spark.operators.textstats import tfidf_topk

    # 3 docs; "rare" appears only in doc 1, "common" in all three
    df = spark.createDataFrame(
        [
            (1, "common rare common"),
            (2, "common word word"),
            (3, "common common other"),
        ],
        "doc_id long, text string",
    )
    rows = tfidf_topk(df, k=2).collect()
    got = {(r.doc_id, r.rank): (r.term, r.tfidf) for r in rows}

    def score(cnt, ntok, df_, n_docs=3):
        return math.floor(
            (cnt / ntok) * math.log10((n_docs + 1) / (df_ + 1)) * 1e6 + 0.5
        ) / 1e6

    # doc 1: rare (1/3, df=1) beats common (2/3, df=3)
    assert got[(1, 1)] == ("rare", score(1, 3, 1))
    assert got[(1, 2)] == ("common", score(2, 3, 3))
    # doc 2: word (2/3, df=1) far ahead
    assert got[(2, 1)] == ("word", score(2, 3, 1))
    # every doc has exactly 2 ranked rows and ranks are 1..2
    assert sorted(k for k in got) == [(d, r) for d in (1, 2, 3) for r in (1, 2)]


def test_source_mix_allocation(spark):
    from newspaper_spark.operators.sampling import source_mix

    # srcA: 1000 tokens w=1, srcB: 200 tokens w=2, srcC: 0 tokens w=1
    rows = (
        [("srcA", 100, 1)] * 10
        + [("srcB", 100, 2)] * 2
        + [("srcC", 0, 1)]
    )
    df = spark.createDataFrame(rows, "source string, n_tokens long, weight long")
    got = {r.source: r for r in source_mix(df).collect()}

    # budget = 1200 // 2 = 600; tot_weight = 4
    a = got["srcA"]           # target = 600*1//4 = 150 of 1000 -> rate 0.15
    assert (a.tokens, a.target_tokens, a.expected_tokens) == (1000, 150, 150)
    assert a.rate == 0.15
    b = got["srcB"]           # target = 600*2//4 = 300 > 200 -> capped
    assert (b.tokens, b.target_tokens, b.expected_tokens) == (200, 300, 200)
    assert b.rate == 1.0
    c = got["srcC"]           # empty source: rate 0, nothing expected
    assert (c.tokens, c.rate, c.expected_tokens) == (0, 0.0, 0)


def test_token_counting_cross_engine_parity(spark):
    """Spark vs DuckDB on the ws/BPE token-count expressions over
    adversarial whitespace and unicode — the exact divergence class
    that made bpe_tokens the round-2 red driver row (Java \\s has
    \\x0B, RE2 \\s doesn't; engines disagree on odd codepoints in
    negated classes)."""
    import duckdb

    from newspaper_spark.operators.textstats import (
        bpe_ish_token_count_col,
        token_count_col,
    )
    import pyspark.sql.functions as F

    nasty = [
        "plain words here",
        "vt\x0bsplit and\ttab",
        "nbsp glue",                 # U+00A0 is NOT in WS_CLASS
        "line sep para",        # unicode separators: not ws
        "zwsp​word",
        "mixed  \t\n\f\r   runs",
        "", " ", "\x0b", "😀 emoji 🎉 tokens",
        "hyphen-ated and under_scored v1.2.3",
    ]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(nasty)], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_ws, r.n_bpe)
        for r in df.select(
            "doc_id",
            token_count_col(F.col("text")).alias("n_ws"),
            bpe_ish_token_count_col(F.col("text")).alias("n_bpe"),
        ).collect()
    }

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, ?)" for i in range(len(nasty)))
        + ") v(doc_id, text)",
        nasty,
    )
    oracle = con.execute(
        """
        SELECT doc_id,
               len(string_split(trim(regexp_replace(lower(text),
                   '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g')), ' ')),
               coalesce(list_sum(list_transform(
                   regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9 \\t\\n\\x0B\\f\\r]'),
                   x -> ceil(length(x) / 4.0)::BIGINT)), 0)::BIGINT
        FROM t
        """
    ).fetchall()
    for doc_id, n_ws, n_bpe in oracle:
        assert got[doc_id] == (n_ws, n_bpe), f"doc {doc_id}: {got[doc_id]} != {(n_ws, n_bpe)}"


def _encode_jpeg_baseline(comps_data, w, h, quant, subsample=False):
    """Minimal baseline-sequential JPEG ENCODER (test oracle for the
    decoder): forward orthonormal DCT, quantize (half-up), zigzag,
    DPCM+Huffman with simple uniform-length canonical tables, 0xFF00
    stuffing. comps_data = [plane] (gray) or [Y, Cb, Cr] full-res
    planes; subsample=True averages chroma 2×2 (Y sampled 2×2)."""
    import math
    import struct

    from newspaper_spark.operators.multimodal import _IDCT_A, _JPEG_ZIGZAG

    A = _IDCT_A

    def fdct(block):  # S(v,u) = Σx Σy A[v][y]·A[u][x]·f(x,y)
        out = [0.0] * 64
        for v in range(8):
            for u in range(8):
                s = 0.0
                for y in range(8):
                    for x in range(8):
                        s += A[v][y] * A[u][x] * (block[8 * y + x] - 128)
                out[8 * v + u] = s
        return out

    def quantize(coef):
        q = []
        for i in range(64):
            v = coef[i] / quant[i]
            q.append(math.floor(v + 0.5) if v >= 0 else -math.floor(-v + 0.5))
        return q

    # canonical tables: DC symbols 0..11 all length 4; AC symbols all
    # length 9 (162 of them fits: 162 < 2^9, Kraft-satisfiable)
    dc_syms = list(range(12))
    ac_syms = [0x00, 0xF0] + [
        (r << 4) | s for r in range(16) for s in range(1, 11)
    ]
    def canonical(symbols, length):
        return {sym: (i, length) for i, sym in enumerate(symbols)}

    dc_codes = canonical(dc_syms, 4)
    ac_codes = canonical(ac_syms, 9)

    bits = []

    def put(code, n):
        for k in range(n - 1, -1, -1):
            bits.append((code >> k) & 1)

    def emit_block(q, pred):
        diff = q[0] - pred
        size = abs(diff).bit_length()
        c, n = dc_codes[size]
        put(c, n)
        if size:
            put(diff if diff >= 0 else diff + (1 << size) - 1, size)
        zz = [q[_JPEG_ZIGZAG[i]] for i in range(64)]
        run = 0
        for k in range(1, 64):
            v = zz[k]
            if v == 0:
                run += 1
                continue
            while run > 15:
                c, n = ac_codes[0xF0]
                put(c, n)
                run -= 16
            size = abs(v).bit_length()
            c, n = ac_codes[(run << 4) | size]
            put(c, n)
            put(v if v >= 0 else v + (1 << size) - 1, size)
            run = 0
        if run:
            c, n = ac_codes[0x00]
            put(c, n)
        return q[0]

    nf = len(comps_data)
    if subsample:
        assert nf == 3
        samp = [(2, 2), (1, 1), (1, 1)]
        planes = [comps_data[0]]
        for p in comps_data[1:]:
            half = []
            for y in range(0, h, 2):
                row = []
                for x in range(0, w, 2):
                    vals = [
                        p[min(yy, h - 1)][min(xx, w - 1)]
                        for yy in (y, y + 1)
                        for xx in (x, x + 1)
                    ]
                    row.append(int(sum(vals) / 4 + 0.5))
                half.append(row)
            planes.append(half)
    else:
        samp = [(1, 1)] * nf
        planes = comps_data
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    preds = [0] * nf
    for my in range(mcuy):
        for mx in range(mcux):
            for ci in range(nf):
                hs, vs = samp[ci]
                plane = planes[ci]
                ph = len(plane)
                pw = len(plane[0])
                for by in range(vs):
                    for bx in range(hs):
                        block = []
                        for y in range(8):
                            for x in range(8):
                                yy = min((my * vs + by) * 8 + y, ph - 1)
                                xx = min((mx * hs + bx) * 8 + x, pw - 1)
                                block.append(plane[yy][xx])
                        q = quantize(fdct(block))
                        emit_block(q, preds[ci])
                        preds[ci] = q[0]
    # pad to byte boundary with 1-bits
    while len(bits) % 8:
        bits.append(1)
    data = bytearray()
    for i in range(0, len(bits), 8):
        byte = 0
        for b in bits[i : i + 8]:
            byte = (byte << 1) | b
        data.append(byte)
        if byte == 0xFF:
            data.append(0x00)

    def huff_segment(tc_th, length, symbols):
        counts = [0] * 16
        counts[length - 1] = len(symbols)
        return (
            b"\xff\xc4"
            + struct.pack(">H", 2 + 1 + 16 + len(symbols))
            + bytes([tc_th])
            + bytes(counts)
            + bytes(symbols)
        )

    out = bytearray(b"\xff\xd8")
    zz_quant = bytes(quant[_JPEG_ZIGZAG[i]] for i in range(64))
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + zz_quant
    sof = bytearray([8]) + struct.pack(">HH", h, w) + bytes([nf])
    for ci in range(nf):
        sof += bytes([ci + 1, (samp[ci][0] << 4) | samp[ci][1], 0])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    out += huff_segment(0x00, 4, dc_syms)
    out += huff_segment(0x10, 9, ac_syms)
    sos = bytearray([nf])
    for ci in range(nf):
        sos += bytes([ci + 1, 0x00])
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    out += data
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# coefficient-level JPEG stream builders (test oracles for the decoder):
# the SAME quantized-coefficient grids rendered as a baseline stream and
# as a progressive multi-scan stream must decode to identical pixels.
# ---------------------------------------------------------------------------

_T_DC_SYMS = list(range(12))
_T_AC_SYMS = (
    [0x00, 0xF0]
    + [(r << 4) | s for r in range(16) for s in range(1, 11)]
    + [(r << 4) for r in range(1, 15)]  # EOBn codes for progressive runs
)
_T_DC_CODES = {sym: (i, 4) for i, sym in enumerate(_T_DC_SYMS)}
_T_AC_CODES = {sym: (i, 9) for i, sym in enumerate(_T_AC_SYMS)}


def _t_huff_segments():
    import struct

    def seg(tc_th, length, symbols):
        counts = [0] * 16
        counts[length - 1] = len(symbols)
        return (
            b"\xff\xc4"
            + struct.pack(">H", 2 + 1 + 16 + len(symbols))
            + bytes([tc_th])
            + bytes(counts)
            + bytes(symbols)
        )

    return seg(0x00, 4, _T_DC_SYMS) + seg(0x10, 9, _T_AC_SYMS)


def _t_bits_to_bytes(bits):
    while len(bits) % 8:
        bits.append(1)
    data = bytearray()
    for i in range(0, len(bits), 8):
        byte = 0
        for b in bits[i : i + 8]:
            byte = (byte << 1) | b
        data.append(byte)
        if byte == 0xFF:
            data.append(0x00)
    return bytes(data)


def _t_put(bits, code, n):
    for k in range(n - 1, -1, -1):
        bits.append((code >> k) & 1)


def _t_coef_grids(planes, samp, quant):
    """Quantized-coefficient grids from full-res component planes
    (already subsampled per samp): grids[ci][by][bx] = [64] naturals."""
    import math

    from newspaper_spark.operators.multimodal import _IDCT_A

    A = _IDCT_A
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    ph = len(planes[0])
    pw = len(planes[0][0])
    mcux = (pw + 8 * hmax - 1) // (8 * hmax)
    mcuy = (ph + 8 * vmax - 1) // (8 * vmax)
    grids = []
    for ci, plane in enumerate(planes):
        hs, vs = samp[ci]
        wb, hb = mcux * hs, mcuy * vs
        cph = len(plane)
        cpw = len(plane[0])
        grid = []
        for by in range(hb):
            row = []
            for bx in range(wb):
                block = [
                    plane[min(by * 8 + y, cph - 1)][min(bx * 8 + x, cpw - 1)]
                    - 128
                    for y in range(8)
                    for x in range(8)
                ]
                coef = [0] * 64
                for v in range(8):
                    for u in range(8):
                        s = 0.0
                        for y in range(8):
                            for x in range(8):
                                s += A[v][y] * A[u][x] * block[8 * y + x]
                        q = s / quant[8 * v + u]
                        coef[8 * v + u] = (
                            math.floor(q + 0.5)
                            if q >= 0
                            else -math.floor(-q + 0.5)
                        )
                row.append(coef)
            grid.append(row)
        grids.append(grid)
    return grids, mcux, mcuy


def _t_headers(w, h, quant, samp, sof_marker):
    import struct

    from newspaper_spark.operators.multimodal import _JPEG_ZIGZAG

    nf = len(samp)
    out = bytearray(b"\xff\xd8")
    zz_quant = bytes(quant[_JPEG_ZIGZAG[i]] for i in range(64))
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + zz_quant
    sof = bytearray([8]) + struct.pack(">HH", h, w) + bytes([nf])
    for ci in range(nf):
        sof += bytes([ci + 1, (samp[ci][0] << 4) | samp[ci][1], 0])
    out += sof_marker + struct.pack(">H", 2 + len(sof)) + sof
    out += _t_huff_segments()
    return out


def _t_sos(scomp_ids, ss, se, ah, al):
    import struct

    sos = bytearray([len(scomp_ids)])
    for cid in scomp_ids:
        sos += bytes([cid, 0x00])
    sos += bytes([ss, se, (ah << 4) | al])
    return b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos


def _t_emit_val(bits, v, size):
    _t_put(bits, v if v >= 0 else v + (1 << size) - 1, size)


def _t_encode_baseline_from_coefs(grids, samp, w, h, quant):
    from newspaper_spark.operators.multimodal import _JPEG_ZIGZAG

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    bits = []
    preds = [0] * len(grids)
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, grid in enumerate(grids):
                hs, vs = samp[ci]
                for by in range(vs):
                    for bx in range(hs):
                        coef = grid[my * vs + by][mx * hs + bx]
                        diff = coef[0] - preds[ci]
                        preds[ci] = coef[0]
                        size = abs(diff).bit_length()
                        c, n = _T_DC_CODES[size]
                        _t_put(bits, c, n)
                        if size:
                            _t_emit_val(bits, diff, size)
                        zzv = [coef[_JPEG_ZIGZAG[i]] for i in range(64)]
                        run = 0
                        for k in range(1, 64):
                            v = zzv[k]
                            if v == 0:
                                run += 1
                                continue
                            while run > 15:
                                c, n = _T_AC_CODES[0xF0]
                                _t_put(bits, c, n)
                                run -= 16
                            size = abs(v).bit_length()
                            c, n = _T_AC_CODES[(run << 4) | size]
                            _t_put(bits, c, n)
                            _t_emit_val(bits, v, size)
                            run = 0
                        if run:
                            c, n = _T_AC_CODES[0x00]
                            _t_put(bits, c, n)
    return bytes(
        _t_headers(w, h, quant, samp, b"\xff\xc0")
        + _t_sos(list(range(1, len(grids) + 1)), 0, 63, 0, 0)
        + _t_bits_to_bytes(bits)
        + b"\xff\xd9"
    )


def _t_encode_progressive_from_coefs(grids, samp, w, h, quant, dri=0):
    """Multi-scan progressive stream: interleaved DC first (Al=1) +
    DC refinement, then per-component AC first (Al=1, EOB runs) and
    AC refinement (Al=0, libjpeg-faithful correction-bit buffering).
    ``dri`` > 0 inserts restart markers every dri MCUs in the DC scans
    (preds reset; byte-aligned RSTn cycle)."""
    import struct

    from newspaper_spark.operators.multimodal import _JPEG_ZIGZAG

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    nf = len(grids)
    out = bytearray(_t_headers(w, h, quant, samp, b"\xff\xc2"))
    if dri:
        out += b"\xff\xdd" + struct.pack(">H", 4) + struct.pack(">H", dri)

    def comp_blocks(ci):
        # non-interleaved AC scans cover the component's DATA blocks
        hs, vs = samp[ci]
        if nf == 1:
            wb, hb = mcux * hs, mcuy * vs
        else:
            cw = (w * hs + hmax - 1) // hmax
            ch = (h * vs + vmax - 1) // vmax
            wb, hb = (cw + 7) // 8, (ch + 7) // 8
        for by in range(hb):
            for bx in range(wb):
                yield grids[ci][by][bx]

    # ---- scans 1+2: DC first (Al=1) then DC refinement (Al=0), both
    # interleaved over MCUs, with optional restart markers every dri
    for scan_i in (0, 1):
        data = bytearray()
        bits = []
        preds = [0] * nf
        n_mcu = 0
        for my in range(mcuy):
            for mx in range(mcux):
                if dri and n_mcu and n_mcu % dri == 0:
                    data += _t_bits_to_bytes(bits)
                    bits = []
                    data += bytes([0xFF, 0xD0 + ((n_mcu // dri - 1) % 8)])
                    preds = [0] * nf
                for ci in range(nf):
                    hs, vs = samp[ci]
                    for by in range(vs):
                        for bx in range(hs):
                            coef = grids[ci][my * vs + by][mx * hs + bx]
                            if scan_i == 0:
                                val = coef[0] >> 1
                                diff = val - preds[ci]
                                preds[ci] = val
                                size = abs(diff).bit_length()
                                c, n = _T_DC_CODES[size]
                                _t_put(bits, c, n)
                                if size:
                                    _t_emit_val(bits, diff, size)
                            else:
                                bits.append(coef[0] & 1)
                n_mcu += 1
        data += _t_bits_to_bytes(bits)
        ah, al = (0, 1) if scan_i == 0 else (1, 0)
        out += _t_sos(list(range(1, nf + 1)), 0, 0, ah, al) + data
    if dri:
        # disable restarts for the AC scans below (DRI redefinition
        # between scans, T.81 B.2.4.4)
        out += b"\xff\xdd" + struct.pack(">H", 4) + struct.pack(">H", 0)
    # ---- per component: AC first (Al=1) then AC refinement (Al=0)
    for ci in range(nf):
        bits = []
        eobrun = 0

        def flush_eob():
            nonlocal eobrun
            if eobrun:
                r = eobrun.bit_length() - 1
                c, n = _T_AC_CODES[r << 4]
                _t_put(bits, c, n)
                if r:
                    _t_put(bits, eobrun - (1 << r), r)
                eobrun = 0

        for coef in comp_blocks(ci):
            zzv = [coef[_JPEG_ZIGZAG[i]] for i in range(64)]
            tv = [
                (v >> 1) if v >= 0 else -((-v) >> 1) for v in zzv
            ]  # point transform: magnitude shift
            nz = [k for k in range(1, 64) if tv[k] != 0]
            if not nz:
                eobrun += 1
                if eobrun == 0x7FFF:
                    flush_eob()
                continue
            flush_eob()
            run = 0
            for k in range(1, 64):
                v = tv[k]
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    c, n = _T_AC_CODES[0xF0]
                    _t_put(bits, c, n)
                    run -= 16
                size = abs(v).bit_length()
                c, n = _T_AC_CODES[(run << 4) | size]
                _t_put(bits, c, n)
                _t_emit_val(bits, v, size)
                run = 0
            if nz[-1] < 63:
                eobrun += 1
        flush_eob()
        out += _t_sos([ci + 1], 1, 63, 0, 1) + _t_bits_to_bytes(bits)

        # AC refinement: libjpeg encode_mcu_AC_refine, Ah=1 → Al=0
        bits = []
        eobrun = 0
        be_bits = []

        def flush_eob_refine():
            nonlocal eobrun
            if eobrun:
                r = eobrun.bit_length() - 1
                c, n = _T_AC_CODES[r << 4]
                _t_put(bits, c, n)
                if r:
                    _t_put(bits, eobrun - (1 << r), r)
                eobrun = 0
            bits.extend(be_bits)
            be_bits.clear()

        for coef in comp_blocks(ci):
            zzv = [coef[_JPEG_ZIGZAG[i]] for i in range(64)]
            absv = [abs(v) for v in zzv]  # Al = 0: |coef| >> 0
            eob_k = 0
            for k in range(1, 64):
                if absv[k] == 1:
                    eob_k = k
            r = 0
            br_bits = []
            emitted = False
            for k in range(1, 64):
                temp = absv[k]
                if temp == 0:
                    r += 1
                    continue
                while r > 15 and k <= eob_k:
                    flush_eob_refine()
                    c, n = _T_AC_CODES[0xF0]
                    _t_put(bits, c, n)
                    r -= 16
                    bits.extend(br_bits)
                    br_bits = []
                if temp > 1:
                    br_bits.append(temp & 1)
                    continue
                flush_eob_refine()
                c, n = _T_AC_CODES[(r << 4) | 1]
                _t_put(bits, c, n)
                bits.append(1 if zzv[k] >= 0 else 0)
                bits.extend(br_bits)
                br_bits = []
                r = 0
                emitted = True
            if r > 0 or br_bits:
                eobrun += 1
                be_bits.extend(br_bits)
                if eobrun == 0x7FFF:
                    flush_eob_refine()
            del emitted
        flush_eob_refine()
        out += _t_sos([ci + 1], 1, 63, 1, 0) + _t_bits_to_bytes(bits)

    out += b"\xff\xd9"
    return bytes(out)


def test_jpeg_decoder_roundtrip_gray():
    """Encode a deterministic 16×24 grayscale gradient with the test
    encoder (quant all-ones ⇒ only DCT/quant rounding), decode with the
    real decoder, compare pixel-by-pixel within the DCT rounding bound."""
    from newspaper_spark.operators.multimodal import _decode_jpeg, _raster_feature

    w, h = 16, 24
    plane = [[(x * 11 + y * 7 + (x * y) % 13) % 256 for x in range(w)]
             for y in range(h)]
    payload = _encode_jpeg_baseline([plane], w, h, [1] * 64)
    gw, gh, nf, feat = _decode_jpeg(payload)
    assert (gw, gh, nf) == (w, h, 1)
    # reconstruct the decoder's raster from the feature definition:
    # decode again via the public path to get identical feature math
    # and bound the error against the source plane
    # (re-derive pixels by decoding a second payload is pointless —
    # instead check the feature against the SOURCE plane within the
    # rounding bound: max per-pixel error ≤ 4 ⇒ band-mean error ≤ 4/255)
    src = bytes(plane[y][x] for y in range(h) for x in range(w))
    want = _raster_feature(src)
    for g, e in zip(feat, want):
        assert abs(g - e) <= 4.0 / 255.0


def test_jpeg_decoder_roundtrip_color_and_subsampled():
    """3-component YCbCr: solid-color image survives 2×2 chroma
    subsampling nearly exactly; an unsubsampled textured image decodes
    within the rounding bound."""
    from newspaper_spark.operators.multimodal import _decode_jpeg

    w, h = 16, 16
    # solid mid-tone color
    rgb = (180, 90, 40)
    r, g, b = rgb
    Y = [[int(0.299 * r + 0.587 * g + 0.114 * b + 0.5)] * w for _ in range(h)]
    Cb = [[int(-0.168736 * r - 0.331264 * g + 0.5 * b + 128 + 0.5)] * w
          for _ in range(h)]
    Cr = [[int(0.5 * r - 0.418688 * g - 0.081312 * b + 128 + 0.5)] * w
          for _ in range(h)]
    for subsample in (False, True):
        payload = _encode_jpeg_baseline([Y, Cb, Cr], w, h, [1] * 64,
                                        subsample=subsample)
        gw, gh, nf, feat = _decode_jpeg(payload)
        assert (gw, gh, nf) == (w, h, 1)
        # solid color ⇒ every band mean is mean(R,G,B-ish triplets);
        # allow the convert+DCT rounding budget
        expect = (r + g + b) / (3 * 255.0)
        for f in feat:
            assert abs(f - expect) < 6.0 / 255.0


def test_jpeg_progressive_equals_baseline_gray():
    """The SAME quantized coefficients rendered as a baseline stream
    and as a 4-scan progressive stream (DC first/refine + AC first
    with EOB runs / AC refine with correction bits) must decode to
    IDENTICAL pixels — the two entropy paths share one IDCT."""
    from newspaper_spark.operators.multimodal import (
        _decode_jpeg,
        _jpeg_sof_marker,
    )

    w, h = 24, 16
    plane = [[(x * 11 + y * 7 + (x * y) % 13) % 256 for x in range(w)]
             for y in range(h)]
    quant = [1] * 64
    grids, _, _ = _t_coef_grids([plane], [(1, 1)], quant)
    base = _t_encode_baseline_from_coefs(grids, [(1, 1)], w, h, quant)
    prog = _t_encode_progressive_from_coefs(grids, [(1, 1)], w, h, quant)
    assert _jpeg_sof_marker(base) == 0xC0
    assert _jpeg_sof_marker(prog) == 0xC2
    assert _decode_jpeg(prog) == _decode_jpeg(base)


def test_jpeg_progressive_equals_baseline_color_subsampled():
    """3-component YCbCr with 2×2-subsampled chroma: interleaved DC
    scans + per-component non-interleaved AC scans over the DATA block
    grid (not the MCU-padded grid) must equal the baseline decode."""
    from newspaper_spark.operators.multimodal import _decode_jpeg

    w, h = 20, 12  # non-multiple of 16: exercises MCU padding blocks
    Y = [[(x * 9 + y * 5) % 256 for x in range(w)] for y in range(h)]
    cw, ch = (w + 1) // 2, (h + 1) // 2
    Cb = [[(x * 3 + y * 13 + 40) % 256 for x in range(cw)] for y in range(ch)]
    Cr = [[(x * 7 + y * 2 + 90) % 256 for x in range(cw)] for y in range(ch)]
    quant = [1] * 64
    samp = [(2, 2), (1, 1), (1, 1)]
    grids, _, _ = _t_coef_grids([Y, Cb, Cr], samp, quant)
    base = _t_encode_baseline_from_coefs(grids, samp, w, h, quant)
    prog = _t_encode_progressive_from_coefs(grids, samp, w, h, quant)
    assert _decode_jpeg(prog) == _decode_jpeg(base)


def test_jpeg_progressive_eobrun_zrl_and_negatives():
    """Hand-picked coefficient grids hitting the tricky paths: EOB runs
    spanning several all-zero blocks, a >16-zero gap (ZRL) inside the
    refinement scan, and negative coefficients refined away from zero."""
    from newspaper_spark.operators.multimodal import _decode_jpeg

    w, h = 32, 8  # 4 blocks in a row
    def blk(**kv):
        c = [0] * 64
        for k, v in kv.items():
            c[int(k[1:])] = v
        return c

    grids = [[[
        blk(i0=10, i1=3, i8=-5, i41=2),   # i41: zigzag pos ~30, big gap
        blk(),                            # all-zero → EOB run
        blk(),                            # all-zero → extends run
        blk(i0=-7, i63=-1),               # negative DC; last-coef edge
    ]]]
    quant = [1] * 64
    samp = [(1, 1)]
    base = _t_encode_baseline_from_coefs(grids, samp, w, h, quant)
    prog = _t_encode_progressive_from_coefs(grids, samp, w, h, quant)
    assert _decode_jpeg(prog) == _decode_jpeg(base)


def test_jpeg_progressive_with_restart_markers():
    """DRI in a progressive stream: DC scans carry RSTn markers every 2
    MCUs (pred resets, byte-aligned), AC scans follow a DRI=0
    redefinition — decode must equal the restart-free encoding."""
    from newspaper_spark.operators.multimodal import _decode_jpeg

    w, h = 48, 8  # 6 MCUs in a row → markers RST0, RST1 at MCUs 2, 4
    plane = [[(x * 5 + y * 17) % 256 for x in range(w)] for y in range(h)]
    quant = [1] * 64
    grids, _, _ = _t_coef_grids([plane], [(1, 1)], quant)
    plain = _t_encode_progressive_from_coefs(grids, [(1, 1)], w, h, quant)
    with_rst = _t_encode_progressive_from_coefs(
        grids, [(1, 1)], w, h, quant, dri=2
    )
    assert b"\xff\xd0" in with_rst and with_rst != plain
    assert _decode_jpeg(with_rst) == _decode_jpeg(plain)


def _t_encode_seq_noninterleaved_from_coefs(grids, samp, w, h, quant, dri=0):
    """Baseline-class SEQUENTIAL stream with one single-component SOS
    per component (T.81 A.2.2 non-interleaved): blocks cover each
    component's DATA grid ceil(cw/8)×ceil(ch/8) in raster order (no
    MCU padding), full DC+AC per block, DC pred reset per scan; dri>0
    inserts RSTn every dri data units (the MCU of a non-interleaved
    scan is one block)."""
    import struct

    from newspaper_spark.operators.multimodal import _JPEG_ZIGZAG

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    nf = len(grids)
    out = bytearray(_t_headers(w, h, quant, samp, b"\xff\xc0"))
    if dri:
        out += b"\xff\xdd" + struct.pack(">H", 4) + struct.pack(">H", dri)
    for ci in range(nf):
        hs, vs = samp[ci]
        cw = (w * hs + hmax - 1) // hmax
        ch = (h * vs + vmax - 1) // vmax
        wb, hb = (cw + 7) // 8, (ch + 7) // 8
        out += _t_sos([ci + 1], 0, 63, 0, 0)
        data = bytearray()
        bits = []
        pred = 0
        n = 0
        n_rst = 0
        for by in range(hb):
            for bx in range(wb):
                if dri and n and n % dri == 0:
                    data += _t_bits_to_bytes(bits)
                    bits = []
                    data += bytes([0xFF, 0xD0 + (n_rst % 8)])
                    n_rst += 1
                    pred = 0
                coef = grids[ci][by][bx]
                diff = coef[0] - pred
                pred = coef[0]
                size = abs(diff).bit_length()
                c, nn = _T_DC_CODES[size]
                _t_put(bits, c, nn)
                if size:
                    _t_emit_val(bits, diff, size)
                zzv = [coef[_JPEG_ZIGZAG[i]] for i in range(64)]
                run = 0
                for k in range(1, 64):
                    v = zzv[k]
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        c, nn = _T_AC_CODES[0xF0]
                        _t_put(bits, c, nn)
                        run -= 16
                    size = abs(v).bit_length()
                    c, nn = _T_AC_CODES[(run << 4) | size]
                    _t_put(bits, c, nn)
                    _t_emit_val(bits, v, size)
                    run = 0
                if run:
                    c, nn = _T_AC_CODES[0x00]
                    _t_put(bits, c, nn)
                n += 1
        data += _t_bits_to_bytes(bits)
        out += data
    out += b"\xff\xd9"
    return bytes(out)


def test_jpeg_noninterleaved_sequential_equals_interleaved():
    """A 3-component 2×2-subsampled sequential stream emitted as three
    single-component scans (the per-component shape some encoders emit
    in baseline-class streams) must decode IDENTICALLY to its fully
    interleaved twin built from the same coefficient grids — including
    at non-multiple-of-16 dims where the interleaved twin codes MCU
    padding blocks the non-interleaved one legally omits."""
    from newspaper_spark.operators.multimodal import _decode_jpeg

    w, h = 20, 12  # MCU padding exercised on both axes
    Y = [[(x * 9 + y * 5) % 256 for x in range(w)] for y in range(h)]
    cw, ch = (w + 1) // 2, (h + 1) // 2
    Cb = [[(x * 3 + y * 13 + 40) % 256 for x in range(cw)] for y in range(ch)]
    Cr = [[(x * 7 + y * 2 + 90) % 256 for x in range(cw)] for y in range(ch)]
    quant = [1] * 64
    samp = [(2, 2), (1, 1), (1, 1)]
    grids, _, _ = _t_coef_grids([Y, Cb, Cr], samp, quant)
    inter = _t_encode_baseline_from_coefs(grids, samp, w, h, quant)
    noninter = _t_encode_seq_noninterleaved_from_coefs(grids, samp, w, h, quant)
    assert noninter.count(b"\xff\xda") == 3
    assert _decode_jpeg(noninter) == _decode_jpeg(inter)
    # unsubsampled 3-component variant too (all planes share the grid)
    samp1 = [(1, 1)] * 3
    CbF = [[(x * 3 + y * 13 + 40) % 256 for x in range(w)] for y in range(h)]
    CrF = [[(x * 7 + y * 2 + 90) % 256 for x in range(w)] for y in range(h)]
    g1, _, _ = _t_coef_grids([Y, CbF, CrF], samp1, quant)
    assert _decode_jpeg(
        _t_encode_seq_noninterleaved_from_coefs(g1, samp1, w, h, quant)
    ) == _decode_jpeg(_t_encode_baseline_from_coefs(g1, samp1, w, h, quant))


def test_jpeg_noninterleaved_with_restarts_and_errors():
    """Non-interleaved scans with DRI (restart counted per data unit,
    pred reset); plus the error contract: a 2-of-3-component scan and
    a stream missing one component's scan both raise ValueError."""
    import pytest

    from newspaper_spark.operators.multimodal import _decode_jpeg

    w, h = 20, 12
    Y = [[(x * 9 + y * 5) % 256 for x in range(w)] for y in range(h)]
    cw, ch = (w + 1) // 2, (h + 1) // 2
    Cb = [[(x * 3 + y * 13 + 40) % 256 for x in range(cw)] for y in range(ch)]
    Cr = [[(x * 7 + y * 2 + 90) % 256 for x in range(cw)] for y in range(ch)]
    quant = [1] * 64
    samp = [(2, 2), (1, 1), (1, 1)]
    grids, _, _ = _t_coef_grids([Y, Cb, Cr], samp, quant)
    plain = _t_encode_seq_noninterleaved_from_coefs(grids, samp, w, h, quant)
    with_rst = _t_encode_seq_noninterleaved_from_coefs(
        grids, samp, w, h, quant, dri=2
    )
    assert b"\xff\xd0" in with_rst and with_rst != plain
    assert _decode_jpeg(with_rst) == _decode_jpeg(plain)

    # 2-of-3-component scan: replace the first SOS (Ns=1, comp 1) with
    # an Ns=2 header — never emitted by mainstream encoders, must go to
    # the error channel, not decode garbage
    i = plain.index(b"\xff\xda")
    two_comp = (
        plain[:i] + _t_sos([1, 2], 0, 63, 0, 0) + plain[i + 10 :]
    )
    with pytest.raises(ValueError):
        _decode_jpeg(two_comp)

    # missing component scan: truncate after the second scan's data
    # (drop Cr's SOS + data) and close with EOI
    j = plain.index(b"\xff\xda", plain.index(b"\xff\xda", i + 2) + 2)
    missing = plain[:j] + b"\xff\xd9"
    with pytest.raises(ValueError):
        _decode_jpeg(missing)


def test_jpeg_single_component_with_2x2_factors():
    """T.81 A.2: an Ns=1 scan is NON-interleaved — a grayscale JPEG
    whose SOF declares H=V=2 (jpegtran-style grayscale output) lays
    blocks out in plain raster order, NOT 2×2-MCU order. Patching the
    SOF sampling byte must not change the decode."""
    from newspaper_spark.operators.multimodal import _decode_jpeg

    w, h = 24, 16  # 3×2 blocks: raster vs MCU order differ
    plane = [[(x * 11 + y * 7) % 256 for x in range(w)] for y in range(h)]
    quant = [1] * 64
    grids, _, _ = _t_coef_grids([plane], [(1, 1)], quant)
    base = bytearray(_t_encode_baseline_from_coefs(grids, [(1, 1)], w, h, quant))
    want = _decode_jpeg(bytes(base))
    i = base.index(b"\xff\xc0")
    assert base[i + 11] == 0x11  # component H/V byte
    base[i + 11] = 0x22
    assert _decode_jpeg(bytes(base)) == want
    # progressive too
    prog = bytearray(
        _t_encode_progressive_from_coefs(grids, [(1, 1)], w, h, quant)
    )
    wantp = _decode_jpeg(bytes(prog))
    j = prog.index(b"\xff\xc2")
    assert prog[j + 11] == 0x11
    prog[j + 11] = 0x22
    assert _decode_jpeg(bytes(prog)) == wantp
    assert wantp == want


def test_jpeg_fill_bytes_before_markers():
    """Legal 0xFF fill bytes before a marker (T.81 B.1.1.2) must not
    derail the decoder — probe/decoder agreement, the class of defect
    commit 8a30116 fixed for PPM."""
    from newspaper_spark.operators.multimodal import _decode_jpeg, _jpeg_dims

    w, h = 16, 8
    plane = [[(x * 3 + y * 9) % 256 for x in range(w)] for y in range(h)]
    quant = [1] * 64
    grids, _, _ = _t_coef_grids([plane], [(1, 1)], quant)
    payload = _t_encode_baseline_from_coefs(grids, [(1, 1)], w, h, quant)
    want = _decode_jpeg(payload)
    # inject a fill byte before the SOF marker and before the SOS marker
    stuffed = payload.replace(b"\xff\xc0", b"\xff\xff\xc0").replace(
        b"\xff\xda", b"\xff\xff\xff\xda"
    )
    assert len(stuffed) == len(payload) + 3
    assert _jpeg_dims(stuffed) == (w, h)
    assert _decode_jpeg(stuffed) == want


def test_jpeg_mutation_error_contract():
    """Bit-flipped VALID streams (reaching the deep entropy-decode
    paths random bytes never hit) either decode or raise ValueError —
    never KeyError/IndexError/hangs. A 4000-trial offline soak of this
    generator found zero violations; this keeps a 300-trial sentinel."""
    import random

    from newspaper_spark.operators.multimodal import _decode_image

    w, h = 24, 16
    plane = [[(x * 11 + y * 7) % 256 for x in range(w)] for y in range(h)]
    quant = [1] * 64
    grids, _, _ = _t_coef_grids([plane], [(1, 1)], quant)
    base = _t_encode_baseline_from_coefs(grids, [(1, 1)], w, h, quant)
    prog = _t_encode_progressive_from_coefs(grids, [(1, 1)], w, h, quant)
    rng = random.Random(7)
    for trial in range(300):
        src = bytearray(base if trial % 2 == 0 else prog)
        for _ in range(rng.randrange(1, 4)):
            i = rng.randrange(2, len(src))
            src[i] ^= 1 << rng.randrange(8)
        try:
            out = _decode_image(bytes(src), real_decode=True)
            assert out[0] > 0 and out[1] > 0 and len(out[3]) == 8
        except ValueError:
            pass


def test_jpeg_decoder_rejects_arithmetic_and_lossless():
    import pytest

    from newspaper_spark.operators.multimodal import _decode_jpeg

    w, h = 16, 16
    plane = [[100] * w for _ in range(h)]
    for sof in (0xC3, 0xC9, 0xCA):  # lossless / arithmetic variants
        payload = bytearray(_encode_jpeg_baseline([plane], w, h, [1] * 64))
        i = payload.index(b"\xff\xc0")
        payload[i + 1] = sof
        with pytest.raises(ValueError):
            _decode_jpeg(bytes(payload))


def test_jpeg_probe_and_decoder_agree_on_dims():
    from newspaper_spark.operators.multimodal import _decode_jpeg, _jpeg_dims

    w, h = 24, 16
    plane = [[(x * 3 + y * 5) % 256 for x in range(w)] for y in range(h)]
    payload = _encode_jpeg_baseline([plane], w, h, [1] * 64)
    assert _jpeg_dims(payload) == (w, h)
    gw, gh, _, _ = _decode_jpeg(payload)
    assert (gw, gh) == (w, h)


def test_jpeg_dc_only_restart_stream_exact():
    """The Column-assembled oracle shape: 16×16 grayscale, four DC-only
    blocks with byte-aligned custom Huffman codes and DRI=1 restarts.
    Decode must yield EXACTLY pixel = 128 + (d+4)//8 per block."""
    from newspaper_spark.operators.multimodal import _decode_jpeg, _raster_feature
    from newspaper_spark.operators.multimodal import jpeg_dc_gray_payload_hex  # noqa: F401

    ds = [130, 170, 201, 254]  # none ≡ 4 (mod 8)
    hexs = jpeg_dc_gray_payload_hex(*[f"{d:02X}" for d in ds])
    payload = bytes.fromhex(hexs)
    w, h, nf, feat = _decode_jpeg(payload)
    assert (w, h, nf) == (16, 16, 1)
    px = [128 + (d + 4) // 8 for d in ds]
    raster = bytearray()
    for row_pair in ((0, 1), (2, 3)):
        a, b = px[row_pair[0]], px[row_pair[1]]
        raster += bytes(([a] * 8 + [b] * 8) * 8)
    assert feat == _raster_feature(bytes(raster))

    # the PROGRESSIVE twin (SOF2, single DC scan, no AC scans) must
    # produce the identical decode through the other entropy path
    from newspaper_spark.operators.multimodal import (
        jpeg_dc_gray_progressive_hex,
    )

    prog = bytes.fromhex(
        jpeg_dc_gray_progressive_hex(*[f"{d:02X}" for d in ds])
    )
    assert _decode_jpeg(prog) == (w, h, nf, feat)


def test_gif_decoder_real():
    """Pure-stdlib GIF decode: hand-assembled GIF89a with a 4-color
    global palette and a clear-code-per-symbol LZW stream (the classic
    uncompressed-GIF encoding), checked against the expected
    palette-mapped raster feature."""
    import struct

    from newspaper_spark.operators.multimodal import (
        _decode_image,
        _raster_feature,
    )

    w, h = 5, 4
    palette = [(0, 0, 0), (255, 0, 0), (0, 255, 0), (0, 0, 255)]
    indices = [(x + y) % 4 for y in range(h) for x in range(w)]

    min_code = 2
    clear, end = 1 << min_code, (1 << min_code) + 1
    code_size = min_code + 1

    bits = []
    def emit(code):
        for k in range(code_size):
            bits.append((code >> k) & 1)

    emit(clear)
    for i in indices:
        emit(i)
        emit(clear)          # reset before the table ever grows
    emit(end)
    data = bytearray()
    for i in range(0, len(bits), 8):
        byte = 0
        for k, b in enumerate(bits[i : i + 8]):
            byte |= b << k
        data.append(byte)

    gif = bytearray()
    gif += b"GIF89a"
    gif += struct.pack("<HH", w, h)
    gif += bytes([0x80 | 0x01, 0, 0])        # GCT present, 2 bits → 4 colors
    for r, g, b in palette:
        gif += bytes([r, g, b])
    gif += b"\x21\xfe\x05hello\x00"          # comment extension (skipped)
    gif += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
    gif += bytes([min_code])
    for i in range(0, len(data), 255):
        block = data[i : i + 255]
        gif += bytes([len(block)]) + block
    gif += b"\x00\x3b"

    gw, gh, nf, feat = _decode_image(bytes(gif), real_decode=True)
    assert (gw, gh, nf) == (w, h, 1)
    expected = b"".join(bytes(palette[i]) for i in indices)
    assert feat == _raster_feature(expected)

    # interlaced variant: same pixels emitted in the GIF89a 4-pass row
    # order with the interlace flag set must decode to the SAME raster
    order = (list(range(0, h, 8)) + list(range(4, h, 8))
             + list(range(2, h, 4)) + list(range(1, h, 2)))
    ilace_indices = [indices[y * w + x] for y in order for x in range(w)]
    bits2 = []
    bits[:] = []
    emit(clear)
    for i in ilace_indices:
        emit(i)
        emit(clear)
    emit(end)
    bits2, bits[:] = bits[:], bits2
    data2 = bytearray()
    for i in range(0, len(bits2), 8):
        byte = 0
        for k, b in enumerate(bits2[i : i + 8]):
            byte |= b << k
        data2.append(byte)
    gif2 = bytearray(gif[: 6 + 7 + 12 + 9])  # header..comment ext
    gif2 += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x40"  # interlaced
    gif2 += bytes([min_code])
    for i in range(0, len(data2), 255):
        block = data2[i : i + 255]
        gif2 += bytes([len(block)]) + block
    gif2 += b"\x00\x3b"
    gw2, gh2, nf2, feat2 = _decode_image(bytes(gif2), real_decode=True)
    assert (gw2, gh2, nf2) == (w, h, 1)
    assert feat2 == _raster_feature(expected)


def test_probe_image_dims_headers():
    """Header-only dims for all five containers + JFIF segment walking
    + the documented error channel."""
    import struct

    import pytest

    from newspaper_spark.operators.multimodal import probe_image_dims

    def jpeg(w, h, with_app0=False):
        sof = (b"\xff\xc0" + struct.pack(">H", 17) + b"\x08"
               + struct.pack(">HH", h, w) + b"\x03"
               + b"\x01\x11\x00\x02\x11\x00\x03\x11\x00")
        app0 = (b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + bytes(9)
                if with_app0 else b"")
        return b"\xff\xd8" + app0 + sof + b"\xff\xd9"

    assert probe_image_dims(jpeg(640, 480)) == (640, 480, "jpeg")
    assert probe_image_dims(jpeg(31, 77, with_app0=True)) == (31, 77, "jpeg")
    assert probe_image_dims(
        b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR"
        + struct.pack(">IIBBBBB", 12, 7, 8, 2, 0, 0, 0) + bytes(4)
    ) == (12, 7, "png")
    assert probe_image_dims(
        b"GIF87a" + struct.pack("<HH", 300, 200) + bytes(3)
    ) == (300, 200, "gif")
    bmp = bytearray(54)
    bmp[:2] = b"BM"
    struct.pack_into("<ii", bmp, 18, 10, -20)       # top-down height
    assert probe_image_dims(bytes(bmp)) == (10, 20, "bmp")
    assert probe_image_dims(b"P6\n# c\n9 5\n255\n") == (9, 5, "ppm")

    for bad in (b"", b"RIFF....", b"\xff\xd8\xff\xd9", b"\xff\xd8\x00\x00"):
        with pytest.raises(ValueError):
            probe_image_dims(bad)


def test_review_fix_regressions(spark, tmp_path):
    """Round-3 second-review fixes: CSV newline records, zero-weight
    source_mix, JPEG fill bytes, probe/decoder PPM agreement."""
    import struct

    import pyspark.sql.functions as F
    import pytest

    from newspaper_spark.operators.multimodal import (
        _decode_ppm,
        probe_image_dims,
    )
    from newspaper_spark.operators.sampling import source_mix
    from newspaper_spark.sources.transcripts import read_transcripts

    # CSV: embedded newline must round-trip as ONE record
    rows = [("c1", 0, "user", "line one\nline two", "", None)]
    t = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    d = str(tmp_path / "csv")
    t.write.option("header", "true").csv(d)
    back = read_transcripts(spark, d, "csv").collect()
    assert len(back) == 1 and back[0].text == "line one\nline two"

    # source_mix: all-zero weights -> zero targets, no ANSI crash
    z = spark.createDataFrame(
        [("a", 10, 0), ("b", 5, 0)], "source string, n_tokens long, weight long"
    )
    out = {r.source: r for r in source_mix(z).collect()}
    assert all(r.target_tokens == 0 and r.rate == 0.0 for r in out.values())
    with pytest.raises(ValueError, match="budget_den"):
        source_mix(z, budget_den=0)

    # JPEG: 0xFF fill byte before SOF is legal
    sof = (b"\xff\xc0" + struct.pack(">H", 17) + b"\x08"
           + struct.pack(">HH", 7, 9) + b"\x03"
           + b"\x01\x11\x00\x02\x11\x00\x03\x11\x00")
    assert probe_image_dims(b"\xff\xd8\xff" + sof + b"\xff\xd9") == (9, 7, "jpeg")

    # probe and decoder must agree on PPM header strictness (\x0c is
    # NOT PPM whitespace)
    bad = b"P6\x0c9 5 255\n" + bytes(9 * 5 * 3)
    with pytest.raises(ValueError):
        probe_image_dims(bad)
    with pytest.raises(ValueError):
        _decode_ppm(bad)


def test_nb_quality_matches_python_model(spark):
    """nb_quality_scores vs an independent hashlib/math model of the
    exact NB arithmetic (md5 bucket hash, add-one smoothing, priors,
    unseen-bucket constant) — pins the classifier semantics
    independently of the DuckDB oracle, including held-out docs whose
    grams never appear in training."""
    import hashlib
    import math

    from newspaper_spark.operators.quality_nb import nb_quality_scores

    B = 64  # tight bucket count so collisions genuinely occur

    def bucket(gram):
        return int(hashlib.md5(gram.encode()).hexdigest()[:15], 16) % B

    def grams(text):
        t = text.lower().split(" ")
        return t + [f"{a} {b}" for a, b in zip(t, t[1:])]

    docs = {
        0: "the good quality article text flows well",
        1: "buy now click here spam spam buy",
        2: "the article reads well and flows",
        3: "click buy click buy now",
        4: "a completely novel heldout document zzz qqq",
        5: "the good article",
    }
    labels = {0: True, 1: False, 2: True, 3: False}  # 4,5 held out

    # python model
    cb = {}
    for i, pos in labels.items():
        for g in grams(docs[i]):
            b = bucket(g)
            c = cb.setdefault(b, [0, 0])
            c[0 if pos else 1] += 1
    n_p = sum(v[0] for v in cb.values())
    n_n = sum(v[1] for v in cb.values())
    d_p = sum(1 for v in labels.values() if v)
    d_n = sum(1 for v in labels.values() if not v)
    prior = math.log10(d_p / d_n)
    lr0 = math.log10((n_n + B) / (n_p + B))

    def score(text):
        ks = {}
        for g in grams(text):
            ks[bucket(g)] = ks.get(bucket(g), 0) + 1
        s = 0.0
        for b, k in ks.items():
            if b in cb:
                c_p, c_n = cb[b]
                s += k * math.log10(
                    ((c_p + 1) * (n_n + B)) / ((c_n + 1) * (n_p + B))
                )
            else:
                s += k * lr0
        v = math.floor((prior + s) * 1000000.0 + 0.5) / 1000000.0
        return sum(ks.values()), v, v > 0

    d = spark.createDataFrame(
        list(docs.items()), "doc_id long, text string"
    )
    lab = spark.createDataFrame(
        [(i, docs[i], p) for i, p in labels.items()],
        "doc_id long, text string, is_pos boolean",
    )
    got = {
        r.doc_id: r
        for r in nb_quality_scores(d, lab, n_buckets=B).collect()
    }
    assert len(got) == len(docs)
    for i, text in docs.items():
        n_feats, logodds, pred = score(text)
        assert got[i].n_feats == n_feats, i
        assert abs(got[i].nb_logodds - logodds) < 1e-9, (i, got[i], logodds)
        assert got[i].pred_hq == pred, i
    # sanity: the training docs classify to their own labels
    for i, pos in labels.items():
        assert got[i].pred_hq == pos, (i, got[i])


def test_grouped_unigram_logprob_and_buckets_equal_per_slice(spark):
    """group_col semantics: running unigram_logprob / quality_buckets
    with group_col must equal running the ungrouped versions on each
    group slice independently (same scores, same bucket labels)."""
    from newspaper_spark.operators.textstats import (
        quality_buckets,
        unigram_logprob,
    )

    rows = [
        (i, "en" if i % 2 == 0 else "fr",
         " ".join(f"w{(i * 7 + j) % 13}" for j in range(5 + i % 4)))
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")

    grouped = {
        r.doc_id: r
        for r in unigram_logprob(df, group_col="lang").collect()
    }
    assert len(grouped) == 40
    for lang in ("en", "fr"):
        sliced = {
            r.doc_id: r
            for r in unigram_logprob(
                df.filter(F.col("lang") == lang)
            ).collect()
        }
        for i, r in sliced.items():
            assert grouped[i].lang == lang
            assert grouped[i].n_tokens == r.n_tokens
            assert grouped[i].mean_logprob == r.mean_logprob, i

    scores = unigram_logprob(df, group_col="lang")
    gb = {
        r.doc_id: r
        for r in quality_buckets(
            scores, score_col="mean_logprob", group_col="lang"
        ).collect()
    }
    assert len(gb) == 40
    for lang in ("en", "fr"):
        sl = {
            r.doc_id: r
            for r in quality_buckets(
                scores.filter(F.col("lang") == lang),
                score_col="mean_logprob",
            ).collect()
        }
        for i, r in sl.items():
            assert gb[i].lang == lang
            assert gb[i].score_bin == r.score_bin
            assert gb[i].bucket == r.bucket, i
    # per-group terciles actually differ from the corpus-wide cut for
    # at least one doc (the grouping is load-bearing in this fixture)
    corpus = {
        r.doc_id: r.bucket
        for r in quality_buckets(scores, score_col="mean_logprob").collect()
    }
    assert any(gb[i].bucket != corpus[i] for i in corpus)


def test_bm25_topk_semantics(spark):
    """bm25_topk: ranking follows tf and length normalization, rare
    terms beat common ones, k caps per query, max_df drops stop-
    frequency terms, unmatched queries yield nothing, and the model
    matches an independent float BM25 computed in Python."""
    import math

    from newspaper_spark.operators.bm25 import bm25_topk

    corpus = [
        (1, "apple banana apple cherry"),
        (2, "apple banana"),
        (3, "banana cherry banana cherry"),
        (4, "zebra quokka xylophone unique"),
        (5, "the the the the the the the the"),
        (6, ""),
    ]
    docs = spark.createDataFrame(corpus, "doc_id long, text string")
    queries = spark.createDataFrame(
        [(100, "apple"), (200, "zebra unique"), (300, "missingterm")],
        "query_id long, query_text string",
    )
    out = bm25_topk(docs, queries, k=5).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    for rows in by_q.values():
        rows.sort(key=lambda r: r.rank)

    # q100: only docs 1 and 2 contain 'apple'; doc 1 (tf=2) outranks
    assert [r.doc_id for r in by_q[100]] == [1, 2]
    assert [r.rank for r in by_q[100]] == [1, 2]
    # q200: doc 4 matches both rare terms
    assert [r.doc_id for r in by_q[200]] == [4]
    assert by_q[200][0].n_terms_matched == 2
    # q300: term absent from the corpus → no candidates at all
    assert 300 not in by_q

    # independent model check (float BM25, same tokenization)
    toks = {d: t.split(" ") if t else [""] for d, t in corpus}
    N = len(corpus)
    avgdl = sum(len(v) for v in toks.values()) / N

    def ref_score(terms, d):
        s = 0.0
        for t in set(terms):
            df = sum(1 for v in toks.values() if t in v)
            tf = toks[d].count(t)
            if tf == 0 or df == 0:
                continue
            idf = math.log10((N - df + 0.5) / (df + 0.5))
            w = tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * len(toks[d]) / avgdl))
            s += idf * w
        return s

    for r in by_q[100] + by_q[200]:
        q_terms = {100: ["apple"], 200: ["zebra", "unique"]}[r.query_id]
        assert abs(r.bm25 - ref_score(q_terms, r.doc_id)) < 1e-5, r

    # k cap
    top1 = bm25_topk(docs, queries, k=1).collect()
    assert all(r.rank == 1 for r in top1)
    assert {r.query_id for r in top1} == {100, 200}

    # max_df: 'banana' appears in 3 docs → dropped at max_df=2
    qb = spark.createDataFrame(
        [(1, "banana")], "query_id long, query_text string"
    )
    assert bm25_topk(docs, qb, k=5, max_df=2).count() == 0
    assert bm25_topk(docs, qb, k=5, max_df=3).count() == 3


def test_parse_sitemaps_kinds_errors_and_cap(spark):
    """parse_sitemaps: urlset rows in document order with literal-text
    fields, sitemapindex rows (kind='index'), and every error channel
    — DTD rejection BEFORE parse, malformed XML, non-sitemap root,
    empty set, and the protocol's 50,000-entry cap (rejected, never
    silently truncated)."""
    from newspaper_spark.operators.feeds import parse_sitemaps

    ns = "http://www.sitemaps.org/schemas/sitemap/0.9"
    urlset = (
        f'<urlset xmlns="{ns}">'
        "<url><loc>http://a.com/1</loc><lastmod>2026-02-01</lastmod>"
        "<changefreq>daily</changefreq><priority>0.8</priority></url>"
        "<url><loc>http://a.com/2</loc></url>"
        "</urlset>"
    )
    index = (
        f'<sitemapindex xmlns="{ns}">'
        "<sitemap><loc>http://a.com/sitemap1.xml</loc>"
        "<lastmod>2026-01-01</lastmod></sitemap>"
        "</sitemapindex>"
    )
    over_cap = (
        f'<urlset xmlns="{ns}">'
        + "<url><loc>http://a.com/x</loc></url>" * 50_001
        + "</urlset>"
    )
    rows = [
        (0, urlset),
        (1, index),
        (2, '<!DOCTYPE urlset [<!ENTITY x "y">]>' + urlset),
        (3, "<urlset><url></url"),                  # malformed
        (4, "<rss><channel/></rss>"),               # wrong root
        (5, f'<urlset xmlns="{ns}"></urlset>'),     # empty
        (6, over_cap),
    ]
    df = spark.createDataFrame(rows, "site_id long, xml string")
    out = {
        (r.site_id, r.entry_idx): r
        for r in parse_sitemaps(df).collect()
    }
    assert out[(0, 0)].kind == "urlset"
    assert out[(0, 0)].loc == "http://a.com/1"
    assert out[(0, 0)].lastmod == "2026-02-01"
    assert out[(0, 0)].priority == "0.8"
    assert out[(0, 1)].loc == "http://a.com/2"
    assert out[(0, 1)].lastmod is None
    assert out[(1, 0)].kind == "index"
    assert out[(1, 0)].loc == "http://a.com/sitemap1.xml"
    assert out[(2, None)].error == "dtd-rejected"
    assert out[(3, None)].error == "malformed-xml"
    assert out[(4, None)].error == "not-a-sitemap"
    assert out[(5, None)].error == "empty" and out[(5, None)].kind == "urlset"
    assert out[(6, None)].error == "too-many-entries"
    assert len(out) == 8  # 2 urlset + 1 index + 5 single-verdict rows


def test_parse_sitemaps_null_xml_lands_in_error_channel(spark):
    """ADVICE r6: a NULL xml value used to pass the DOCTYPE substring
    check as the string 'None' and then kill the executor task with a
    TypeError from ET.fromstring(None) — it must land in the promised
    error channel like any other malformed input."""
    from newspaper_spark.operators.feeds import parse_sitemaps

    df = spark.createDataFrame(
        [(0, None), (1, "<not-xml")], "site_id long, xml string"
    )
    out = {r.site_id: r for r in parse_sitemaps(df).collect()}
    assert out[0].error == "malformed-xml" and out[0].loc is None
    assert out[1].error == "malformed-xml"


def test_streaming_sitemap_parse_batch_equal(spark, tmp_path):
    """parse_sitemaps is stateless map-only, so it must run unchanged
    on an availableNow stream (the crawl-discovery side of a streaming
    crawl loop) and produce bit-for-bit the batch parse, including the
    dtd-rejected error row."""
    from newspaper_spark.operators.feeds import parse_sitemaps

    ns = "http://www.sitemaps.org/schemas/sitemap/0.9"
    rows = [
        (
            i,
            f'<urlset xmlns="{ns}">'
            + "".join(
                f"<url><loc>http://h{i}.com/p{j}</loc></url>" for j in range(3)
            )
            + "</urlset>",
        )
        for i in range(4)
    ] + [(4, "<!DOCTYPE urlset><urlset/>")]
    in_dir, out_dir, ckpt = (
        str(tmp_path / d) for d in ("in", "out", "ckpt")
    )
    spark.createDataFrame(rows, "site_id long, xml string").write.parquet(in_dir)
    stream = spark.readStream.schema("site_id long, xml string").parquet(in_dir)
    parsed = parse_sitemaps(stream)
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
    key = lambda r: (r.site_id, r.entry_idx, r.loc, r.error)  # noqa: E731
    streamed = sorted(key(r) for r in spark.read.parquet(out_dir).collect())
    batch = sorted(
        key(r)
        for r in parse_sitemaps(spark.read.parquet(in_dir)).collect()
    )
    assert streamed == batch
    assert len(streamed) == 4 * 3 + 1
    assert any(e == "dtd-rejected" for (_, _, _, e) in streamed)


def test_pagerank_int_matches_python_model(spark):
    """pagerank_int vs an independent dict-based integer model on
    random digraphs (self-loops and duplicate edges in the input,
    sink nodes, disconnected pairs) — pins the scaled-integer
    recurrence, the no-dangling-redistribution semantics, and the
    out_degree-0 sink behavior independently of the DuckDB oracle."""
    import random

    from newspaper_spark.operators.graph import pagerank_int

    def model(edge_list, iters, scale=1_000_000):
        e = sorted({(s, d) for s, d in edge_list})
        nodes = {s for s, _ in e} | {d for _, d in e}
        od = {}
        for s, _ in e:
            od[s] = od.get(s, 0) + 1
        r = {v: scale for v in nodes}
        base = (15 * scale) // 100
        for _ in range(iters):
            inflow = {v: 0 for v in nodes}
            for s, d in e:
                inflow[d] += ((r[s] // od[s]) * 85) // 100
            r = {v: base + inflow[v] for v in nodes}
        return {v: (od.get(v, 0), r[v]) for v in nodes}

    for seed in range(4):
        rng = random.Random(900 + seed)
        n = rng.randint(5, 12)
        edges = [
            (rng.randrange(n), rng.randrange(n))
            for _ in range(rng.randint(4, 25))
        ]
        # ensure at least one sink: strip node 0's outgoing edges
        edges = [(s, d) for s, d in edges if s != 0] + [(1, 0)]
        df = spark.createDataFrame(edges, "src long, dst long")
        got = {
            r.node: (r.out_degree, r.rank)
            for r in pagerank_int(df, iterations=3).collect()
        }
        assert got == model(edges, 3), f"seed {seed}"


def test_kmv_distinct_matches_python_model(spark):
    """kmv_distinct vs an independent hashlib-based model: grouped
    and ungrouped, duplicated values, groups under k (exact path) and
    over k (estimator path); the estimate lands within the standard
    ~1/sqrt(k) KMV error band on the over-k group."""
    import hashlib

    from newspaper_spark.operators.dedup import kmv_distinct

    def h60(v):
        return int(hashlib.md5(v.encode()).hexdigest()[:15], 16)

    def model(pairs, k):
        groups = {}
        for g, v in pairs:
            groups.setdefault(g, set()).add(h60(v))
        out = {}
        for g, hs in groups.items():
            top = sorted(hs)[:k]
            n, kth = len(top), max(top)
            est = n if n < k else int((float(k - 1) * float(1 << 60)) / float(kth))
            out[g] = (n, kth, est)
        return out

    k = 16
    pairs = [("small", f"v{i % 7}") for i in range(30)] + [
        ("big", f"w{i}") for i in range(400)
    ]
    df = spark.createDataFrame(pairs, "g string, v string")
    got = {
        r.g: (r.n_hashes, r.kth_min_hash, r.est_distinct)
        for r in kmv_distinct(df, "v", group_col="g", k=k).collect()
    }
    assert got == model(pairs, k)
    assert got["small"] == (7, got["small"][1], 7)  # exact path
    est = got["big"][2]
    assert 400 * 0.5 < est < 400 * 2.0  # estimator path, sane band
    # ungrouped call covers the global branch
    (row,) = kmv_distinct(df, "v", k=k).collect()
    assert row.n_hashes == k and row.est_distinct == model(
        [("all", v) for _, v in pairs], k
    )["all"][2]


def test_cms_matches_python_model_and_never_underestimates(spark):
    """cms_counters/cms_estimate vs an independent hashlib model on a
    deliberately narrow sketch (width 16 → real collisions): counter
    cells exact, estimates exact, and est >= true count for EVERY
    value (the CMS one-sided error guarantee heavy_hitters relies on
    for zero false negatives)."""
    import hashlib

    from newspaper_spark.operators.sketches import cms_counters, cms_estimate

    def h60(v):
        return int(hashlib.md5(v.encode()).hexdigest()[:15], 16)

    depth, width = 3, 16
    vals = [f"v{i % 11}" for i in range(120)] + ["solo-a", "solo-b"]
    truth = {v: vals.count(v) for v in set(vals)}
    cells = {}
    for v in vals:
        for r in range(depth):
            c = h60(f"cms{r}:{v}") % width
            cells[(r, c)] = cells.get((r, c), 0) + 1
    model_est = {
        v: min(cells.get((r, h60(f"cms{r}:{v}") % width), 0) for r in range(depth))
        for v in set(vals)
    }

    df = spark.createDataFrame([(v,) for v in vals], "tok string")
    counters = cms_counters(df, "tok", depth, width)
    assert {(r.row, r.col): r.cnt for r in counters.collect()} == cells
    got = {
        r.tok: r.est
        for r in cms_estimate(
            counters, df.select("tok").distinct(), "tok", depth, width
        ).collect()
    }
    assert got == model_est
    assert all(got[v] >= truth[v] for v in truth)  # one-sided error
    # a value absent from the build stream estimates from untouched or
    # collided cells — still >= its true count of 0
    (miss,) = cms_estimate(
        counters, spark.createDataFrame([("absent",)], "tok string"),
        "tok", depth, width,
    ).collect()
    assert miss.est >= 0


def test_cms_heavy_hitters_threshold_forms(spark):
    """Integer threshold and single-row-DataFrame threshold produce
    identical heavy-hitter sets; exact_count is the true stream count
    and est_count >= exact_count everywhere."""
    from pyspark.sql import functions as F

    from newspaper_spark.operators.sketches import cms_heavy_hitters

    vals = ["hot"] * 50 + ["warm"] * 20 + [f"cold{i}" for i in range(30)]
    truth = {v: vals.count(v) for v in set(vals)}
    df = spark.createDataFrame([(v,) for v in vals], "tok string")

    by_int = {
        r.tok: (r.est_count, r.exact_count)
        for r in cms_heavy_hitters(df, "tok", 15, depth=3, width=32).collect()
    }
    thr = df.agg(F.expr("cast(count(*) div 6 as bigint)").alias("threshold"))
    by_df = {
        r.tok: (r.est_count, r.exact_count)
        for r in cms_heavy_hitters(df, "tok", thr, depth=3, width=32).collect()
    }
    # count(*)=100, div 6 = 16 vs int 15: same candidate set here (no
    # estimate lands on 15/16 exactly for this data — assert both ways)
    by_div = {
        r.tok: (r.est_count, r.exact_count)
        for r in cms_heavy_hitters(
            df, "tok", depth=3, width=32, total_div=6
        ).collect()
    }
    assert set(by_int) >= {"hot", "warm"}
    assert all(e >= x and x == truth[t] for t, (e, x) in by_int.items())
    assert all(e >= x and x == truth[t] for t, (e, x) in by_df.items())
    assert by_div == by_df  # total_div=6 IS the count(*) div 6 cutoff
    assert not any(t.startswith("cold") for t in by_int)

    import pytest as _pytest

    with _pytest.raises(ValueError):
        cms_heavy_hitters(df, "tok")  # neither threshold form
    with _pytest.raises(ValueError):
        cms_heavy_hitters(df, "tok", 15, total_div=6)  # both forms


def test_hll_distinct_matches_python_model(spark):
    """hll_distinct vs an independent hashlib/math model: grouped and
    ungrouped, duplicates collapse, small-range flag fires for tiny
    groups, raw estimate within the ~1.04/sqrt(m) band for the large
    group, and p outside the supported constants raises."""
    import hashlib
    import math

    import pytest as _pytest

    from newspaper_spark.operators.sketches import hll_distinct

    def model(values, p):
        m, rmax = 1 << p, 61 - p
        regs = {}
        for v in set(values):
            h = int(hashlib.md5(v.encode()).hexdigest()[:15], 16)
            b, rem = h >> (60 - p), h % (1 << (60 - p))
            rho = rmax if rem == 0 else rmax - rem.bit_length()
            regs[b] = max(regs.get(b, 0), rho)
        s = sum(1 << (rmax - r) for r in regs.values())
        s += (m - len(regs)) * (1 << rmax)
        alpha = {4: 0.673, 5: 0.697, 6: 0.709}[p]
        est = math.floor((alpha * float(m * m) * float(1 << rmax)) / float(s))
        return m - len(regs), s, est, (est <= 5 * m // 2 and len(regs) < m)

    pairs = [("small", f"v{i % 5}") for i in range(40)] + [
        ("big", f"w{i}") for i in range(600)
    ]
    df = spark.createDataFrame(pairs, "g string, v string")
    got = {
        r.g: (r.n_zero_buckets, r.sum_scaled, r.est_raw, r.small_range)
        for r in hll_distinct(df, "v", group_col="g", p=6).collect()
    }
    assert got["small"] == model([v for g, v in pairs if g == "small"], 6)
    assert got["big"] == model([v for g, v in pairs if g == "big"], 6)
    assert got["small"][3] is True  # 5 distinct « m=64 → flagged
    est_big = got["big"][2]
    assert 600 * 0.6 < est_big < 600 * 1.6  # ~3σ of 1.04/sqrt(64)
    (row,) = hll_distinct(df, "v", p=6).collect()
    assert (row.n_zero_buckets, row.sum_scaled, row.est_raw) == model(
        [v for _, v in pairs], 6
    )[:3]
    for p_bad in (3, 7, 10):
        with _pytest.raises(ValueError):
            hll_distinct(df, "v", p=p_bad)


def test_shard_assign_matches_python_model(spark):
    """shard_assign vs an independent hashlib model: md5 permutation
    key, exclusive prefix offsets in (key, id) order, greedy
    document-boundary shard rule, per-shard 0-based ranks. Plus the
    structural invariants: every shard's ranks are contiguous from 0,
    shard token sums stay under capacity + one document (the greedy
    overflow bound), and a different seed yields a different
    permutation of the same rows."""
    import hashlib

    from newspaper_spark.operators.packing import shard_assign

    def h60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    rows = [(i, 7 + (i * 13) % 90) for i in range(200)]  # (id, n_tokens)
    cap = 256

    def model(seed):
        keyed = sorted(
            ((h60(f"{seed}:{i}"), i, n) for i, n in rows)
        )
        out, off = {}, 0
        shard_rank = {}
        for k, i, n in keyed:
            sid = off // cap
            r = shard_rank.get(sid, 0)
            out[i] = (k, n, off, sid, r)
            shard_rank[sid] = r + 1
            off += n
        return out

    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    got = {
        r.doc_id: (
            r.shuffle_key, r.n_tokens, r.offset, r.shard_id, r.pos_in_shard
        )
        for r in shard_assign(
            df, shard_tokens=cap, seed="shard", num_partitions=8
        ).collect()
    }
    assert got == model("shard")

    # structural invariants
    by_shard = {}
    for i, (k, n, off, sid, r) in got.items():
        by_shard.setdefault(sid, []).append((r, n))
    max_doc = max(n for _, n in rows)
    for sid, members in by_shard.items():
        ranks = sorted(r for r, _ in members)
        assert ranks == list(range(len(members)))
        assert sum(n for _, n in members) < cap + max_doc

    other = {
        r.doc_id: r.offset
        for r in shard_assign(
            df, shard_tokens=cap, seed="epoch1", num_partitions=8
        ).collect()
    }
    assert other == {i: off for i, (_, _, off, _, _) in model("epoch1").items()}
    assert other != {i: off for i, (_, _, off, _, _) in got.items()}


def test_pmi_collocations_matches_python_model(spark):
    """pmi_collocations vs an independent math model: bigram-slot
    marginals (NOT raw-token counts), exact integer counts, 6dp
    floor-rounded log10 score, min_count cut, and the deterministic
    top-k boundary. Also the semantic point: a perfectly-associated
    planted pair outranks a higher-frequency promiscuous pair."""
    import math

    from newspaper_spark.operators.textstats import pmi_collocations

    docs = []
    for i in range(40):
        base = "alpha beta gamma delta " * 3
        planted = " neural network" * 2 if i % 2 == 0 else ""
        # w_k also rides behind 'filler', doubling its right marginal —
        # so (common, w_k) is HALF as associated as (neural, network)
        # rather than landing on the exact same n/40 ratio
        promiscuous = f" common w{i % 8} filler w{(i + 1) % 8}"
        docs.append((i, base.strip() + planted + promiscuous))

    # model: adjacent bigrams per doc, slot marginals, pmi
    from collections import Counter

    pairs = Counter()
    for _, text in docs:
        toks = text.split(" ")
        for a, b in zip(toks, toks[1:]):
            pairs[(a, b)] += 1
    left = Counter()
    right = Counter()
    for (a, b), c in pairs.items():
        left[a] += c
        right[b] += c
    n = sum(pairs.values())
    min_count, top_k = 3, 10

    def pmi6(c12, cl, cr):
        raw = math.log10((float(c12) * float(n)) / (float(cl) * float(cr)))
        return math.floor(raw * 1000000.0 + 0.5) / 1000000.0

    surv = [
        (pmi6(c, left[a], right[b]), a, b, c, left[a], right[b])
        for (a, b), c in pairs.items()
        if c >= min_count
    ]
    surv.sort(key=lambda t: (-t[0], t[1], t[2]))
    expect = [(a, b, c, cl, cr, p) for p, a, b, c, cl, cr in surv[:top_k]]

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = [
        (r.w1, r.w2, r.pair_n, r.left_n, r.right_n, r.pmi)
        for r in pmi_collocations(
            df, min_count=min_count, top_k=top_k
        ).collect()
    ]
    assert got == expect

    ranks = {(a, b): i for i, (a, b, *_) in enumerate(got)}
    assert ("neural", "network") in ranks
    # 'common' appears in MORE docs than 'neural network' but spreads
    # over 8 right words — every common-pair scores below the planted
    # collocation (when it survives min_count at all)
    for (a, b), i in ranks.items():
        if a == "common":
            assert i > ranks[("neural", "network")]


def test_chunk_text_matches_python_model(spark):
    """chunk_text vs an independent window model: window count rule,
    offsets, short final windows, single-window docs, the empty-doc
    one-''-token convention, and the reconstruction invariant — the
    stride-aligned prefix of every chunk reassembles the original
    token stream exactly (no token lost between windows)."""
    from newspaper_spark.operators.chunking import chunk_text

    c, s = 5, 3
    docs = [
        (1, " ".join(f"t{i}" for i in range(13))),
        (2, " ".join(f"u{i}" for i in range(5))),   # exactly one window
        (3, " ".join(f"v{i}" for i in range(6))),   # n = c + 1
        (4, "solo"),
        (5, ""),
        (6, "  A   B\tC  "),                        # WS collapse + lower
    ]

    def model(text):
        toks = " ".join(text.lower().split()).split(" ")
        n = len(toks)
        m = (max(n - c, 0) + s - 1) // s + 1
        return [
            (k, k * s, min(c, n - k * s), " ".join(toks[k * s:k * s + c]))
            for k in range(m)
        ]

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {}
    for r in chunk_text(df, chunk_tokens=c, stride=s).collect():
        got.setdefault(r.doc_id, []).append(
            (r.chunk_id, r.start_tok, r.n_chunk_tokens, r.chunk_text)
        )
    for i, text in docs:
        assert sorted(got[i]) == model(text), f"doc {i}"

    # reconstruction: first `s` tokens of every non-final chunk + the
    # whole final chunk == the token stream
    for i, text in docs:
        chunks = sorted(got[i])
        toks = []
        for k, (_, _, _, ct) in enumerate(chunks):
            piece = ct.split(" ")
            toks.extend(piece[:s] if k < len(chunks) - 1 else piece)
        assert toks == " ".join(text.lower().split()).split(" "), f"doc {i}"


def test_triangle_count_matches_python_model(spark):
    """triangle_count vs an independent adjacency-set model on a
    seeded random digraph WITH reverse duplicates, self-loops, and a
    planted hub + clique: degrees from the canonical undirected edge
    set, per-node triangle membership counts, zero rows for
    triangle-free nodes come back as 0 (left join), and total
    triangle mass is divisible by 3."""
    import random

    from newspaper_spark.operators.graph import triangle_count

    rng = random.Random(17)
    N = 50
    raw = [(v, v) for v in range(0, N, 9)]  # self-loops: dropped
    for _ in range(160):
        raw.append((rng.randrange(N), rng.randrange(N)))
    raw += [(0, v) for v in range(1, 12)]          # hub
    raw += [(b, a) for a, b in raw if a != b][:40]  # reverse dups
    clique = [10, 20, 30, 40]
    raw += [(x, y) for x in clique for y in clique if x < y]

    und = {(min(a, b), max(a, b)) for a, b in raw if a != b}
    adj = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    expect = {
        v: sum(1 for x, y in und if x in adj[v] and y in adj[v])
        for v in adj
    }

    df = spark.createDataFrame(raw, "src long, dst long")
    got = {
        r.node: (r.degree, r.n_triangles) for r in triangle_count(df).collect()
    }
    assert set(got) == set(adj)
    assert got == {v: (len(adj[v]), expect[v]) for v in adj}
    assert sum(t for _, t in got.values()) % 3 == 0
    # the planted clique's members hold at least C(3,2)=3 triangles
    assert all(got[v][1] >= 3 for v in clique)


def test_anchor_topk_matches_python_model(spark):
    """anchor_topk vs a Counter model: WS/case normalization collapses
    variants, per-target (count DESC, anchor) rank, k-cut, in_links
    totals count ALL anchors (not just survivors), empty/null anchors
    normalize to '' and participate."""
    from collections import Counter

    from newspaper_spark.operators.anchors import anchor_topk

    rows = []
    for i in range(60):
        t = i % 7
        rows.append((t, ["Click  Here", "click here", "Read More",
                         None, "  "][i % 5]))
    rows.append((9, "only one"))

    norm = lambda s: " ".join((s or "").lower().split())
    per = {}
    for t, a in rows:
        per.setdefault(t, Counter())[norm(a)] += 1
    k = 2
    expect = set()
    for t, ctr in per.items():
        ranked = sorted(ctr.items(), key=lambda kv: (-kv[1], kv[0]))
        for rank, (a, n) in enumerate(ranked[:k], start=1):
            expect.add((t, a, n, rank, sum(ctr.values())))

    df = spark.createDataFrame(rows, "target long, anchor string")
    got = {
        (r.target, r.anchor, r.n_mentions, r.rank, r.in_links)
        for r in anchor_topk(df, k=k).collect()
    }
    assert got == expect
    # the two Click-Here variants merged: every target with >=1 of
    # them reports the merged count under 'click here'
    merged = [g for g in got if g[1] == "click here"]
    assert merged and all(n >= 2 for _, _, n, _, _ in merged)


def test_build_postings_matches_python_model(spark):
    """build_postings vs an independent dict model: delta-gap strings
    reconstruct positions by prefix sum, tf/df/cf exact, repeated
    terms within a doc, a term in one doc only, and the empty-doc
    ''-token convention."""
    from newspaper_spark.operators.index import build_postings

    docs = [
        (1, "a b a c a b"),
        (2, "b b b"),
        (3, "c"),
        (4, ""),
        (5, "  A \t a  "),  # normalization: both tokens are 'a'
    ]

    model = {}
    for i, text in docs:
        toks = " ".join(text.lower().split()).split(" ")
        pos = {}
        for p, t in enumerate(toks):
            pos.setdefault(t, []).append(p)
        for t, ps in pos.items():
            deltas = [ps[0]] + [b - a for a, b in zip(ps, ps[1:])]
            model[(t, i)] = (len(ps), "+".join(map(str, deltas)))
    df_ = {}
    cf = {}
    for (t, _), (tf, _) in model.items():
        df_[t] = df_.get(t, 0) + 1
        cf[t] = cf.get(t, 0) + tf

    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r.term, r.doc_id): (r.tf, r.deltas, r.df, r.cf)
        for r in build_postings(sdf).collect()
    }
    assert got == {
        k: (tf, d, df_[k[0]], cf[k[0]]) for k, (tf, d) in model.items()
    }
    # positions reconstruct: doc 1 'a' at 0,2,4 -> deltas 0+2+2
    assert got[("a", 1)][1] == "0+2+2"
    assert got[("", 4)] == (1, "0", 1, 1)


def test_pagerank_int_weighted_matches_python_model(spark):
    """Weighted pagerank_int vs an independent integer model: STRING
    node ids (the host-graph case), duplicate (src, dst) rows summing
    their weights, sinks, and the overflow-safe recurrence order
    (rank DIV out_weight FIRST, then the weight multiply). Also the
    reduction property: weight_col with all-1 weights equals the
    unweighted call exactly."""
    import random

    from newspaper_spark.operators.graph import pagerank_int

    rng = random.Random(23)
    hosts = [f"h{i}.com" for i in range(12)]
    raw = []
    for _ in range(70):
        s, d2 = rng.choice(hosts), rng.choice(hosts)
        if s != d2:
            raw.append((s, d2, rng.randrange(1, 9)))
    raw += raw[:15]  # duplicate rows: weights must SUM

    agg = {}
    for s, d2, w in raw:
        agg[(s, d2)] = agg.get((s, d2), 0) + w
    nodes = {x for e in agg for x in e}
    ow = {}
    od = {}
    for (s, _), w in agg.items():
        ow[s] = ow.get(s, 0) + w
        od[s] = od.get(s, 0) + 1
    scale = 1_000_000
    r = {v: scale for v in nodes}
    for _ in range(3):
        inflow = {v: 0 for v in nodes}
        for (s, d2), w in agg.items():
            inflow[d2] += (((r[s] // ow[s]) * w) * 85) // 100
        r = {v: (15 * scale) // 100 + inflow[v] for v in nodes}

    df = spark.createDataFrame(raw, "src string, dst string, w long")
    got = {
        x.node: (x.out_degree, x.rank)
        for x in pagerank_int(df, weight_col="w").collect()
    }
    assert got == {v: (od.get(v, 0), r[v]) for v in nodes}

    ones = df.select("src", "dst", F.lit(1).cast("long").alias("w")).distinct()
    wtd = {
        (x.node): (x.out_degree, x.rank)
        for x in pagerank_int(ones, weight_col="w").collect()
    }
    unw = {
        (x.node): (x.out_degree, x.rank)
        for x in pagerank_int(df.select("src", "dst")).collect()
    }
    assert wtd == unw


def test_pagerank_int_zero_weight_source_is_sink(spark):
    """ADVICE r6: a source whose weights sum to 0 used to hit
    `rank DIV ow` with ow=0 and raise DIVIDE_BY_ZERO under the
    session's ANSI mode, failing the whole job. It must instead act as
    a sink (contributes no rank mass) while keeping its out_degree and
    its presence in the node set; other nodes' ranks must equal the
    graph with the zero-weight edges absent from the mass flow."""
    from newspaper_spark.operators.graph import pagerank_int

    # b's only out-edge has weight 0; a→b carries normal mass
    df = spark.createDataFrame(
        [("a", "b", 3), ("b", "c", 0)], "src string, dst string, w long"
    )
    got = {
        x.node: (x.out_degree, x.rank)
        for x in pagerank_int(df, weight_col="w", iterations=3).collect()
    }
    scale = 1_000_000
    base = (15 * scale) // 100
    # independent model: a→b weight 3 (ow=3), b contributes nothing
    r = {v: scale for v in "abc"}
    for _ in range(3):
        inflow = {v: 0 for v in "abc"}
        inflow["b"] += (((r["a"] // 3) * 3) * 85) // 100
        r = {v: base + inflow[v] for v in "abc"}
    assert got == {"a": (1, r["a"]), "b": (1, r["b"]), "c": (0, r["c"])}


def test_sparse_dot_pairs_matches_python_model(spark):
    """sparse_dot_pairs vs a brute-force Counter model: exact tf dot
    products over df-surviving terms, the max_df cut removes
    corpus-frequent terms (and with it every pair they alone
    connect), min_dot filters, id1 < id2 canonical order, repeated
    terms multiply tfs."""
    from collections import Counter
    from itertools import combinations

    from newspaper_spark.operators.index import sparse_dot_pairs

    stop = "the and of"  # df = all docs -> cut at max_df=4
    docs = [
        (1, f"{stop} apple apple banana"),
        (2, f"{stop} apple cherry"),
        (3, f"{stop} banana cherry cherry"),
        (4, f"{stop} durian"),
        (5, f"{stop} apple banana"),
        (6, f"{stop} unrelated"),
    ]
    max_df, min_dot = 4, 1

    bags = {i: Counter(t.lower().split()) for i, t in docs}
    docfreq = Counter(t for b in bags.values() for t in b)
    expect = {}
    for i, j in combinations(sorted(bags), 2):
        dot = sum(
            bags[i][t] * bags[j][t]
            for t in bags[i]
            if docfreq[t] <= max_df and t in bags[j]
        )
        if dot >= min_dot:
            expect[(i, j)] = dot

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r.id1, r.id2): r.dot
        for r in sparse_dot_pairs(df, max_df=max_df, min_dot=min_dot).collect()
    }
    assert got == expect
    # the stopwords alone never connect: doc 4 and 6 share only them
    assert (4, 6) not in got
    # repeated terms multiply: docs 1x3 share banana (1*1) -> 1,
    # docs 2x3 share cherry (1*2) -> 2
    assert got[(1, 3)] == 1 and got[(2, 3)] == 2


def test_extract_source_meta_brand_and_description(spark):
    """extract_source_meta vs the reference semantics (source.py:79-82,
    170-175): brand = registered-domain label under the mini-PSL for
    every URL shape tldextract handles (subdomain, two-label suffix,
    port, userinfo, trailing dot, bare host), description = homepage
    meta[name=description] content with attribute charrefs unescaped
    and surrounding whitespace stripped, '' when the tag is absent —
    and non-html passthrough columns survive."""
    from newspaper_spark.operators.source_build import extract_source_meta

    meta = '<meta name="description" content="  News &amp; views, daily  ">'
    rows = [
        (0, "http://www.example.com/", f"<html><head>{meta}</head></html>"),
        (1, "http://news.paper.co.uk/", f"<html><head>{meta}</head></html>"),
        (2, "http://host.org:8080/", "<html><head></head><body/></html>"),
        (3, "http://editor@dotty.net./", f"<head>{meta}</head>"),
        (4, "localhost", "<html></html>"),
        (5, None, None),
    ]
    df = spark.createDataFrame(rows, "sid long, source_url string, html string")
    got = {r.sid: r for r in extract_source_meta(df).collect()}
    assert set(got[0].asDict()) == {"sid", "source_url", "brand", "description"}
    assert got[0].brand == "example"
    assert got[1].brand == "paper"       # co.uk is a two-label suffix
    assert got[2].brand == "host"        # port stripped
    assert got[3].brand == "dotty"       # userinfo + trailing dot
    assert got[4].brand == "localhost"   # single label: whole host
    assert got[5].brand == ""
    expected_desc = "News & views, daily"
    assert got[0].description == expected_desc
    assert got[3].description == expected_desc
    assert got[2].description == ""      # tag absent -> reference default
    assert got[5].description == ""


def test_api_popular_urls_and_languages(spark):
    """api parity (reference api.py:45-68): popular_urls prefixes each
    bundled popular-sources entry with http:// in file order;
    languages is the sorted 2-char-code table with full names from the
    reference's code->name map, excluding the nlp-en wordlist."""
    from newspaper_spark.api import languages, popular_urls

    pop = popular_urls(spark).orderBy("idx").collect()
    assert len(pop) == 242
    assert pop[0].idx == 0 and pop[0].url == "http://www.huffingtonpost.com"
    assert pop[1].url == "http://cnn.com"
    assert all(r.url.startswith("http://") for r in pop)

    langs = languages(spark).collect()
    codes = [r.code for r in langs]
    assert codes == sorted(codes) and len(codes) == 38
    assert all(len(c) == 2 for c in codes)  # nlp-en excluded
    by = {r.code: r.full_name for r in langs}
    assert by["en"] == "English"
    assert by["nb"] == "Norwegian (Bokmål)"
    assert by["zh"] == "Chinese"

    # ADVICE r7: the api_surface oracle reads the SAME bundled JSON
    # resources as the implementation, so it cannot detect resource
    # corruption — both sides would drift together. Pin content
    # digests here so any edit of the bundled data fails loudly.
    import hashlib
    import os

    import newspaper_spark

    res = os.path.join(os.path.dirname(newspaper_spark.__file__), "resources")
    digests = {
        "popular_sources.json":
            "0c6f51cf9a22e871313c2f36015f6e30890cde9de28cc02d496e0672c6b37ac0",
        "stopwords.json":
            "36454300430f0f0c1ef39f17047cb75f79481d0bbb0e69f107f566103f5b5fca",
    }
    for fname, want in digests.items():
        with open(os.path.join(res, fname), "rb") as f:
            got_d = hashlib.sha256(f.read()).hexdigest()
        assert got_d == want, f"bundled resource drifted: {fname}"


def test_badwords_filter_matches_python_model(spark):
    """badwords_filter vs a brute-force model: unigram entries count
    every token occurrence, two-token entries count every adjacent
    pair, verdicts flag any hit; docs with no hits keep
    badwords_ok=True; 3-token entries raise."""
    import re

    import pytest as _pytest

    from newspaper_spark.operators.filters import badwords_filter

    docs = [
        (0, "the big bad wolf saw a big dog"),
        (1, "nothing wrong here at all"),
        (2, "click here to click here now"),
        (3, "bad bad bad"),
        (4, ""),
        (5, None),
        (6, "CLICK  Here\tto win"),  # case + whitespace normalization
    ]
    bl = ["bad", "click here"]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_badword_hits, r.badwords_ok)
        for r in badwords_filter(df, bl).collect()
    }

    def model(text):
        toks = [t for t in re.split("[ \t\n\x0b\f\r]+", (text or "").lower()) if t]
        hits = sum(1 for t in toks if t == "bad")
        hits += sum(
            1
            for a, b in zip(toks, toks[1:])
            if (a, b) == ("click", "here")
        )
        return hits, hits == 0

    assert got == {i: model(t) for i, t in docs}

    # a blocklist is a set: duplicated entries must not double-count
    got_dup = {
        r.doc_id: r.n_badword_hits
        for r in badwords_filter(df, bl + bl).collect()
    }
    assert got_dup == {i: model(t)[0] for i, t in docs}

    # every broadcast_candidates mode gives identical verdicts: None
    # (default — planner/AQE decides from runtime size, the scale-safe
    # setting), True (forced broadcast), False (forced shuffle join)
    for mode in (True, False):
        got_mode = {
            r.doc_id: (r.n_badword_hits, r.badwords_ok)
            for r in badwords_filter(
                df, bl, broadcast_candidates=mode
            ).collect()
        }
        assert got_mode == got, mode

    with _pytest.raises(ValueError):
        badwords_filter(df, ["one two three"]).collect()
    # list inputs validate driver-side with the same split semantics
    # as the Column path — BEFORE any Spark job runs
    with _pytest.raises(ValueError):
        badwords_filter(df, ["a  b"])  # double space = 3 split parts


def test_dedup_lines_within_doc_matches_python_model(spark):
    """dedup_lines_within_doc vs a brute-force model: first occurrence
    of every non-empty line survives in order, empty lines are
    preserved verbatim (all of them), repeats are counted."""
    from newspaper_spark.operators.span_dedup import dedup_lines_within_doc

    docs = [
        (0, "boiler\nstory a\nboiler\n\nstory b\nboiler\nstory a"),
        (1, "one\ntwo\nthree"),
        (2, "\n\n"),          # only empties: all preserved
        (3, "same\nsame"),
        (4, ""),
        (5, None),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: (r.cleaned_text, r.n_lines, r.n_removed)
        for r in dedup_lines_within_doc(df).collect()
    }

    def model(text):
        lines = (text or "").split("\n")
        seen, out = set(), []
        for ln in lines:
            if ln == "" or ln not in seen:
                out.append(ln)
                seen.add(ln)
        return "\n".join(out), len(out), len(lines) - len(out)

    assert got == {i: model(t) for i, t in docs}


def test_dedup_lines_randomized_batch_vs_model(spark):
    """Seeded randomized batch (one Spark call, the fuzz-value shape
    for a distributed operator): 200 documents mixing repeated lines,
    whitespace-only lines, \\r remnants, unicode, long runs of empty
    lines, and single-line docs — exact match against the Python
    model on every row."""
    import random

    from newspaper_spark.operators.span_dedup import dedup_lines_within_doc

    rng = random.Random(7)
    pool = [
        "boiler plate",
        "  ",
        "\t",
        "line with trailing \r",
        "ünïcodé ⚡ line",
        "a",
        "",
        "subscribe now",
        "the same exact line",
    ]
    docs = []
    for i in range(200):
        n = rng.randrange(0, 12)
        docs.append((i, "\n".join(rng.choice(pool) for _ in range(n))))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: (r.cleaned_text, r.n_lines, r.n_removed)
        for r in dedup_lines_within_doc(df).collect()
    }

    def model(text):
        lines = (text or "").split("\n")
        seen, out = set(), []
        for ln in lines:
            if ln == "" or ln not in seen:
                out.append(ln)
                seen.add(ln)
        return "\n".join(out), len(out), len(lines) - len(out)

    assert got == {i: model(t) for i, t in docs}
