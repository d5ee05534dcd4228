"""Property-based robustness: at 10^12 turns the input contains every
kind of garbage; the kernel must never raise and must keep its output
contract on arbitrary byte salad."""
import string

from hypothesis import given, settings
from hypothesis import strategies as st

TAGS = ["p", "div", "span", "a", "b", "i", "br", "li", "ul", "table", "tr",
        "td", "h1", "em", "script", "style", "title", "meta", "article"]

tag_soup = st.recursive(
    st.text(alphabet=string.printable + "éü中¿", max_size=60),
    lambda children: st.builds(
        lambda tag, inner, close: f"<{tag} class='x'>" + inner + (f"</{tag}>" if close else ""),
        st.sampled_from(TAGS),
        children,
        st.booleans(),
    ),
    max_leaves=12,
)


@settings(max_examples=150, deadline=None)
@given(tag_soup)
def test_extract_article_never_raises(html):
    from newspaper_spark.kernel.article import extract_article

    rec = extract_article(html)
    assert isinstance(rec, dict)
    assert isinstance(rec["status"], str)
    assert rec["text"] is None or isinstance(rec["text"], str)
    assert rec["authors"] is None or isinstance(rec["authors"], list)


@settings(max_examples=150, deadline=None)
@given(st.text(max_size=200))
def test_fulltext_never_raises_on_text(garbage):
    from newspaper_spark.kernel.fulltext import fulltext

    out = fulltext(garbage)
    assert isinstance(out, str)


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=300))
def test_decode_never_raises(raw):
    from newspaper_spark.operators.decode import decode_html_bytes

    out = decode_html_bytes(raw)
    assert isinstance(out, str)


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=120))
def test_valid_url_never_raises(s):
    from newspaper_spark.kernel.urlutils import valid_url

    assert valid_url(s) in (True, False)


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=400), st.text(max_size=40))
def test_nlp_never_raises(text, title):
    from newspaper_spark.kernel.nlp import keywords, summarize

    assert isinstance(keywords(text), dict)
    assert isinstance(summarize(title=title, text=text), str)


def test_charset_detector_never_crashes_on_random_bytes():
    """decode_html_bytes must return a str for ANY byte soup."""
    import random

    from newspaper_spark.operators.decode import decode_html_bytes

    rng = random.Random(1234)
    for n in (0, 1, 7, 100, 4096):
        for _ in range(20):
            raw = bytes(rng.randrange(256) for _ in range(n))
            out = decode_html_bytes(raw)
            assert isinstance(out, str)


@given(st.binary(min_size=0, max_size=400))
@settings(max_examples=200, deadline=None)
def test_real_decoder_error_contract(payload):
    """real_decode on arbitrary bytes either decodes or raises
    ValueError — NEVER struct.error / zlib.error / IndexError — so the
    mapInPandas error column always gets the documented channel."""
    from newspaper_spark.operators.multimodal import _decode_image

    for prefix in (b"", b"P6\n", b"P5\n", b"BM", b"\x89PNG\r\n\x1a\n",
                   b"GIF89a", b"GIF87a", b"\xff\xd8", b"\xff\xd8\xff\xdb",
                   b"\xff\xd8\xff\xc2", b"RIFF\x00\x01\x00\x00AVI ",
                   b"RIFF\x00\x01\x00\x00AVI LIST"):
        try:
            w, h, nf, feat = _decode_image(prefix + payload, real_decode=True)
            # nf > 1 is legal for AVI containers (frame count)
            assert w > 0 and h > 0 and nf >= 1 and len(feat) == 8
        except ValueError:
            pass


@given(st.binary(min_size=0, max_size=300))
@settings(max_examples=150, deadline=None)
def test_wav_decoder_error_contract(payload):
    """_decode_wav on arbitrary bytes either decodes or raises
    ValueError — the audio error-column contract."""
    from newspaper_spark.operators.multimodal import _decode_wav

    for prefix in (b"", b"RIFF\x00\x01\x00\x00WAVE",
                   b"RIFF\x00\x01\x00\x00WAVEfmt "):
        try:
            n, r, c, feat = _decode_wav(prefix + payload)
            assert n > 0 and r > 0 and c > 0 and len(feat) == 8
        except ValueError:
            pass
