"""Property-based fuzzing of the round-2 codecs (hypothesis).

Same discipline as test_parse_fuzz for the HTML core: the PDF and WARC
writers/parsers must be exact inverses on ARBITRARY content (the
round-trip property), and the parsers must be total on arbitrary bytes
(raise ValueError-family errors, never crash the interpreter or hang)."""

from struct import error as struct_error

import numpy as np
from hypothesis import given, settings, strategies as st

from mindocr_spark.multimodal import (
    _decode_bmp,
    _decode_wav,
    encode_bmp,
    encode_wav,
)
from mindocr_spark.pdf import build_pdf, parse_pdf
from mindocr_spark.sources.warc import (
    format_response_record,
    parse_warc,
    _warcinfo,
)

# surrogates can't round-trip utf-8; everything else must
doc_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=400
)


def _expected_doc(text):
    q = len(text) // 4
    return "\n\n".join(
        [text[:q], text[q:2 * q], text[2 * q:3 * q], text[3 * q:]]
    )


@settings(max_examples=150, deadline=None)
@given(doc_text)
def test_pdf_roundtrip_property(text):
    blocks = parse_pdf(build_pdf(text, "Report 1"))
    paras = [b for b in blocks if b["kind"] == "para"]

    def contained(a, b):
        return (a["page"] == b["page"] and a["x0"] >= b["x0"]
                and a["y0"] >= b["y0"] and a["x1"] <= b["x1"]
                and a["y1"] <= b["y1"]
                and (a["x1"] - a["x0"]) * (a["y1"] - a["y0"])
                < (b["x1"] - b["x0"]) * (b["y1"] - b["y0"]))

    kept = [a for a in paras if not any(contained(a, b) for b in paras)]
    kept.sort(key=lambda b: (b["page"], b["x0"] >= 306.0, b["y0"], b["x0"]))
    assert "\n\n".join(b["text"] for b in kept) == _expected_doc(text)


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=3000))
def test_pdf_parse_total_on_garbage(data):
    try:
        parse_pdf(data)
    except (ValueError, KeyError, IndexError, AttributeError,
            UnicodeDecodeError, OverflowError, MemoryError):
        pass  # rejected, not crashed — the failed-flag path handles these


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 10**6),                      # url suffix
            st.integers(0, 2**31 - 1),                  # ts_sec
            st.binary(max_size=300),                    # html (ANY bytes)
            st.sampled_from(["en", "de", "zh", "unknown"]),
        ),
        max_size=6,
    )
)
def test_warc_roundtrip_property(recs):
    buf = bytearray(_warcinfo("f.warc"))
    for i, (u, ts, html, lang) in enumerate(recs):
        buf += format_response_record(
            f"https://f.example/{u}/{i}", ts, html, lang
        )
    got = parse_warc(bytes(buf))
    assert len(got) == len(recs)
    for rec, (u, ts, html, lang) in zip(got, recs):
        assert rec["ts_sec"] == ts
        assert rec["html"] == html
        assert rec["lang"] == lang


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=3000))
def test_warc_parse_total_on_garbage(data):
    try:
        parse_warc(data)
    except (ValueError, KeyError, IndexError, UnicodeDecodeError,
            OverflowError):
        pass


@settings(max_examples=100, deadline=None)
@given(st.integers(1, 12), st.integers(1, 12), st.integers(0, 2**32 - 1))
def test_bmp_roundtrip_property(h, w, seed):
    pix = ((np.arange(h * w * 3, dtype=np.int64) * 2654435761 + seed)
           % 256).astype(np.uint8).reshape(h, w, 3)
    assert np.array_equal(_decode_bmp(encode_bmp(pix)), pix)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(-32768, 32767), min_size=1, max_size=256))
def test_wav_roundtrip_property(samples):
    smp = np.array(samples, dtype=np.int16)
    assert np.array_equal(_decode_wav(encode_wav(smp)), smp)


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=500))
def test_media_decoders_total_on_garbage(data):
    for dec in (_decode_bmp,):
        try:
            dec(data)
        except (ValueError, IndexError, struct_error):
            pass


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=500))
def test_wav_decoder_total_on_garbage(data):
    import wave

    try:
        _decode_wav(data)
    except (ValueError, EOFError, wave.Error):
        pass


@settings(max_examples=60, deadline=None)
@given(
    st.integers(1, 4), st.integers(1, 9), st.integers(1, 9),
    st.integers(0, 2**32 - 1),
)
def test_avi_roundtrip_property(n, h, w, seed):
    from mindocr_spark.multimodal import _decode_avi, encode_avi

    rng = np.random.default_rng(seed)
    fr = rng.integers(0, 256, (n, h, w, 3), dtype=np.uint8)
    out = _decode_avi(encode_avi(fr))
    assert out.shape == fr.shape and (out == fr).all()


@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=600))
def test_avi_parse_total(data):
    """The AVI parser must be TOTAL on arbitrary bytes: ValueError-family
    rejection or a successful parse, never a crash or hang."""
    from mindocr_spark.multimodal import _decode_avi

    try:
        _decode_avi(data)
    except (ValueError, struct_error, IndexError):
        pass


class TestJPEGFuzz:
    """The untrusted-input discipline applied to the JPEG walk: any
    truncation/corruption must raise (never hang, never return
    garbage silently)."""

    def _enc(self):
        import numpy as np

        from mindocr_spark.multimodal import encode_jpeg

        rng = np.random.RandomState(5)
        return encode_jpeg(rng.randint(0, 256, (16, 16)).astype(np.uint8))

    def test_truncations_raise_or_roundtrip(self):
        from mindocr_spark.multimodal import _decode_jpeg

        enc = self._enc()
        for cut in range(2, len(enc), 37):
            try:
                _decode_jpeg(enc[:cut])
            except (ValueError, IndexError):
                pass  # rejected — the required outcome for truncation

    def test_single_byte_corruptions_never_hang(self):
        import numpy as np

        from mindocr_spark.multimodal import _decode_jpeg

        enc = bytearray(self._enc())
        rng = np.random.RandomState(7)
        for _ in range(60):
            i = int(rng.randint(2, len(enc) - 2))
            old = enc[i]
            enc[i] ^= 0xFF
            try:
                out = _decode_jpeg(bytes(enc))
                # a decode that survives must still be a sane image
                assert out.dtype == np.uint8 and out.ndim == 2
            except (ValueError, IndexError, KeyError):
                pass
            enc[i] = old

    def test_zero_length_and_wrong_magic(self):
        import pytest as _pytest

        from mindocr_spark.multimodal import _decode_jpeg

        for bad in (b"", b"\x00", b"BM\x00\x00", b"\xff\xd8"):
            with _pytest.raises(ValueError):
                _decode_jpeg(bad)
