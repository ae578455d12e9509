"""Generate-known-content-then-recover: the reference's system-test pattern
(reference: tests/st/test_online_infer.py:17-44 renders known text into an
image and asserts the pipeline recovers it). Here the spec must recover
the generator's known main content **byte-identically** — the BASELINE
acceptance contract — in-process (no Spark; the Spark-parity test lives in
test_pipeline_spark.py)."""

from mindocr_spark.corpus import generate_page
from mindocr_spark.extract_core import extract_document

N = 500


def test_byte_identical_recovery():
    for i in range(N):
        p = generate_page(42, i)
        ex = extract_document(p["html"])
        assert ex.extracted_text.encode() == p["text"].encode(), (
            f"page {i} ({p['lang']}) not byte-identical"
        )


def test_boilerplate_fully_stripped():
    # generator chrome markers must never appear in extractions
    for i in range(200):
        p = generate_page(42, i)
        ex = extract_document(p["html"])
        assert "Related" not in ex.extracted_text
        assert "© 2024" not in ex.extracted_text
        assert "Privacy" not in ex.extracted_text


def test_seed_sensitivity():
    assert generate_page(42, 1)["html"] != generate_page(43, 1)["html"]


def test_latin1_pages_roundtrip():
    found = 0
    for i in range(1000):
        p = generate_page(42, i)
        if b"iso-8859-1" in p["html"][:200]:
            found += 1
            ex = extract_document(p["html"])
            assert ex.encoding == "latin-1"
            assert ex.extracted_text.encode() == p["text"].encode()
    assert found > 0, "corpus should include latin-1 pages"


def test_skew_tail_exists():
    sizes = [len(generate_page(42, i)["html"]) for i in range(500)]
    assert max(sizes) > 10 * sorted(sizes)[len(sizes) // 2], "long tail expected"
