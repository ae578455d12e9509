"""End-to-end curation pipeline: planted duplicates and junk removed."""

import pytest

from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def raw_pages(spark):
    from mindocr_spark.corpus import generate_batch, PAGES_SCHEMA_DDL

    rows = generate_batch(42, range(60))
    # plant an exact duplicate (same html, different url) and a near-dup
    dup = dict(rows[3], url="https://dup.example/exact")
    near = dict(rows[5], url="https://dup.example/near")
    near["html"] = rows[5]["html"].replace(b"the", b"thy", 1)
    junk = dict(rows[7], url="https://dup.example/junk",
                html=b"<html><body><nav><a href='/'>x</a></nav></body></html>",
                text="")
    return spark.createDataFrame(rows + [dup, near, junk], PAGES_SCHEMA_DDL)


def test_curate_funnel(spark, raw_pages):
    from mindocr_spark.curate import CurateConfig, curate

    curated, funnel = curate(raw_pages, CurateConfig(min_chars=50))
    stages = {r["stage"]: r["docs"] for r in funnel.collect()}
    assert stages["input"] == 63
    assert stages["extracted_ok"] < stages["input"]      # junk page dropped
    assert stages["exact_dedup"] < stages["lang_quality"]  # exact dup removed
    assert stages["near_dedup"] <= stages["exact_dedup"]

    urls = {r["url"] for r in curated.collect()}
    # of the exact pair, exactly one survives
    orig3 = [u for u in urls if u.endswith("/p/3")]
    assert (("https://dup.example/exact" in urls) + bool(orig3)) == 1
    assert "https://dup.example/junk" not in urls


def test_curate_near_dup_removed(spark, raw_pages):
    from mindocr_spark.curate import CurateConfig, curate

    curated, _ = curate(raw_pages, CurateConfig(min_chars=50,
                                                neardup_threshold=0.5))
    urls = {r["url"] for r in curated.collect()}
    orig5 = [u for u in urls if u.endswith("/p/5")]
    # near-dup pair collapsed to one survivor
    assert (("https://dup.example/near" in urls) + bool(orig5)) == 1


def test_curate_lang_filter(spark, raw_pages):
    from mindocr_spark.curate import CurateConfig, curate

    curated, _ = curate(raw_pages, CurateConfig(min_chars=50, langs=("en",)))
    assert {r["lang_pred"] for r in curated.collect()} == {"en"}
