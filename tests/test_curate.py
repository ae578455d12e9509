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


def test_curate_build_is_lazy(spark, raw_pages, monkeypatch):
    """Building the pipeline (including the funnel) must trigger ZERO
    Spark actions — counts/collects during plan construction were a 5×
    eager-job cost at build time."""
    from pyspark.sql import DataFrame
    from mindocr_spark.curate import CurateConfig, curate

    def boom(name):
        def _fail(self, *a, **kw):
            raise AssertionError(f"eager {name}() during curate build")
        return _fail

    for action in ("count", "collect", "toPandas", "toLocalIterator"):
        monkeypatch.setattr(DataFrame, action, boom(action))
    curated, funnel = curate(raw_pages, CurateConfig(min_chars=50))
    # both results are plain lazy DataFrames
    assert curated.columns == ["url", "text", "lang_pred", "n_chars"]
    assert funnel.columns == ["stage_idx", "stage", "docs"]


def test_curate_scoped_unpersists(spark, raw_pages):
    from mindocr_spark.curate import CurateConfig, curate, curate_scoped

    def n_cached():
        return len(spark.sparkContext._jsc.sc().getRDDStorageInfo())

    # a plan DISTINCT from every other test's (Spark's CacheManager is
    # keyed by logical plan — identical plans share cache entries, so an
    # unpersist here would otherwise release a neighbouring test's cache)
    pages = raw_pages.where("url NOT LIKE '%/junk'")
    before = n_cached()
    with curate_scoped(pages, CurateConfig(min_chars=50)) as (curated, funnel):
        stages = {r["stage"]: r["docs"] for r in funnel.collect()}
        assert stages["input"] == 62
        assert n_cached() > before          # intermediates were cached
    assert n_cached() == before             # ...and released on exit

    # the _track hook gives manual callers the same handle
    track = []
    pages2 = raw_pages.where("url NOT LIKE '%/near'")
    _c, funnel2 = curate(pages2, CurateConfig(min_chars=50), _track=track)
    funnel2.collect()
    assert track and all(df.is_cached for df in track)
    for df in track:
        df.unpersist()
    assert n_cached() == before


def test_curate_inside_ambient_persist_scope(spark, raw_pages):
    """curate() without _track must hand its nested persists to an
    ambient persist_scope, not swallow them into a throwaway list."""
    from mindocr_spark.cache import persist_scope
    from mindocr_spark.curate import CurateConfig, curate

    def n_cached():
        return len(spark.sparkContext._jsc.sc().getRDDStorageInfo())

    pages = raw_pages.where("url NOT LIKE '%/exact'")  # distinct plan
    before = n_cached()
    with persist_scope():
        _curated, funnel = curate(pages, CurateConfig(min_chars=50))
        funnel.collect()
        assert n_cached() > before
    assert n_cached() == before


def test_curate_lang_filter(spark, raw_pages):
    from mindocr_spark.curate import CurateConfig, curate

    curated, _ = curate(raw_pages, CurateConfig(min_chars=50, langs=("en",)))
    assert {r["lang_pred"] for r in curated.collect()} == {"en"}
