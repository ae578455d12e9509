"""Driver-contract guard inside the test suite: a fast subset of the
oracle comparisons (the full set runs via tools/check_oracle.py), plus
contract-shape invariants."""

import duckdb
import pytest

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

FAST_QUERIES = [
    "extract_fulltext",      # byte-identical extraction
    "agg_partial_final",     # decimal-exact aggregation
    "token_stats",           # text analysis
    "exact_dedup",           # dedup
    "windowed_counts",       # timestamp handling
    "layout_assemble",       # 2-D layout path
    "layout_from_bytes",     # real PDF codec end-to-end
    "multimodal_real_codec", # real BMP/WAV codecs
]


@pytest.fixture(scope="module")
def entrymod():
    import sys

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as E

    return E


@pytest.fixture(scope="module")
def oracle(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _canon(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].map(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", FAST_QUERIES)
def test_oracle_parity(spark, sf_dir, entrymod, oracle, name):
    got = _canon(entrymod.queries()[name](spark, sf_dir).toPandas())
    want = _canon(oracle.sql(entrymod.oracle_sql()[name]).df())
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want)
    assert got.equals(want)


def test_contract_shape(entrymod):
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert len(qs) >= 40
    assert set(oracles) <= set(qs)           # no orphan oracles
    assert len(oracles) >= 38                # coverage floor
    for name, fn in qs.items():
        assert callable(fn), name


def test_entry_smoke(spark, entrymod):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert "extracted_text" in df.columns
