import pytest


@pytest.fixture(scope="session")
def spark():
    from mindocr_spark.session import get_spark

    s = get_spark(app="mindocr_spark_tests", cores=4, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    import os

    return os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
