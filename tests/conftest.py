import pytest

from crawl4ai_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(parallelism=4, app_name="crawl4ai_spark_tests")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"
