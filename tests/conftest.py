import pytest

from outcite_duplicate_detecting_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(cores=4, app_name="tests", shuffle_partitions=8)
    yield s


def pytest_addoption(parser):
    parser.addoption("--sf-dir", default="/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def sf_dir(request):
    return request.config.getoption("--sf-dir")
