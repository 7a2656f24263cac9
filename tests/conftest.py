import pytest


@pytest.fixture(scope="session")
def spark():
    from fastlink_spark.session import get_spark

    s = get_spark(app_name="fastlink_tests", master="local[8]", shuffle_partitions=8)
    yield s
