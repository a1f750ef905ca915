import pytest


@pytest.fixture(scope="session")
def spark():
    from spapy_spark.session import get_spark

    s = get_spark(app="spapy-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()
