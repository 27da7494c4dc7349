import pytest

from illumio_spark.session import build_session


@pytest.fixture(scope="session")
def spark():
    s = build_session(app_name="illumio_spark-tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()
