import pytest


@pytest.fixture(scope="session")
def spark():
    from marie_icr_spark.session import build_session

    s = build_session(
        app_name="marie-icr-spark-tests", master="local[4]", shuffle_partitions=4
    )
    yield s
    s.stop()
