import pytest

from pg_logical_replication_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="plrs-tests", cpus=4, shuffle_partitions=4)
    yield s
