import pytest

from hydra_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(cores=4, shuffle_partitions=4, app="hydra_spark_tests")
    yield s
