import pytest

from py3dtiles_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("py3dtiles-spark-tests", cpus=4, shuffle_partitions=8)
    yield s
    s.stop()
