import pytest

from rdf_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("rdf_spark-tests", master="local[4]", shuffle_partitions=8)
    yield s
