import pytest

from neuroner_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("neuroner_spark_tests", cores=4, shuffle_partitions=4)
    yield s


SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"
