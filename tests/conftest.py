import pytest

from fonduer_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="fonduer_spark_tests", cores=4,
                  shuffle_partitions=8, driver_memory="8g")
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()
