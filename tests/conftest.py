import pytest


@pytest.fixture(scope="session")
def spark():
    from donut_spark.sources.session import get_spark

    s = get_spark(cores=8, app_name="donut_spark_tests")
    s.sparkContext.setLogLevel("ERROR")
    yield s


SF_SMALL = "/root/testdata/sf0.001"
SF_MED = "/root/testdata/sf0.01"
