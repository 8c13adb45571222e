import pytest

from syslog_ng_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", cpus=8, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def transcripts_df(spark):
    from syslog_ng_spark.datagen import transcripts

    return transcripts(spark, n_convs=200, avg_turns=8, hot_convs=2, hot_factor=50).cache()


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"
