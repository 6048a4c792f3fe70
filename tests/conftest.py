import pytest


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .appName("osmospark-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def fixture_pages_df(spark):
    from osmospark.corpus import fixture_pages, pages_rows

    return spark.createDataFrame(
        pages_rows(fixture_pages()),
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
