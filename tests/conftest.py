import pytest

from pyspark.sql import SparkSession


def make_spark(parallelism: int = 2, shuffle_partitions: int = 4) -> SparkSession:
    return (
        SparkSession.builder.master(f"local[{parallelism}]")
        .appName("chug_spark_tests")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "6g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


@pytest.fixture(scope="session")
def spark():
    s = make_spark()
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()
