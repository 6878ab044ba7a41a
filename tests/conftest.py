import os
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_TESTS = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)
sys.path.insert(0, _TESTS)
# python workers spawned by Spark must resolve test/fixture modules that
# cloudpickle references by name
os.environ["PYTHONPATH"] = os.pathsep.join(
    [p for p in (_REPO, _TESTS, os.environ.get("PYTHONPATH")) if p]
)

from pyspark.sql import SparkSession  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("biocypher-spark-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "4g")
        .getOrCreate()
    )
    yield spark
    spark.stop()


SCHEMA_PATH = os.path.join(os.path.dirname(__file__), "fixtures", "test_schema_config.yaml")


@pytest.fixture(scope="session")
def schema_path():
    return SCHEMA_PATH
