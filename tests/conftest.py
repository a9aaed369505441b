import json
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
FIXDIR = os.path.join(REPO, "tests", "fixtures")


def load_fixture(name):
    with open(os.path.join(FIXDIR, name)) as f:
        return json.load(f)


@pytest.fixture(scope="session")
def spark():
    """Local SparkSession shared by Spark-layer tests."""
    from pyspark.sql import SparkSession
    os.environ["PYTHONPATH"] = REPO + os.pathsep + \
        os.environ.get("PYTHONPATH", "")
    spark = (
        SparkSession.builder
        .master("local[4]")
        .appName("jsoup_spark_tests")
        .config("spark.python.worker.module", "pyspark_worker_zipcache")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "4g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    yield spark
