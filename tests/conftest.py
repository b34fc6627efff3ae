from __future__ import annotations

import pytest
from pyspark.sql import SparkSession

from pagerank_service_spark.session import get_session


@pytest.fixture(scope="session")
def spark() -> SparkSession:
    s = get_session(
        app_name="tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.driver.memory": "8g"},
    )
    yield s


def edges_df(spark, triples):
    return spark.createDataFrame(
        [(int(s), int(d), float(w)) for s, d, w in triples],
        "src long, dst long, weight double",
    )
