from __future__ import annotations

import pytest
from pyspark.sql import SparkSession


@pytest.fixture(scope="session")
def spark() -> SparkSession:
    from textalyzer_spark.session import get_spark

    s = get_spark("textalyzer-tests", cores=4, shuffle_partitions=4)
    yield s
    s.stop()


def rows_as_tuples(df):
    return [tuple(r) for r in df.collect()]
