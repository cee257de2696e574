import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMALL = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


@pytest.fixture(scope="session")
def spark():
    from mpes_spark.session import get_spark

    s = get_spark(app_name="mpes_spark_tests", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def duck():
    """DuckDB connection with the testdata tables registered as views,
    mimicking the driver's oracle environment."""
    import duckdb

    con = duckdb.connect()
    for tb in TABLES:
        con.execute(
            f"CREATE VIEW {tb} AS SELECT * FROM '{SF_ORACLE}/{tb}.parquet'"
        )
    yield con
    con.close()
