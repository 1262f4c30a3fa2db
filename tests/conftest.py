from __future__ import annotations

import duckdb
import pytest

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"

TESTDATA_TABLES = (
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
)


@pytest.fixture(scope="session")
def spark():
    from data_warehouse_product_mix_clustering_spark.session import get_spark

    # Small local session for tests: the data is tiny, so fewer shuffle
    # partitions are faster; semantics are unchanged.
    s = get_spark(
        app_name="data_warehouse_product_mix_clustering_spark-tests",
        master="local[4]",
        shuffle_partitions=4,
    )
    yield s
    s.stop()


def make_duckdb(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


@pytest.fixture(scope="session")
def duck_smoke() -> duckdb.DuckDBPyConnection:
    return make_duckdb(SF_SMOKE)
