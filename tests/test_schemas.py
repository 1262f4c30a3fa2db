"""Schema-contract tests: the declared StructType contracts in schemas.py
must match what the driver's testdata actually carries (names + types for
the columns we declare) — catches silent testdata drift between rounds."""

from __future__ import annotations

import pytest

from data_warehouse_product_mix_clustering_spark import schemas as S
from data_warehouse_product_mix_clustering_spark.sources.registry import table

from conftest import SF_SMOKE

DECLARED = {
    "lineitem": S.LINEITEM,
    "orders": S.ORDERS,
    "events": S.EVENTS,
    "documents": S.DOCUMENTS,
    "embeddings": S.EMBEDDINGS,
}


@pytest.mark.parametrize("name", sorted(DECLARED))
def test_testdata_matches_declared_schema(spark, name):
    actual = {f.name: f.dataType.simpleString() for f in table(spark, name, SF_SMOKE).schema}
    for field in DECLARED[name]:
        assert field.name in actual, f"{name}: missing column {field.name}"
        assert actual[field.name] == field.dataType.simpleString().replace(
            "timestamp_ntz", "timestamp"
        ) or actual[field.name] in (
            field.dataType.simpleString(),
            field.dataType.simpleString().replace("timestamp", "timestamp_ntz"),
        ), (
            f"{name}.{field.name}: declared {field.dataType.simpleString()}, "
            f"testdata has {actual[field.name]}"
        )


def test_all_testdata_tables_load(spark):
    for name in S.TESTDATA_TABLES:
        df = table(spark, name, SF_SMOKE)
        assert df.count() > 0, f"{name} empty"
