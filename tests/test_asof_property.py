"""Property-based as-of join correctness: both distributed strategies must
agree with pandas ``merge_asof`` (the reference's semantics source,
reference src/pipelines/etl.py:27-42) on arbitrary inputs — not just the
hand-picked edge fixtures in test_asof.py."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from data_warehouse_product_mix_clustering_spark.operators.asof_join import asof_join

_BASE = dt.datetime(2024, 1, 1)

# Timestamps on a coarse grid so ties and exact-boundary hits are COMMON
# (the interesting cases), not vanishingly rare.
_ts = st.integers(min_value=0, max_value=40).map(
    lambda h: _BASE + dt.timedelta(hours=h)
)
_left_rows = st.lists(_ts, min_size=1, max_size=12)
# Right side: unique event times (merge_asof's behavior on duplicate right
# keys is positional, which no distributed engine can honor; our tie rule
# for that case is pinned separately in test_asof.py).
_right_rows = st.lists(
    st.tuples(_ts, st.floats(min_value=0, max_value=100, allow_nan=False)),
    min_size=1,
    max_size=8,
    unique_by=lambda r: r[0],
)


@pytest.mark.parametrize("strategy", ["broadcast", "union"])
@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(left_ts=_left_rows, right_rows=_right_rows)
def test_asof_matches_pandas_merge_asof(spark, strategy, left_ts, right_rows):
    left_pd = pd.DataFrame(
        {"id": range(len(left_ts)), "ts": pd.to_datetime(left_ts)}
    ).sort_values("ts", kind="stable")
    right_pd = pd.DataFrame(
        {
            "start": pd.to_datetime([r[0] for r in right_rows]),
            "price": [r[1] for r in right_rows],
        }
    ).sort_values("start", kind="stable")
    want = pd.merge_asof(left_pd, right_pd, left_on="ts", right_on="start")
    want_map = {
        int(r.id): (None if pd.isna(r.price) else float(r.price))
        for r in want.itertuples()
    }

    left = spark.createDataFrame(left_pd, "id long, ts timestamp")
    right = spark.createDataFrame(right_pd, "start timestamp, price double")
    got = {
        r.id: r.price
        for r in asof_join(
            left, right, left_on="ts", right_on="start", strategy=strategy
        ).collect()
    }
    assert got == want_map

