"""Semantic invariants for the round-7 analytics/pipeline queries — the
properties the oracle hash can't state directly (coverage, overlap,
balance, value ranges)."""

from __future__ import annotations

import pandas as pd

from data_warehouse_product_mix_clustering_spark.plans.registry import all_queries

from conftest import SF_SMOKE

QUERIES = all_queries()

CHUNK_SIZE, CHUNK_STRIDE = 200, 160  # plans/analytics.py constants


def test_doc_chunks_cover_every_document_exactly(spark):
    """Every doc is fully covered by its chunks, consecutive chunks overlap
    by exactly size-stride chars, and no chunk starts past the text end."""
    chunks = QUERIES["doc_chunks"].fn(spark, SF_SMOKE).toPandas()
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select(
        "doc_id", "text"
    ).toPandas()
    lengths = dict(zip(docs.doc_id, docs.text.str.len()))
    assert set(chunks.doc_id) == set(docs.doc_id)  # every doc chunked
    for doc_id, g in chunks.groupby("doc_id"):
        n = lengths[doc_id]
        g = g.sort_values("chunk_idx", ignore_index=True)
        assert list(g.chunk_idx) == list(range(len(g)))  # dense indices
        assert (g.chunk_start == g.chunk_idx * CHUNK_STRIDE + 1).all()
        # full coverage: last chunk reaches the end of the text
        last = g.iloc[-1]
        assert last.chunk_start + last.chunk_len - 1 == n
        # every non-final chunk is full-size (stride < size ⇒ overlap)
        assert (g.chunk_len.iloc[:-1] == CHUNK_SIZE).all()
        # no degenerate chunk fully contained in the previous one
        assert (g.chunk_len.iloc[-1:] > 0).all()


def test_customer_spend_deciles_are_balanced_and_monotone(spark):
    df = (
        QUERIES["customer_spend_deciles"]
        .fn(spark, SF_SMOKE)
        .toPandas()
        .sort_values(["total_spend", "cust_key"], ignore_index=True)
    )
    assert df.decile.between(1, 10).all()
    assert df.decile.is_monotonic_increasing  # deciles follow the sort order
    sizes = df.decile.value_counts()
    assert sizes.max() - sizes.min() <= 1  # ntile balance
    assert df.pct_rank.iloc[0] == 0.0
    assert abs(df.cume.iloc[-1] - 1.0) < 1e-9
    assert df.pct_rank.is_monotonic_increasing
    assert df.cume.is_monotonic_increasing


def test_retention_week0_counts_every_user(spark):
    """Offset-0 cells must count every user of the cohort (a user is active
    in their own first week by definition)."""
    df = QUERIES["events_retention_cohorts"].fn(spark, SF_SMOKE).toPandas()
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet").toPandas()
    firsts = ev.groupby("user_id").ts.min().dt.to_period("W").dt.start_time
    cohort_sizes = firsts.value_counts()
    wk0 = df[df.week_offset == 0].set_index("cohort_week").active_users
    for cohort, size in cohort_sizes.items():
        assert wk0.loc[pd.Timestamp(cohort)] == size
    assert (df.active_users > 0).all()
    assert (df.week_offset >= 0).all()


def test_quantized_codes_stay_in_int8_range(spark):
    """Absmax scaling must keep every code in [-127, 127]; the L1 bound
    follows (64 dims × 127)."""
    df = QUERIES["embedding_quantize_int8"].fn(spark, SF_SMOKE).toPandas()
    assert (df.q_l1 <= 127 * 64).all()
    assert (df.q_l1 >= 127).all()  # the absmax element itself maps to ±127
    assert (df.scale > 0).all()


def test_first_last_order_agrees_with_windowed_truth(spark):
    """min_by/max_by output must match an independent pandas recomputation
    with the same (floor-epoch-seconds, orderkey) total order."""
    df = QUERIES["customer_first_last_order"].fn(spark, SF_SMOKE).toPandas()
    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").toPandas()
    o["ordval"] = (
        (o.o_orderdate.astype("int64") // 10**9) * 10_000_000 + o.o_orderkey
    )
    got = df.set_index("cust_key")
    for ck, g in o.groupby("o_custkey"):
        first = g.loc[g.ordval.idxmin()]
        last = g.loc[g.ordval.idxmax()]
        assert got.loc[ck, "first_priority"] == first.o_orderpriority
        assert got.loc[ck, "last_priority"] == last.o_orderpriority
        assert got.loc[ck, "n_orders"] == len(g)


def test_chunkers_edge_lengths_match_python_reference(spark):
    """Boundary-length documents (empty, 1, size-1, size, size+1,
    size+stride, size+stride+1 chars / analogous token counts) chunk
    exactly like a pure-Python reference implementation."""
    import hashlib
    import math

    from data_warehouse_product_mix_clustering_spark.plans.analytics import (
        _CHUNK_SIZE,
        _CHUNK_STRIDE,
        _TOK_CHUNK,
        _TOK_STRIDE,
        chunk_chars,
        chunk_tokens,
    )

    texts = {
        0: "",
        1: "x",
        2: "a" * (_CHUNK_SIZE - 1),
        3: "b" * _CHUNK_SIZE,
        4: "c" * (_CHUNK_SIZE + 1),
        5: "d" * (_CHUNK_SIZE + _CHUNK_STRIDE),
        6: "e" * (_CHUNK_SIZE + _CHUNK_STRIDE + 1),
        7: " ".join(f"t{i}" for i in range(_TOK_CHUNK + _TOK_STRIDE + 1)),
        8: "  leading and   trailing  ",
    }
    docs = spark.createDataFrame(list(texts.items()), ["doc_id", "text"])

    def ref_chars(t):
        n = len(t)
        last = max(0, math.ceil((n - _CHUNK_SIZE) / _CHUNK_STRIDE))
        out = []
        for i in range(last + 1):
            c = t[i * _CHUNK_STRIDE : i * _CHUNK_STRIDE + _CHUNK_SIZE]
            out.append((i, i * _CHUNK_STRIDE + 1, len(c), hashlib.md5(c.encode()).hexdigest()))
        return out

    got = chunk_chars(docs).toPandas()
    for doc_id, t in texts.items():
        g = got[got.doc_id == doc_id].sort_values("chunk_idx")
        want = ref_chars(t)
        assert [tuple(r) for r in g[["chunk_idx", "chunk_start", "chunk_len", "chunk_md5"]].itertuples(index=False)] == want, f"char doc {doc_id}"

    def ref_tokens(t):
        toks = [w for w in __import__("re").split(r"\s+", t) if w != ""]
        n = len(toks)
        last = max(0, math.ceil((n - _TOK_CHUNK) / _TOK_STRIDE))
        out = []
        for i in range(last + 1):
            c = toks[i * _TOK_STRIDE : i * _TOK_STRIDE + _TOK_CHUNK]
            out.append((i, len(c), hashlib.md5(" ".join(c).encode()).hexdigest()))
        return out

    got_t = chunk_tokens(docs).toPandas()
    for doc_id, t in texts.items():
        g = got_t[got_t.doc_id == doc_id].sort_values("chunk_idx")
        want = ref_tokens(t)
        assert [tuple(r) for r in g[["chunk_idx", "n_tokens", "chunk_md5"]].itertuples(index=False)] == want, f"token doc {doc_id}"


def test_pareto_and_gini_distributed_twins_exactly_equal(spark):
    """The Pareto/Gini single-partition-window class now carries its
    escape hatch as CODE (operators/packing.py::with_rank_and_running):
    the distributed two-pass formulations must equal the registered
    global-window queries EXACTLY (prefix sums and ranks are
    associative — this is an exact twin, not an approximation), and
    their plans must contain NO global (un-partitioned) Window
    operator."""
    from data_warehouse_product_mix_clustering_spark.plans.analytics import (
        customer_revenue_gini,
        customer_revenue_gini_distributed,
        revenue_pareto_share,
        revenue_pareto_share_distributed,
    )
    from conftest import SF_SMOKE

    for exact_fn, dist_fn in (
        (revenue_pareto_share, revenue_pareto_share_distributed),
        (customer_revenue_gini, customer_revenue_gini_distributed),
    ):
        a = exact_fn(spark, SF_SMOKE).collect()[0].asDict()
        b = dist_fn(spark, SF_SMOKE).collect()[0].asDict()
        assert a == b, (exact_fn.__name__, a, b)
        plan = (
            dist_fn(spark, SF_SMOKE)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        global_windows = [
            line
            for line in plan.splitlines()
            if "Window" in line and "__pid" not in line
        ]
        assert not global_windows, (dist_fn.__name__, global_windows)
