#!/usr/bin/env python
"""Benchmark harness (driver contract).

Runs the registry's headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON
line: ``{"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}``.

Each query is forced with a ``noop`` write — full plan execution on the
executors, no driver-side collect — so timings measure the engine, not
row transfer. One warm-up run of the cheapest query amortizes JVM/codegen
start-up out of the per-query numbers; each query then runs THREE times
and reports the fastest run. Profiling (round 7) showed per-query runs
keep dropping for several iterations — 2.8 → 1.64 → 1.26 → 1.11 s on the
heaviest query — as the JIT warms the generated code paths, so best-of-2
reported a still-warming run, not the plan's cost; best-of-3 lands within
~20% of steady state while keeping total bench wall bounded. The min is
the honest estimate of what the plan costs (ambient scheduler noise on a
shared host swings single runs 2-3x upward, never downward).
"""

from __future__ import annotations

import json
import os
import sys
import time

from data_warehouse_product_mix_clustering_spark.plans.registry import all_queries
from data_warehouse_product_mix_clustering_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Queries that memoize expensive driver-side state per (session, sf_dir) —
# today the KMeans fit cache behind product_clusters (plans/ml.py). Their
# best-of-3 number measures the CACHED read path (the steady-state serving
# cost, which is what the reference's @st.cache_data dashboard pays too);
# the bench JSON annotates them as such and reports the first, genuinely
# cold run separately so rounds compare like with like (VERDICT r7 #3).
CACHED_FIT = {"product_clusters"}


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    queries = {n: q for n, q in all_queries().items() if q.headline}
    spark = get_spark(app_name="data_warehouse_product_mix_clustering_spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm-up: JVM JIT, codegen cache, parquet footer reads. Use the
    # cheapest headline query — iteration order now leads with a heavy
    # dedup query, which would add seconds of untimed-but-real wall.
    first = queries.get("pricing_summary") or next(iter(queries.values()))
    _force(first.fn(spark, SF_DIR))

    timings: dict[str, float] = {}
    cold: dict[str, float] = {}
    for name, q in sorted(queries.items()):
        if name in CACHED_FIT:
            # Evict any fit memoized by the warm-up so run 1 is honestly cold.
            from data_warehouse_product_mix_clustering_spark.plans.ml import invalidate_cluster_cache

            invalidate_cluster_cache(SF_DIR)
        best = float("inf")
        for i in range(3):
            t0 = time.perf_counter()
            _force(q.fn(spark, SF_DIR))
            dt = time.perf_counter() - t0
            if i == 0 and name in CACHED_FIT:
                cold[name] = round(dt, 3)
                continue  # runs 2-3 measure the cached serving path
            best = min(best, dt)
        timings[name] = round(best, 3)

    sf = os.path.basename(SF_DIR.rstrip("/")).removeprefix("sf")
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "cached": {n: True for n in sorted(CACHED_FIT) if n in timings},
                "cold": cold,
                "sf": sf_val,
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
