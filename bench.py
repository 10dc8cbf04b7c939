"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": <sf>}

Each query executes fully via the noop sink (no driver-side collect cost for
large result sets); per-query wall time includes planning + execution.
"""

from __future__ import annotations

import json
import os
import sys
import time

HEADLINE = [
    "q01_pricing_summary",       # scan + 6-group agg over lineitem
    "q05_local_supplier_volume", # 6-table join
    "q08_latest_event_per_user", # ranking window (online-view primitive)
    "q09_running_total",         # frame window over orders
    "q15_asof_join",             # merge-scan as-of join
    "q16_engineer_features",     # feature-engineering agg
    "q18_incremental_avg",       # window + weighted fold
    "q21_minhash_near_dups",     # MinHash+LSH dedup pipeline
    "q26_token_counts",          # regexp text analysis
    "q28_cosine_topk",           # brute-force ANN
    "q34_tumbling_windows",      # event-time windowed agg
    "q40_sessionize",            # gap sessionization
    "q41_salted_agg",            # skew-bounded two-stage agg
    "q42_sql_shipping_priority", # pure-SQL 3-table join + topk
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from feature_store_test_spark.registry import all_queries
    from feature_store_test_spark.session import get_spark

    # Local-bench scan parallelism: the sf0.1 files are ~1-10 MB, so the
    # 128 MB default split yields 1-3 scan partitions on a 32-thread local
    # master. 4 MB splits spread the scan; a real cluster at 100 TB keeps
    # the default (128 MB splits ≈ one task per HDFS/S3 block).
    spark = get_spark(
        app_name="fsts-bench",
        extra_conf={
            "spark.sql.files.maxPartitionBytes": "4m",
            "spark.sql.files.openCostInBytes": "512k",
        },
    )
    specs = all_queries()

    # warm each query's JVM/codegen path once on the smallest SF so measured
    # times reflect steady-state execution, not first-call JIT noise (cold
    # first runs measured 3-8x slower than warm on identical plans)
    for name in HEADLINE:
        specs[name].fn(spark, "/root/testdata/sf0.001").write.format("noop").mode(
            "overwrite"
        ).save()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.perf_counter()
        specs[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
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
                "sf": sf_val,
            }
        )
    )


if __name__ == "__main__":
    main()
