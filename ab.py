"""Scratch interleaved A/B harness (not shipped): mirrors bench.py's
pure-execution protocol — base profile, clone()-execute body, min-of-N
with variants alternating inside the same window so host drift cancels.

Usage: python ab.py  (edit VARIANTS / QUERIES below per experiment)
"""
from __future__ import annotations

import statistics
import sys
import time

from feature_store_test_spark.registry import all_queries, release_caches
from feature_store_test_spark.session import get_spark

SF = "/root/testdata/sf0.1"


def set_profile(spark, sh=4, split=32 * 1024 * 1024, aqe=False,
                open_cost=2 * 1024 * 1024, smj=False):
    spark.conf.set("spark.sql.shuffle.partitions", str(sh))
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(split))
    spark.conf.set("spark.sql.adaptive.enabled", str(aqe).lower())
    spark.conf.set("spark.sql.files.openCostInBytes", str(open_cost))
    spark.conf.set("spark.sql.join.preferSortMergeJoin", str(smj).lower())


def execute_prepared(spark, df):
    if spark.conf.get("spark.sql.adaptive.enabled") == "true":
        df.write.format("noop").mode("overwrite").save()
    else:
        df._jdf.queryExecution().executedPlan().clone().execute().count()


def ab(spark, queries, variants, n=6):
    """variants: dict name -> (setup_fn, builder_fn(spark, sf) -> df).
    setup_fn runs before each timed run (e.g. conf change)."""
    specs = all_queries()
    results = {q: {v: [] for v in variants} for q in queries}
    # warm every (query, variant) once
    for q in queries:
        for vname, (setup, build) in variants.items():
            setup(spark)
            df = build(spark, specs[q], SF)
            execute_prepared(spark, df)
            spark.catalog.clearCache()
            release_caches()
    set_profile(spark)
    spark.sparkContext._jvm.System.gc()
    time.sleep(1.0)
    for q in queries:
        prepared = {}
        for i in range(n):
            for vname, (setup, build) in variants.items():
                setup(spark)
                t0 = time.perf_counter()
                if vname not in prepared:
                    prepared[vname] = build(spark, specs[q], SF)
                execute_prepared(spark, prepared[vname])
                dt = time.perf_counter() - t0
                results[q][vname].append(dt)
                spark.catalog.clearCache()
                release_caches()
    for q in queries:
        line = f"{q:30}"
        for vname in variants:
            r = results[q][vname]
            line += f" {vname}:min={min(r):.3f} med={statistics.median(r):.3f}"
        print(line)
    return results


def main():
    spark = get_spark()
    set_profile(spark)
    queries = sys.argv[1:] or [
        "q78_lonely_late_supplier", "q42_sql_shipping_priority",
        "q76_large_orders", "q105_referential_audit",
        "q05_local_supplier_volume", "q01_pricing_summary",
        "q16_engineer_features", "q41_salted_agg",
    ]
    variants = {
        "sh4": (lambda s: set_profile(s, sh=4), lambda s, spec, sf: spec.fn(s, sf)),
        "sh8": (lambda s: set_profile(s, sh=8), lambda s, spec, sf: spec.fn(s, sf)),
        "sh16": (lambda s: set_profile(s, sh=16), lambda s, spec, sf: spec.fn(s, sf)),
    }
    ab(spark, queries, variants)


if __name__ == "__main__":
    main()
