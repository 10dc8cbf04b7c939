"""Scratch interleaved A/B harness (not shipped): mirrors bench.py's
pure-execution protocol — bench BASE_PROFILE (imported, not copied),
clone()-execute body with bench's exact version pin, plans constructed
OUTSIDE the timed window, min-of-N with variants alternating inside the
same window so host drift cancels.

Usage: python ab.py [query ...]  (edit VARIANTS below per experiment)
"""
from __future__ import annotations

import statistics
import sys
import time

import pyspark

from bench import (
    BASE_PROFILE,
    CLONE_VALIDATED_VERSIONS,
    set_profile as _bench_set_profile,
)
from feature_store_test_spark.registry import all_queries, release_caches
from feature_store_test_spark.session import get_spark

SF = "/root/testdata/sf0.1"

# bench.py's exact-version allowlist (imported — one copy): on any other
# build clone() may silently reuse shuffle map outputs (the documented
# cheat) — fall back to the honest noop-save body
_CLONE_VALIDATED = pyspark.__version__ in CLONE_VALIDATED_VERSIONS


def set_profile(spark, sh=None, **overrides):
    base = dict(zip(("sh", "split", "aqe", "open_cost", "smj"), BASE_PROFILE))
    if sh is not None:
        base["sh"] = sh
    base.update(overrides)
    _bench_set_profile(
        spark,
        (base["sh"], base["split"], base["aqe"], base["open_cost"], base["smj"]),
    )


def execute_prepared(spark, df):
    if (
        not _CLONE_VALIDATED
        or spark.conf.get("spark.sql.adaptive.enabled") == "true"
    ):
        df.write.format("noop").mode("overwrite").save()
    else:
        df._jdf.queryExecution().executedPlan().clone().execute().count()


def ab(spark, queries, variants, n=6):
    """variants: dict name -> (setup_fn, builder_fn(spark, spec, sf) -> df).
    Plans are constructed (and warmed) before any timed run — the timed
    windows measure pure execution only, like bench.py."""
    specs = all_queries()
    results = {q: {v: [] for v in variants} for q in queries}
    prepared: dict[tuple[str, str], object] = {}
    for q in queries:
        for vname, (setup, build) in variants.items():
            setup(spark)
            df = build(spark, specs[q], SF)
            prepared[(q, vname)] = df
            execute_prepared(spark, df)  # warm
            spark.catalog.clearCache()
            release_caches()
    set_profile(spark)
    spark.sparkContext._jvm.System.gc()
    time.sleep(1.0)
    for q in queries:
        for _ in range(n):
            for vname, (setup, _build) in variants.items():
                setup(spark)
                df = prepared[(q, vname)]
                t0 = time.perf_counter()
                execute_prepared(spark, df)
                results[q][vname].append(time.perf_counter() - t0)
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
    queries = sys.argv[1:] or ["q01_pricing_summary", "q78_lonely_late_supplier"]
    variants = {
        "base": (lambda s: set_profile(s), lambda s, spec, sf: spec.fn(s, sf)),
    }
    ab(spark, queries, variants)


if __name__ == "__main__":
    main()
