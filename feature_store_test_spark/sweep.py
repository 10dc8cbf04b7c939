"""Full-registry scale sweep: EVERY registered query timed cold at the
base SF (default sf0.1, bench BASE profile) and on the 10x scaleprobe
replica (bench SCALE profile), written to SCALE_SWEEP.json.

This is the audit that catches scale pathologies the 30-query headline
bench never touches (round 2: q39's 749s band join, ANN retrain storms;
round 3: q83's data-sized salt fan-out). A ratio near 1x means the query
is still floor-dominated at ~6M-row lineitem; near 10x means linear
data-bound work; far above flags quadratic candidate growth / broadcast
overflow / skew — except where the OUTPUT itself grows superlinearly by
declared semantics (q39 exploded pairs, q50 head-fingerprint pairs),
which the ratio can't distinguish from a bad plan; read those rows with
their documented cost models.

Run:  python -m feature_store_test_spark.sweep
Env:  SPARK_GRAFT_SF_DIR (base dir), SPARK_GRAFT_SWEEP_SKIP_10X=1 (x1 only)
"""

from __future__ import annotations

import json
import os
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from feature_store_test_spark.registry import (
        all_queries,
        persistent_rdd_ids,
        release_caches,
        release_new_rdds,
    )
    from feature_store_test_spark.session import get_spark

    # File-split confs are owned by bench's profiles (set via _set_profile
    # below before any timing) — no extra_conf here, so the values can't
    # drift from bench.BASE_PROFILE (r9 ADVICE: a dead 16m/512k copy under
    # a 'same as bench' comment contradicted the single-source cleanup).
    spark = get_spark(app_name="fsts-sweep")

    # the EXACT bench profiles (round 9: this module had drifted to a
    # stale 8-partition copy of a pre-r5 base profile — profile literals
    # now live in ONE place, bench.py, imported here and by plans.py)
    import sys as _sys

    _sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from bench import BASE_PROFILE, SCALE_PROFILE, profile_desc, set_profile

    def _set_profile(*profile) -> None:
        set_profile(spark, profile)

    with_10x = os.environ.get("SPARK_GRAFT_SWEEP_SKIP_10X", "0") != "1"
    scale_dir = None
    if with_10x:
        from feature_store_test_spark.scaleprobe import ensure_replica

        scale_dir = ensure_replica(spark)

    specs = all_queries()
    baseline_rdds = persistent_rdd_ids(spark)

    def run_once(name: str, data_dir: str) -> float:
        t0 = time.perf_counter()
        specs[name].fn(spark, data_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        dt = time.perf_counter() - t0
        spark.catalog.clearCache()
        release_caches()
        release_new_rdds(spark, baseline_rdds)
        return dt

    def run_timed(name: str, data_dir: str, n_runs: int = 2) -> float:
        # min-of-N cold-cache runs, the same protocol as bench.py: a
        # single shot on a shared 32-thread JVM occasionally absorbs a
        # multi-second GC pause from the preceding queries' garbage
        return min(run_once(name, data_dir) for _ in range(n_runs))

    out: dict[str, dict] = {}
    _set_profile(*BASE_PROFILE)
    # warm every query's JVM/codegen path at the smallest SF so the first
    # timed queries don't absorb cold-start JIT (without this, whichever
    # query runs first reads 5-8x slower than steady state)
    for name in specs:
        try:
            run_once(name, "/root/testdata/sf0.001")
        except Exception:  # noqa: BLE001 — recorded in the timed pass
            pass
    spark.sparkContext._jvm.System.gc()
    time.sleep(2.0)
    for name in specs:
        try:
            out[name] = {"x1": round(run_timed(name, sf_dir), 3)}
        except Exception as e:  # noqa: BLE001 — sweep must record, not die
            out[name] = {"err": str(e)[:200]}

    if with_10x and scale_dir:
        spark.sparkContext._jvm.System.gc()
        time.sleep(2.0)
        _set_profile(*SCALE_PROFILE)
        for name in specs:
            if "err" in out[name]:
                continue
            if specs[name].scale_demo:
                # output-bound demo views (q39's exploded dup² pairs):
                # their x10 wall measures OUTPUT volume by declared
                # semantics, not plan quality — the bounded twin (q39b)
                # carries the scale signal
                out[name]["skipped_10x"] = "output-bound demo view"
                continue
            try:
                t = run_timed(name, scale_dir)
                out[name]["x10"] = round(t, 3)
                out[name]["ratio"] = round(t / max(out[name]["x1"], 1e-9), 2)
            except Exception as e:  # noqa: BLE001
                out[name]["err"] = str(e)[:200]
        _set_profile(*BASE_PROFILE)

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALE_SWEEP.json",
    )
    x1_tot = sum(v.get("x1", 0.0) for v in out.values())
    x10_tot = sum(v.get("x10", 0.0) for v in out.values())
    result: dict[str, dict] = {
        "_totals": {
            "total_x1_sec": round(x1_tot, 2),
            "total_x10_sec": round(x10_tot, 2),
            "total_ratio": round(x10_tot / x1_tot, 2) if x1_tot else None,
            "n_queries": len(out),
            "protocol": (
                "min-of-2 cold-cache runs after an sf0.001 warmup pass; "
                f"x1 = sf0.1 under bench.BASE_PROFILE "
                f"({profile_desc(BASE_PROFILE)}), x10 = scaleprobe "
                f"replica under bench.SCALE_PROFILE "
                f"({profile_desc(SCALE_PROFILE)})"
            ),
        }
    }
    # the 100x probe (SPARK_GRAFT_SCALE_COPIES=100, 19-query subset) is
    # measured out-of-band and carried across regenerations
    if os.path.exists(path):
        try:
            with open(path) as f:
                probe100 = json.load(f).get("_probe100")
            if probe100:
                result["_probe100"] = probe100
        except Exception:  # noqa: BLE001
            pass
    result.update(out)
    with open(path, "w") as f:
        json.dump(result, f, indent=1)
    flagged = {
        n: v
        for n, v in out.items()
        if "err" in v or v.get("ratio", 0) > 12
    }
    print(
        f"\n{len(out)} queries  x1 total {x1_tot:.1f}s  "
        f"x10 total {x10_tot:.1f}s  flagged {json.dumps(flagged)}"
    )


if __name__ == "__main__":
    main()
