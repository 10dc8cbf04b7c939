"""Query registry: every engine capability is declared as a named query.

Each entry pairs a Spark implementation (``fn(spark, sf_dir) -> DataFrame``)
with an equivalent DuckDB oracle SQL string run on the same parquet tables.
The driver executes both at sf0.01 and hash-compares results; queries whose
semantics cannot be expressed in SQL (stateful streaming, iterative ML) set
``oracle=None`` and get a rows-only check.

Conventions that keep the hash-compare honest:
- Alias every computed column identically in Spark and SQL (the driver sorts
  columns by name before hashing).
- Money sums: ``CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE)`` on both sides
  — exact integer-cent arithmetic makes the result bit-identical regardless
  of summation order (Spark partial aggs vs DuckDB's), then one double cast.
- Ratios / averages: compute from exact decimal sums where possible, else
  round to 6 dp on both sides (double accumulation order differs between
  engines; 1e-6 rounding absorbs it while staying far above the noise).
- LIMIT/top-k queries carry a total deterministic ORDER BY (unique tiebreak
  column) — otherwise ties make the result set itself nondeterministic.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None -> rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)
    # Output-bound demo view: the OUTPUT grows superlinearly by declared
    # semantics (q39's exploded dup² pairs), so scale sweeps report the
    # output size, not plan quality. The scale sweep skips these at the
    # 10x point; the bounded twin (q39b) carries the scale contract.
    scale_demo: bool = False


_REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None,
    doc: str = "",
    tags: tuple[str, ...] = (),
    scale_demo: bool = False,
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(
            name=name,
            fn=fn,
            oracle=oracle,
            doc=doc,
            tags=tags,
            scale_demo=scale_demo,
        )
        return fn

    return deco


def all_queries() -> dict[str, QuerySpec]:
    # Import for side effect: query modules self-register on import.
    from feature_store_test_spark import queries as _q  # noqa: F401

    return dict(_REGISTRY)


# ---------------------------------------------------------------------------
# Query-scoped cache tracking. A registered query cannot unpersist the
# intermediates it caches — its result DataFrame still depends on them when
# the function returns — so caches created inside query bodies go through
# ``managed_cache`` and the HARNESS (oracle comparator, bench loop) calls
# ``release_caches`` once the result is materialized. Without this, a
# long-lived session running many queries (serving, 100x probes, the
# driver's full sweep) accumulates cached RDDs that never free.
# ---------------------------------------------------------------------------
_live_caches: list[DataFrame] = []


def managed_cache(df: DataFrame) -> DataFrame:
    """``df.cache()`` that the harness can release after consumption."""
    df = df.cache()
    _live_caches.append(df)
    return df


def live_cache_count() -> int:
    """Managed caches currently registered (harness introspection: a
    query whose plan binds cached intermediates cannot be re-executed as
    a prepared plan after those caches are released — see bench.py)."""
    return len(_live_caches)


def release_caches() -> None:
    """Unpersist every managed cache (call after materializing a query)."""
    while _live_caches:
        try:
            _live_caches.pop().unpersist()
        except Exception:  # noqa: BLE001 — a dead session must not mask cleanup
            pass


def persistent_rdd_ids(spark: SparkSession) -> set[int]:
    """Ids of currently-persisted RDDs (includes localCheckpoint blocks,
    which live at the RDD level where DataFrame.unpersist can't reach)."""
    m = spark.sparkContext._jsc.getPersistentRDDs()
    return {int(k) for k in m.keySet().toArray()}


def release_new_rdds(spark: SparkSession, baseline: set[int]) -> None:
    """Unpersist RDDs persisted since ``baseline`` was snapshotted.

    The scoped sweep for RDD-level persistence a query created but cannot
    free itself — iterative operators' localCheckpoints (connected
    components' per-round label frames). Baseline scoping means caches
    that predate the query (a user's own, another query's in-flight
    state) are untouched."""
    try:
        m = spark.sparkContext._jsc.getPersistentRDDs()
        for k in m.keySet().toArray():
            if int(k) not in baseline:
                m.get(k).unpersist()
    except Exception:  # noqa: BLE001 — cleanup must not mask the query result
        pass
