"""Embedding similarity search (north-star: ANN over array<float> columns).

Baseline: brute-force cosine top-k — broadcast the (small) query set against
the full corpus; dot products run as JVM-side higher-order functions
(zip_with + aggregate folding in array order with double accumulation, so
results are bit-stable), then a per-query ranking window.

Scale path: the same top-k with an LSH pre-bucket (random-hyperplane signs
derived from md5, same determinism story as dedup) so each query only scans
its bucket — implemented in later rounds; the brute-force form stays as the
exact-recall oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: str | Column, b: str | Column) -> Column:
    """Ordered-fold dot product with double accumulation (deterministic)."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: str | Column) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )


def cosine(a: str | Column, b: str | Column) -> Column:
    # nullif guards the zero-vector case: under Spark 4's default ANSI
    # mode 0/0 raises DIVIDE_BY_ZERO instead of yielding NaN; NULL
    # similarity fails every >= threshold filter on both engines, and
    # (unlike NaN, which Spark orders ABOVE every number) sorts LAST in
    # descending rankings — the sane degenerate behavior either way.
    return dot(a, b) / F.nullif(l2_norm(a) * l2_norm(b), F.lit(0.0))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    round_dp: int = 6,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Output: (query_id, neighbor_id, rank, cos_sim). Self-matches excluded.
    The similarity is rounded BEFORE ranking and ties break on neighbor id,
    so the result set is fully deterministic.

    Scale: queries broadcast (top-k serving batches are small); the corpus
    is scanned once, partition-parallel; ranking shuffles only
    (n_queries × corpus) score rows — at 100 TB use the LSH variant to cut
    the scored candidate set first.
    """
    # Norms are precomputed once per row on each side BEFORE the pair join:
    # higher-order array folds are interpreted (not codegen'd), so folding
    # 3 arrays per pair (dot + both norms) costs 3x the single dot fold.
    # The divisor qn*cn keeps the exact multiplication order of
    # l2_norm(a)*l2_norm(b), so scores are bit-identical to cosine().
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        l2_norm(vec_col).alias("__qn"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        l2_norm(vec_col).alias("__cn"),
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                # nullif: zero-vector guard, see cosine()
                dot("__qv", "__cv")
                / F.nullif(F.col("__qn") * F.col("__cn"), F.lit(0.0)),
                round_dp,
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
    )


def cosine_topk_arrow(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    round_dp: int = 6,
    chunk_bytes: int = 128 * 1024 * 1024,
    lin_map: list[list[float]] | None = None,
) -> DataFrame:
    """``cosine_topk`` on the BLAS path: the corpus scan scores each Arrow
    batch against the whole (broadcast, request-sized) query matrix with
    one numpy GEMM instead of 1 interpreted array-fold per (query, row)
    pair — the faiss/ScaNN exhaustive-scan inner loop, and the right
    brute-force shape at scale (measured ~5x on a 50k-corpus × 5k-query
    scan; the fold form evaluates 250M interpreted lambdas there).

    ``lin_map`` (round 10): an optional (k_out × dim) projection matrix
    applied to BOTH sides inside the scorer (one extra GEMM per batch)
    before normalization — compress-then-score for the PCA candidate
    path without materializing a projected column. The JVM fold this
    replaces ran interpreted per array element (61M lambda evals over
    the 10x corpus ≈ 30s+ of q91's exec) and cost ~3.4s of eager
    per-dim Column analysis at every plan build. Numerics: projection
    joins the scorer's existing tolerance contract — GEMM accumulation
    differs from the ordered fold in the last ulp, absorbed by the
    ``round_dp`` round except exactly at a rounding boundary (same
    caveat already documented for the scoring GEMM itself; candidates
    only — exact rescoring downstream is unaffected).

    Exactness: scores are rounded to ``round_dp`` BEFORE ranking with the
    id tiebreak, like ``cosine_topk``; each scan chunk emits every row
    scoring >= its (k+1)-th best per query (ties included, so the global
    re-rank sees every possible winner), and a final window takes the
    true top-k. GEMM accumulation order differs from the ordered fold in
    the last ulp, which the 6-dp round absorbs except exactly at a
    rounding boundary — ``tests/test_similarity.py`` pins equality to
    ``cosine_topk`` on the fixtures.

    Scale: queries broadcast inside the closure (request-sized by
    definition); the corpus is scanned once, partition-parallel; only
    ~(k+1) candidate rows per (chunk, query) shuffle into the final
    ranking window.
    """
    import numpy as np

    from pyspark.sql import types as T

    # The request-side collect is memoized on (application id, plan
    # semanticHash) — the established ANN-training policy (_memo_train):
    # the query matrix is a pure function of the queries PLAN, so repeated
    # constructions of the same request batch (bench min-of-N loops, the
    # driver's per-query runs) pay the driver collect job once. Same
    # staleness caveat as _memo_train, documented there.
    P = None if lin_map is None else np.asarray(lin_map, dtype=np.float64)

    def _collect_q():
        q_rows = queries.select(id_col, vec_col).collect()
        qids = [r[id_col] for r in q_rows]
        Qm = np.asarray([r[vec_col] for r in q_rows], dtype=np.float64)
        if len(Qm):
            if P is not None:
                Qm = Qm @ P.T
            qn = np.linalg.norm(Qm, axis=1, keepdims=True)
            qn[qn == 0.0] = 1.0
            Qm = Qm / qn
        return qids, Qm

    qids, Q = _memo_query_matrix(
        queries,
        id_col,
        vec_col,
        _collect_q,
        extra=() if P is None else ("lin_map", P.shape, P.tobytes()),
    )
    nq = len(qids)
    qids_arr = np.asarray(qids)
    # corpus rows per scoring chunk so the (chunk × nq) score matrix stays
    # inside chunk_bytes of doubles
    chunk = max(256, int(chunk_bytes / 8 / max(nq, 1)))
    id_type = corpus.schema[id_col].dataType
    out_schema = T.StructType(
        [
            T.StructField("query_id", id_type),
            T.StructField("neighbor_id", id_type),
            T.StructField("cos_sim", T.DoubleType()),
        ]
    )

    def score(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf) or not nq:
                continue
            C_all = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
            ids_all = pdf[id_col].to_numpy()
            if P is not None:
                C_all = C_all @ P.T
            cn = np.linalg.norm(C_all, axis=1, keepdims=True)
            cn[cn == 0.0] = 1.0
            C_all = C_all / cn
            for s in range(0, len(ids_all), chunk):
                C = C_all[s : s + chunk]
                ids = ids_all[s : s + chunk]
                S = np.round(C @ Q.T, round_dp)  # (rows, nq)
                if len(ids) > k + 1:
                    # (k+1)-th best per query; emit everything >= it so
                    # tied rows can't be cut before the global re-rank
                    thr = np.partition(S, len(ids) - (k + 1), axis=0)[
                        len(ids) - (k + 1)
                    ]
                    rmask = S >= thr[None, :]
                else:
                    rmask = np.ones_like(S, dtype=bool)
                rows, cols = np.nonzero(rmask)
                yield pd.DataFrame(
                    {
                        "query_id": qids_arr[cols],
                        "neighbor_id": ids[rows],
                        "cos_sim": S[rows, cols],
                    }
                )

    from feature_store_test_spark.operators.multimodal import python_stage_tasks

    # Right-size the Python scoring stage to its input bytes (local leaf
    # parallelism otherwise splits a sub-MB corpus into 32 ~20 KB Arrow
    # tasks whose fixed worker cost dwarfs the GEMM). Safe here: each
    # chunk emits its own >=(k+1)-th-best candidates and the global
    # window re-ranks, so task boundaries never change the result.
    n_tasks = python_stage_tasks(corpus)
    src = corpus.coalesce(n_tasks) if n_tasks is not None else corpus
    cands = src.mapInPandas(score, out_schema).where(
        F.col("query_id") != F.col("neighbor_id")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        cands.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
    )


# ---------------------------------------------------------------------------
# LSH-bucketed ANN (the 100 TB scale path)
# ---------------------------------------------------------------------------

def _hyperplane_coefs(n_planes: int, dim: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes derived from md5 digests
    (no RNG state, reproducible across engines/runs — the same determinism
    discipline as the minhash family). Coefficient for (plane p, dim d) =
    first md5 nibble of "p_d" minus 7.5 → symmetric around 0."""
    import hashlib

    return [
        [
            int(hashlib.md5(f"{p}_{d}".encode()).hexdigest()[0], 16) - 7.5
            for d in range(dim)
        ]
        for p in range(n_planes)
    ]


def lsh_bucket(vec_col: str | Column, n_planes: int, dim: int) -> Column:
    """Random-hyperplane bucket id: one sign bit per plane, as a bit string.

    Cosine-LSH property: P(two vectors agree on a plane) = 1 - θ/π, so
    near-duplicate vectors land in the same bucket with high probability
    while the corpus spreads over 2^n_planes buckets.
    """
    # single-parse SQL form (round 11, the r6 fusion playbook): the
    # Column-API loop eagerly analyzed n_planes nested fold trees per
    # call (~0.3s of q38's fn); one F.expr parse builds the IDENTICAL
    # expression tree (repr round-trips doubles exactly), execution
    # unchanged.
    v_sql = f"`{vec_col}`" if isinstance(vec_col, str) else None
    if v_sql is None:
        # Column input: keep the API form (no SQL name to splice)
        v = vec_col
        coefs = _hyperplane_coefs(n_planes, dim)
        bits = []
        for plane in coefs:
            c = F.array(*[F.lit(x) for x in plane])
            d = F.aggregate(
                F.zip_with(v, c, lambda x, y: x.cast("double") * y),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            bits.append(F.when(d >= 0, F.lit("1")).otherwise(F.lit("0")))
        return F.concat(*bits)
    parts = []
    for plane in _hyperplane_coefs(n_planes, dim):
        arr = ", ".join(f"{float(x)!r}D" for x in plane)
        d = (
            f"aggregate(zip_with({v_sql}, array({arr}), "
            "(x, y) -> CAST(x AS DOUBLE) * y), 0D, (acc, x) -> acc + x)"
        )
        parts.append(f"IF({d} >= 0D, '1', '0')")
    return F.expr("concat(" + ", ".join(parts) + ")")


def _grid_dirs(g: int, dim: int) -> list[list[float]]:
    """``g`` orthonormal directions from the md5-derived coefficient
    family (Gram–Schmidt) — pinned constants, no RNG state."""
    import math

    dirs: list[list[float]] = []
    for row in _hyperplane_coefs(g, dim):
        v = [float(x) for x in row]
        for u in dirs:
            d = sum(x * y for x, y in zip(v, u))
            v = [x - d * y for x, y in zip(v, u)]
        n = math.sqrt(sum(x * x for x in v))
        dirs.append([x / n for x in v])
    return dirs


def _grid_cells(
    vec_col: str | Column, threshold: float, dim: int, g: int = 2
) -> Column:
    """ε-grid cell vector (array<long> of ``g`` coordinates) of a
    vector's normalized projections onto pinned orthonormal directions —
    the COMPLETE sub-bucketing primitive for cosine-threshold pair
    generation (unlike sign-bit LSH, which loses recall).

    For unit vectors, cos(a,b) ≥ t ⇒ ‖a−b‖ ≤ √(2−2t) =: ε, and by
    Cauchy–Schwarz |⟨a,u_i⟩ − ⟨b,u_i⟩| ≤ ‖a−b‖ for each unit u_i — so a
    qualifying pair's cells differ by at most 1 IN EVERY coordinate, and
    probing the 3^g adjacent-cell combinations is exhaustive. Pruning
    multiplies across coordinates and sharpens as t → 1 (ε shrinks):
    strong for SemDeDup-style t ≥ 0.9, weak for loose thresholds —
    which is why callers engage it cost-based, only where all-pairs
    would go quadratic."""
    import math

    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    # ε derives from (threshold − 5e-7), not the raw threshold: the
    # emitted filter is round(cos, 6) ≥ t, which admits true cosines down
    # to t − 5e-7, and grid coverage must include everything the filter
    # can admit or the output would depend on the oversize routing in
    # that half-ulp band (exact plan-split contract).
    eps = math.sqrt(max(2.0 * (1.0 - (threshold - 5e-7)), 1e-12))
    if isinstance(vec_col, str):
        # single-parse SQL form — same rationale as lsh_bucket (round 11)
        v_sql = f"`{vec_col}`"
        nrm_sql = (
            f"sqrt(aggregate({v_sql}, 0D, (acc, x) -> acc"
            " + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"
        )
        cells_sql = []
        for u in _grid_dirs(g, dim):
            arr = ", ".join(f"{float(x)!r}D" for x in u)
            proj = (
                f"aggregate(zip_with({v_sql}, array({arr}), "
                "(x, y) -> CAST(x AS DOUBLE) * y), 0D, (acc, x) -> acc + x)"
                f" / {nrm_sql}"
            )
            cells_sql.append(f"CAST(floor(({proj}) / {eps!r}D) AS BIGINT)")
        return F.expr("array(" + ", ".join(cells_sql) + ")")
    nrm = l2_norm(v)
    cells = []
    for u in _grid_dirs(g, dim):
        c = F.array(*[F.lit(x) for x in u])
        proj = F.aggregate(
            F.zip_with(v, c, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ) / nrm
        cells.append(F.floor(proj / F.lit(eps)).cast("long"))
    return F.array(*cells)


def threshold_pairs_within_buckets(
    g: DataFrame,
    bucket_col: str,
    vec_col: str,
    rep_col: str,
    threshold: float,
    keep_cols: tuple[str, ...] = (),
    oversize: int = 4096,
    dim: int = 64,
    grid_dims: int = 2,
    scorer: str = "fold",
) -> DataFrame:
    """All (ra < rb) pairs within a bucket whose round(cosine, 6) ≥
    ``threshold`` — EXACT output (same filter expression either way),
    with a cost-based plan split: buckets with ≤ ``oversize`` distinct
    vectors take the direct all-pairs join; oversized buckets route
    through the ε-grid candidate join (``_grid_cell``), cutting the
    candidate count from O(n²) to Σ_cell O(n_cell·n_adjacent) — the same
    skew discipline as operators/dedup.exact_collapse. The bucket-count
    probe is one small aggregation collected driver-side (bucket domains
    are bounded: labels, clusters, shard keys).

    ``scorer``: "fold" scores pairs with the JVM ordered-fold dot
    product; "arrow" runs each small bucket's all-pairs block through
    one numpy GEMM inside applyInPandas (the cosine_topk_arrow shape —
    measured ~2x on the within-label SemDeDup stage, and the gap widens
    with bucket size). Same 6-dp rounded contract; GEMM accumulation
    ulps are absorbed by the round exactly as in q123, and the oversized-
    bucket grid path stays fold-based either way (its candidates are
    sparse, not blocks).

    Output: (ra, rb, cos_sim, {keep}_a, {keep}_b)."""
    if scorer not in ("fold", "arrow"):
        raise ValueError(f"unknown scorer {scorer!r}")
    keep = list(keep_cols)

    def side(base: DataFrame, tag: str, cell: bool = False) -> DataFrame:
        cols = [
            F.col(bucket_col),
            F.col(rep_col).alias(f"r{tag}"),
            F.col(vec_col).alias(f"v{tag}"),
            # norms precomputed ONCE per distinct vector, not per pair:
            # higher-order folds are interpreted, and cosine() would
            # evaluate BOTH norm folds for every candidate pair — same
            # bits (identical fold, evaluated earlier), 3x less fold work
            l2_norm(vec_col).alias(f"n{tag}"),
            *(
                [_grid_cells(vec_col, threshold, dim, grid_dims).alias(f"cell_{tag}")]
                if cell
                else []
            ),
            *[F.col(k).alias(f"{k}_{tag}") for k in keep],
        ]
        return base.select(*cols)

    # nullif: zero-vector guard, see cosine()
    sim = F.round(
        dot("va", "vb") / F.nullif(F.col("na") * F.col("nb"), F.lit(0.0)), 6
    )
    out_cols = [
        "ra", "rb", sim.alias("cos_sim"),
        *[f"{k}_a" for k in keep], *[f"{k}_b" for k in keep],
    ]

    def all_pairs_fold(base: DataFrame) -> DataFrame:
        return (
            side(base, "a")
            .join(side(base, "b"), bucket_col)
            .where(F.col("ra") < F.col("rb"))
            .where(sim >= threshold)
            .select(*out_cols)
        )

    def all_pairs_arrow(base: DataFrame) -> DataFrame:
        import numpy as np
        import pandas as pd

        from pyspark.sql import types as T

        rep_type = base.schema[rep_col].dataType
        keep_types = {k: base.schema[k].dataType for k in keep}
        out_schema = T.StructType(
            [
                T.StructField("ra", rep_type),
                T.StructField("rb", rep_type),
                T.StructField("cos_sim", T.DoubleType()),
                *[T.StructField(f"{k}_a", keep_types[k]) for k in keep],
                *[T.StructField(f"{k}_b", keep_types[k]) for k in keep],
            ]
        )

        def block(pdf: pd.DataFrame) -> pd.DataFrame:
            n = len(pdf)
            if n < 2:
                return pd.DataFrame({f.name: [] for f in out_schema.fields})
            # order by rep so emitted (i < j) positions give ra < rb
            pdf = pdf.sort_values(rep_col, kind="mergesort").reset_index(drop=True)
            X = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
            nrm = np.linalg.norm(X, axis=1, keepdims=True)
            nrm[nrm == 0.0] = 1.0
            S = np.round((X / nrm) @ (X / nrm).T, 6)
            iu, ju = np.triu_indices(n, k=1)
            keepm = S[iu, ju] >= threshold
            iu, ju = iu[keepm], ju[keepm]
            out = {
                "ra": pdf[rep_col].to_numpy()[iu],
                "rb": pdf[rep_col].to_numpy()[ju],
                "cos_sim": S[iu, ju],
            }
            for k in keep:
                out[f"{k}_a"] = pdf[k].to_numpy()[iu]
                out[f"{k}_b"] = pdf[k].to_numpy()[ju]
            return pd.DataFrame(out)

        return base.select(bucket_col, rep_col, vec_col, *keep).groupBy(
            bucket_col
        ).applyInPandas(lambda _, pdf: block(pdf), out_schema)

    all_pairs = all_pairs_arrow if scorer == "arrow" else all_pairs_fold

    # oversized-bucket probe: one small agg, memoized like ANN training —
    # a pure function of the input data, so bench loops / serving
    # sessions pay the scan once per plan. semanticHash collisions /
    # in-place file rewrites can only mis-route buckets between the two
    # plan paths, and BOTH paths are exact for any routing (the ε-grid is
    # complete) — perf-only risk, never correctness (dedup.py precedent)
    memo = (
        g.sparkSession.sparkContext.applicationId,
        g.semanticHash(),
        "__oversize_probe__",
        bucket_col,
        oversize,
    )
    big = _train_cache.get(memo)
    if big is None:
        counts = g.groupBy(bucket_col).agg(F.count(F.lit(1)).alias("n"))
        big = [r[bucket_col] for r in counts.where(F.col("n") > oversize).collect()]
        if len(_train_cache) >= _TRAIN_CACHE_MAX:
            _train_cache.pop(next(iter(_train_cache)))
        _train_cache[memo] = big
    if not big:
        return all_pairs(g)

    import itertools

    big_g = g.where(F.col(bucket_col).isin(big))
    combos = [
        F.array(*[F.element_at(F.col("cell_a"), i + 1) + F.lit(d) for i, d in enumerate(offs)])
        for offs in itertools.product((-1, 0, 1), repeat=grid_dims)
    ]
    probes = side(big_g, "a", cell=True).select(
        "*", F.explode(F.array(*combos)).alias("__probe")
    )
    b = side(big_g, "b", cell=True)
    grid = (
        probes.join(
            b,
            (probes[bucket_col] == b[bucket_col])
            & (probes["__probe"] == b["cell_b"]),
        )
        .where(F.col("ra") < F.col("rb"))
        .where(sim >= threshold)
        .select(*out_cols)
    )
    return all_pairs(g.where(~F.col(bucket_col).isin(big))).unionByName(grid)


def lsh_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_planes: int = 4,
    dim: int = 64,
    round_dp: int = 6,
    probes: int = 0,
) -> DataFrame:
    """Approximate top-k: score only same-bucket candidates.

    Scale shape: corpus is bucketed once (a narrow derived column, ideal
    for partitioning a stored index table by bucket); each query joins its
    bucket — an equi-join on bucket id instead of a full cross-product, so
    scoring cost drops by ~2^n_planes. Recall is data-dependent (near-dup
    heavy corpora recall well; uniformly random vectors mostly don't
    collide) — the brute-force operator stays the exact baseline.

    ``probes``: multi-probe LSH — additionally search buckets within
    hamming distance ``probes`` of the query's bucket (probes=1 → flip
    each single bit). Each probe multiplies query-side rows (cheap, they
    broadcast) and recall rises toward exact as probes → n_planes.
    """
    bq = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        lsh_bucket(vec_col, n_planes, dim).alias("bucket"),
    )
    if probes >= 1:
        # expand each query to its bucket + all single-bit-flip buckets
        def flip(bits: F.Column, i: int) -> F.Column:
            flipped = F.when(
                F.substring(bits, i + 1, 1) == "1", F.lit("0")
            ).otherwise(F.lit("1"))
            return F.concat(
                F.substring(bits, 1, i), flipped, F.substring(bits, i + 2, n_planes - i - 1)
            )

        variants = F.array(
            F.col("bucket"), *[flip(F.col("bucket"), i) for i in range(n_planes)]
        )
        bq = bq.select(
            "query_id", "__qv", F.explode(variants).alias("bucket")
        )
    bc = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        lsh_bucket(vec_col, n_planes, dim).alias("bucket"),
    )
    scored = (
        bc.join(F.broadcast(bq), "bucket")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine("__qv", "__cv"), round_dp).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
    )


# ---------------------------------------------------------------------------
# Training memoization: ivf_train / pq_train / pca_train are train-once/
# serve-many artifacts (centroids, codebooks, components — all tiny,
# driver-side). Registered queries only receive (spark, sf_dir), so they
# would otherwise retrain per invocation; memoizing on (application id,
# input-plan semanticHash, params) makes repeated calls — bench min-of-N
# loops, the driver's per-query runs, a session serving many requests —
# pay training once, with NO behavior change on the first call. A stale
# hit (files rewritten in-place under the same plan) returns a stale
# index: exactly the staleness contract of any persisted ANN index
# (store/annindex.py), where refresh = retrain. Bounded like the dedup
# probe cache.
# ---------------------------------------------------------------------------
_train_cache: dict[tuple, object] = {}
_TRAIN_CACHE_MAX = 64


def _memo_train(df: DataFrame, tag: str, params: tuple, build):
    key = (
        df.sparkSession.sparkContext.applicationId,
        df.semanticHash(),
        tag,
        params,
    )
    hit = _train_cache.get(key)
    if hit is None:
        hit = build()
        if len(_train_cache) >= _TRAIN_CACHE_MAX:
            _train_cache.pop(next(iter(_train_cache)))
        _train_cache[key] = hit
    return hit


def _memo_query_matrix(
    queries: DataFrame, id_col: str, vec_col: str, collect, extra: tuple = ()
):
    """Memoized driver collect of a request batch (ids, normalized matrix)
    for the exact GEMM scorer.

    Unlike the train-once artifacts, this memo feeds an EXACT scorer, so
    its key is strengthened beyond ``_memo_train``'s 32-bit semanticHash
    (ADVICE r6): it also folds in (a) an md5 of the full analyzed-plan
    text — two different query plans colliding on both the 32-bit hash
    AND the full plan string is not a realistic event — and (b) the
    identity (path, size, mtime-ns) of every input file behind the plan,
    so rewriting the query batch in place under an identical plan misses
    the cache and re-collects. Both are driver-side only (no Spark jobs),
    preserving the bench/serving win the memo exists for.
    """
    import hashlib

    # CANONICALIZED plan text, not the raw analyzed string: raw plan
    # strings embed exprIds (name#123), which are globally monotonic, so
    # a caller reconstructing an identical request batch outside the
    # exprId-stable reader memo would never hit the cache (code-review
    # r7). Canonicalization normalizes exprIds while still capturing the
    # full tree (the 32-bit semanticHash collision concern this key
    # strengthens against).
    plan_txt = queries._jdf.queryExecution().analyzed().canonicalized().toString()
    plan_md5 = hashlib.md5(plan_txt.encode()).hexdigest()
    files = []
    try:
        for f in sorted(queries.inputFiles()):
            p = f[7:] if f.startswith("file://") else f
            try:
                st = os.stat(p)
                files.append((f, st.st_size, st.st_mtime_ns))
            except OSError:
                files.append((f, -1, -1))
    except Exception:  # non-file-based plans (in-memory relations)
        pass
    return _memo_train(
        queries,
        "topk_query_matrix",
        (id_col, vec_col, plan_md5, tuple(files), extra),
        collect,
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the second scale path next to LSH bucketing
# ---------------------------------------------------------------------------

def ivf_assign(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str,
    vec_col: str,
    n_probe: int = 1,
    round_dp: int = 6,
) -> DataFrame:
    """Assign each vector to its ``n_probe`` nearest centroids by cosine.

    ``centroids`` must have columns (cid, cv). Similarity is rounded before
    ranking with a centroid-id tiebreak, so cell assignment is fully
    deterministic and reproducible across engines — which is why the IVF
    path (unlike raw-sign LSH) can be oracle-checked end to end.

    Scale: centroids broadcast (coarse quantizers are small — thousands of
    cells for billions of vectors); assignment is one scan, no shuffle.

    Norms are precomputed ONCE per side before the pair join (round 11 —
    the cosine_topk discipline): higher-order array folds run
    interpreted, and ``cosine()`` per (row, centroid) pair re-folded the
    row norm |cells| times and the centroid norm |rows| times. The
    divisor keeps the exact ``l2(a)*l2(b)`` multiplication order, so
    assignments are bit-identical.
    """
    c = centroids.select("cid", "cv", l2_norm("cv").alias("__cvn"))
    w = Window.partitionBy("__id").orderBy(F.col("__sim").desc(), F.col("cid"))
    return (
        df.select(
            F.col(id_col).alias("__id"),
            F.col(vec_col).alias("__v"),
            l2_norm(vec_col).alias("__vn"),
        )
        .join(F.broadcast(c))
        .select(
            "__id",
            "__v",
            "cid",
            F.round(
                dot("__v", "cv")
                / F.nullif(F.col("__vn") * F.col("__cvn"), F.lit(0.0)),
                round_dp,
            ).alias("__sim"),
        )
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= n_probe)
        .select("__id", "__v", "cid")
    )


def ivf_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_probe: int = 2,
    round_dp: int = 6,
) -> DataFrame:
    """IVF-flat approximate nearest neighbors.

    Corpus vectors live in exactly one cell (their nearest centroid); each
    query probes its ``n_probe`` nearest cells and brute-forces only those
    members. Output: (query_id, neighbor_id, rank, cos_sim) — deterministic
    via the same round-then-rank discipline as ``cosine_topk``.

    Scale: the corpus scan partitions by cell id (pre-partition the stored
    table by cid to make the probe join shuffle-free); per-query work drops
    from |corpus| to ~n_probe/n_cells of it. At real scale the centroids
    come from a k-means fit — here they are seeded deterministically so the
    whole operator is engine-comparable.
    """
    # norms precomputed once per side before the cell join (round 11 —
    # the cosine_topk discipline; divisor keeps the l2(q)*l2(c) order so
    # scores are bit-identical): the pair stage folds ONE dot per
    # (query, cellmate) instead of three array folds
    ca = ivf_assign(corpus, centroids, id_col, vec_col, 1, round_dp).select(
        F.col("__id").alias("neighbor_id"),
        F.col("__v").alias("__cv"),
        "cid",
        l2_norm("__v").alias("__cn"),
    )
    qa = ivf_assign(queries, centroids, id_col, vec_col, n_probe, round_dp).select(
        F.col("__id").alias("query_id"),
        F.col("__v").alias("__qv"),
        "cid",
        l2_norm("__v").alias("__qn"),
    )
    scored = (
        ca.join(qa, "cid")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot("__qv", "__cv")
                / F.nullif(F.col("__qn") * F.col("__cn"), F.lit(0.0)),
                round_dp,
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
    )


def _exact_rescore(
    cands: DataFrame,
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    round_dp: int,
    precompute_corpus_norm: bool = True,
) -> DataFrame:
    """Exact full-dimension cosine rescore of (query_id, neighbor_id)
    candidate pairs + top-``k`` window — the shared tail of the ANN
    operators. Norms are precomputed before the pair joins (round 11):
    ``cosine()`` per pair folded three interpreted arrays (dot + both
    norms). The query-side norm always precomputes (request-sized, rides
    the broadcast); the corpus-side precompute is per call site —
    MEASURED split: it wins for the PQ/IVF-PQ shapes (q103 x10 4.8 vs
    6.7 interleaved) but LOSES for the PCA shape (q91 x10 1.9 vs 2.1,
    x1 0.31 vs 0.40), whose mapInPandas candidate frame makes the
    planner take the corpus side as the build/broadcast side — the
    per-row fold then runs inside the (serial) relation build instead of
    the probe stream. Either way the divisor keeps the exact
    ``l2(q)*l2(c)`` multiplication order, so cos_sim is bit-identical to
    ``cosine()`` (the cosine_topk argument; outputs verified identical
    at 3 SFs + the 10x replica)."""
    qv = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        l2_norm(vec_col).alias("__qn"),
    )
    cv = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        *([l2_norm(vec_col).alias("__cn")] if precompute_corpus_norm else []),
    )
    cn = F.col("__cn") if precompute_corpus_norm else l2_norm("__cv")
    rescored = (
        cands.join(F.broadcast(qv), "query_id")
        .join(cv, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot("__qv", "__cv")
                / F.nullif(F.col("__qn") * cn, F.lit(0.0)),
                round_dp,
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        rescored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
    )


def ivf_train(
    corpus: DataFrame,
    vec_col: str = "embedding",
    n_cells: int = 16,
    seed: int = 42,
    max_iter: int = 20,
    fit: str = "ml",
) -> DataFrame:
    """Fit IVF coarse centroids → (cid, cv) frame.

    Vectors are L2-normalized before the (Euclidean) fit, so nearest-by-L2
    equals nearest-by-cosine and the centroids compose directly with
    ``ivf_assign``/``ivf_ann_topk``'s cosine cell assignment.

    Two fit paths, both deterministic for a fixed seed:

    - ``fit="ml"``: distributed pyspark.ml KMeans over the (hash-pinned)
      full corpus — the form that scales the FIT itself, at the cost of
      max_iter small Spark jobs (~2-3s of per-job floor on toy data).
    - ``fit="sample"``: seeded numpy Lloyd over a bounded deterministic
      sample (the ``pq_train`` pattern — faiss practice: coarse-quantizer
      quality saturates at ~10⁵ training vectors regardless of corpus
      size), zero extra Spark jobs beyond one bounded collect.
      ``tests/test_similarity.py`` pins its recall against the exact
      baseline alongside the ml path's.

    A *training* step either way, not a SQL expression — queries built on
    it are rows-only checked. Memoized per (application id, input plan,
    params) — see ``_memo_train``.
    """
    if fit == "ml":
        build = lambda: _ivf_fit(corpus, vec_col, n_cells, seed, max_iter)  # noqa: E731
    elif fit == "sample":
        build = lambda: _ivf_fit_sampled(corpus, vec_col, n_cells, seed, max_iter)  # noqa: E731
    else:
        raise ValueError(f"unknown fit mode {fit!r}")
    rows = _memo_train(
        corpus,
        "ivf",
        (vec_col, n_cells, seed, max_iter, fit),
        build,
    )
    from feature_store_test_spark.data import local_rows_df

    return local_rows_df(corpus.sparkSession, rows, "cid int, cv array<double>")


def _ivf_fit_sampled(
    corpus: DataFrame,
    vec_col: str,
    n_cells: int,
    seed: int,
    max_iter: int,
    sample_size: int = 100_000,
) -> list[tuple[int, list[float]]]:
    import numpy as np

    n_total = corpus.count()
    frac = min(1.0, sample_size / max(n_total, 1))
    # Content-defined sampling + content-defined ordering, mirroring the
    # _ivf_fit pinning: a partition-seeded .sample() selects DIFFERENT
    # rows under a different partition layout, and .collect() returns
    # them in partition order — either would make "deterministic for a
    # fixed seed" hold only for a fixed layout. Hash-threshold selection
    # and a lexicographic sort of the collected matrix depend on data
    # content alone.
    sampled = corpus.select(vec_col)
    if frac < 1.0:
        bound = int(frac * (1 << 31))
        sampled = sampled.where(
            F.pmod(F.xxhash64(F.col(vec_col), F.lit(seed)), F.lit(1 << 31))
            < F.lit(bound)
        )
    X = np.asarray([r[0] for r in sampled.collect()], dtype=np.float64)
    if X.size == 0:
        raise ValueError(
            "ivf_train: empty corpus sample — ANN training needs data"
        )
    norms = np.linalg.norm(X, axis=1, keepdims=True)
    X = X[norms[:, 0] > 0.0]  # zero vectors have no direction to cluster
    if len(X) == 0:
        raise ValueError("ivf_train: corpus sample has no nonzero vectors")
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    X = X[np.lexsort(X.T[::-1])]
    rng = np.random.default_rng(seed)
    cents = X[rng.choice(len(X), size=n_cells, replace=False)].copy()
    for _ in range(max_iter):
        d2 = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        new = cents.copy()
        for c in range(n_cells):
            mask = assign == c
            if mask.any():
                new[c] = X[mask].mean(axis=0)
        if np.allclose(new, cents):
            break
        cents = new
    return [(i, [float(x) for x in c]) for i, c in enumerate(cents)]


def _ivf_fit(
    corpus: DataFrame, vec_col: str, n_cells: int, seed: int, max_iter: int
) -> list[tuple[int, list[float]]]:
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    # nullif: a zero vector's 0/0 normalization is a DIVIDE_BY_ZERO
    # crash under ANSI (see cosine()); NULL-norm rows are FILTERED from
    # the fit sample below — a zero vector has no direction to cluster.
    unit = F.transform(
        F.col(vec_col),
        lambda x: x.cast("double") / F.nullif(l2_norm(F.col(vec_col)), F.lit(0.0)),
    )
    # Pin the fit input's partition COMPOSITION and ORDER: k-means||'s
    # init sample depends on both, and a bare coalesce only fixes the
    # partition COUNT — composition still follows upstream split planning
    # (maxPartitionBytes / defaultParallelism), so centroids could drift
    # across session configs. Hash-repartitioning on the vector's own
    # content plus a within-partition sort makes the fit — and therefore
    # the centroids — reproducible for a fixed seed at any parallelism.
    # 4 partitions also keeps Lloyd's max_iter rounds off the per-
    # iteration task-scheduling floor (measured ~20s of the 10x q104 on
    # 32 tiny partitions). At billion-vector scale the fit input is a
    # bounded sample anyway (faiss practice, like pq_train).
    fit_df = (
        corpus.where(F.nullif(l2_norm(F.col(vec_col)), F.lit(0.0)).isNotNull())
        .select(
            array_to_vector(unit).alias("__features"),
            F.xxhash64(unit).alias("__h"),
        )
        .repartition(4, "__h")
        .sortWithinPartitions("__h")
        .select("__features")
    )
    if fit_df.isEmpty():
        raise ValueError(
            "ivf_train: empty corpus sample (or all-zero vectors) — "
            "ANN training needs data"
        )
    model = KMeans(
        k=n_cells, seed=seed, maxIter=max_iter, featuresCol="__features"
    ).fit(fit_df)
    return [
        (i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())
    ]


# ---------------------------------------------------------------------------
# PCA-compressed ANN (dimensionality reduction before search)
# ---------------------------------------------------------------------------
def pca_train(
    corpus: DataFrame, vec_col: str = "embedding", k: int = 8
) -> list[list[float]]:
    """Fit a k-component PCA on the corpus; returns the k×dim projection
    matrix as plain lists (tiny — rides into plans as literals, the same
    broadcast discipline as IVF centroids).

    Scale: the fit is one distributed covariance pass (pyspark.ml); the
    projection afterwards is a per-row JVM expression. Like ivf_train this
    is a training step, not a SQL expression — consumers are rows-only
    checked with recall bounds. Memoized per (application id, input plan,
    params) like ivf_train.
    """
    return _memo_train(
        corpus, "pca", (vec_col, k), lambda: _pca_fit(corpus, vec_col, k)
    )


def _pca_fit(corpus: DataFrame, vec_col: str, k: int) -> list[list[float]]:
    from pyspark.ml.feature import PCA
    from pyspark.ml.functions import array_to_vector

    fit_df = corpus.select(
        array_to_vector(
            F.transform(F.col(vec_col), lambda x: x.cast("double"))
        ).alias("__features")
    )
    if fit_df.isEmpty():
        raise ValueError(
            "pca_train: empty corpus — PCA training needs data"
        )
    model = PCA(k=k, inputCol="__features", outputCol="__p").fit(fit_df)
    pc = model.pc.toArray()  # dim × k, column-major components
    return [[float(pc[i][j]) for i in range(pc.shape[0])] for j in range(pc.shape[1])]


def pca_project(
    df: DataFrame,
    components: list[list[float]],
    vec_col: str = "embedding",
    out_col: str = "pvec",
) -> DataFrame:
    """Project ``vec_col`` onto the PCA components — pure JVM fold
    (zip_with + aggregate per output dimension), no Python per row.

    This is the exact-order reference projection (bit-deterministic
    left-to-right accumulation). It is deliberately NOT on q91's hot
    path anymore (round 10): the fold runs interpreted (~1 lambda frame
    per array element — 61M evals over the 10x corpus dominated q91's
    exec) and its per-dim Column construction cost ~3.4s of eager
    analysis per build. An unrolled ``_lit_dot_sql`` chain was tried and
    REJECTED: at 24x64 terms the generated ``processNext()`` overflows
    Janino's method limit, the whole stage silently falls back to
    INTERPRETED expression trees, and exec got 10x worse (0.32s ->
    3.7s warm at sf0.1) — don't re-run that experiment. The production
    candidate path projects inside the Arrow GEMM scorer instead
    (``cosine_topk_arrow(lin_map=...)``)."""
    dims = [
        F.aggregate(
            F.zip_with(
                F.col(vec_col),
                F.array(*[F.lit(c) for c in comp]),
                lambda a, b: a.cast("double") * b,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        for comp in components
    ]
    return df.withColumn(out_col, F.array(*dims))


def pca_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    components: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_candidates: int = 25,
    round_dp: int = 6,
) -> DataFrame:
    """ANN via compress-then-rescore: candidate top-``n_candidates`` in the
    PCA space (cheap — k-dim dot products instead of dim-dim), then exact
    full-space cosine rescoring of only those candidates. Same output
    schema as ``cosine_topk``; recall depends on how much variance the
    components capture (tested, not assumed).

    Scale: the compressed pass cuts per-pair score cost by dim/k; compose
    with LSH/IVF cell restriction to also cut the candidate count. The
    rescore join touches O(queries × n_candidates) rows only.
    """
    # candidate search on the GEMM path with the projection applied
    # INSIDE the scorer (round 10, guide §4.2: hand whole batches to
    # native code): compressed-space scoring is the hot loop
    # (|queries| × |corpus| pairs) and needs no cross-engine bit parity —
    # only the candidate SET feeds the exact rescore below. The previous
    # form materialized a JVM pca_project column first: interpreted
    # zip_with/aggregate folds (~61M lambda evals over the 10x corpus,
    # ~30s of exec) plus ~3.4s of eager per-dim Column analysis at EVERY
    # plan build (q91 was the single largest x1 entry in SCALE_SWEEP at
    # 8.1s). One batch GEMM replaces both; output verified identical on
    # all three SFs and the 10x replica (candidate ties live behind the
    # 6-dp round, same tolerance the scorer already documents).
    cands = cosine_topk_arrow(
        corpus.select(id_col, vec_col),
        queries.select(id_col, vec_col),
        id_col=id_col,
        vec_col=vec_col,
        k=n_candidates,
        round_dp=round_dp,
        lin_map=components,
    ).select("query_id", "neighbor_id")
    return _exact_rescore(
        cands, queries, corpus, id_col, vec_col, k, round_dp,
        precompute_corpus_norm=False,
    )


# ---------------------------------------------------------------------------
# Product quantization (IVF-PQ's fine quantizer — the billion-scale recipe)
# ---------------------------------------------------------------------------
def pq_train(
    corpus: DataFrame,
    vec_col: str = "embedding",
    m: int = 8,
    k: int = 16,
    seed: int = 42,
    max_iter: int = 20,
    sample_size: int = 100_000,
) -> list[list[list[float]]]:
    """Fit ``m`` per-subspace codebooks of ``k`` centroids each (classic
    product quantization): the vector splits into m contiguous subvectors
    and each subspace gets its own small KMeans. Returns
    ``codebooks[j][c] -> list[float]`` (m·k·(dim/m) floats — tiny; rides
    into plans as literals like the IVF centroids).

    Training runs a seeded Lloyd's iteration in numpy over a bounded,
    deterministic SAMPLE of the corpus — the standard PQ practice (faiss
    trains codebooks on ~10⁵ sampled vectors regardless of corpus size):
    codebook quality saturates long before the sample does, so the 100 TB
    corpus never feeds the fit. The sample is taken by hash order
    (md5 of the row's vector id-free content is overkill here — a seeded
    DataFrame sample suffices: same seed → same rows → same codebooks).
    Encoding the full corpus stays distributed (pq_encode). Vectors are
    L2-normalized before fitting so PQ's L2 distances rank identically to
    cosine. A training step, not a SQL expression — consumers are
    rows-only checked with recall bounds. Memoized per (application id,
    input plan, params) like ivf_train.
    """
    return _memo_train(
        corpus,
        "pq",
        (vec_col, m, k, seed, max_iter, sample_size),
        lambda: _pq_fit(corpus, vec_col, m, k, seed, max_iter, sample_size),
    )


def _pq_fit(
    corpus: DataFrame,
    vec_col: str,
    m: int,
    k: int,
    seed: int,
    max_iter: int,
    sample_size: int,
) -> list[list[list[float]]]:
    import numpy as np

    first = corpus.select(vec_col).first()
    if first is None:
        raise ValueError(
            "pq_train: empty corpus sample — ANN training needs data"
        )
    dim = len(first[0])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    d = dim // m
    n_total = corpus.count()
    frac = min(1.0, sample_size / max(n_total, 1))
    sampled = corpus.select(vec_col) if frac >= 1.0 else corpus.select(
        vec_col
    ).sample(fraction=frac, seed=seed)
    X = np.array([r[0] for r in sampled.collect()], dtype=np.float64)
    if X.size == 0:
        raise ValueError(
            "pq_train: empty corpus sample — ANN training needs data"
        )
    norms = np.linalg.norm(X, axis=1, keepdims=True)
    X = X[norms[:, 0] > 0.0]  # zero vectors have no direction to cluster
    if len(X) == 0:
        raise ValueError("pq_train: corpus sample has no nonzero vectors")
    X /= np.linalg.norm(X, axis=1, keepdims=True)

    codebooks = []
    for j in range(m):
        S = X[:, j * d : (j + 1) * d]
        rng = np.random.default_rng(seed + j)
        cents = S[rng.choice(len(S), size=k, replace=False)].copy()
        for _ in range(max_iter):
            # assign: nearest centroid by squared L2
            d2 = ((S[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            new = cents.copy()
            for c in range(k):
                mask = assign == c
                if mask.any():
                    new[c] = S[mask].mean(axis=0)
            if np.allclose(new, cents):
                break
            cents = new
        codebooks.append([[float(x) for x in c] for c in cents])
    return codebooks


def _sq_l2(a: Column, centroid: list[float]) -> Column:
    """Squared L2 distance between an array column and a literal centroid
    (ordered zip_with fold — deterministic double accumulation)."""
    lit = F.array(*[F.lit(float(x)) for x in centroid])
    diffs = F.zip_with(a, lit, lambda x, y: (x.cast("double") - y) * (x.cast("double") - y))
    return F.aggregate(diffs, F.lit(0.0), lambda acc, x: acc + x)


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
    out_col: str = "codes",
) -> DataFrame:
    """Assign each row its m-byte PQ code: per subspace, the index of the
    nearest codebook centroid. Pure JVM expressions — the codebook rides
    in as ONE literal array-of-arrays per subspace and a single
    ``transform`` lambda computes all k distances (a compact plan, not
    m·k unrolled folds; Catalyst's subexpression elimination shares the
    duplicated argmin reference). The normalized vector materializes once
    per row. argmin = position of the array minimum; ties pick the first
    index — deterministic.
    """
    import math

    d = len(codebooks[0][0])
    # generated-SQL hygiene (ADVICE r10): out_col is backtick-quoted like
    # vec_col, and non-finite codebook values are rejected up front — a
    # repr'd nan/inf literal would fail the SQL parse far from its source
    if any(
        not math.isfinite(x) for book in codebooks for c in book for x in c
    ):
        raise ValueError("pq_encode: codebooks contain non-finite values")
    # nullif: zero-vector ANSI guard (see cosine()); a zero vector gets a
    # NULL unit array, NULL distances, and the deterministic first-index
    # argmin code — present in the index, never a crash.
    # Single-parse selectExpr strings (round 10, the r6 fusion playbook):
    # the identical expression tree built through per-book Column calls
    # cost ~1.4s of eager analysis per plan build (8 books x nested
    # transform/zip_with trees) vs one SQL parse; execution unchanged
    # (same transform/aggregate lambdas, codes verified identical).
    norm = (
        f"sqrt(aggregate(`{vec_col}`, 0D, "
        "(acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"
    )
    out = df.selectExpr(
        "*",
        f"transform(`{vec_col}`, x -> CAST(x AS DOUBLE) / nullif({norm}, 0D))"
        " AS __unit",
    )
    code_exprs = []
    for j, book in enumerate(codebooks):
        lit_book = ", ".join(
            "array(" + ", ".join(f"{float(x)!r}D" for x in c) + ")" for c in book
        )
        dists = (
            f"transform(array({lit_book}), cent -> "
            f"aggregate(zip_with(slice(__unit, {j * d + 1}, {d}), cent, "
            "(x, y) -> (x - y) * (x - y)), 0D, (acc, v) -> acc + v))"
        )
        code_exprs.append(
            f"CAST(array_position({dists}, array_min({dists})) - 1 AS INT)"
        )
    return out.selectExpr(
        "*", f"array({', '.join(code_exprs)}) AS `{out_col}`"
    ).drop("__unit")


def _pq_lut(
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Per-query ADC lookup table: LUT[j][c] = ||q_sub_j - centroid_jc||²,
    built driver-side (queries are request-sized by definition — the same
    broadcast discipline as cosine_topk) as a (query_id, j, code, d)
    frame to broadcast-join against exploded corpus codes.

    The query_id field inherits ``id_col``'s type from ``queries``'s
    schema (not a hardcoded long); a zero-norm query vector skips
    normalization (distances become ||centroid||² — deterministic finite
    ranks) instead of crashing on the division."""
    from pyspark.sql import types as T

    d = len(codebooks[0][0])
    rows = []
    for r in queries.select(id_col, vec_col).collect():
        v = [float(x) for x in r[vec_col]]
        n = sum(x * x for x in v) ** 0.5
        qv = [x / n for x in v] if n else v
        for j, book in enumerate(codebooks):
            sub = qv[j * d : (j + 1) * d]
            for c, cent in enumerate(book):
                dist = sum((a - b) * (a - b) for a, b in zip(sub, cent))
                rows.append((r[id_col], j, c, dist))
    schema = T.StructType(
        [
            T.StructField("query_id", queries.schema[id_col].dataType),
            T.StructField("j", T.IntegerType()),
            T.StructField("code", T.IntegerType()),
            T.StructField("d", T.DoubleType()),
        ]
    )
    from feature_store_test_spark.data import local_rows_df

    return local_rows_df(queries.sparkSession, rows, schema)


def _pq_lut_wide(
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """``_pq_lut`` flattened to ONE row per query: (query_id, __lut) with
    __lut[j*k + c] = ||q_sub_j - centroid_jc||² in j-major order. Joining
    this on query_id and folding the m codes against the array in-row
    replaces the posexplode -> (j, code) join -> re-aggregation pipeline:
    the ADC stage handles one row per (query, candidate) instead of m,
    and the m-way re-grouping shuffle disappears entirely (measured
    q103 13.6s -> ~4s at the 10x point). The fold sums in fixed j order,
    so adist is bit-deterministic regardless of partitioning.

    Same contracts as ``_pq_lut``: query_id inherits ``id_col``'s schema
    type, and a zero-norm query skips normalization instead of crashing.

    The LUT entries are computed as one vectorized numpy broadcast
    (queries × m × k centroids) instead of a per-entry Python loop — at
    5k queries × 128 centroids the loop form cost multiple seconds of
    pure driver Python, dominating the whole 10x q103/q104 runtime."""
    import numpy as np

    from pyspark.sql import types as T

    d = len(codebooks[0][0])
    m = len(codebooks)
    k_cb = len(codebooks[0])
    collected = queries.select(id_col, vec_col).collect()
    ids = [r[id_col] for r in collected]
    rows: list[tuple] = []
    if collected:
        V = np.asarray([r[vec_col] for r in collected], dtype=np.float64)
        norms = np.linalg.norm(V, axis=1, keepdims=True)
        norms[norms == 0.0] = 1.0  # zero-norm queries skip normalization
        Q = (V / norms).reshape(len(V), m, 1, d)
        C = np.asarray(codebooks, dtype=np.float64).reshape(1, m, k_cb, d)
        # luts[q, j, c] = ||q_sub_j - centroid_jc||², flattened j-major
        luts = ((Q - C) ** 2).sum(axis=3).reshape(len(V), m * k_cb)
        rows = [(i, lut.tolist()) for i, lut in zip(ids, luts)]
    schema = T.StructType(
        [
            T.StructField("query_id", queries.schema[id_col].dataType),
            T.StructField("__lut", T.ArrayType(T.DoubleType())),
        ]
    )
    from feature_store_test_spark.data import local_rows_df

    return local_rows_df(queries.sparkSession, rows, schema)


def _adc_fold(codes_col: str, lut_col: str, k_cb: int, m: int):
    """adist = Σ_j __lut[j*k + code_j], unrolled to ``m`` plain
    ``element_at`` additions in fixed ascending-j order. The unrolled
    expression stays inside whole-stage codegen; the previous
    transform+aggregate fold ran interpreted — at 60M (query, candidate)
    rows × m lookups that interpretation dominated the 10x ADC stage.
    Addition order (left-assoc, j ascending) matches the fold, so adist
    stays bit-deterministic and value-identical."""
    terms = [
        F.element_at(
            F.col(lut_col),
            (F.lit(j * k_cb + 1) + F.element_at(F.col(codes_col), j + 1)).cast("int"),
        )
        for j in range(m)
    ]
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def pq_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_candidates: int = 25,
    round_dp: int = 6,
) -> DataFrame:
    """Asymmetric-distance PQ search with exact rescoring.

    1. Corpus rows carry only their m small codes (the 100 TB win: the
       scan that scores candidates reads m ints per vector, not dim
       floats).
    2. Per query, a lookup table LUT[j][c] = ||q_sub_j - centroid_jc||²
       is built driver-side (queries are request-sized by definition —
       the same broadcast discipline as cosine_topk) and shipped as a
       broadcast (query_id, j, code, d) frame.
    3. ADC score = Σ_j LUT[j][code_j], computed relationally: posexplode
       the codes, broadcast-join the LUT, partial-agg the sum — map-side
       combinable, no Python, no per-row driver work.
    4. The ADC top-``n_candidates`` per query are rescored with exact
       full-dimension cosine; output schema matches cosine_topk.
    """
    # Arrow-form encode: the expression form's codes column is a large
    # expression tree that downstream operators (posexplode -> join ->
    # window) re-substitute during optimization — measured ~70s of pure
    # driver-side analysis for the composed plan even at m*k=128. The
    # mapInPandas encoder is a substitution barrier (downstream sees a
    # plain column) with constant plan size at any codebook size.
    codes = pq_encode_arrow(corpus, codebooks, vec_col).select(
        F.col(id_col).alias("neighbor_id"), "codes"
    )
    lut = _pq_lut_wide(queries, codebooks, id_col, vec_col)

    # one row per (query, candidate); adist folds the m codes against the
    # broadcast per-query LUT array in-row — no posexplode, no re-grouping
    adc = codes.crossJoin(F.broadcast(lut)).select(
        "query_id",
        "neighbor_id",
        _adc_fold("codes", "__lut", len(codebooks[0]), len(codebooks)).alias("adist"),
    )
    wc = Window.partitionBy("query_id").orderBy(F.col("adist"), "neighbor_id")
    cands = (
        adc.withColumn("crank", F.row_number().over(wc))
        .where(F.col("crank") <= n_candidates)
        .select("query_id", "neighbor_id")
    )
    return _exact_rescore(cands, queries, corpus, id_col, vec_col, k, round_dp)


def ivfpq_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_probe: int = 2,
    n_candidates: int = 50,
    round_dp: int = 6,
) -> DataFrame:
    """IVF-PQ: the full billion-scale recipe — coarse cells cut the
    candidate set to ~n_probe/n_cells of the corpus, PQ codes cut the
    per-candidate score cost to m LUT lookups, exact cosine rescores the
    survivors. Composition of ``ivf_assign`` + ``pq_encode``/ADC:

    1. each corpus vector lives in ONE cell and carries its m codes
       (stored once — at scale this is the persisted index layout,
       partitioned by cid);
    2. each query probes its ``n_probe`` nearest cells; only members of
       probed cells are ADC-scored (the join is cid-equi, THEN the
       broadcast LUT join on (query_id, j, code) — no all-pairs stage);
    3. ADC top-``n_candidates`` rescore with exact full-dim cosine.

    Output schema matches cosine_topk; self-matches are kept (rank 1 ==
    the query itself when it is in the corpus), mirroring pq_ann_topk.
    """
    ca = ivf_assign(corpus, centroids, id_col, vec_col, 1, round_dp)
    # Arrow-form encode — see pq_ann_topk: a plan-substitution barrier
    # that keeps composed-plan analysis cost constant in codebook size
    codes = pq_encode_arrow(
        ca.select(
            F.col("__id").alias("neighbor_id"),
            F.col("__v").alias(vec_col),
            "cid",
        ),
        codebooks,
        vec_col,
    ).select("neighbor_id", "cid", "codes")
    qa = ivf_assign(queries, centroids, id_col, vec_col, n_probe, round_dp).select(
        F.col("__id").alias("query_id"), "cid"
    )
    lut = _pq_lut_wide(queries, codebooks, id_col, vec_col)

    # probed-cell candidates, then the in-row ADC fold (see pq_ann_topk)
    adc = (
        codes.join(F.broadcast(qa), "cid")
        .join(F.broadcast(lut), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            _adc_fold("codes", "__lut", len(codebooks[0]), len(codebooks)).alias("adist"),
        )
    )
    wc = Window.partitionBy("query_id").orderBy(F.col("adist"), "neighbor_id")
    cands = (
        adc.withColumn("crank", F.row_number().over(wc))
        .where(F.col("crank") <= n_candidates)
        .select("query_id", "neighbor_id")
    )
    return _exact_rescore(cands, queries, corpus, id_col, vec_col, k, round_dp)


def pq_encode_arrow(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
    out_col: str = "codes",
) -> DataFrame:
    """``pq_encode`` scale path for large ``m*k``: the expression form
    plants m·k centroid literals in the plan, and analyzer cost grows with
    the codebook (fine at 8×16, painful at 64×256). This variant ships the
    codebooks to executors as numpy arrays inside a ``mapInPandas``
    closure — plan size stays CONSTANT regardless of codebook size, and
    each Arrow batch computes all subspace argmins vectorized
    (O(batch·k·d) numpy per subspace, no per-row Python).

    Same contract as ``pq_encode``: rows keep all columns, ``out_col`` is
    an array<int> of m nearest-centroid indices over the L2-normalized
    vector; numpy argmin breaks ties at the first index like
    ``array_position(array_min)``. Codes can differ from the expression
    path only on last-ulp distance ties (different float summation
    order); ``tests/test_similarity.py`` pins equality on the fixtures.
    """
    import numpy as np

    from pyspark.sql import types as T

    m = len(codebooks)
    d = len(codebooks[0][0])
    books = [np.asarray(b, dtype=np.float64) for b in codebooks]
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out_col, T.ArrayType(T.IntegerType()))]
    )

    def encode(batches):
        for pdf in batches:
            pdf = pdf.copy()
            if len(pdf):
                V = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
                V = V / np.linalg.norm(V, axis=1, keepdims=True)
                codes = np.empty((len(V), m), dtype=np.int64)
                for j in range(m):
                    S = V[:, j * d : (j + 1) * d]
                    d2 = ((S[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
                    codes[:, j] = d2.argmin(axis=1)
                pdf[out_col] = [c.tolist() for c in codes]
            else:
                pdf[out_col] = []
            yield pdf

    return df.mapInPandas(encode, out_schema)
