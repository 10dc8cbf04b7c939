"""Deduplication operators (north-star: exact, MinHash+LSH, SimHash, Jaccard).

Design for 100 TB:
- Exact dedup: hash-groupBy on a fingerprint column — one shuffle of
  (fingerprint, doc_id), never of document bodies.
- MinHash+LSH: shingle → k minhashes → b bands → bucket group-expand.
  Candidate generation is linear in bucket sizes instead of O(n²);
  verification runs only on candidate pairs.
- All hashing is md5-based so signatures are deterministic and identical
  across engines — minhash takes the lexicographic MIN over digest
  windows, which is order-free and shuffle-insensitive.

Two physical forms, one semantics:
- ARRAY form (default, ``shingle_array``/``minhash_near_dups``): each
  doc's distinct shingle set stays in ONE array column. Signatures are a
  pure projection (``array_min`` over higher-order transforms — zero
  shuffles), and exact-Jaccard verification is ``array_intersect`` on a
  docs-sized table instead of joins over an exploded shingles-sized
  table. The only shuffles in the whole pipeline are the (band, bucket)
  grouping and the final pair distinct — both over rows-per-doc, not
  rows-per-shingle. Holds whenever one document's shingle set fits in a
  row (LLM-corpus docs: ~KBs); measured ~2x faster than the explode form
  at sf0.1.
- EXPLODE form (``word_shingles``/``minhash_signatures``/
  ``jaccard_verify``): (doc, shingle) rows + groupBy mins. Unbounded doc
  sizes, and the shape the shingle-join queries (containment,
  decontamination) build on.

Performance gotchas this module encodes (measured at sf0.1, 5000 docs /
260k shingles):
- the words array is materialized as a projected column BEFORE the
  shingle transform — referencing ``split(...)`` inside a higher-order
  lambda re-evaluates the split per element (3× per shingle ≈ 800× per
  doc);
- never FILTER on the built shingle array (``where(size(arr) > 0)``):
  predicate pushdown substitutes the whole array expression into the
  filter and re-evaluates the transform per row — measured 7x slower
  than prefiltering on word count (``shingle_array`` does the latter);
- the md5 array is materialized as its own projected column so the k
  window transforms share one digest per shingle (CollapseProject keeps
  multi-referenced non-cheap aliases unmerged);
- higher-order lambdas run interpreted (no whole-stage codegen), so the
  md5+window projection (~0.7s per 260k shingles, measured equal in the
  explode/codegen form) is the array pipeline's intrinsic floor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def shingle_array(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, out: str = "shingles"
) -> DataFrame:
    """Distinct n-word shingles per doc as ONE array column (no explode).

    Docs shorter than n words are dropped — they have no shingles, and
    keeping them would give every one a NULL/empty signature that LSH
    would bucket together. The word-count prefilter runs BEFORE the
    shingle projection (see module docstring on the pushdown trap).
    """
    # single-parse SQL form: the Column-API lambda (n element_at calls per
    # window) cost ~40ms of py4j chatter per invocation. The shingle
    # string is built by direct ||-concatenation of the n (0-based) array
    # elements — identical bytes to array_join(slice(...)) since every
    # in-range window is full-width and split() never yields NULL
    # elements, but without allocating a length-n sub-array per shingle
    # (measured 0.33s -> 0.21s for the 260k-shingle sf0.1 projection).
    shingle = " || ' ' || ".join(f"__w[i + {j}]" for j in range(n))
    return (
        df.selectExpr(f"`{id_col}`", f"split(`{text_col}`, ' ') AS __w")
        .where(f"size(__w) >= {n}")
        .selectExpr(
            f"`{id_col}`",
            f"array_distinct(transform(sequence(0, size(__w) - {n}), "
            f"i -> {shingle})) AS `{out}`",
        )
    )


def shingle_rows(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, out: str = "shingle"
) -> DataFrame:
    """NON-distinct n-word shingles as rows — the SIGNATURE-side feed.

    Min-aggregation is duplicate-insensitive (min over a multiset equals
    min over its support), so the per-doc ``array_distinct`` pass is
    skipped, and exploding the position sequence keeps every per-shingle
    operation — the window concat, the md5, the k substring windows, the
    min aggregation — inside WHOLE-STAGE CODEGEN: GenerateExec
    participates in codegen, so ``__w`` stays a loop-local variable (never
    copied per output row) and no interpreted higher-order lambda runs.

    WHEN TO USE: per-doc shingle counts too large to sit in one array
    cell (unbounded document sizes — the module docstring's EXPLODE-form
    criterion); feed the result to ``minhash_signatures``. At bench scale
    (50-shingle docs) the interpreted array form measured FASTER end to
    end — string allocation dominates either way and the row form adds a
    generate + partial-agg shuffle (round-6 A/B, two full-harness runs;
    see minhash_near_dups) — so bounded-doc pipelines keep the array form.

    Docs shorter than n words are dropped, like ``shingle_array``.
    """
    shingle = " || ' ' || ".join(f"__w[__i + {j}]" for j in range(n))
    return (
        df.selectExpr(f"`{id_col}`", f"split(`{text_col}`, ' ') AS __w")
        .where(f"size(__w) >= {n}")
        .selectExpr(
            f"`{id_col}`",
            "__w",
            f"explode(sequence(0, size(__w) - {n})) AS __i",
        )
        .selectExpr(f"`{id_col}`", f"{shingle} AS `{out}`")
    )


def shingle_digest_array(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, out: str = "hs"
) -> DataFrame:
    """Distinct md5 DIGESTS of the n-word shingles, one array per doc —
    the fused md5-family feed (round-6 A/B: 0.55 -> 0.45 on the q21
    pipeline at sf0.1, interleaved min-of-6).

    Fuses what the string form ran as four interpreted array passes
    (shingle concat, array_distinct on strings, per-element xxhash64
    fingerprints, per-element md5) into two (md5 INSIDE the shingle
    transform, distinct on digests): the shingle string is hashed the
    moment it is built and never materialized into an array, and the
    digest array serves BOTH downstream consumers — signature windows
    (identical bits to hashing the distinct strings: min over a multiset
    equals min over its support, and md5-before-distinct preserves the
    support) and exact-Jaccard verification (digest-set intersection ==
    shingle-set intersection up to a 128-bit collision INSIDE one pair's
    union, P < 10^-34 at bench shingle counts — strictly stronger than
    the 64-bit xxhash64 fingerprints the verify side already used).
    The engine-portability contract is unchanged: md5(shingle) is exactly
    what the oracle computes.

    Docs shorter than n words are dropped, like ``shingle_array``.
    """
    shingle = " || ' ' || ".join(f"__w[i + {j}]" for j in range(n))
    return (
        df.selectExpr(f"`{id_col}`", f"split(`{text_col}`, ' ') AS __w")
        .where(f"size(__w) >= {n}")
        .selectExpr(
            f"`{id_col}`",
            f"array_distinct(transform(sequence(0, size(__w) - {n}), "
            f"i -> md5({shingle}))) AS `{out}`",
        )
    )


def minhash_signatures_digests(
    harr: DataFrame,
    id_col: str,
    digest_col: str = "hs",
    k: int = 8,
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """k min-window signature columns from an md5-DIGEST array
    (``shingle_digest_array`` output): same window family as
    ``minhash_signatures_arrays`` — member s = lexicographic MIN over the
    15-hex window at offset ``s * (32 // k)`` of the self-concatenated
    digest — minus the per-element md5 pass (the digests already exist).
    """
    if k > 32:
        raise ValueError("digest window family supports k <= 32")
    step = 32 // k
    keep = keep_cols or []
    h2 = harr.selectExpr(
        f"`{id_col}`",
        *[f"`{c}`" for c in keep],
        f"transform(`{digest_col}`, h -> concat(h, h)) AS __h2a",
    )
    return h2.selectExpr(
        f"`{id_col}`",
        *[f"`{c}`" for c in keep],
        *[
            f"array_min(transform(__h2a, h -> substring(h, {step * s + 1}, 15))) AS mh{s}"
            for s in range(k)
        ],
    )


def minhash_signatures_arrays(
    arr_df: DataFrame,
    id_col: str,
    arr_col: str = "shingles",
    k: int = 8,
    keep_arr: bool = False,
    keep_cols: list[str] | None = None,
    family: str = "md5",
) -> DataFrame:
    """k min-window signature columns from an array-of-shingles table.

    ``family="md5"`` (default): same hash family as
    ``minhash_signatures`` (one md5 per shingle; member s =
    lexicographic MIN over the 15-hex window at offset s * (32 // k) of
    the self-concatenated digest) computed as a pure projection:
    ``array_min`` over per-element transforms — no explode, no shuffle.
    The md5 array is a separate projected column so the k window
    transforms share one digest evaluation per shingle. This family is
    reproducible in any engine with md5/substr, which is what the
    oracle-exact queries require.

    ``family="xxhash64"``: the documented scale swap — member s =
    MIN over seeded ``xxhash64(shingle, s)`` longs. The hash itself is
    far cheaper than md5 (one 64-bit mix vs a cryptographic digest +
    string windows) and the min-state is a long, not a 15-char string;
    measured effect on the WHOLE pipeline is modest where other stages
    dominate (~6% on the sf0.1 direct path, ~20% on the collapsed 10x
    replica) and grows with shingle volume per doc. The cost is
    engine-portability of the exact bits: use it when nothing
    downstream needs to reproduce signatures outside Spark. Candidate
    quality is statistically equivalent (both are uniform hash
    families); ``tests/test_operators.py`` pins pipeline agreement on
    the fixtures.
    """
    # selectExpr throughout: each higher-order F.transform lambda costs
    # several py4j round-trips to build JVM-side, and k signature columns
    # built through the Column API were ~0.1s of pure RPC chatter per
    # invocation; one selectExpr parses the same Catalyst tree in a
    # single call. (SQL lambdas are unary `x -> ...` — the same
    # (element, index) 2-arg trap documented for F.transform applies.)
    keep_names = keep_cols if keep_cols is not None else ([arr_col] if keep_arr else [])
    if family == "xxhash64":
        return arr_df.selectExpr(
            f"`{id_col}`",
            *[f"`{c}`" for c in keep_names],
            *[
                f"array_min(transform(`{arr_col}`, x -> xxhash64(x, {s}))) AS mh{s}"
                for s in range(k)
            ],
        )
    if family != "md5":
        raise ValueError(f"unknown minhash family {family!r}")
    if k > 32:
        raise ValueError("array signature family supports k <= 32")
    step = 32 // k
    harr = arr_df.selectExpr(
        f"`{id_col}`",
        *[f"`{c}`" for c in keep_names],
        # chained transforms: md5 evaluated ONCE per element, then
        # self-concatenated (concat(md5(x), md5(x)) would hash twice)
        f"transform(transform(`{arr_col}`, x -> md5(x)), h -> concat(h, h)) AS __h2a",
    )
    return harr.selectExpr(
        f"`{id_col}`",
        *[f"`{c}`" for c in keep_names],
        *[
            f"array_min(transform(__h2a, h -> substring(h, {step * s + 1}, 15))) AS mh{s}"
            for s in range(k)
        ],
    )


def jaccard_verify_arrays(
    arr_df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    arr_col: str = "shingles",
    threshold: float = 0.0,
) -> DataFrame:
    """Exact Jaccard on candidate pairs via array intersection.

    Joins the (tiny) pair list against the docs-sized array table twice
    and computes |A∩B| per pair inside the row. SHUFFLE_HASH with the
    pair side as build (round 10): the previous unhinted form let the
    static threshold broadcast the ARRAY table — a corpus-sized build
    side, exactly the shape the facts-never-broadcast rule exists for,
    and its two broadcast builds were separate scheduler jobs under the
    bench's clone body (q21: 3 jobs). Hashing the pair side per
    partition instead runs the whole verify inside ONE job, streams the
    array table through a plain shuffle on the id (scale-safe at any
    corpus size), and measured faster outright (interleaved min 0.481
    -> 0.414, parity exact).
    """
    aa = arr_df.selectExpr(f"`{id_col}` AS id_a", f"`{arr_col}` AS __arr_a")
    bb = arr_df.selectExpr(f"`{id_col}` AS id_b", f"`{arr_col}` AS __arr_b")
    # filter on the UNrounded ratio (the oracle's WHERE does too)
    ratio = (
        "CAST(size(array_intersect(__arr_a, __arr_b)) AS DOUBLE) / "
        "CAST(size(__arr_a) + size(__arr_b) "
        "- size(array_intersect(__arr_a, __arr_b)) AS DOUBLE)"
    )
    # single projection after the joins: the filter evaluates the ratio
    # expression directly (candidate rows are few — re-evaluating the
    # intersect in the filter costs less than another analysis pass over
    # the whole tree at construction; round-6 op-count shave)
    return (
        pairs.hint("shuffle_hash")
        .join(aa, "id_a")
        .hint("shuffle_hash")
        .join(bb, "id_b")
        .where(f"{ratio} >= {threshold!r}")
        .selectExpr("id_a", "id_b", f"round({ratio}, 6) AS jaccard")
    )


def word_shingles(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, out: str = "shingle"
) -> DataFrame:
    """Distinct n-word shingles per document: (id_col, shingle) rows.

    Docs shorter than n words produce no rows (sequence would otherwise
    run descending and fabricate shingles).
    """
    with_words = df.select(F.col(id_col), F.split(F.col(text_col), " ").alias("__w"))
    w = F.col("__w")
    shingles = F.when(
        F.size(w) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(w) - n),
            lambda i: F.concat_ws(" ", *[F.element_at(w, i + j + 1) for j in range(n)]),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return with_words.select(
        F.col(id_col), F.explode(F.array_distinct(shingles)).alias(out)
    )


def minhash_signatures(
    shingles: DataFrame,
    id_col: str,
    shingle_col: str = "shingle",
    k: int = 8,
    family: str = "md5",
) -> DataFrame:
    """Wide k-column minhash signature per doc: (id, mh0..mh{k-1}).

    The k-hash family is derived from ONE md5 per shingle: member s orders
    shingles by a 15-hex-char window of the digest starting at offset
    ``s * (32 // k)`` (wrapping past the end via digest self-concat), and
    takes the lexicographic MIN over those windows. Each window ranks by
    60 effectively-independent digest bits, giving k near-independent
    orderings for the cost of one hash; q111 audits the estimate error
    the family produces. Windowing is plain substring, expressible
    identically in DuckDB, so signatures stay engine-identical — measured
    ~30% faster than rotating the full 32-char digest (narrower agg
    buffers + shorter string compares), and ~4x slower than a
    non-portable xxhash64 family would be (the price of an oracle-exact
    contract; swap the hash family behind this function if bit-parity
    with a second engine stops mattering). One groupBy(doc) with map-side
    partial min; no row blowup. Falls back to per-seed salted md5 when
    k > 32 (not enough distinct window offsets).

    ``family="xxhash64"``: member s = MIN over ``xxhash64(shingle, s)``
    longs — same non-portable scale family as
    ``minhash_signatures_arrays``; signatures are longs, not hex windows.

    This row form runs every per-shingle op (md5/xxhash64, windows, min)
    in WHOLE-STAGE CODEGEN — pair it with ``shingle_rows`` for documents
    too large to hold their shingle set in one array cell; see
    ``shingle_rows`` for when the array form wins instead.
    """
    if family == "xxhash64":
        return shingles.groupBy(id_col).agg(
            *[
                F.min(F.xxhash64(F.col(shingle_col), F.lit(s))).alias(f"mh{s}")
                for s in range(k)
            ]
        )
    if family != "md5":
        raise ValueError(f"unknown minhash family {family!r}")
    if k > 32:
        aggs = [
            F.min(
                F.md5(F.concat_ws("|", F.lit(str(s)), F.col(shingle_col)))
            ).alias(f"mh{s}")
            for s in range(k)
        ]
        return shingles.groupBy(id_col).agg(*aggs)
    step = 32 // k
    h = F.md5(F.col(shingle_col))
    pre = shingles.select(F.col(id_col), F.concat(h, h).alias("__h2"))
    aggs = [
        F.min(F.substring("__h2", step * s + 1, 15)).alias(f"mh{s}")
        for s in range(k)
    ]
    return pre.groupBy(id_col).agg(*aggs)


def lsh_candidate_pairs(
    signatures: DataFrame, id_col: str, k: int = 8, bands: int = 4
) -> DataFrame:
    """Band the k-signature into buckets; expand pairs within each bucket.

    Returns distinct (id_a, id_b) with id_a < id_b. Docs agreeing on ALL
    r = k/bands minhashes of any band become candidates:
    P(candidate) = 1 - (1 - J^r)^bands.

    Candidates are generated by grouping on (band, bucket) and expanding
    ordered pairs from each bucket's sorted member list, NOT by
    self-joining the banded table: the self-join evaluates the whole
    signature pipeline for both sides (or needs a cache barrier to
    avoid it, which round-1 measurements showed colliding badly with
    cache-clearing callers — 2-4x swings), while the group-expand form
    consumes the signatures exactly once and costs one shuffle. Work is
    C(bucket_size, 2) per bucket either way — linear in bucket sizes,
    never all-pairs; a pathological bucket (thousands of identical docs)
    degrades both forms identically, and exact-dedup upstream is the
    real mitigation.
    """
    r = k // bands
    # bucket id: md5 over the concatenated string signatures (the
    # engine-portable family), or one xxhash64 mix when signatures are
    # longs (the xxhash64 family — concat doesn't apply). Either way,
    # equal signature slices land in equal buckets; collisions between
    # different slices are 64/128-bit-rare and only ever ADD a candidate
    # that exact verification then filters.
    sig_is_long = isinstance(signatures.schema["mh0"].dataType, T.LongType)

    def bucket_of(b: int) -> str:
        cols = ", ".join(f"mh{b * r + j}" for j in range(r))
        if sig_is_long:
            return f"CAST(xxhash64({cols}) AS STRING)"
        return f"md5(concat({cols}))"

    # one selectExpr parse instead of bands x (struct + bucket hash)
    # Column-API calls — same tree, a fraction of the py4j round-trips;
    # inline() (round 6) lands the struct fields directly as (band,
    # bucket) columns, fusing what explode + a reprojection did in two
    # analysis passes
    entries = ", ".join(
        f"struct({b} AS band, {bucket_of(b)} AS bucket)" for b in range(bands)
    )
    banded = signatures.selectExpr(
        f"`{id_col}`", f"inline(array({entries}))"
    )
    # the pair expansion is one inline() over the SQL twin of
    # ordered_pair_structs — same tree, a handful of RPCs instead of the
    # nested-lambda Column build, and inline() lands directly on
    # (id_a, id_b) columns without the intermediate struct projection
    # no size-1 pre-filter: a singleton bucket's ordered-pair expansion is
    # the empty array, so inline() already drops it — the where() was a
    # redundant analysis pass, not an execution saver (round 6)
    buckets = banded.groupBy("band", "bucket").agg(
        F.expr(f"array_sort(collect_set(`{id_col}`)) AS ids")
    )
    return buckets.selectExpr(f"inline({ordered_pairs_sql('ids')})").distinct()


def ordered_pair_structs(ids: F.Column) -> F.Column:
    """All ordered pairs (a < b by array position) from a SORTED id array,
    as an array of (id_a, id_b) structs — the bucket/group pair-expansion
    primitive shared by LSH candidates and exact-dup group expansion."""
    return F.flatten(
        F.transform(
            ids,
            lambda x, i: F.transform(
                F.slice(ids, i + F.lit(2), F.size(ids)),
                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
            ),
        )
    )


def ordered_pairs_sql(ids: str) -> str:
    """SQL-string twin of ``ordered_pair_structs`` for single-parse call
    sites (``ids`` is a SQL expression evaluating to a sorted array)."""
    return (
        f"flatten(transform({ids}, (x, i) -> "
        f"transform(slice({ids}, i + 2, size({ids})), "
        f"y -> struct(x AS id_a, y AS id_b))))"
    )


def exact_collapse(
    arr_df: DataFrame, id_col: str, arr_col: str = "shingles"
) -> tuple[DataFrame, DataFrame]:
    """Exact-dup collapse for near-dedup pipelines: (groups, reps).

    Collapses on the DISTINCT-SHINGLE-SET hash (xxhash64 of the sorted
    array) rather than raw text: every downstream stage — signatures,
    banding, verification, Jaccard — is a pure function of the shingle
    set, so set-identical docs are fully interchangeable (a strictly
    coarser, equally exact key than text identity). Computing the key
    from the already-built array keeps the pipeline at ONE scan of the
    corpus (callers persist ``arr_df``); collapsing on text would need a
    second pass over document bodies.

    ``groups``: one row per distinct set — (__fp, __rep = min id,
    __ids = sorted member ids); only the (fp, id) pairs shuffle.
    ``reps``: the min-id member's rows, selected via a semi join on the
    rep-id set (a column of longs — AQE broadcasts it).

    Fingerprint trade (same as ``minhash_near_dups``'s verify step): set
    equality is decided by the 64-bit xxhash64, not by comparing arrays,
    so a collision (P ≈ n²/2⁶⁵) would silently merge two different texts
    into one "exact" group — and that label propagates to outputs that
    report exact_jaccard=1.0 / shared-shingle counts. The standard
    at-scale dedup trade; verify array equality inside colliding groups
    if a workload can't accept it.
    """
    groups = (
        arr_df.select(
            F.col(id_col),
            F.xxhash64(F.array_sort(F.col(arr_col))).alias("__fp"),
        )
        .groupBy("__fp")
        .agg(
            F.min(id_col).alias("__rep"),
            F.array_sort(F.collect_set(id_col)).alias("__ids"),
        )
    )
    reps = arr_df.join(
        groups.select(F.col("__rep").alias(id_col)), id_col, "left_semi"
    )
    return groups, reps


def expand_rep_pairs(
    rep_pairs: DataFrame, groups: DataFrame, value_cols: list[str]
) -> DataFrame:
    """Expand rep-level (id_a, id_b, *value_cols) pairs to all original-id
    pairs through the dup-group map; ``value_cols`` ride unchanged (they
    are pure functions of the two texts). Output ids re-ordered with
    least/greatest so id_a < id_b holds after expansion."""
    ga = groups.select(F.col("__rep").alias("id_a"), F.col("__ids").alias("__ids_a"))
    gb = groups.select(F.col("__rep").alias("id_b"), F.col("__ids").alias("__ids_b"))
    return (
        rep_pairs.join(ga, "id_a")
        .join(gb, "id_b")
        .select(*value_cols, F.explode("__ids_a").alias("__x"), "__ids_b")
        .select(*value_cols, "__x", F.explode("__ids_b").alias("__y"))
        .select(
            F.least("__x", "__y").alias("id_a"),
            F.greatest("__x", "__y").alias("id_b"),
            *value_cols,
        )
    )


def within_group_pairs(
    groups: DataFrame,
    survivors: DataFrame,
    id_col: str,
    values: dict[str, F.Column],
) -> DataFrame:
    """All (id_a < id_b) pairs inside exact-dup groups, with literal
    ``values`` columns (exact dups: Jaccard 1, estimate 1, error 0).
    ``survivors`` filters to groups whose rep is still in the pipeline
    (e.g. passed the minimum-shingle-count gate)."""
    return (
        groups.where(F.size("__ids") >= 2)
        .join(survivors.select(F.col(id_col).alias("__rep")), "__rep", "left_semi")
        .select(F.explode(ordered_pair_structs(F.col("__ids"))).alias("p"))
        .select(
            F.col("p.id_a").alias("id_a"),
            F.col("p.id_b").alias("id_b"),
            *[v.alias(name) for name, v in values.items()],
        )
    )


def jaccard_verify(
    shingles: DataFrame,
    pairs: DataFrame,
    id_col: str,
    shingle_col: str = "shingle",
    threshold: float = 0.0,
) -> DataFrame:
    """Exact Jaccard on candidate pairs: |A∩B| / (|A|+|B|-|A∩B|).

    Joins run only over candidate pairs (LSH output), so the quadratic
    verification cost is bounded by actual near-duplicates, not corpus size.
    """
    sizes = shingles.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    sa = shingles.select(F.col(id_col).alias("id_a"), F.col(shingle_col))
    sb = shingles.select(F.col(id_col).alias("id_b"), F.col(shingle_col))
    inter = (
        pairs.join(sa, "id_a")
        .join(sb, ["id_b", shingle_col])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    za = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"))
    zb = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"))
    # filter on the UNrounded ratio (the oracle's WHERE does too — filtering
    # on the rounded value would keep a 0.4999996 pair the oracle drops)
    ratio = F.col("inter").cast("double") / (
        F.col("sz_a") + F.col("sz_b") - F.col("inter")
    ).cast("double")
    return (
        inter.join(za, "id_a")
        .join(zb, "id_b")
        .where(ratio >= threshold)
        .select("id_a", "id_b", F.round(ratio, 6).alias("jaccard"))
    )


_dup_probe_cache: dict[tuple, float] = {}
_DUP_PROBE_CACHE_MAX = 256


def has_duplicate_sets(
    arr_df: DataFrame,
    id_col: str,
    arr_col: str = "shingles",
    min_frac: float = 0.0,
) -> bool:
    """One-job probe: is ``arr_df``'s duplicate-(sorted)-array fraction
    above ``min_frac``?

    Memoized on (application id, plan semanticHash) — repeated pipeline
    invocations over the same memoized reader plan (bench min-of-N loops,
    the driver's per-query runs) pay the probe once; the cached value is
    the FRACTION, so callers with different thresholds share one probe.
    Drives the ADAPTIVE exact-collapse COST-BASED: the group-map
    machinery adds ~10 stage-jobs of fixed overhead (~0.5-1s at the
    local per-job floor) and pays off proportionally to the duplication
    factor, so a corpus with trace-level duplication (a handful of dup
    docs in thousands — measured 0.16% on the sf0.1 fixture) takes the
    direct path, while a crawl-shaped corpus (30-90% dups, like the
    10x/100x replicas) takes the collapsed one. Both branches are
    row-identical; the threshold only moves the crossover.

    A wrong or stale cache hit (semanticHash is a 32-bit plan hash, and
    files rewritten in-place under the same plan don't change it) is
    PERF-ONLY by design. The cache is bounded (drops oldest entries past
    ``_DUP_PROBE_CACHE_MAX``) so a long-lived session can't grow it
    without limit.
    """
    key = (
        arr_df.sparkSession.sparkContext.applicationId,
        arr_df.semanticHash(),
    )
    frac = _dup_probe_cache.get(key)
    if frac is None:
        row = arr_df.agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct(F.xxhash64(F.array_sort(F.col(arr_col)))).alias("d"),
        ).collect()[0]
        frac = (row["n"] - row["d"]) / row["n"] if row["n"] else 0.0
        if len(_dup_probe_cache) >= _DUP_PROBE_CACHE_MAX:
            _dup_probe_cache.pop(next(iter(_dup_probe_cache)))
        _dup_probe_cache[key] = frac
    return frac > min_frac


def minhash_near_dups(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    k: int = 8,
    bands: int = 4,
    threshold: float = 0.5,
    cache_shingles: bool = True,
    collapse: bool | None = None,
    family: str = "md5",
) -> DataFrame:
    """Full near-dup pipeline: shingle → minhash → LSH → exact verify.

    ``family`` selects the signature hash family (see
    ``minhash_signatures_arrays``): "md5" is engine-portable and what
    the oracle-checked queries use; "xxhash64" is the cheaper scale
    path with statistically equivalent candidate quality — verification
    is exact either way, so a family switch can only move which
    candidate pairs are CONSIDERED, never emit a wrong Jaccard.

    ARRAY form (module docstring): the per-doc shingle-set table feeds
    two consumers (signatures + verification), so it is persisted once
    (MEMORY_AND_DISK — docs-sized rows, spills instead of OOM). The
    pipeline's only shuffles are the (band, bucket) grouping and the
    pair distinct. Pass ``cache_shingles=False`` when the caller already
    persists the input or runs the pipeline once on a small corpus; for
    unbounded individual document sizes, compose the EXPLODE-form
    primitives instead.

    Verification intersects HASH arrays, not shingle strings: md5-family
    pipelines intersect the 32-hex digest arrays the signatures already
    derive from (one fused projection serves both consumers — see
    shingle_digest_array), the xxhash64 family intersects 8-byte long
    fingerprints. Either way a pair's Jaccard differs from string
    equality only on a hash collision inside that pair's union (128-bit:
    P < 10^-34; 64-bit: P ≈ 100²/2⁶⁵ ≈ 3e-16) — the standard
    fingerprint-equality trade every at-scale dedup makes. When candidate
    density is high (the 10x replica) the verify joins shuffle pair rows
    carrying both docs' arrays; hash arrays cut that payload vs raw
    shingle strings.

    EXACT-COLLAPSE FIRST (the production ordering: exact dedup before
    near-dedup): the expensive stages — shingling, signatures, banding,
    verification — run only on DISTINCT texts; results expand back to
    original ids through the duplicate-group map. Mathematically
    equivalent to running on all docs: identical texts have identical
    signatures, so they always share every bucket (within-group pairs are
    candidates with exact Jaccard 1.0), and any cross-text candidate/
    verification outcome is a pure function of the two texts. Cost at 1x
    (a corpus with no exact dups): one narrow (text-hash, id) shuffle and
    broadcast-sized joins. Gain on a crawl-shaped corpus (30-50% exact
    dups; the 10x/100x replicas by construction): the whole pipeline
    shrinks by the duplication factor — measured 3.4s -> ~1s at 10x,
    30s -> ~2s at 100x. The group map rides broadcast joins at these
    sizes; at 100 TB the same shape is a shuffle join on the rep id —
    exactly the materialize-the-deduped-corpus pass production runs
    anyway.
    """
    from pyspark import StorageLevel

    # md5 family (round 6): the FUSED digest pipeline — md5 evaluated
    # inside the shingle transform, distinct + exact-verify on the digest
    # arrays (see shingle_digest_array; interleaved A/B 0.55 -> 0.45 at
    # sf0.1). xxhash64 family keeps the string-shingle table (its hashes
    # are seeded per signature member, so no shared digest exists to
    # fuse). Round-6 A/B note (two full-harness min-merged runs each):
    # both EXPLODE-based signature rewrites measured SLOWER than the
    # interpreted array chains — (a) pure-codegen row signatures with
    # candidate-only verify arrays (+0.23: extra semi-join/broadcast
    # stages cost more scheduler floor than codegen saves), (b)
    # signatures via explode-of-the-cache into the codegen row agg
    # (+0.08: the generate + partial-agg shuffle cancels the window-
    # transform win). Don't re-run those experiments.
    if family == "md5":
        arr0 = shingle_digest_array(df, id_col, text_col, n=n)
        arr_col = "hs"
    else:
        arr0 = shingle_array(df, id_col, text_col, n=n)
        arr_col = "shingles"
    # adaptive collapse (``collapse=None``): probe once per input identity
    # whether duplicate shingle-sets exist; without them the collapsed and
    # direct pipelines are identical row-for-row, so take the direct form
    # and skip the group-map stages. The probe runs on the UNpersisted
    # shingle table (one extra source scan, memoized per input identity) so
    # the direct path below caches the shingle arrays exactly ONCE — the
    # previous form persisted both arr0 and the derived arr, doubling the
    # largest cache in the pipeline.
    if collapse is None:
        # cost-based crossover: the group-map stages only pay off when the
        # pipeline shrinks materially (see has_duplicate_sets docstring)
        collapse = has_duplicate_sets(arr0, id_col, arr_col, min_frac=0.05)

    def with_fingerprints(base: DataFrame) -> tuple[DataFrame, str]:
        """(verify table, verify column) per family: digests ARE the
        fingerprints; string shingles get the xxhash64 long projection."""
        if family == "md5":
            return base, "hs"
        return (
            base.select(
                F.col(id_col),
                F.col("shingles"),
                F.transform("shingles", lambda x: F.xxhash64(x)).alias("__sh64"),
            ),
            "__sh64",
        )

    def signatures_of(arr: DataFrame) -> DataFrame:
        if family == "md5":
            return minhash_signatures_digests(arr, id_col, "hs", k=k)
        return minhash_signatures_arrays(arr, id_col, k=k, family=family)

    if not collapse:
        # Direct path: one cached array table feeds signatures + verify.
        arr, verify_col = with_fingerprints(arr0)
        if cache_shingles:
            arr = arr.persist(StorageLevel.MEMORY_AND_DISK)
        sigs = signatures_of(arr)
        pairs = lsh_candidate_pairs(sigs, id_col, k=k, bands=bands)
        return jaccard_verify_arrays(
            arr, pairs, id_col, arr_col=verify_col, threshold=threshold
        )
    if cache_shingles:
        # collapsed path: arr0 feeds both exact_collapse consumers (the
        # group aggregation and the rep semi join) — one persist each for
        # arr0 / groups / the rep-only arr, no table cached twice
        arr0 = arr0.persist(StorageLevel.MEMORY_AND_DISK)
    groups, reps = exact_collapse(arr0, id_col, arr_col)
    if cache_shingles:
        # the group map feeds the rep semi join, both expansion sides and
        # the within-group explode — persist the (tiny) table or each
        # consumer re-runs its aggregation
        groups = groups.persist(StorageLevel.MEMORY_AND_DISK)
    # the expensive projections — signature windows and (xxhash64 family
    # only) verify fingerprints — run on representatives only; arr feeds
    # three consumers (signatures + both verify sides), so persist it too
    # when caching is on
    arr, verify_col = with_fingerprints(reps)
    if cache_shingles:
        arr = arr.persist(StorageLevel.MEMORY_AND_DISK)
    sigs = signatures_of(arr)
    pairs = lsh_candidate_pairs(sigs, id_col, k=k, bands=bands)
    rep_pairs = jaccard_verify_arrays(
        arr, pairs, id_col, arr_col=verify_col, threshold=threshold
    )
    # expand rep-level results back to original ids: cross-group pairs
    # inherit the verified rep Jaccard; within-group pairs are exact
    # duplicates (Jaccard 1.0 by identity — emitted only when 1.0 passes
    # the threshold, like any other pair), restricted to groups whose rep
    # survived the >= n-words filter — docs with no shingles are outside
    # the near-dup universe on both engines.
    cross = expand_rep_pairs(rep_pairs, groups, ["jaccard"])
    if threshold > 1.0:
        return cross
    within = within_group_pairs(
        groups, arr.select(id_col), id_col, {"jaccard": F.lit(1.0)}
    )
    return cross.unionByName(within)
