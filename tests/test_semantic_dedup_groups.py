"""q121's rep-graph component contract, pinned on adversarial synthetic
data the parquet fixtures never produce.

The round-5 rewrite runs connected components on one node per distinct
(label, embedding) group and maps ids through their group rep. Its
correctness argument has two load-bearing claims that the fixture-based
oracle drive exercises only implicitly:

1. zero-vector groups (cosine NaN) form NO edges — neither internal
   cliques nor cross pairs — so each of their ids must stay its own
   component even though the ids share one (label, embedding) group;
2. min-id labels survive the collapse: the component label of every id
   equals the min vec_id over the component of the EXPANDED id graph.

Both are asserted here against a brute-force NumPy reference that builds
the full id graph the pre-rewrite implementation used.
"""

from __future__ import annotations

import itertools

import numpy as np
import pytest

from feature_store_test_spark.registry import all_queries, release_caches


def _brute_components(rows, threshold=0.25):
    """Reference: full id-graph components via union-find over all
    within-label pairs whose round(cosine, 6) >= threshold."""
    parent = {r[0]: r[0] for r in rows}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo

    for (ia, la, va), (ib, lb, vb) in itertools.combinations(rows, 2):
        if la != lb:
            continue
        na, nb = np.sqrt(va @ va), np.sqrt(vb @ vb)
        if na == 0.0 or nb == 0.0:
            continue  # NaN cosine: never an edge
        if round(float(va @ vb / (na * nb)), 6) >= threshold:
            union(ia, ib)
    return {i: find(i) for i, _, _ in rows}


@pytest.fixture()
def adversarial_embeddings(spark, tmp_path):
    """Labels exercising every branch: a duplicated-vector group, a
    zero-vector group (size 3!), a singleton zero vector, cross-group
    near-dups, and an isolated far vector."""
    base = np.array([1.0, 0.0, 0.0, 0.0])
    near = np.array([0.9, 0.1, 0.0, 0.0])
    far = np.array([0.0, 0.0, 0.0, 1.0])
    zero = np.zeros(4)
    rows = [
        # label 0: ids 0,1 share an identical vector (one group);
        # id 2 is near it (cross edge); id 3 is far (isolated)
        (0, 0, base), (1, 0, base), (2, 0, near), (3, 0, far),
        # label 1: three ids share the ZERO vector — one group, no edges
        (4, 1, zero), (5, 1, zero), (6, 1, zero),
        # label 1: a normal pair that must still connect
        (7, 1, base), (8, 1, near),
        # label 2: singleton zero vector
        (9, 2, zero),
    ]
    sf = str(tmp_path / "sf")
    (tmp_path / "sf").mkdir()
    spark.createDataFrame(
        [(i, int(l), [float(x) for x in v]) for i, l, v in rows],
        "vec_id long, label int, embedding array<float>",
    ).write.parquet(sf + "/embeddings.parquet")
    return sf, rows


def test_q121_matches_bruteforce_id_graph(spark, adversarial_embeddings):
    sf, rows = adversarial_embeddings
    expected = _brute_components(rows)
    got = {
        r["vec_id"]: r["component"]
        for r in all_queries()["q121_semantic_dedup"].fn(spark, sf).collect()
    }
    release_caches()
    assert got == expected
    # the two claims, spelled out:
    assert got[4] == 4 and got[5] == 5 and got[6] == 6  # zero group: selves
    assert got[9] == 9                                   # zero singleton
    assert got[0] == 0 and got[1] == 0 and got[2] == 0   # dup group + near
    assert got[3] == 3                                   # far: isolated
    assert got[7] == 7 and got[8] == 7                   # normal pair


def test_q84_star_edges_match_bruteforce_cliques(spark, tmp_path):
    """q84's star edges (docs connect via their fingerprint's min-doc hub)
    must produce the exact components of the pairwise-clique graph, on a
    corpus with a dominant shared head (the clique-explosion shape the
    star form exists for) and chained head/tail overlaps."""
    docs = [
        # one dominant head shared by 6 docs (ids 0-5), distinct tails
        *[(i, f"aaa bbb ccc ddd eee tail{i} x y z w") for i in range(6)],
        # chain: doc 6 shares its TAIL with doc 7's HEAD words
        (6, "p q r s t uuu vvv www xxx yyy"),
        (7, "uuu vvv www xxx yyy k l m n o"),
        # isolated
        (8, "alone words that match nothing else at all ok fin"),
        # short doc (< 5 words): head slice == whole text
        (9, "tiny doc here"),
    ]
    sf = str(tmp_path / "sf")
    (tmp_path / "sf").mkdir()
    spark.createDataFrame(
        [(i, t, "srcA", len(t)) for i, t in docs],
        "doc_id long, text string, source string, n_chars long",
    ).write.parquet(sf + "/documents.parquet")

    # brute force: union-find over pairwise shared head/tail fingerprints
    def fps(t):
        w = t.split(" ")
        return {" ".join(w[:5]), " ".join(w[-5:])}

    parent = {i: i for i, _ in docs}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for (ia, ta), (ib, tb) in itertools.combinations(docs, 2):
        if fps(ta) & fps(tb):
            ra, rb = find(ia), find(ib)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    expected = {i: find(i) for i, _ in docs}

    got = {
        r["doc_id"]: r["component"]
        for r in all_queries()["q84_dedup_components"].fn(spark, sf).collect()
    }
    release_caches()
    assert got == expected
    assert got[0] == 0 and got[5] == 0      # dominant-head clique
    assert got[7] == 6                       # tail->head chain
    assert got[8] == 8 and got[9] == 9       # isolated + short doc


def test_ann_family_survives_degenerate_embeddings(spark, tmp_path):
    """Zero vectors and mass-duplicated vectors through the trained-ANN
    paths: IVF/PQ unit-normalization is 0/0 on a zero vector — a
    DIVIDE_BY_ZERO crash under ANSI before the nullif guards. Zero-norm
    rows are filtered from k-means fit samples (no direction to
    cluster) and get NULL unit arrays at assignment (first-index argmin
    — indexed, never a crash)."""
    import random

    random.seed(7)
    one = [1.0] + [0.0] * 63
    rows = [(i, [float(x) for x in one], 0) for i in range(30)]
    rows += [(i, [0.0] * 64, 1) for i in range(30, 33)]
    rows += [
        (i, [random.random() for _ in range(64)], i % 3) for i in range(33, 40)
    ]
    sf = str(tmp_path)
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.parquet(sf + "/embeddings.parquet")
    for name in [
        "q28_cosine_topk", "q29_embedding_norms", "q30_embedding_near_dups",
        "q38_lsh_ann_topk", "q43_label_centroids", "q68_ivf_trained_ann",
        "q91_pca_ann_topk", "q103_pq_ann_topk", "q104_ivfpq_ann_topk",
        "q121_semantic_dedup", "q123_cosine_topk_gemm",
    ]:
        assert all_queries()[name].fn(spark, sf).count() >= 0, name
        release_caches()
