"""Degenerate-document regression net: empty text, single-word text,
below-shingle-width text, and exact batch duplicates, run through the
text/dedup query family.

The oracle fixtures are well-formed prose, so they never exercise these
rows; Spark 4's default ANSI mode turns several silent-NaN/NULL habits
into runtime errors (the zero-vector cosine crash was exactly this
class), making "doesn't crash on degenerate rows" a property worth
pinning per family. Row counts are asserted where the semantics make
them obvious, existence otherwise.
"""

from __future__ import annotations

import pytest

from feature_store_test_spark.registry import all_queries, release_caches


@pytest.fixture()
def degenerate_docs(spark, tmp_path):
    rows = [
        (0, "", "src0", 0),                      # empty text
        (1, "one", "src0", 3),                   # single word
        (2, "two words", "src1", 9),             # below 3-shingle width
        (3, "a b c d e f g h i j", "src9", 19),  # normal
        (4, "a b c d e f g h i j", "src9", 19),  # exact dup inside batch
    ]
    sf = str(tmp_path)
    spark.createDataFrame(
        rows, "doc_id long, text string, source string, n_chars long"
    ).write.parquet(sf + "/documents.parquet")
    return sf


QUERIES = [
    ("q19_exact_dedup_stats", 3),     # one row per source
    ("q20_dedup_keep_first", 4),      # 4 distinct head fingerprints
    ("q21_minhash_near_dups", 1),     # the one identical-text pair
    ("q22_simhash", 5),               # every doc gets a fingerprint
    ("q26_token_counts", None),
    ("q87_token_budget_sample", 3),   # one row per source
    ("q110_incremental_dedup", 1),    # the deduped src9 fingerprint
    ("q84_dedup_components", 5),      # every doc labelled
    ("q126_span_dedup", 5),
    ("q127_pii_redaction", 5),
    ("q128_url_domain_stats", 5),
    ("q102_decontamination", 0),      # nothing shares 8-grams with eval
    ("q155_doc_chunking", 5),         # every doc yields its single short chunk
    ("q156_mlm_corruption", 5),       # every doc gets input/target fps
    ("q157_trigram_langid", None),    # lang column absent -> NULL labels; no crash
]


@pytest.mark.parametrize("name,expected", QUERIES)
def test_degenerate_docs_do_not_crash(spark, degenerate_docs, name, expected):
    n = all_queries()[name].fn(spark, degenerate_docs).count()
    release_caches()
    if expected is not None:
        assert n == expected, name


def test_bm25_adversarial_corpus_matches_oracle(spark, tmp_path):
    """Round-6 adversarial probe for the retrieval family, ORACLE-compared
    (the family's other degenerate coverage is Spark-only): a corpus where
    every doc contains every query term (df == N — minimal idf), a doc
    that is ONLY query terms repeated (tf ≈ dl), whitespace-only text,
    a one-word doc, and ties by construction. Pins that the shared SQL
    scoring text really is engine-agreed on the degenerate ends of the
    tf/df/dl ranges and that rounded-score + doc_id tiebreaks hold."""
    import duckdb

    from feature_store_test_spark.registry import all_queries, release_caches

    rows = [
        (0, "hash scan merge", "s", 15),
        (1, "hash hash hash hash hash hash hash hash", "s", 39),  # tf~dl
        (2, "   ", "s", 3),                                        # whitespace only
        (3, "merge", "s", 5),                                      # one word
        (4, "hash scan merge", "s", 15),                           # exact tie with 0
        (5, "a b c d e f g h hash scan merge", "s", 31),
    ]
    sf = str(tmp_path)
    spark.createDataFrame(
        rows, "doc_id long, text string, source string, n_chars long"
    ).write.parquet(sf + "/documents.parquet")

    spec = all_queries()["q134_bm25_search"]
    got = sorted(tuple(r) for r in spec.fn(spark, sf).collect())
    release_caches()
    con = duckdb.connect()
    con.execute(  # Spark writes a part-file directory -> glob form
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet/*.parquet')"
    )
    want = sorted(tuple(r) for r in con.execute(spec.oracle).fetchall())
    assert len(got) == 5  # every doc but the whitespace-only one scores
    assert got == want
    # ties really happened and broke deterministically: docs 0 and 4 are
    # identical texts -> identical rounded scores, both present
    by_id = {r[0]: r[-1] for r in got}
    assert by_id[0] == by_id[4]


def test_bpe_and_maxspan_degenerate_oracle_parity(spark, tmp_path):
    """Round-7 adversarial probe for the new tokenize/span family, ORACLE-
    compared on a corpus the fixtures never produce: empty text,
    whitespace-only, punctuation-only (zero [a-z]+ words), a one-char
    word, a word that is one long run of a single char (pathological
    (x, x) self-overlapping merges), and exact duplicate docs (anchor
    keep-first ties). Pins engine agreement of the recursive-CTE BPE
    training replay and the island-merge span algebra on the degenerate
    ends."""
    import duckdb

    from feature_store_test_spark.operators import bpe as bpe_ops

    rows = [
        (0, "", "s", 0),
        (1, "   ", "s", 3),
        (2, "123 ... !!!", "s", 11),                      # no [a-z]+ at all
        (3, "x", "s", 1),                                  # one char
        (4, "xxxxxxxxxx", "s", 10),                        # single-char run
        (5, "the quick brown fox jumps over the lazy dog again", "s", 50),
        (6, "the quick brown fox jumps over the lazy dog again", "s", 50),
    ]
    sf = str(tmp_path)
    spark.createDataFrame(
        rows, "doc_id long, text string, source string, n_chars long"
    ).write.parquet(sf + "/documents.parquet")

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet/*.parquet')"
    )
    for name in ("q150_bpe_train", "q151_bpe_token_counts", "q152_max_span_dedup"):
        spec = all_queries()[name]
        got = sorted(tuple(r) for r in spec.fn(spark, sf).collect())
        release_caches()
        want = sorted(tuple(r) for r in con.execute(spec.oracle).fetchall())
        assert got == want, name

    # semantic spot checks:
    merges, seg = bpe_ops.trained_bpe(spark, sf)
    # the xxxxxxxxxx word segments consistently under self-overlapping merges
    assert "".join(seg["xxxxxxxxxx"]) == "xxxxxxxxxx"
    # docs 5 and 6 are exact dups: doc 5 owns every first anchor, doc 6 is
    # fully covered (10 tokens, W=10 -> one run of exactly 10)
    out = {
        r["doc_id"]: r.asDict()
        for r in all_queries()["q152_max_span_dedup"].fn(spark, sf).collect()
    }
    release_caches()
    assert out[5]["n_covered_tokens"] == 0
    assert out[6] == {
        "doc_id": 6, "n_tokens": 10, "n_dup_runs": 1,
        "n_covered_tokens": 10, "max_run_len": 10,
    }
    # wordless docs report zero coverage, empty-word docs absent from q151
    assert out[0]["n_covered_tokens"] == 0 and out[2]["n_covered_tokens"] == 0


def test_q153_html_extract_adversarial_text(spark, tmp_path):
    """q153 synthesizes HTML around the document text, so the adversarial
    class is text that LOOKS like markup: literal tags, entities, braces,
    quotes, empty/whitespace text. Both engines run the identical
    synthesis + strip pipeline, so outputs must hash-match even when the
    'extraction' of such a document is lossy by construction."""
    import duckdb

    rows = [
        (0, "", "en", "s", 0),
        (1, "   ", "en", "s", 3),
        (2, "plain words only here", "en", "s", 21),
        (3, "evil <script>alert(1)</script> embedded", "de", "s", 39),
        (4, "entity soup &amp; &lt;tag&gt; &quot;q&quot; &#39;a&#39;", "es", "s", 55),
        (5, "closing </article> early and <footer>fake</footer>", "en", "s", 50),
        (6, "braces { and } and <nav>menu</nav> inline", "de", "s", 41),
        # nested landmarks: the fused single-pass block strip ends at the
        # FIRST listed closer, so the inner <nav> closer ends the block
        # and "site title" survives as text (declared semantics —
        # operators/text.BLOCK_STRIP_PATTERN)
        (7, "intro <header><nav>m</nav>site title</header> outro", "en", "s", 51),
        # custom element sharing a boilerplate tag-name PREFIX: the anchored
        # opener boundary (r8 ADVICE) must not treat <navbar> as a <nav>
        # opener — its content survives, the tags strip as stray tags
        (8, "custom <navbar>keep me</navbar> tail", "en", "s", 36),
    ]
    sf = str(tmp_path)
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(sf + "/documents.parquet")

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet/*.parquet')"
    )
    spec = all_queries()["q153_html_extract"]
    got = sorted(tuple(r) for r in spec.fn(spark, sf).collect())
    release_caches()
    want = sorted(tuple(r) for r in con.execute(spec.oracle).fetchall())
    assert got == want

    # semantic spot checks on the clean row: boilerplate gone, text kept
    out = {r["doc_id"]: r.asDict() for r in spec.fn(spark, sf).collect()}
    release_caches()
    assert out[2]["main_starts_with_src"] is True
    import hashlib

    main2 = "plain words only here tags & notes for lang en"
    assert out[2]["main_fp"] == hashlib.md5(main2.encode()).hexdigest()
    assert out[2]["n_main_chars"] == len(main2)
    # nested-landmark residue survives per the declared fused semantics
    main7 = "intro site title outro tags & notes for lang en"
    assert out[7]["main_fp"] == hashlib.md5(main7.encode()).hexdigest()
    # prefix-named custom element is NOT a boilerplate opener: its content
    # survives and only the tags strip
    main8 = "custom keep me tail tags & notes for lang en"
    assert out[8]["main_fp"] == hashlib.md5(main8.encode()).hexdigest()


def test_q157_langid_degenerate_oracle_parity(spark, tmp_path):
    """q157 on the degenerate ends: empty text, sub-trigram text, NULL
    text (all three yield no trigrams — absent from the output on BOTH
    engines: Spark filters length >= 3 because sequence(1, n<1) descends,
    DuckDB's generate_series is naturally empty), exact-tie distances
    (identical docs under different labels — alphabetical tiebreak), and
    a single-language corpus slice."""
    import duckdb

    rows = [
        (0, "", "en", "s", 0),
        (1, "ab", "en", "s", 2),          # below trigram width
        (2, None, "en", "s", 0),          # NULL text
        (3, "aaa bbb ccc aaa", "de", "s", 15),
        (4, "aaa bbb ccc aaa", "es", "s", 15),  # identical text, other label
        (5, "xyz xyz xyz", "en", "s", 11),
        (6, "the quick brown fox jumps over the lazy dog", "en", "s", 44),
        # NULL label + trigrams unique to this doc: it trains only the
        # (non-candidate) NULL profile, so EVERY candidate distance ties
        # at K * |doc profile| — exercising both the NULL-candidate
        # exclusion (Spark sorts NULLS FIRST ascending, DuckDB NULLS
        # LAST — a NULL candidate would flip the pick) and the
        # alphabetical tiebreak itself (code-review r9)
        (7, "zzz qqq vvv zzz", None, "s", 15),
    ]
    sf = str(tmp_path)
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(sf + "/documents.parquet")

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet/*.parquet')"
    )
    spec = all_queries()["q157_trigram_langid"]
    # NULL true-lang rows make the output tuples None-bearing; sort with
    # a None-aware key (Python can't compare None to str)
    nkey = lambda t: tuple((x is None, x) for x in t)  # noqa: E731
    got = sorted((tuple(r) for r in spec.fn(spark, sf).collect()), key=nkey)
    release_caches()
    want = sorted(
        (tuple(r) for r in con.execute(spec.oracle).fetchall()), key=nkey
    )
    assert got == want
    # trigram-less docs (0, 1, 2) contribute nothing: 5 classified docs
    assert sum(r[2] for r in got) == 5
    # the NULL-label doc classifies into the alphabetically-first
    # candidate (exact tie: none of its trigrams hit any real profile)
    assert (None, "de", 1) in got


def test_q156_null_text_oracle_parity(spark, tmp_path):
    """NULL-text row through q156 (r8 ADVICE): both engines must agree —
    n_masked and input_fp are NULL, target_fp is md5('') via the matching
    coalesces (DuckDB's COALESCE on array_to_string, Spark's on
    array_join). The standard fixtures have no NULL text, so this is the
    only place the case is exercised."""
    import hashlib

    import duckdb

    rows = [(0, None, "en", "s", 0), (1, "two words", "en", "s", 9)]
    sf = str(tmp_path)
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(sf + "/documents.parquet")

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet/*.parquet')"
    )
    spec = all_queries()["q156_mlm_corruption"]
    got = sorted(tuple(r) for r in spec.fn(spark, sf).collect())
    release_caches()
    want = sorted(tuple(r) for r in con.execute(spec.oracle).fetchall())
    assert got == want
    by_id = {r[0]: r for r in got}
    assert by_id[0][1] is None and by_id[0][2] is None
    assert by_id[0][3] == hashlib.md5(b"").hexdigest()
