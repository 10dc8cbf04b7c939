"""Query definitions. Importing this package registers every query.

Modules:
    relational      scans, filters, joins, aggs, windows, sorts, set ops (SURVEY §2.1-2.8)
    relational2     grouping sets, TPC-H Q12/Q13/Q17/Q19/Q22 shapes, sliding windows, range frames
    relational3     TPC-H Q4/Q7/Q8/Q9/Q11/Q15/Q16/Q18/Q20/Q21 shapes (semi/anti/scalar-subquery forms)
    feature_parity  reference feature-store semantics re-expressed on Spark (SURVEY §2.4, §2.9-2.10)
    dedup           exact + near-duplicate detection (north-star)
    text            text analysis: tokens, language id, quality, fingerprints (north-star)
    similarity      embedding similarity search (north-star)
    multimodal      binary media columns + stub codec plumbing (north-star)
    extended        pandas UDFs, event-time windows, cube, approx aggs, LSH ANN
    pipeline        training-data pipeline: hash splits, source mixing, packing, range join
    analytics       event analytics: gap-filled resample, new-vs-returning, cohort retention
    curation        corpus governance: PII redaction, provenance stats, contamination matrix
    retrieval       bigram-LM quality scoring, BM25 keyword search
    graphrank       PageRank over the aggregated nation trade graph
    sketches        count-min heavy hitters with exact rerank
    fuzzy           edit-distance fuzzy matching (length-band blocked levenshtein join)
    profiling       one-pass column profiler (rows / nulls / exact distinct)
    tokenize        corpus-trained BPE: recursive-SQL-replayable merge training + token counts
"""

from feature_store_test_spark.queries import (  # noqa: F401
    analytics,
    curation,
    dedup,
    extended,
    feature_parity,
    fuzzy,
    graphrank,
    multimodal,
    pipeline,
    profiling,
    relational,
    relational2,
    relational3,
    retrieval,
    similarity,
    sketches,
    text,
    tokenize,
)
