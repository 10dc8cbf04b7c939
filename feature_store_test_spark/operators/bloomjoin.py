"""Distributed Bloom-filter semi-join reduction (runtime row filtering).

The classic 100 TB pattern: a fact→dim semi join whose dim side is too
big to broadcast as exact keys forces a full shuffle of the fact table.
A Bloom filter of the dim keys is thousands of times smaller than the
keys themselves, has no false negatives, and can be applied map-side —
so the expensive shuffle only ever sees fact rows that *probably* match,
and an exact join over the survivors removes the false positives. Net:
identical results to the plain semi join, with shuffle input cut to
(match rate + false-positive rate) of the fact table.

Spark's own runtime filters (``spark.sql.optimizer.runtime.bloomFilter``)
inject the same shape inside Catalyst but only for favourable cost
estimates; this operator is the explicit, always-on form, built from
plain DataFrame ops so the construction itself distributes:

- build: each dim key sets ``n_hashes`` bit positions
  (``xxhash64(key, seed) mod m_bits``); positions aggregate into ≤
  ``m_bits/64`` 64-bit words via ``bit_or`` — a vocab-bounded groupBy,
  never a driver-side bitmap (contrast ``df.stat.bloomFilter``, which
  collects to the driver and can't be applied JVM-side from Python).
- probe: per hash seed, one broadcast hash join of the fact against the
  tiny word table plus a bitmask test — all map-side, inside
  whole-stage codegen, zero extra shuffles.

Sizing: with ``|S|`` keys, ``m_bits`` bits and ``k`` hashes the false
positive rate is ``(1 - e^(-k|S|/m))^k``; at 100 TB you would size
``m_bits`` from a cheap ``approx_count_distinct`` of the dim side
(one extra tiny job). The default here is fixed so plans stay
deterministic at test scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bloom_words(keys: DataFrame, key_col: str, m_bits: int, n_hashes: int) -> DataFrame:
    """Aggregate the Bloom bitmap of ``keys[key_col]`` as a word table
    ``(word_idx int, word long)`` with at most ``m_bits/64`` rows.

    Duplicate keys are harmless (bit_or is idempotent), so callers do
    not pay a distinct() shuffle on the build side.
    """
    if m_bits % 64 != 0:
        raise ValueError(f"m_bits must be a multiple of 64, got {m_bits}")
    positions = keys.select(
        F.explode(
            F.array(
                *[
                    F.pmod(F.xxhash64(F.col(key_col), F.lit(seed)), F.lit(m_bits))
                    for seed in range(n_hashes)
                ]
            )
        ).alias("pos")
    )
    return (
        positions.select(
            (F.col("pos") / 64).cast("int").alias("word_idx"),
            # shiftleft's bit-count arg must be a column-valued expression
            # here; the python F.shiftleft only accepts a literal int
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").alias("mask"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("word"))
    )


def bloom_prefilter(
    fact: DataFrame,
    words: DataFrame,
    fact_col: str,
    m_bits: int,
    n_hashes: int,
) -> DataFrame:
    """Keep only fact rows whose ``fact_col`` passes the Bloom filter
    ``words`` (built by :func:`bloom_words` with the same geometry).

    One broadcast hash join per hash seed against the ≤``m_bits/64``-row
    word table — map-side, no shuffle of ``fact``. Inner joins are
    correct here: a missing word_idx means no dim key ever set any bit
    in that word, so the row cannot match.
    """
    out = fact
    for seed in range(n_hashes):
        w = F.broadcast(
            words.select(
                F.col("word_idx").alias(f"_bf_idx{seed}"),
                F.col("word").alias(f"_bf_word{seed}"),
            )
        )
        pos = F.pmod(F.xxhash64(F.col(fact_col), F.lit(seed)), F.lit(m_bits))
        out = (
            out.withColumn(f"_bf_pos{seed}", pos)
            .join(
                w,
                (F.col(f"_bf_pos{seed}") / 64).cast("int")
                == F.col(f"_bf_idx{seed}"),
            )
            .where(
                F.expr(
                    f"shiftright(_bf_word{seed}, CAST(_bf_pos{seed} % 64 AS INT)) & 1"
                )
                == 1
            )
            .drop(f"_bf_pos{seed}", f"_bf_idx{seed}", f"_bf_word{seed}")
        )
    return out


def bloom_semi_join(
    fact: DataFrame,
    dim_keys: DataFrame,
    fact_col: str,
    dim_col: str,
    m_bits: int = 1 << 18,
    n_hashes: int = 3,
    words: DataFrame | None = None,
) -> DataFrame:
    """Semi join ``fact`` to ``dim_keys`` with a Bloom prefilter ahead of
    the exact join. Result rows are exactly ``fact LEFT SEMI JOIN
    dim_keys`` — the filter only reduces how much of ``fact`` reaches
    the exact join's shuffle; the rerank removes false positives.

    The probe references the word table once per hash seed, so without
    reuse the build aggregation runs ``n_hashes`` times. Callers that
    control a cache lifecycle should pass ``words=cache(bloom_words(
    dim_keys, dim_col, m_bits, n_hashes))`` so the ≤``m_bits/64``-row
    bitmap is computed once (registered queries use ``managed_cache``;
    the operator itself does not persist — cache policy belongs to the
    caller).
    """
    if words is None:
        words = bloom_words(dim_keys, dim_col, m_bits, n_hashes)
    candidates = bloom_prefilter(fact, words, fact_col, m_bits, n_hashes)
    # no distinct() on the dim side: LEFT SEMI is already set-semantic
    # over the right input, so deduping would just add a shuffle
    return candidates.join(
        dim_keys.select(F.col(dim_col).alias(fact_col)),
        on=fact_col,
        how="left_semi",
    )
