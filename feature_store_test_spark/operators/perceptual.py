"""Perceptual image hashing + near-duplicate detection (LAION-style).

The reference has no image pipeline at all (its only media artifact is a
pickled sklearn model, /root/reference/core/utils.py:255-256); this is
north-star surface: the image/frame dedup stage a large-scale multimodal
training pipeline runs between ingest and training — "the same image
re-crawled under different URLs/byte encodings" — composed from two
families this repo already ships:

* the REAL image codecs (``operators/codecs.py`` — BMP/PPM/PNG/JPEG
  decode to pixels), and
* the banded-LSH candidate join of the text near-dup family
  (``operators/dedup.py`` — ``lsh_candidate_pairs`` group-expand,
  ``expand_rep_pairs`` / ``ordered_pairs_sql`` group expansion).

HASH (integer-only, oracle-expressible): the 8x8 average hash on decoded
luma —
    1. luma per pixel, SCALED x1000 (299R + 587G + 114B) — integers
       end-to-end, no float rounding to disagree across engines;
    2. block index (by, bx) = (y*grid div h, x*grid div w) — works for
       any dimensions, equal blocks when grid | h;
    3. bit(by,bx) = block_sum * n_pixels > total_sum * block_n_pixels
       (the exact-integer form of "block mean > image mean");
    4. bits pack into ``bands`` integers by INTERLEAVED assignment:
       block idx = by*grid + bx goes to band (idx % bands) at position
       (idx div bands). Interleaving matters: aHash bits are spatially
       correlated (a vertical gradient sets the whole top half to 0), so
       contiguous-row bands would concentrate real corpora into the
       0x0000/0xFFFF buckets; striped bands mix top and bottom blocks,
       spreading band values over the full 2^16 space.

NEAR-DUP (zero all-pairs, the q21 ordering): exact-collapse FIRST on the
full hash tuple (identical-hash images are interchangeable downstream —
same argument as ``minhash_near_dups``'s text collapse), then band the
DISTINCT hashes through the same LSH group-expand as q21, verify
candidates by exact Hamming distance (xor + bit_count, integers), and
expand rep-level pairs back through the duplicate-group map.

100 TB: every candidate comes from an equi-join on a (band, value)
bucket; all-pairs work is confined within buckets. With 16-bit bands the
bucket space is fixed, so candidate count carries a birthday term
~n_distinct^2 / 2^16 per band — fine to ~10^6 DISTINCT hashes (the
fixture's exact-collapse keeps distinct counts far below corpus size,
the same way crawl dedup does); beyond that raise ``grid`` (16 -> a
256-bit hash whose 4 bands address 2^64 buckets) or drop ``bands`` for
wider buckets — both parameters, not rewrites. The decode+hash stage is
embarrassingly parallel mapInPandas with byte-sized task counts.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# integer Rec.601 luma, scaled x1000 (299R + 587G + 114B)
LUMA_R, LUMA_G, LUMA_B = 299, 587, 114


def average_hash_bands(
    rgb: np.ndarray, grid: int = 8, bands: int = 4
) -> list[int]:
    """Integer average-hash of an (h, w, 3) uint8 array, packed into
    ``bands`` non-negative ints of grid*grid/bands bits each (interleaved
    band assignment — module docstring)."""
    h, w = rgb.shape[:2]
    px = rgb.astype(np.int64)
    luma = px[:, :, 0] * LUMA_R + px[:, :, 1] * LUMA_G + px[:, :, 2] * LUMA_B
    by = (np.arange(h, dtype=np.int64) * grid) // h
    bx = (np.arange(w, dtype=np.int64) * grid) // w
    idx = (by[:, None] * grid + bx[None, :]).ravel()
    bsum = np.zeros(grid * grid, dtype=np.int64)
    np.add.at(bsum, idx, luma.ravel())
    bnpx = np.bincount(idx, minlength=grid * grid).astype(np.int64)
    total = int(luma.sum())
    npx = h * w
    bits = (bsum * npx) > (total * bnpx)
    out = [0] * bands
    for i in range(grid * grid):
        if bits[i]:
            out[i % bands] |= 1 << (i // bands)
    return out


def perceptual_hash_bands(
    df: DataFrame,
    blob_col: str = "blob",
    id_col: str = "doc_id",
    grid: int = 8,
    bands: int = 4,
) -> DataFrame:
    """Decode each blob (real codecs: BMP/PPM/PNG/JPEG) and emit its
    average-hash band values as (id, mh0..mh{bands-1}) LONG columns —
    the wide signature form ``lsh_candidate_pairs`` consumes directly."""
    from feature_store_test_spark.operators.multimodal import python_stage_tasks

    schema = T.StructType(
        [df.schema[id_col]]
        + [T.StructField(f"mh{b}", T.LongType()) for b in range(bands)]
    )
    src = df.select(id_col, blob_col)
    n_tasks = python_stage_tasks(
        df, min_tasks=df.sparkSession.sparkContext.defaultParallelism
    )
    if n_tasks is not None:
        # real decode is CPU-bound: keep every core decoding locally; the
        # byte term dominates at scale (see python_stage_tasks)
        src = src.coalesce(n_tasks)

    def gen(batches):
        from feature_store_test_spark.operators.codecs import image_pixels

        for pdf in batches:
            out: dict[str, list] = {id_col: []}
            for b in range(bands):
                out[f"mh{b}"] = []
            for i, blob in zip(pdf[id_col], pdf[blob_col]):
                vals = average_hash_bands(
                    image_pixels(bytes(blob)), grid=grid, bands=bands
                )
                out[id_col].append(i)
                for b, v in enumerate(vals):
                    out[f"mh{b}"].append(v)
            yield pd.DataFrame(out)

    return src.mapInPandas(gen, schema)


def perceptual_near_dups(
    df: DataFrame,
    blob_col: str = "blob",
    id_col: str = "doc_id",
    grid: int = 8,
    bands: int = 4,
    max_hamming: int = 6,
) -> DataFrame:
    """Image near-dup pairs: decode -> average-hash -> exact-collapse on
    the hash tuple -> banded LSH over DISTINCT hashes -> Hamming verify
    -> expand through the dup-group map. Returns (id_a, id_b, hamming)
    with id_a < id_b. See module docstring for the scale argument."""
    from feature_store_test_spark.operators.dedup import (
        expand_rep_pairs,
        lsh_candidate_pairs,
        ordered_pairs_sql,
    )
    from feature_store_test_spark.registry import managed_cache

    mhs = [f"mh{b}" for b in range(bands)]
    # one decode pass; the signature table is tiny (bands longs per image)
    sigs = managed_cache(
        perceptual_hash_bands(
            df, blob_col=blob_col, id_col=id_col, grid=grid, bands=bands
        )
    )
    # exact-collapse on the FULL hash: identical-hash images always share
    # every band and have Hamming 0, so rep-level results expand exactly
    # (the minhash_near_dups collapse argument, keyed on the hash tuple)
    groups = managed_cache(
        sigs.groupBy(*mhs).agg(
            F.min(id_col).alias("__rep"),
            F.array_sort(F.collect_set(id_col)).alias("__ids"),
        )
    )
    rep_sigs = groups.selectExpr(f"__rep AS `{id_col}`", *mhs)
    # the SAME LSH candidate join as q21: with k == bands each band is one
    # signature column, bucketed by value (r = 1)
    pairs = lsh_candidate_pairs(rep_sigs, id_col, k=bands, bands=bands)
    ham = " + ".join(f"bit_count(__a{b} ^ __b{b})" for b in range(bands))
    aa = rep_sigs.selectExpr(
        f"`{id_col}` AS id_a", *[f"mh{b} AS __a{b}" for b in range(bands)]
    )
    bb = rep_sigs.selectExpr(
        f"`{id_col}` AS id_b", *[f"mh{b} AS __b{b}" for b in range(bands)]
    )
    rep_pairs = (
        pairs.join(aa, "id_a")
        .join(bb, "id_b")
        .selectExpr("id_a", "id_b", f"CAST({ham} AS INT) AS hamming")
        .where(f"hamming <= {int(max_hamming)}")
    )
    cross = expand_rep_pairs(rep_pairs, groups, ["hamming"])
    within = (
        groups.where(F.size("__ids") >= 2)
        .selectExpr(f"inline({ordered_pairs_sql('__ids')})")
        .selectExpr("id_a", "id_b", "CAST(0 AS INT) AS hamming")
    )
    return cross.unionByName(within)
