"""Multimodal-column queries (north-star: opaque binary + typed metadata).

The fixture has no real media files, so blobs are derived deterministically
(UTF-8 bytes of document text — pure ASCII, so char offsets == byte
offsets, which the oracle SQL relies on). The *plumbing* under test is
real: binary columns, JVM-side metadata extraction, and the Arrow-batched
mapInPandas frame fan-out with its declared output schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from feature_store_test_spark.data import load_table as load_table_plain
from feature_store_test_spark.data import load_table_spread as load_table
from feature_store_test_spark.operators.multimodal import (
    blob_meta,
    decode_media,
    extract_features,
)
from feature_store_test_spark.registry import register


def _docs_with_blob(
    spark: SparkSession, sf_dir: str, spread: bool = True
) -> DataFrame:
    # spread=True feeds the REAL-codec stages, whose min_tasks=cores clamp
    # keeps every core decoding — there the round-robin exchange IS the
    # parallelism. spread=False is for stages that byte-size themselves
    # DOWN (extract_features has no CPU clamp): at sf0.1 they coalesce to
    # 1 task, so a spread exchange upstream would be written and read
    # back for nothing (see the q28 note in queries/similarity.py).
    loader = load_table if spread else load_table_plain
    docs = loader(spark, "documents", sf_dir)
    return docs.withColumn("blob", F.encode(F.col("text"), "utf-8"))


# ---------------------------------------------------------------------------
# Q31 — binary column + JVM-side metadata extraction: the pattern that keeps
# blobs OUT of shuffles (extract small typed metadata first, shuffle that).
# ---------------------------------------------------------------------------
@register(
    "q31_blob_metadata",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           md5(text) AS content_fp,   -- md5 over the same UTF-8 bytes
           CASE substr(upper(md5(text)), 1, 1)
                WHEN 'F' THEN 'bucket-f' WHEN '8' THEN 'bucket-8'
                ELSE 'bucket-other' END AS shard
    FROM documents
    """,
    doc="opaque binary column with JVM-side typed metadata (size/fp/shard)",
    tags=("multimodal", "scalar"),
)
def q31_blob_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _docs_with_blob(spark, sf_dir)
    meta = blob_meta("blob")
    return df.select(
        "doc_id",
        meta["n_bytes"].alias("n_bytes"),
        meta["content_fp"].alias("content_fp"),
        F.when(F.substring(F.upper(meta["content_fp"]), 1, 1) == "F", F.lit("bucket-f"))
        .when(F.substring(F.upper(meta["content_fp"]), 1, 1) == "8", F.lit("bucket-8"))
        .otherwise(F.lit("bucket-other"))
        .alias("shard"),
    )


# ---------------------------------------------------------------------------
# Q32 — frame sampling through the stub codec: mapInPandas fan-out with a
# declared frame schema. The fake codec is a pure function of the bytes, so
# the oracle reproduces it with substr arithmetic (ASCII ⇒ chars == bytes).
# ---------------------------------------------------------------------------
@register(
    "q32_frame_sample",
    oracle="""
    SELECT doc_id,
           CAST(i AS INT) AS frame_idx,
           md5(substr(text, i * 256 + 1, 256)) AS frame_fp,
           CAST(length(substr(text, i * 256 + 1, 256)) AS INT) AS frame_bytes
    FROM documents, unnest(generate_series(0, (length(text) - 1) // 256)) AS g(i)
    """,
    doc="media frame sampling via Arrow-batched mapInPandas (stub codec)",
    tags=("multimodal", "udf"),
)
def q32_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _docs_with_blob(spark, sf_dir)
    return decode_media(df, blob_col="blob", id_col="doc_id", frame_size=256, fake=True)


# ---------------------------------------------------------------------------
# Q88 — media feature extraction: blob → fixed-length embedding through the
# stub encoder (normalized byte-histogram, a pure function of the bytes),
# then a JVM-side fold over the returned array (norm + dominant bin). The
# plumbing under test is the binary-in / float-array-out Arrow path — the
# same shape a real vision encoder would use, feeding the ANN operators.
# l2 rounds at 6 dp (sqrt output is non-terminating); top_bin ties resolve
# to the smallest bin on both engines (first array occurrence / ORDER BY b).
# ---------------------------------------------------------------------------
@register(
    "q88_media_features",
    oracle="""
    WITH bytes AS (
      SELECT doc_id, (ascii(substr(text, CAST(i AS INT), 1)) % 16) AS b
      FROM documents, unnest(generate_series(1, length(text))) AS g(i)
    ),
    hist AS (
      SELECT doc_id, b, COUNT(*) AS c FROM bytes GROUP BY doc_id, b
    ),
    norms AS (
      SELECT h.doc_id,
             round(sqrt(SUM(POW(CAST(h.c AS DOUBLE) / length(d.text), 2))), 6) AS l2norm
      FROM hist h JOIN documents d USING (doc_id)
      GROUP BY h.doc_id
    ),
    tops AS (
      SELECT doc_id, CAST(b AS INT) AS top_bin,
             row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, b) AS rk
      FROM hist
    )
    SELECT n.doc_id, n.l2norm, t.top_bin
    FROM norms n JOIN tops t ON n.doc_id = t.doc_id AND t.rk = 1
    ORDER BY n.doc_id
    """,
    doc="stub media encoder: blob -> byte-histogram embedding -> norm + top bin",
    tags=("multimodal", "udf", "embedding"),
)
def q88_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _docs_with_blob(spark, sf_dir, spread=False)
    emb = extract_features(df, blob_col="blob", id_col="doc_id", dim=16, fake=True)
    sq = F.aggregate(
        "embedding", F.lit(0.0), lambda acc, x: acc + x * x
    )
    top_bin = (
        F.array_position(F.col("embedding"), F.array_max("embedding")) - 1
    ).cast("int")
    # no trailing orderBy: a range sort directly above a narrow
    # mapInPandas stage SAMPLES its child for the partitioner — the
    # whole Python encode pipeline executed twice (measured 0.29s ->
    # 0.66s at sf0.1). The correctness harness sorts rows itself, and
    # unordered output is the honest contract for a distributed result.
    return emb.select(
        "doc_id",
        F.round(F.sqrt(sq), 6).alias("l2norm"),
        top_bin.alias("top_bin"),
    )


# ---------------------------------------------------------------------------
# Q118 — REAL audio codec end to end: each doc synthesizes a deterministic
# PCM16 WAV payload (samples are a closed-form function of doc_id), the
# Spark side round-trips it through ACTUAL RIFF bytes — encode_wav builds
# the container, audio_features walks the chunks and decodes the samples
# (operators/codecs.py, no stub, no fake flag) — while the oracle computes
# the same features directly from the closed form. Exercises: binary
# construction + decode in one Arrow-batched Python stage, real chunk
# parsing, numpy feature math; all hash-checked. Sums of v^2 (<=10^4 each,
# <=70 terms) are exact in doubles, so rms is bit-identical across engines.
# ---------------------------------------------------------------------------
@register(
    "q118_audio_codec",
    oracle="""
    WITH d AS (
      SELECT doc_id, 50 + doc_id % 20 AS n FROM documents WHERE doc_id < 200
    ),
    s AS (
      SELECT doc_id, n, CAST(j AS BIGINT) AS j,
             ((doc_id * 7 + j) % 200) - 100 AS v
      FROM d, unnest(generate_series(0, n - 1)) AS g(j)
    ),
    lagged AS (
      SELECT doc_id, n, v,
             LAG(v) OVER (PARTITION BY doc_id ORDER BY j) AS pv
      FROM s
    )
    SELECT doc_id,
           CAST(MIN(n) AS BIGINT) AS n_samples,
           ROUND(MIN(n) / 8000.0, 6) AS duration_s,
           ROUND(SQRT(AVG(CAST(v * v AS DOUBLE))), 6) AS rms,
           CAST(MAX(ABS(v)) AS DOUBLE) AS peak,
           ROUND(AVG(CASE WHEN pv IS NULL THEN NULL
                          WHEN (v < 0) <> (pv < 0) THEN 1.0 ELSE 0.0 END), 6)
             AS zero_crossing_rate
    FROM lagged GROUP BY doc_id
    """,
    doc="REAL WAV PCM decode (RIFF chunk walk) vs closed-form sample oracle",
    tags=("multimodal", "codec", "udf"),
)
def q118_audio_codec(spark: SparkSession, sf_dir: str) -> DataFrame:
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import types as T

    from feature_store_test_spark.operators.multimodal import audio_features

    docs = load_table(spark, "documents", sf_dir).where(F.col("doc_id") < 200)

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from feature_store_test_spark.operators.codecs import encode_wav

        for pdf in batches:
            blobs = []
            for doc_id in pdf["doc_id"]:
                n = 50 + int(doc_id) % 20
                j = np.arange(n, dtype=np.int64)
                samples = ((int(doc_id) * 7 + j) % 200) - 100
                blobs.append(encode_wav(samples, sample_rate=8000, bits=16))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "blob": blobs})

    wavs = docs.select("doc_id").mapInPandas(
        synth,
        T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("blob", T.BinaryType()),
            ]
        ),
    )
    feats = audio_features(wavs)
    # zcr's n>1 guard: n >= 50 always here, so the decoder's formula and
    # the oracle's pairwise average agree with no edge case
    return feats.select(
        "doc_id",
        F.col("n_samples"),
        F.round(F.col("duration_s"), 6).alias("duration_s"),
        F.round("rms", 6).alias("rms"),
        "peak",
        F.round("zero_crossing_rate", 6).alias("zero_crossing_rate"),
    )


# ---------------------------------------------------------------------------
# Q122 — REAL PNG codec end to end (the q118 pattern for images): each doc
# synthesizes a deterministic RGB image (pixels are a closed-form function
# of doc_id), the Spark side round-trips it through ACTUAL PNG bytes —
# encode_png builds zlib-compressed IDAT with MIXED per-row filters (every
# unfilter branch: None/Sub/Up/Average/Paeth runs in-pipeline), and
# image_features walks the chunks, CRC-checks, inflates and unfilters
# (operators/codecs.py decode_png; stdlib zlib + numpy, no stub) — while
# the oracle computes the same channel means directly from the closed
# form. Integer sums are exact in doubles, so means are bit-identical
# across engines before the 6-dp round.
# ---------------------------------------------------------------------------
@register(
    "q122_image_codec",
    oracle="""
    WITH d AS (
      SELECT doc_id, 8 + doc_id % 5 AS w, 6 + doc_id % 3 AS h
      FROM documents WHERE doc_id < 200
    ),
    px AS (
      SELECT doc_id, w, h, c.c AS c,
             CAST((doc_id * 3 + y.y * 7 + x.x * 11 + c.c * 13) % 256 AS DOUBLE) AS v
      FROM d,
           unnest(generate_series(0, h - 1)) AS y(y),
           unnest(generate_series(0, w - 1)) AS x(x),
           unnest(generate_series(0, 2)) AS c(c)
    )
    SELECT doc_id,
           CAST(MIN(w) AS INT) AS width,
           CAST(MIN(h) AS INT) AS height,
           CAST(24 AS INT) AS bpp,
           ROUND(AVG(CASE WHEN c = 0 THEN v END), 6) AS mean_r,
           ROUND(AVG(CASE WHEN c = 1 THEN v END), 6) AS mean_g,
           ROUND(AVG(CASE WHEN c = 2 THEN v END), 6) AS mean_b
    FROM px GROUP BY doc_id
    """,
    doc="REAL PNG decode (zlib inflate + all 5 unfilters) vs closed-form pixel oracle",
    tags=("multimodal", "codec", "udf"),
)
def q122_image_codec(spark: SparkSession, sf_dir: str) -> DataFrame:
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import types as T

    from feature_store_test_spark.operators.multimodal import image_features

    docs = load_table(spark, "documents", sf_dir).where(F.col("doc_id") < 200)

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from feature_store_test_spark.operators.codecs import encode_png

        for pdf in batches:
            blobs = []
            for doc_id in pdf["doc_id"]:
                did = int(doc_id)
                w, h = 8 + did % 5, 6 + did % 3
                y, x, c = np.ogrid[0:h, 0:w, 0:3]
                px = ((did * 3 + y * 7 + x * 11 + c * 13) % 256).astype(np.uint8)
                blobs.append(encode_png(px, filter_type="mixed"))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "blob": blobs})

    pngs = docs.select("doc_id").mapInPandas(
        synth,
        T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("blob", T.BinaryType()),
            ]
        ),
    )
    feats = image_features(pngs)
    return feats.select(
        "doc_id",
        "width",
        "height",
        "bpp",
        F.round("mean_r", 6).alias("mean_r"),
        F.round("mean_g", 6).alias("mean_g"),
        F.round("mean_b", 6).alias("mean_b"),
    )


# ---------------------------------------------------------------------------
# Q124 — REAL baseline-JPEG codec end to end: each doc synthesizes a
# constant-color RGB image, encodes it through the ACTUAL JPEG pipeline
# (level shift, orthonormal DCT, quality-85 quantization, zigzag,
# stream-defined canonical Huffman tables, byte stuffing) and decodes it
# back (marker walk, DHT-built codes, dequant, IDCT, YCbCr round trip).
# At quality 85 the DC quantizer step (2) divides the scaled DC of any
# constant image exactly, so decode is BIT-EXACT on these payloads — the
# oracle is the closed form: every channel mean equals the input color.
# Lossy behavior on non-constant images is property-tested in
# tests/test_codecs.py (SQL can't express DCT quantization error).
# ---------------------------------------------------------------------------
@register(
    "q124_jpeg_codec",
    oracle="""
    SELECT doc_id,
           CAST(8 + doc_id % 9 AS INT) AS width,
           CAST(8 + doc_id % 7 AS INT) AS height,
           CAST(24 AS INT) AS bpp,
           ROUND(CAST((doc_id * 37) % 256 AS DOUBLE), 6) AS mean_r,
           ROUND(CAST((doc_id * 37) % 256 AS DOUBLE), 6) AS mean_g,
           ROUND(CAST((doc_id * 37) % 256 AS DOUBLE), 6) AS mean_b
    FROM documents WHERE doc_id < 200
    """,
    doc="REAL baseline JPEG encode+decode (Huffman/DCT/quant) vs closed-form color oracle",
    tags=("multimodal", "codec", "udf"),
)
def q124_jpeg_codec(spark: SparkSession, sf_dir: str) -> DataFrame:
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import types as T

    from feature_store_test_spark.operators.multimodal import image_features

    docs = load_table(spark, "documents", sf_dir).where(F.col("doc_id") < 200)

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from feature_store_test_spark.operators.codecs import encode_jpeg

        for pdf in batches:
            blobs = []
            for doc_id in pdf["doc_id"]:
                did = int(doc_id)
                w, h, v = 8 + did % 9, 8 + did % 7, (did * 37) % 256
                blobs.append(
                    encode_jpeg(np.full((h, w, 3), v, dtype=np.uint8), quality=85)
                )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "blob": blobs})

    jpgs = docs.select("doc_id").mapInPandas(
        synth,
        T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("blob", T.BinaryType()),
            ]
        ),
    )
    feats = image_features(jpgs)
    return feats.select(
        "doc_id",
        "width",
        "height",
        "bpp",
        F.round("mean_r", 6).alias("mean_r"),
        F.round("mean_g", 6).alias("mean_g"),
        F.round("mean_b", 6).alias("mean_b"),
    )


# ---------------------------------------------------------------------------
# Q125 — REAL video codec end to end: each doc synthesizes a short Y4M
# clip (constant gray frames, values a closed-form function of doc_id and
# frame index), encoded as an actual YUV4MPEG2 stream (planar 4:4:4
# frames) and decoded back through video_features (header parse, FRAME
# walk, YCbCr→RGB). Gray frames make the color round trip bit-exact
# (Cb=Cr=128 exactly), so the oracle computes the same frame means in
# closed form. AVI-MJPEG decode is property-tested in
# tests/test_multimodal.py (lossy JPEG frames — no SQL closed form).
# ---------------------------------------------------------------------------
@register(
    "q125_video_codec",
    oracle="""
    WITH d AS (
      SELECT doc_id, 2 + doc_id % 4 AS n, 6 + doc_id % 5 AS w, 4 + doc_id % 3 AS h
      FROM documents WHERE doc_id < 200
    ),
    fr AS (
      SELECT doc_id, n, w, h,
             CAST((doc_id * 13 + f.f * 29) % 256 AS DOUBLE) AS v
      FROM d, unnest(generate_series(0, n - 1)) AS f(f)
    )
    SELECT doc_id,
           'y4m' AS container,
           CAST(MIN(w) AS INT) AS width,
           CAST(MIN(h) AS INT) AS height,
           CAST(MIN(n) AS INT) AS n_frames,
           CAST(10.0 AS DOUBLE) AS fps,
           ROUND(MIN(n) / 10.0, 6) AS duration_s,
           ROUND(AVG(v), 6) AS mean_r,
           ROUND(AVG(v), 6) AS mean_g,
           ROUND(AVG(v), 6) AS mean_b
    FROM fr GROUP BY doc_id
    """,
    doc="REAL Y4M video decode (planar 4:4:4 frame walk) vs closed-form frame oracle",
    tags=("multimodal", "codec", "video", "udf"),
)
def q125_video_codec(spark: SparkSession, sf_dir: str) -> DataFrame:
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import types as T

    from feature_store_test_spark.operators.multimodal import video_features

    docs = load_table(spark, "documents", sf_dir).where(F.col("doc_id") < 200)

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from feature_store_test_spark.operators.codecs import encode_y4m

        for pdf in batches:
            blobs = []
            for doc_id in pdf["doc_id"]:
                did = int(doc_id)
                n, w, h = 2 + did % 4, 6 + did % 5, 4 + did % 3
                frames = np.stack(
                    [
                        np.full((h, w), (did * 13 + f * 29) % 256, dtype=np.uint8)
                        for f in range(n)
                    ]
                )
                blobs.append(encode_y4m(frames, fps=10))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "blob": blobs})

    clips = docs.select("doc_id").mapInPandas(
        synth,
        T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("blob", T.BinaryType()),
            ]
        ),
    )
    feats = video_features(clips)
    return feats.select(
        "doc_id",
        "container",
        "width",
        "height",
        "n_frames",
        "fps",
        F.round("duration_s", 6).alias("duration_s"),
        F.round("mean_r", 6).alias("mean_r"),
        F.round("mean_g", 6).alias("mean_g"),
        F.round("mean_b", 6).alias("mean_b"),
    )


# ---------------------------------------------------------------------------
# Q130 — REAL inter-frame video codec end to end: each doc synthesizes a
# deterministic clip (constant-color frames, value a closed form of
# doc_id/frame index), encodes it into the IFDV container (gop=3, so every
# stream carries BOTH I-frames and P-frame deltas), and the Spark side
# decodes through the actual inter-frame reconstruction loop (P-frame =
# previous decoded frame + int16 delta — operators/codecs.py:ifdv_frames)
# while the oracle computes the same features from the closed form. IFDV is
# lossless by construction, so the hash check is exact. Foreign bitstreams
# (H.264) remain the documented external-library boundary; this pins the
# inter-frame DECODE SHAPE — carried reconstruction state, GOP boundaries —
# with a real codec.
# ---------------------------------------------------------------------------
@register(
    "q130_interframe_codec",
    oracle="""
    WITH d AS (
      SELECT doc_id, 3 + doc_id % 5 AS n, 5 + doc_id % 4 AS w, 4 + doc_id % 3 AS h
      FROM documents WHERE doc_id < 200
    ),
    fr AS (
      SELECT doc_id, n, w, h,
             CAST((doc_id * 7 + f.f * 31) % 256 AS DOUBLE) AS v
      FROM d, unnest(generate_series(0, n - 1)) AS f(f)
    )
    SELECT doc_id,
           'ifdv' AS container,
           CAST(MIN(w) AS INT) AS width,
           CAST(MIN(h) AS INT) AS height,
           CAST(MIN(n) AS INT) AS n_frames,
           CAST(12.0 AS DOUBLE) AS fps,
           ROUND(MIN(n) / 12.0, 6) AS duration_s,
           ROUND(AVG(v), 6) AS mean_r,
           ROUND(AVG(v), 6) AS mean_g,
           ROUND(AVG(v), 6) AS mean_b
    FROM fr GROUP BY doc_id
    """,
    doc="REAL inter-frame (I/P delta) video decode vs closed-form frame oracle",
    tags=("multimodal", "codec", "video", "udf"),
)
def q130_interframe_codec(spark: SparkSession, sf_dir: str) -> DataFrame:
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import types as T

    from feature_store_test_spark.operators.multimodal import video_features

    docs = load_table(spark, "documents", sf_dir).where(F.col("doc_id") < 200)

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from feature_store_test_spark.operators.codecs import encode_ifdv

        for pdf in batches:
            blobs = []
            for doc_id in pdf["doc_id"]:
                did = int(doc_id)
                n, w, h = 3 + did % 5, 5 + did % 4, 4 + did % 3
                frames = np.stack(
                    [
                        np.full((h, w, 3), (did * 7 + f * 31) % 256, dtype=np.uint8)
                        for f in range(n)
                    ]
                )
                blobs.append(encode_ifdv(frames, fps=12, gop=3))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "blob": blobs})

    clips = docs.select("doc_id").mapInPandas(
        synth,
        T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("blob", T.BinaryType()),
            ]
        ),
    )
    feats = video_features(clips)
    return feats.select(
        "doc_id",
        "container",
        "width",
        "height",
        "n_frames",
        "fps",
        F.round("duration_s", 6).alias("duration_s"),
        F.round("mean_r", 6).alias("mean_r"),
        F.round("mean_g", 6).alias("mean_g"),
        F.round("mean_b", 6).alias("mean_b"),
    )


# ---------------------------------------------------------------------------
# Q158 — perceptual image near-dup (LAION-style frame/image dedup; r9
# verdict item 3): each doc synthesizes a small RGB image whose pattern is
# an md5-coefficient bilinear form of its GROUP (doc_id div 5) plus a
# per-doc single-pixel perturbation, round-trips it through REAL PNG
# bytes (mixed-filter encode -> full decode), then runs the perceptual
# near-dup operator: integer 8x8 average-hash on decoded luma ->
# exact-collapse on the hash tuple -> the SAME banded-LSH candidate join
# as q21 over DISTINCT hashes -> exact Hamming verify -> group expansion.
# The oracle replays hash, banding, candidates and verification in
# closed form from the same pixel formula (PNG is lossless, so decoded
# pixels == the formula). Zero all-pairs: candidates come only from
# (band, value) equi-join buckets. See operators/perceptual.py for the
# 100 TB argument (birthday term of 16-bit bands + the grid/bands
# parameters that widen the bucket space).
# ---------------------------------------------------------------------------
_AHASH_LUM = "299*(v % 256) + 587*((v+37) % 256) + 114*((v+74) % 256)"

@register(
    "q158_perceptual_near_dups",
    oracle=f"""
    WITH coef AS (
      SELECT doc_id, grp, 16 + 8 * (grp % 2) AS wh,
             (strpos('0123456789abcdef', substr(md5(CAST(grp AS VARCHAR)), 1, 1)) - 1) * 16
           + (strpos('0123456789abcdef', substr(md5(CAST(grp AS VARCHAR)), 2, 1)) - 1) AS ay,
             (strpos('0123456789abcdef', substr(md5(CAST(grp AS VARCHAR)), 3, 1)) - 1) * 16
           + (strpos('0123456789abcdef', substr(md5(CAST(grp AS VARCHAR)), 4, 1)) - 1) AS ax,
             (strpos('0123456789abcdef', substr(md5(CAST(grp AS VARCHAR)), 5, 1)) - 1) * 16
           + (strpos('0123456789abcdef', substr(md5(CAST(grp AS VARCHAR)), 6, 1)) - 1) AS am
      FROM (SELECT doc_id, doc_id // 5 AS grp FROM documents)
    ),
    lum0 AS (
      SELECT doc_id, wh, (y.y * 8) // wh AS by, (x.x * 8) // wh AS bx,
             y.y * (1 + ay) + x.x * (1 + ax) + y.y * x.x * (1 + am)
             + CASE WHEN y.y = ay % wh AND x.x = ax % wh
                    THEN (doc_id % 5) * 40 ELSE 0 END AS v
      FROM coef,
           unnest(generate_series(0, wh - 1)) AS y(y),
           unnest(generate_series(0, wh - 1)) AS x(x)
    ),
    blocks AS (
      SELECT doc_id, by, bx,
             SUM({_AHASH_LUM}) AS bsum, COUNT(*) AS bnpx
      FROM lum0 GROUP BY 1, 2, 3
    ),
    tot AS (
      SELECT doc_id, SUM(bsum) AS tsum, SUM(bnpx) AS npx
      FROM blocks GROUP BY 1
    ),
    bits AS (
      SELECT b.doc_id, (by * 8 + bx) % 4 AS band, (by * 8 + bx) // 4 AS pos,
             CASE WHEN b.bsum * t.npx > t.tsum * b.bnpx THEN 1 ELSE 0 END AS bit
      FROM blocks b JOIN tot t USING (doc_id)
    ),
    sig AS (
      SELECT doc_id, band, SUM(bit * CAST(POW(2, pos) AS BIGINT)) AS mh
      FROM bits GROUP BY 1, 2
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM sig a JOIN sig b
        ON a.band = b.band AND a.mh = b.mh AND a.doc_id < b.doc_id
    ),
    ham AS (
      SELECT c.id_a, c.id_b, SUM(bit_count(xor(sa.mh, sb.mh))) AS h
      FROM cand c
      JOIN sig sa ON sa.doc_id = c.id_a
      JOIN sig sb ON sb.doc_id = c.id_b AND sb.band = sa.band
      GROUP BY 1, 2
    )
    SELECT id_a, id_b, CAST(h AS INT) AS hamming FROM ham WHERE h <= 6
    """,
    doc="perceptual (average-hash) image near-dups: real PNG round-trip -> banded LSH -> Hamming verify",
    tags=("multimodal", "dedup", "lsh", "codec", "udf"),
)
def q158_perceptual_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import types as T

    from feature_store_test_spark.operators.perceptual import perceptual_near_dups

    # SPREAD loader (the q122/q124 REAL-codec discipline): the synth ->
    # decode -> hash chain is CPU-bound Python over a single-row-group
    # fixture file that would otherwise scan (and therefore encode AND
    # decode) on one core; the round-robin exchange recovers parallelism
    # locally and disables itself on any real multi-file table.
    # Interleaved A/B at sf0.1 (min-of-6): spread 0.236 vs plain 0.273
    # (med 0.352 vs 0.359 — the tiny fixture images keep the delta small
    # here; the discipline matters at the 10x/100x image counts).
    docs = load_table(spark, "documents", sf_dir)

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        import numpy as np

        from feature_store_test_spark.operators.codecs import encode_png

        alphabet = "0123456789abcdef"
        for pdf in batches:
            blobs = []
            for doc_id in pdf["doc_id"]:
                did = int(doc_id)
                grp = did // 5
                hx = hashlib.md5(str(grp).encode()).hexdigest()
                ay = alphabet.index(hx[0]) * 16 + alphabet.index(hx[1])
                ax = alphabet.index(hx[2]) * 16 + alphabet.index(hx[3])
                am = alphabet.index(hx[4]) * 16 + alphabet.index(hx[5])
                wh = 16 + 8 * (grp % 2)
                y, x = np.ogrid[0:wh, 0:wh]
                base = y * (1 + ay) + x * (1 + ax) + y * x * (1 + am)
                px = base[:, :, None] + np.arange(3)[None, None, :] * 37
                px = px.copy()
                px[ay % wh, ax % wh, :] += (did % 5) * 40
                blobs.append(
                    encode_png((px % 256).astype(np.uint8), filter_type="mixed")
                )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "blob": blobs})

    imgs = docs.select("doc_id").mapInPandas(
        synth,
        T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("blob", T.BinaryType()),
            ]
        ),
    )
    return perceptual_near_dups(
        imgs, blob_col="blob", id_col="doc_id", grid=8, bands=4, max_hamming=6
    )
