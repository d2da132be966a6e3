"""Multimodal pipeline queries: binary asset synthesis, decode features,
frame sampling, resize — each with a full DuckDB value oracle.

The synthesis arithmetic (``unhex(repeat(sha256(text), 1 + doc_id % 4))``)
is chosen so DuckDB reproduces the payload bytes exactly; the oracles
then verify the mapInPandas stages value-for-value, not just row counts
(operators/multimodal.py documents the determinism contract).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pg_logical_replication_spark.operators import multimodal as MM
from pg_logical_replication_spark.plans.registry import register, t

# DuckDB twin of multimodal.synthesize_assets (payload + kind only)
_ASSETS = (
    "SELECT doc_id AS asset_id,"
    " ['image','audio','video'][(doc_id % 3)::int + 1] AS kind,"
    " unhex(repeat(sha256(text), (1 + doc_id % 4)::int)) AS payload,"
    " repeat(sha256(text), (1 + doc_id % 4)::int) AS payload_hex"
    " FROM documents"
)


@register(
    "q_mm_payload_stats",
    f"""
    WITH assets AS ({_ASSETS})
    SELECT kind, COUNT(*) AS n_assets,
           CAST(SUM(octet_length(payload)) AS bigint) AS total_bytes,
           CAST(MIN(octet_length(payload)) AS int) AS min_bytes,
           CAST(MAX(octet_length(payload)) AS int) AS max_bytes
    FROM assets GROUP BY kind
    """,
    "multimodal asset inventory: per-kind payload volume (JVM-side "
    "synthesis, metadata-only agg — payloads never hit Python)",
)
def q_mm_payload_stats(spark, sf_dir):
    assets = MM.synthesize_assets(t(spark, sf_dir, "documents"))
    return assets.groupBy("kind").agg(
        F.count("*").alias("n_assets"),
        F.sum(F.length("payload")).alias("total_bytes"),
        F.min(F.length("payload")).cast("int").alias("min_bytes"),
        F.max(F.length("payload")).cast("int").alias("max_bytes"),
    )


@register(
    "q_mm_decode_features",
    f"""
    WITH assets AS ({_ASSETS})
    SELECT asset_id, kind,
           CAST(octet_length(payload) AS int) AS n_bytes,
           CAST(ceil(octet_length(payload) / 32.0) AS int) AS n_frames,
           list_avg(list_transform(string_split(payload_hex, ''),
                                   x -> ord(x))) AS hexmean
    FROM assets
    """,
    "Arrow-batched decode: per-asset byte/frame counts + a pixel-stat "
    "stand-in (hexmean), verified value-for-value against SQL",
)
def q_mm_decode_features(spark, sf_dir):
    assets = MM.synthesize_assets(t(spark, sf_dir, "documents"))
    return MM.decode_features(assets)


@register(
    "q_mm_frame_sample",
    f"""
    WITH assets AS ({_ASSETS}),
    v AS (SELECT asset_id, CAST(octet_length(payload) / 32 AS int) AS n_frames
          FROM assets WHERE kind = 'video')
    SELECT asset_id,
           CAST(unnest(generate_series(0, n_frames - 1, 2)) AS int) AS frame_idx,
           32 AS frame_bytes
    FROM v
    """,
    "video frame sampling: every-2nd 32-byte frame, one-to-many "
    "mapInPandas fan-out",
)
def q_mm_frame_sample(spark, sf_dir):
    assets = MM.synthesize_assets(t(spark, sf_dir, "documents"))
    return MM.sample_frames(assets, every_k=2).withColumn(
        "frame_bytes", F.col("frame_bytes").cast("int")
    )


@register(
    "q_mm_resize",
    f"""
    WITH assets AS ({_ASSETS})
    SELECT asset_id, 576 AS n_bytes, 24 AS width, 24 AS height
    FROM assets WHERE kind = 'image'
    """,
    "image resize plumbing: payload rewritten to 24x24 bytes with meta "
    "updated (codec step stubbed, pipeline shape real)",
)
def q_mm_resize(spark, sf_dir):
    assets = MM.synthesize_assets(t(spark, sf_dir, "documents"))
    resized = MM.resize_images(assets, width=24, height=24)
    return resized.select(
        "asset_id",
        F.length("payload").cast("int").alias("n_bytes"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
    )


@register(
    "q_mm_dedup_exact",
    f"""
    WITH assets AS ({_ASSETS})
    SELECT md5(payload_hex) AS payload_hash,
           MIN(asset_id) AS representative_id,
           COUNT(*) AS n_dups,
           CAST(MIN(octet_length(payload)) AS INT) AS n_bytes
    FROM assets GROUP BY md5(payload_hex)
    ORDER BY n_dups DESC, payload_hash LIMIT 50
    """,
    "multimodal exact dedup: duplicate assets by content digest — the "
    "image/audio analogue of text exact-dedup; only 16-byte hashes "
    "shuffle, payload bytes stay in the scan",
)
def q_mm_dedup_exact(spark, sf_dir):
    """Content-hash dedup over binary payloads. At 100 TB the md5 is
    computed in the scan projection (JVM, per partition) and the groupBy
    shuffles digests + ids only — payload bytes never move."""
    assets = MM.synthesize_assets(t(spark, sf_dir, "documents"))
    return (
        assets.groupBy(
            # digest the canonical lowercase-hex form: DuckDB's md5()
            # rejects BLOB, and hex is engine-portable anyway
            F.md5(F.lower(F.hex("payload"))).alias("payload_hash")
        )
        .agg(
            F.min("asset_id").alias("representative_id"),
            F.count("*").alias("n_dups"),
            F.min(F.length("payload")).cast("int").alias("n_bytes"),
        )
        .orderBy(F.col("n_dups").desc(), "payload_hash")
        .limit(50)
    )


@register(
    "q_mm_png_decode",
    """
    SELECT doc_id AS asset_id,
           CAST(8 + doc_id % 16 AS INT) AS width,
           CAST(8 + doc_id % 8 AS INT) AS height,
           CAST(1 AS INT) AS channels,
           CAST((8 + doc_id % 16) * (8 + doc_id % 8) AS INT) AS n_pixels,
           ROUND(list_avg(list_transform(
               generate_series(0, (8 + doc_id % 16) * (8 + doc_id % 8) - 1),
               i -> (doc_id * 31 + i * 7) % 256)), 6) AS mean_pixel
    FROM documents
    """,
    "REAL PNG codec round-trip: greyscale PNGs encoded executor-side "
    "(zlib+struct, all 5 scanline filters), decoded back by the "
    "spec-complete stdlib decoder; dims + mean pixel must match the "
    "closed-form oracle that never parses a PNG",
)
def q_mm_png_decode(spark, sf_dir):
    """The codec graduation query (review r2 #8): pixel[i] =
    (doc_id*31 + i*7) mod 256 is arithmetic, so DuckDB predicts every
    decoded statistic while Spark actually runs encode_png → decode_png
    on executors — any filter/CRC/inflate bug breaks the hash match."""
    from pg_logical_replication_spark.plans.registry import spread_if_narrow

    # single-row-group testdata caps the scan at ONE task; the codec
    # work is CPU-bound Python, so parallelism IS the runtime here
    docs = spread_if_narrow(t(spark, sf_dir, "documents"), spark)
    assets = MM.synthesize_png_assets(docs)
    return MM.decode_png_features(assets)


@register(
    "q_mm_jpeg_decode",
    """
    WITH spec AS (
      SELECT doc_id,
             CAST(1 + doc_id % 4 AS INT) AS bw,
             CAST(1 + doc_id % 3 AS INT) AS bh
      FROM documents)
    SELECT doc_id AS asset_id,
           CAST(8 * bw AS INT) AS width,
           CAST(8 * bh AS INT) AS height,
           CAST(1 AS INT) AS channels,
           CAST(64 * bw * bh AS INT) AS n_pixels,
           ROUND(list_avg(list_transform(
               generate_series(0, bw * bh - 1),
               b -> (doc_id * 31 + b * 7) % 256)), 6) AS mean_pixel
    FROM spec
    """,
    "REAL JPEG codec round-trip (functions/jpeg.py, T.81 baseline): "
    "block-constant greyscale JPEGs at quality=100 (all-ones quant "
    "tables) are LOSSLESS by construction, so dims + mean pixel match "
    "a closed-form oracle that never parses a JPEG — while Spark "
    "actually runs marker parse, Huffman decode, dequant and IDCT "
    "executor-side",
)
def q_mm_jpeg_decode(spark, sf_dir):
    """The jpeg graduation query (review r3 #3): every 8x8 block is
    constant, so only DC coefficients survive the FDCT and quality=100
    quantizes by 1 — the decoded image is bit-exact and the per-asset
    mean is the mean of the block values, closed-form for DuckDB. Any
    Huffman/DPCM/zigzag/IDCT bug breaks the hash match."""
    from pg_logical_replication_spark.plans.registry import spread_if_narrow

    # single-row-group testdata caps the scan at ONE task; the codec
    # work is CPU-bound Python, so parallelism IS the runtime here
    docs = spread_if_narrow(t(spark, sf_dir, "documents"), spark)
    assets = MM.synthesize_jpeg_assets(docs)
    return MM.decode_jpeg_features(assets)


@register(
    "q_mm_wav_decode",
    """
    WITH spec AS (
      SELECT doc_id,
             CAST(64 + doc_id % 256 AS INT) AS n,
             CAST(CASE WHEN doc_id % 2 = 0 THEN 16000 ELSE 8000 END AS INT)
               AS rate
      FROM documents)
    SELECT doc_id AS asset_id,
           rate AS sample_rate,
           n AS n_samples,
           CAST((n * 1000) // rate AS INT) AS duration_ms,
           CAST(list_sum(list_transform(
               generate_series(0, n - 1),
               i -> abs((doc_id * 37 + i * 101) % 2001 - 1000))) AS BIGINT)
             AS sum_abs,
           CAST(list_max(list_transform(
               generate_series(0, n - 1),
               i -> abs((doc_id * 37 + i * 101) % 2001 - 1000))) AS INT)
             AS peak
    FROM spec
    """,
    "REAL WAV codec round-trip: 16-bit mono PCM RIFF containers encoded "
    "executor-side (stdlib wave), decoded back to integer amplitude "
    "stats that must match the closed-form oracle — the audio twin of "
    "q_mm_png_decode",
)
def q_mm_wav_decode(spark, sf_dir):
    """sample[i] = ((doc_id*37 + i*101) mod 2001) - 1000 is integer
    arithmetic end-to-end (no float DSP in the contract), so DuckDB
    predicts the decoded rate/frames/duration/sum|x|/peak exactly while
    Spark actually parses RIFF/PCM bytes on executors."""
    from pg_logical_replication_spark.plans.registry import spread_if_narrow

    # single-row-group testdata caps the scan at ONE task; the codec
    # work is CPU-bound Python, so parallelism IS the runtime here
    docs = spread_if_narrow(t(spark, sf_dir, "documents"), spark)
    assets = MM.synthesize_wav_assets(docs)
    return MM.decode_wav_features(assets)


@register(
    "q_mm_flac_decode",
    """
    WITH spec AS (
      SELECT doc_id,
             CAST(64 + doc_id % 256 AS INT) AS n,
             CAST(CASE WHEN doc_id % 2 = 0 THEN 16000 ELSE 8000 END AS INT)
               AS rate
      FROM documents)
    SELECT doc_id AS asset_id,
           rate AS sample_rate,
           n AS n_samples,
           CAST((n * 1000) // rate AS INT) AS duration_ms,
           CAST(list_sum(list_transform(
               generate_series(0, n - 1),
               i -> abs((doc_id * 53 + i * 71) % 2001 - 1000))) AS BIGINT)
             AS sum_abs,
           CAST(list_max(list_transform(
               generate_series(0, n - 1),
               i -> abs((doc_id * 53 + i * 71) % 2001 - 1000))) AS INT)
             AS peak
    FROM spec
    """,
    "REAL FLAC codec round-trip (functions/flac.py, RFC 9639): a "
    "genuinely COMPRESSING lossless encode (FIXED predictors + Rice "
    "residuals) decoded back through frame sync, CRC-8/16, Rice and "
    "predictor reconstruction — integer stats match the closed-form "
    "oracle exactly because FLAC is lossless",
)
def q_mm_flac_decode(spark, sf_dir):
    """sample[i] = ((doc_id*53 + i*71) mod 2001) - 1000; losslessness
    turns the full entropy-coded audio pipeline into an exact oracle —
    the compressed-audio twin of q_mm_wav_decode."""
    from pg_logical_replication_spark.plans.registry import spread_if_narrow

    # single-row-group testdata caps the scan at ONE task; the codec
    # work is CPU-bound Python, so parallelism IS the runtime here
    docs = spread_if_narrow(t(spark, sf_dir, "documents"), spark)
    assets = MM.synthesize_flac_assets(docs)
    return MM.decode_flac_features(assets)


@register(
    "q_mm_archive_members",
    """
    WITH spec AS (
      SELECT doc_id, CAST(1 + doc_id % 5 AS INT) AS n FROM documents)
    SELECT doc_id AS asset_id,
           n AS n_members,
           CASE WHEN doc_id % 2 = 0 THEN 'zip' ELSE 'tar' END
             AS archive_format,
           CAST(list_sum(list_transform(generate_series(0, n - 1),
               j -> 5 + (doc_id * 3 + j * 11) % 40)) AS BIGINT)
             AS total_bytes,
           CAST(list_max(list_transform(generate_series(0, n - 1),
               j -> 5 + (doc_id * 3 + j * 11) % 40)) AS BIGINT)
             AS max_member_bytes
    FROM spec
    """,
    "zip / tar.gz member enumeration (stdlib, magic-byte dispatch) — "
    "the first pass over dataset tarballs: member names + UNCOMPRESSED "
    "sizes without extracting content, counts and byte totals matching "
    "the closed-form oracle for both container families",
)
def q_mm_archive_members(spark, sf_dir):
    from pg_logical_replication_spark.plans.registry import spread_if_narrow

    docs = spread_if_narrow(t(spark, sf_dir, "documents"), spark)
    members = MM.archive_members(MM.synthesize_archive_assets(docs))
    return members.groupBy("asset_id").agg(
        F.count("*").cast("int").alias("n_members"),
        F.first("archive_format").alias("archive_format"),
        F.sum("n_bytes").alias("total_bytes"),
        F.max("n_bytes").alias("max_member_bytes"),
    )


@register(
    "q_mm_warc_records",
    """
    WITH spec AS (
      SELECT doc_id, CAST(1 + doc_id % 4 AS INT) AS n_resp FROM documents)
    SELECT doc_id AS asset_id,
           CAST(1 + n_resp AS INT) AS n_records,
           n_resp AS n_responses,
           CAST(16 + list_sum(list_transform(
               generate_series(0, n_resp - 1),
               j -> 10 + (doc_id * 7 + j * 13) % 50)) AS BIGINT)
             AS total_block_bytes,
           CAST(list_max(list_transform(
               generate_series(0, n_resp - 1),
               j -> 10 + (doc_id * 7 + j * 13) % 50)) AS INT)
             AS max_response_bytes
    FROM spec
    """,
    "REAL WARC (ISO 28500) record split — the Common Crawl ingestion "
    "fan-out: version line, header parse, Content-Length framing, and "
    "the record-per-gzip-member .warc.gz layout (odd doc_ids), with "
    "record counts and block byte totals matching the closed-form "
    "oracle exactly",
)
def q_mm_warc_records(spark, sf_dir):
    """Both container forms (plain + gzip members) parse to identical
    record structure; any framing/length/gzip bug breaks the hash."""
    from pg_logical_replication_spark.plans.registry import spread_if_narrow

    docs = spread_if_narrow(t(spark, sf_dir, "documents"), spark)
    recs = MM.warc_records(MM.synthesize_warc_assets(docs))
    return recs.groupBy("asset_id").agg(
        F.count("*").cast("int").alias("n_records"),
        F.sum(F.when(F.col("warc_type") == "response", 1).otherwise(0))
        .cast("int")
        .alias("n_responses"),
        F.sum("block_bytes").alias("total_block_bytes"),
        F.max(
            F.when(F.col("warc_type") == "response", F.col("block_bytes"))
        ).alias("max_response_bytes"),
    )


@register(
    "q_mm_tiff_decode",
    """
    WITH spec AS (
      SELECT doc_id,
             CAST(8 + doc_id % 20 AS INT) AS w,
             CAST(8 + doc_id % 10 AS INT) AS h
      FROM documents)
    SELECT doc_id AS asset_id,
           w AS width, h AS height,
           CAST(1 AS INT) AS channels,
           CAST(w * h AS INT) AS n_pixels,
           ROUND(list_avg(list_transform(generate_series(0, w*h - 1),
               i -> (doc_id * 29 + i * 13) % 256)), 6) AS mean_pixel
    FROM spec
    """,
    "REAL TIFF codec round-trip (functions/tiff.py, TIFF 6.0 baseline): "
    "PackBits-compressed grayscale strips through the IFD walk and "
    "strip reassembly, dims + mean pixel matching the closed-form "
    "oracle exactly — the scanned-document format of OCR corpora",
)
def q_mm_tiff_decode(spark, sf_dir):
    """pixel[i] = (doc_id*29 + i*13) mod 256; any IFD/strip/RLE bug
    breaks the hash match."""
    from pg_logical_replication_spark.plans.registry import spread_if_narrow

    docs = spread_if_narrow(t(spark, sf_dir, "documents"), spark)
    assets = MM.synthesize_tiff_assets(docs)
    return MM.decode_tiff_features(assets)


@register(
    "q_mm_gif_decode",
    """
    WITH spec AS (
      SELECT doc_id,
             CAST(8 + doc_id % 24 AS INT) AS w,
             CAST(8 + doc_id % 12 AS INT) AS h
      FROM documents)
    SELECT doc_id AS asset_id,
           w AS width, h AS height,
           CAST(1 AS INT) AS channels,
           CAST(w * h AS INT) AS n_pixels,
           ROUND(list_avg(list_transform(generate_series(0, w*h - 1),
               i -> (doc_id * 31 + i * 7) % 256)), 6) AS mean_pixel
    FROM spec
    """,
    "REAL GIF codec round-trip (functions/gif.py): 8-bit indexed "
    "images through genuine variable-width LZW compression — "
    "interlaced for odd doc_ids, so both four-pass and sequential row "
    "orders run — with dims + mean pixel matching the closed-form "
    "oracle exactly (GIF is lossless)",
)
def q_mm_gif_decode(spark, sf_dir):
    """index[i] = (doc_id*31 + i*7) mod 256 over the grayscale ramp;
    any LZW/interlace/color-table bug breaks the hash match."""
    from pg_logical_replication_spark.plans.registry import spread_if_narrow

    docs = spread_if_narrow(t(spark, sf_dir, "documents"), spark)
    assets = MM.synthesize_gif_assets(docs)
    return MM.decode_gif_features(assets)


@register(
    "q_mm_webp_decode",
    """
    WITH spec AS (
      SELECT doc_id,
             CAST(4 + doc_id % 12 AS INT) AS w,
             CAST(4 + doc_id % 8 AS INT) AS h
      FROM documents)
    SELECT doc_id AS asset_id,
           w AS width, h AS height,
           CAST(w * h AS INT) AS n_pixels,
           ROUND(list_avg(list_transform(generate_series(0, w*h - 1),
               i -> (doc_id * 31 + i * 7) % 256)), 6) AS mean_r,
           ROUND(list_avg(list_transform(generate_series(0, w*h - 1),
               i -> (doc_id * 17 + i * 11) % 256)), 6) AS mean_g,
           ROUND(list_avg(list_transform(generate_series(0, w*h - 1),
               i -> (doc_id * 13 + i * 5) % 256)), 6) AS mean_b
    FROM spec
    """,
    "REAL lossless-WebP codec round-trip (functions/vp8l.py): ARGB "
    "images through a spec-valid VP8L bitstream — prefix codes decoded "
    "bit-by-bit executor-side — with dims + per-channel means matching "
    "the closed-form oracle exactly because VP8L is lossless; lossy "
    "VP8 remains the one declared image stub",
)
def q_mm_webp_decode(spark, sf_dir):
    """The webp graduation query: encode_webp_lossless →
    decode_webp_lossless on executors, Arrow-batched; any prefix-code /
    bit-order / channel-order bug breaks the hash match."""
    from pg_logical_replication_spark.plans.registry import spread_if_narrow

    docs = spread_if_narrow(t(spark, sf_dir, "documents"), spark)
    assets = MM.synthesize_webp_assets(docs)
    return MM.decode_webp_features(assets)


@register(
    "q_mm_media_probe",
    """
    SELECT doc_id AS asset_id,
           CASE doc_id % 5 WHEN 0 THEN 'mp3' WHEN 1 THEN 'webp'
                WHEN 2 THEN 'mp4' WHEN 3 THEN 'webm'
                ELSE 'h264' END AS media_format,
           CASE doc_id % 5
                WHEN 1 THEN CAST(16 + doc_id % 64 AS INT)
                WHEN 2 THEN CAST(320 + 16 * (doc_id % 8) AS INT)
                WHEN 3 THEN CAST(320 + 16 * (doc_id % 10) AS INT)
                WHEN 4 THEN CAST(16 * (2 + doc_id % 8) AS INT)
           END AS width,
           CASE doc_id % 5
                WHEN 1 THEN CAST(16 + doc_id % 48 AS INT)
                WHEN 2 THEN CAST(240 + 16 * (doc_id % 4) AS INT)
                WHEN 3 THEN CAST(180 + 8 * (doc_id % 10) AS INT)
                WHEN 4 THEN CAST(16 * (2 + doc_id % 6) AS INT)
           END AS height,
           CASE doc_id % 5
                WHEN 0 THEN CAST(((4 + doc_id % 8) * 1152 * 1000) // 44100
                                 AS INT)
                WHEN 2 THEN CAST(1000 + doc_id % 9000 AS INT)
                WHEN 3 THEN CAST(2000 + doc_id % 8000 AS INT)
           END AS duration_ms,
           CASE doc_id % 5 WHEN 0 THEN 44100 END AS sample_rate,
           CASE doc_id % 5 WHEN 0 THEN CAST(4 + doc_id % 8 AS INT)
           END AS n_frames
    FROM documents
    """,
    "REAL container-metadata probes for ALL the stubbed-codec formats "
    "(functions/mediainfo.py): mp3 frame-header walk, RIFF/WEBP chunk "
    "parse, ISO BMFF box walk, EBML/Matroska walk (vp9-in-webm), and "
    "an Exp-Golomb H.264 SPS parse — dims/duration/rate extracted from "
    "spec-valid container bytes without decoding a single sample, the "
    "filter pass a training pipeline runs before paying for decode",
)
def q_mm_media_probe(spark, sf_dir):
    """Synthesized spec-valid mp3/webp/mp4/webm/h264-SPS containers
    (filler sample data — the honest stub boundary) probed
    executor-side; every extracted field matches the closed-form
    oracle."""
    from pg_logical_replication_spark.plans.registry import spread_if_narrow

    # single-row-group testdata caps the scan at ONE task; the codec
    # work is CPU-bound Python, so parallelism IS the runtime here
    docs = spread_if_narrow(t(spark, sf_dir, "documents"), spark)
    assets = MM.synthesize_media_assets(docs)
    return MM.probe_media_features(assets)


@register(
    "q_mm_wav_loudest_frame",
    """
    WITH spec AS (SELECT doc_id, CAST(64 + doc_id % 256 AS INT) AS n
                  FROM documents),
    fr AS (SELECT doc_id, n,
                  list_transform(
                    generate_series(0, (n + 31) // 32 - 1),
                    f -> list_sum(list_transform(
                           generate_series(f * 32, least(n, (f + 1) * 32) - 1),
                           i -> CAST((doc_id * 37 + i * 101) % 2001 - 1000
                                AS BIGINT)
                              * CAST((doc_id * 37 + i * 101) % 2001 - 1000
                                AS BIGINT)))) AS sums
           FROM spec)
    SELECT doc_id AS asset_id,
           CAST(len(sums) AS INT) AS n_frames,
           CAST(list_position(sums, list_max(sums)) - 1 AS INT)
             AS loudest_frame,
           CAST(list_max(sums) AS BIGINT) AS loudest_energy
    FROM fr
    """,
    "frame-level audio analysis over REAL decoded PCM: 32-sample energy "
    "windows, loudest frame per asset (first index on ties) — the audio "
    "twin of video frame sampling, integer-exact vs the closed-form "
    "oracle",
)
def q_mm_wav_loudest_frame(spark, sf_dir):
    assets = MM.synthesize_wav_assets(t(spark, sf_dir, "documents"))
    return MM.wav_loudest_frame(assets)


@register(
    "q_mm_adpcm_decode",
    """
    WITH spec AS (
      SELECT doc_id,
             CAST(64 + doc_id % 200 AS INT) AS n,
             CAST(CASE WHEN doc_id % 2 = 0 THEN 16000 ELSE 8000 END AS INT)
               AS rate
      FROM documents)
    SELECT doc_id AS asset_id,
           rate AS sample_rate,
           n AS n_samples,
           CAST((n + 128) // 129 AS INT) AS n_blocks,
           CAST((doc_id * 41) % 2001 - 1000 AS INT) AS first_sample,
           CAST(list_sum(list_transform(
               generate_series(0, (n + 128) // 129 - 1),
               b -> (doc_id * 41 + b * 129 * 97) % 2001 - 1000))
             AS BIGINT) AS sum_block_preds,
           TRUE AS err_ok
    FROM spec
    """,
    "REAL IMA-ADPCM codec round-trip (WAVE fmt 0x0011, the 4-bit "
    "telephony/game-audio format): encode executor-side, decode the "
    "RIFF walk + block headers + adaptive nibble expansion back; "
    "block-header predictors and all counts are EXACT vs the "
    "closed-form oracle, the lossy samples carry a bounded-error "
    "contract (max<=4095, mean<=512) — the lossy-audio twin of "
    "q_mm_jpeg_decode",
)
def q_mm_adpcm_decode(spark, sf_dir):
    """IMA ADPCM stores each block's first sample verbatim in the
    4-byte block header, so rate / sample count / block count / every
    block-anchor sample are integer-exact cross-engine while Spark
    actually runs the adaptive step-table codec on executors; any
    step/index/nibble bug breaks err_ok or the anchors."""
    from pg_logical_replication_spark.plans.registry import spread_if_narrow

    docs = spread_if_narrow(t(spark, sf_dir, "documents"), spark)
    assets = MM.synthesize_adpcm_assets(docs)
    return MM.decode_adpcm_features(assets)


@register(
    "q_mm_tar_shards",
    """
    SELECT doc_id // 50 AS shard_id,
           CAST(COUNT(*) AS INT) AS n_members,
           CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_payload_bytes,
           CAST(((SUM(512 + (octet_length(encode(text)) + 511) // 512 * 512)
                  + 1024 + 10239) // 10240) * 10240 AS BIGINT) AS tar_bytes,
           TRUE AS members_ok
    FROM documents GROUP BY 1
    """,
    "WebDataset-style tar shard EXPORT (the write path the archive "
    "readers mirror): pack the corpus into deterministic POSIX tar "
    "training shards (50 docs/shard, zero-padded member keys, mtime=0), "
    "each shard re-enumerated by tarfile before emission (write "
    "verified by read); the oracle pins the EXACT tar byte size "
    "structurally (512-header + 512-padded bodies + end blocks, "
    "10240 blocking) — any framing bug changes the length",
)
def q_mm_tar_shards(spark, sf_dir):
    """One shuffle co-locates each shard's members (doc_id DIV 50 —
    webdataset's sequential shard convention); tar assembly is
    Arrow-batched Python per shard; the query emits the structural
    stats, the payload column carries the actual shard bytes."""
    shards = MM.pack_tar_shards(t(spark, sf_dir, "documents"))
    return shards.drop("payload")


@register(
    "q_mm_tar_shards_roundtrip",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_distinct,
           CAST(SUM(octet_length(encode(text))) AS BIGINT) AS sum_bytes,
           CAST(SUM(('0x' || substr(md5(text), 1, 8))::UBIGINT) AS BIGINT)
             AS sum_text_hash
    FROM documents
    """,
    "shard export->import composite (the format-agreement pattern for "
    "the corpus write path): pack every document into tar shards, "
    "EXTRACT the members back executor-side (tarfile), and the "
    "recovered corpus must aggregate identically to the source table "
    "(count, distinct ids, byte total, md5 content checksum) — any "
    "loss, duplication, reorder-corruption or encoding bug in the "
    "shard writer breaks the hash match",
)
def q_mm_tar_shards_roundtrip(spark, sf_dir):
    """pack (1 shuffle) -> extract (narrow mapInPandas over shard
    payloads) -> aggregate; the md5 checksum rides per-doc so a single
    flipped byte anywhere in any shard fails the oracle."""
    from typing import Iterator

    import pandas as pd  # noqa: F401

    shards = MM.pack_tar_shards(t(spark, sf_dir, "documents"))

    def extract(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import io
        import tarfile

        import pandas as pd

        for pdf in it:
            ids, texts = [], []
            for blob in pdf["payload"]:
                with tarfile.open(fileobj=io.BytesIO(bytes(blob))) as tf:
                    for m in tf.getmembers():
                        ids.append(int(m.name.split(".")[0]))
                        texts.append(
                            tf.extractfile(m).read().decode("utf-8")
                        )
            yield pd.DataFrame({"doc_id": ids, "text": texts})

    docs = shards.select("payload").mapInPandas(
        extract, schema="doc_id bigint, text string"
    )
    return docs.agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("doc_id").alias("n_distinct"),
        F.sum(F.octet_length("text")).alias("sum_bytes"),
        F.sum(
            F.conv(F.substring(F.md5("text"), 1, 8), 16, 10).cast("long")
        ).alias("sum_text_hash"),
    )


@register(
    "q_mm_bmp_decode",
    """
    SELECT doc_id AS asset_id,
           CAST(8 + doc_id % 16 AS INT) AS width,
           CAST(8 + doc_id % 8 AS INT) AS height,
           CAST(CASE WHEN doc_id % 3 = 1 THEN 24 ELSE 8 END AS INT) AS bits,
           doc_id % 3 = 2 AS rle,
           CAST((8 + doc_id % 16) * (8 + doc_id % 8) AS INT) AS n_pixels,
           ROUND(list_avg(list_transform(
               generate_series(0, (8 + doc_id % 16) * (8 + doc_id % 8) - 1),
               i -> (doc_id * 29 + i * 11) % 256)), 6) AS mean_pixel
    FROM documents
    """,
    "REAL BMP codec round-trip (the legacy DIB raster scanned-document "
    "corpora carry): 8-bit paletted, 24-bit BGR and RLE8 profiles "
    "cycled per asset, encoded and decoded executor-side with the "
    "stdlib codec; dims + profile + mean pixel hash-matched against "
    "the closed-form oracle — the ninth real codec",
)
def q_mm_bmp_decode(spark, sf_dir):
    """pixel[i] = (doc_id*29 + i*11) mod 256 — arithmetic, so DuckDB
    predicts every decoded statistic while Spark runs the actual
    header/padding/palette/RLE8 walk on executors."""
    from pg_logical_replication_spark.plans.registry import spread_if_narrow

    docs = spread_if_narrow(t(spark, sf_dir, "documents"), spark)
    assets = MM.synthesize_bmp_assets(docs)
    return MM.decode_bmp_features(assets)


@register(
    "q_mm_wav_vad_segments",
    """
    WITH spec AS (SELECT doc_id, CAST(64 + doc_id % 256 AS INT) AS n
                  FROM documents),
    fr AS (SELECT doc_id, n,
                  list_transform(
                    generate_series(0, (n + 31) // 32 - 1),
                    f -> list_sum(list_transform(
                           generate_series(f * 32, least(n, (f + 1) * 32) - 1),
                           i -> CAST((doc_id * 37 + i * 101) % 2001 - 1000
                                AS BIGINT)
                              * CAST((doc_id * 37 + i * 101) % 2001 - 1000
                                AS BIGINT)))) AS sums
           FROM spec),
    en AS (SELECT doc_id, CAST(u.i - 1 AS INT) AS frame_idx,
                  sums[u.i] AS energy
           FROM fr, UNNEST(generate_series(1, len(sums))) AS u(i)),
    mx AS (SELECT doc_id, MAX(energy) AS mx,
                  CAST(COUNT(*) AS INT) AS n_frames
           FROM en GROUP BY 1),
    v AS (SELECT en.doc_id, frame_idx
          FROM en JOIN mx USING (doc_id)
          WHERE energy * 4 >= mx * 1),
    g AS (SELECT doc_id, frame_idx,
                 frame_idx - ROW_NUMBER() OVER (PARTITION BY doc_id
                                                ORDER BY frame_idx) AS grp
          FROM v),
    segs AS (SELECT doc_id, grp, CAST(COUNT(*) AS INT) AS seg_len,
                    MIN(frame_idx) AS seg_start
             FROM g GROUP BY 1, 2)
    SELECT mx.doc_id AS asset_id, mx.n_frames,
           CAST(COALESCE(SUM(seg_len), 0) AS INT) AS n_voiced,
           CAST(COUNT(segs.grp) AS INT) AS n_segments,
           CAST(COALESCE(MAX(seg_len), 0) AS INT) AS longest_segment,
           CAST(MIN(seg_start) AS INT) AS first_voiced_frame
    FROM mx LEFT JOIN segs ON mx.doc_id = segs.doc_id
    GROUP BY 1, 2
    """,
    "energy-threshold voice-activity segmentation over REAL decoded "
    "PCM — the silence-trim / utterance-split pass before ASR/TTS "
    "training: voiced = frame energy >= 1/4 of the asset's max "
    "(integer cross-multiplied), maximal contiguous segments via "
    "gaps-and-islands; decode is the only Python, thresholding and "
    "islands are whole-stage-codegen SQL keyed on asset_id",
)
def q_mm_wav_vad_segments(spark, sf_dir):
    """See operators/multimodal.py:wav_vad_segments."""
    from pg_logical_replication_spark.plans.registry import spread_if_narrow

    docs = spread_if_narrow(t(spark, sf_dir, "documents"), spark)
    return MM.wav_vad_segments(MM.synthesize_wav_assets(docs))


@register(
    "q_mm_g711_decode",
    """
    WITH spec AS (SELECT doc_id, CAST(64 + doc_id % 192 AS INT) AS n,
                         doc_id % 2 = 0 AS is_ulaw
                  FROM documents),
    s AS (SELECT doc_id, n, is_ulaw,
                 CAST((doc_id * 43 + u.i * 89) % 2001 - 1000 AS BIGINT) AS sv
          FROM spec, UNNEST(generate_series(0, n - 1)) AS u(i)),
    comp AS (SELECT doc_id, n, is_ulaw, sv,
                    CASE WHEN is_ulaw
                         THEN CASE WHEN sv >= 0 THEN sv // 4
                              ELSE (3 - sv) // 4 END + 33
                         ELSE CASE WHEN sv >= 0 THEN sv // 8
                              ELSE (-sv - 1) // 8 END
                    END AS pcm
             FROM s),
    seg AS (SELECT *,
                   CASE WHEN is_ulaw
                        THEN GREATEST(length(bin(pcm)) - 6, 0)
                        ELSE GREATEST(length(bin(pcm)) - 5, 0)
                   END AS sg
            FROM comp),
    dec AS (SELECT doc_id, n, is_ulaw,
                   CASE WHEN is_ulaw THEN
                     CASE WHEN sv >= 0 THEN 1 ELSE -1 END
                     * ((((pcm >> (sg + 1)) & 15) * 8 + 132) * (1 << sg)
                        - 132)
                   ELSE
                     CASE WHEN sv >= 0 THEN 1 ELSE -1 END
                     * (CASE WHEN sg = 0
                             THEN ((pcm >> 1) & 15) * 16 + 8
                             ELSE (((pcm >> sg) & 15) * 16 + 264)
                                  * (1 << (sg - 1)) END)
                   END AS y
            FROM seg)
    SELECT doc_id AS asset_id,
           CASE WHEN is_ulaw THEN 'ulaw' ELSE 'alaw' END AS law,
           CAST(8000 AS INT) AS sample_rate,
           CAST(n AS INT) AS n_samples,
           CAST(SUM(y) AS BIGINT) AS sum_decoded,
           CAST(MAX(ABS(y)) AS BIGINT) AS max_abs_decoded
    FROM dec GROUP BY 1, 2, 3, 4
    """,
    "REAL G.711 telephone-audio codec (functions/g711.py, the TENTH "
    "real codec): mu-law and A-law companding per the Sun/CCITT "
    "reference (pinned byte-equal to audioop over the full 16-bit "
    "range), hand-rolled RIFF container with format tags 7/6. G.711 "
    "is memoryless, so the oracle replays the LOSSY decode(encode(s)) "
    "round-trip in closed-form integer SQL — segment via bin-length, "
    "mantissa via shifts, both laws in one query",
)
def q_mm_g711_decode(spark, sf_dir):
    """See operators/multimodal.py:synthesize_g711_assets /
    g711_decode_features; codec cited to ITU-T G.711 (Sun g711.c)."""
    from pg_logical_replication_spark.plans.registry import spread_if_narrow

    docs = spread_if_narrow(t(spark, sf_dir, "documents"), spark)
    return MM.g711_decode_features(MM.synthesize_g711_assets(docs))


@register(
    "q_mm_image_ahash_dedup",
    """
    WITH spec AS (SELECT doc_id,
                         CAST(8 + doc_id % 16 AS INT) AS w,
                         CAST(8 + doc_id % 8 AS INT) AS h
                  FROM documents),
    grid AS (SELECT doc_id,
                    list_transform(generate_series(0, 63), k ->
                      CAST((doc_id * 31 +
                            (((k // 8) * h // 8) * w
                             + ((k % 8) * w // 8)) * 7) % 256
                           AS BIGINT)) AS g
             FROM spec),
    tot AS (SELECT doc_id, g, CAST(list_sum(g) AS BIGINT) AS total
            FROM grid),
    hw AS (SELECT doc_id,
                  CAST(list_sum(list_transform(generate_series(0, 31),
                        k -> CASE WHEN g[k + 1] * 64 > total
                             THEN (1::BIGINT << k) ELSE 0::BIGINT END))
                       AS BIGINT) AS hash_w0,
                  CAST(list_sum(list_transform(generate_series(32, 63),
                        k -> CASE WHEN g[k + 1] * 64 > total
                             THEN (1::BIGINT << (k - 32)) ELSE 0::BIGINT
                             END)) AS BIGINT) AS hash_w1
           FROM tot)
    SELECT hash_w0, hash_w1,
           CAST(COUNT(*) AS BIGINT) AS n_images,
           MIN(doc_id) AS representative_id
    FROM hw GROUP BY 1, 2 HAVING COUNT(*) > 1
    """,
    "perceptual image dedup by average-hash (aHash, the classic "
    "pHash-family member) over REAL PNG decode: 8x8 nearest-neighbor "
    "grid sample, bit = sample*64 > grid sum (exact integer), packed "
    "into two 32-bit words (the BQ pack) — decode is the only Python, "
    "hashing is codegen SQL, and only 16-byte hashes shuffle, never "
    "pixels; the image twin of exact_dedup",
)
def q_mm_image_ahash_dedup(spark, sf_dir):
    """See operators/multimodal.py:image_ahash_dedup. The synthetic
    PNG generator cycles with period 256 in doc_id, so doc_id and
    doc_id+256 are pixel-identical — planted perceptual duplicates the
    oracle predicts in closed form."""
    from pg_logical_replication_spark.plans.registry import spread_if_narrow

    docs = spread_if_narrow(t(spark, sf_dir, "documents"), spark)
    return MM.image_ahash_dedup(MM.synthesize_png_assets(docs))


@register(
    "q_mm_image_dhash_pairs",
    """
    WITH spec AS (SELECT doc_id,
                         CAST(8 + doc_id % 16 AS INT) AS w,
                         CAST(8 + doc_id % 8 AS INT) AS h
                  FROM documents),
    hw AS (SELECT doc_id,
             CAST(list_sum(list_transform(generate_series(0, 31), k ->
               CASE WHEN (doc_id * 31 + (((k // 8) * h // 8) * w
                          + ((k % 8) * w // 9)) * 7) % 256
                       > (doc_id * 31 + (((k // 8) * h // 8) * w
                          + (((k % 8) + 1) * w // 9)) * 7) % 256
                    THEN (1::BIGINT << k) ELSE 0::BIGINT END))
               AS BIGINT) AS hw0,
             CAST(list_sum(list_transform(generate_series(32, 63), k ->
               CASE WHEN (doc_id * 31 + (((k // 8) * h // 8) * w
                          + ((k % 8) * w // 9)) * 7) % 256
                       > (doc_id * 31 + (((k // 8) * h // 8) * w
                          + (((k % 8) + 1) * w // 9)) * 7) % 256
                    THEN (1::BIGINT << (k - 32)) ELSE 0::BIGINT END))
               AS BIGINT) AS hw1
           FROM spec),
    bands AS (
      SELECT doc_id, hw0, hw1, i AS band_idx,
             CASE i WHEN 0 THEN hw0 & 65535
                    WHEN 1 THEN (hw0 >> 16) & 65535
                    WHEN 2 THEN hw1 & 65535
                    ELSE (hw1 >> 16) & 65535 END AS band_val
      FROM hw, UNNEST(range(0, 4)) AS u(i)),
    cand AS (
      SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
             a.hw0 AS a0, a.hw1 AS a1, b.hw0 AS b0, b.hw1 AS b1
      FROM bands a JOIN bands b
        ON a.band_idx = b.band_idx AND a.band_val = b.band_val
       AND a.doc_id < b.doc_id)
    SELECT a_id, b_id,
           CAST(bit_count(xor(a0, b0)) + bit_count(xor(a1, b1)) AS INT)
             AS hamming
    FROM cand
    WHERE bit_count(xor(a0, b0)) + bit_count(xor(a1, b1)) <= 6
    """,
    "NEAR-duplicate image pairs by difference-hash (dHash — gradient "
    "bits, brightness-shift robust where aHash is not): four 16-bit "
    "LSH bands generate candidates (the MinHash inverted-index "
    "shape), exact XOR+popcount Hamming <= 6 gates them; only hash "
    "words shuffle, never pixels",
)
def q_mm_image_dhash_pairs(spark, sf_dir):
    """See operators/multimodal.py:image_dhash_pairs; the 9-column
    grid's right-neighbour comparison replays in closed form."""
    from pg_logical_replication_spark.plans.registry import spread_if_narrow

    docs = spread_if_narrow(t(spark, sf_dir, "documents"), spark)
    return MM.image_dhash_pairs(MM.synthesize_png_assets(docs))


@register(
    "q_mm_ogg_probe",
    """
    SELECT doc_id AS asset_id,
           CASE WHEN doc_id % 2 = 0 THEN 'vorbis' ELSE 'opus' END
             AS codec_name,
           CAST(1 + doc_id % 2 AS INT) AS channels,
           CAST(CASE WHEN doc_id % 2 = 0 THEN 44100 ELSE 48000 END
                AS INT) AS sample_rate,
           CAST(3 + doc_id % 5 AS INT) AS n_pages,
           CAST((2 + doc_id % 5) * 4800 * 1000
                // (CASE WHEN doc_id % 2 = 0 THEN 44100 ELSE 48000 END)
                AS BIGINT) AS duration_ms
    FROM documents
    """,
    "REAL Ogg container probe (RFC 3533): page walk with the Ogg "
    "CRC-32 (0x04C11DB7, unreflected — not zlib's), packet reassembly "
    "from lacing values, Vorbis/Opus ID-header identification, "
    "duration from the last granule position — the fifth container "
    "family next to WARC/RIFF/BMFF/EBML, all facts closed-form",
)
def q_mm_ogg_probe(spark, sf_dir):
    """See functions/ogg.py; synthesis per operators/multimodal.py:
    synthesize_ogg_assets."""
    from pg_logical_replication_spark.plans.registry import spread_if_narrow

    docs = spread_if_narrow(t(spark, sf_dir, "documents"), spark)
    return MM.probe_ogg_features(MM.synthesize_ogg_assets(docs))


@register(
    "q_mm_audio_fingerprint",
    """
    WITH spec AS (SELECT doc_id, CAST(64 + doc_id % 256 AS INT) AS n
                  FROM documents),
    sub AS (SELECT doc_id, n,
                   list_transform(
                     generate_series(0, (n + 7) // 8 - 1),
                     f -> list_sum(list_transform(
                            generate_series(f * 8, least(n, (f + 1) * 8) - 1),
                            i -> CAST((doc_id * 37 + i * 101) % 2001 - 1000
                                 AS BIGINT)
                               * CAST((doc_id * 37 + i * 101) % 2001 - 1000
                                 AS BIGINT)))) AS es
            FROM spec),
    en AS (SELECT doc_id, CAST(u.i - 1 AS INT) AS sub_idx, es[u.i] AS energy
           FROM sub, UNNEST(generate_series(1, len(es))) AS u(i)),
    pv AS (SELECT doc_id, sub_idx // 4 AS frame,
                  MAX(CASE WHEN sub_idx % 4 = 0 THEN energy END) AS e0,
                  MAX(CASE WHEN sub_idx % 4 = 1 THEN energy END) AS e1,
                  MAX(CASE WHEN sub_idx % 4 = 2 THEN energy END) AS e2,
                  MAX(CASE WHEN sub_idx % 4 = 3 THEN energy END) AS e3,
                  COUNT(*) AS nb
           FROM en GROUP BY 1, 2),
    cmpl AS (SELECT * FROM pv WHERE nb = 4),
    lagged AS (SELECT doc_id, frame, e0, e1, e2, e3,
                      LAG(e0) OVER w AS p0, LAG(e1) OVER w AS p1,
                      LAG(e2) OVER w AS p2, LAG(e3) OVER w AS p3
               FROM cmpl
               WINDOW w AS (PARTITION BY doc_id ORDER BY frame)),
    bits AS (SELECT doc_id, frame,
                    CASE WHEN (e0 - e1) - (p0 - p1) > 0 THEN 4 ELSE 0 END +
                    CASE WHEN (e1 - e2) - (p1 - p2) > 0 THEN 2 ELSE 0 END +
                    CASE WHEN (e2 - e3) - (p2 - p3) > 0 THEN 1 ELSE 0 END AS h
             FROM lagged WHERE p0 IS NOT NULL),
    roll AS (SELECT doc_id,
                    CAST(COUNT(*) AS INT) AS n_fp_frames,
                    CAST(SUM((h // 4) % 2 + (h // 2) % 2 + h % 2) AS BIGINT)
                      AS fp_ones,
                    CAST(SUM(h * (frame + 1)) AS BIGINT) AS fp_checksum
             FROM bits GROUP BY 1),
    nf AS (SELECT doc_id, CAST(COUNT(*) AS INT) AS n_frames
           FROM cmpl GROUP BY 1)
    SELECT nf.doc_id AS asset_id, nf.n_frames,
           COALESCE(roll.n_fp_frames, 0) AS n_fp_frames,
           CAST(COALESCE(roll.fp_ones, 0) AS BIGINT) AS fp_ones,
           CAST(COALESCE(roll.fp_checksum, 0) AS BIGINT) AS fp_checksum
    FROM nf LEFT JOIN roll ON nf.doc_id = roll.doc_id
    """,
    "Haitsma-Kalker-style robust audio hash over REAL decoded PCM "
    "(Philips ISMIR'02, eq. 1 with integer time-band energies): per "
    "frame, sign bits of the band-energy difference-of-differences — "
    "the perceptual audio near-dup primitive; per asset the exact "
    "fingerprint checksum pins every bit against the closed-form "
    "oracle",
)
def q_mm_audio_fingerprint(spark, sf_dir):
    """operators/multimodal.wav_robust_fingerprint over the synthesized
    WAV assets: decode is the only Python; the 4-band pivot, frame lag,
    sign bits and rollup are codegen SQL keyed on asset_id."""
    from pg_logical_replication_spark.plans.registry import spread_if_narrow

    docs = spread_if_narrow(t(spark, sf_dir, "documents"), spark)
    return MM.wav_robust_fingerprint(MM.synthesize_wav_assets(docs))
