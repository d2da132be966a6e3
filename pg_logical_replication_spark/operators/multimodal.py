"""Multimodal (image/audio/video) columns as binary + typed metadata.

A 100 TB training-data pipeline carries media as opaque ``binary``
columns with structured metadata, decoded lazily on executors. This
module provides that plumbing Spark-first:

* an assets schema: ``payload: binary`` + ``meta: struct`` (typed,
  per-kind fields nullable);
* deterministic asset synthesis from the ``documents`` table (this
  container ships no media codecs or fixtures) — payloads are
  ``unhex(repeat(sha2(text, 256), k))``, reproducible bit-for-bit in
  DuckDB (``unhex(repeat(sha256(text), k))``) so every downstream
  operator keeps a value-level oracle;
* decode / feature-extract / frame-sample / resize as Arrow-batched
  ``mapInPandas`` stages — the real executor-side shape (batch in,
  variable rows out, no driver involvement);
* REAL codecs where the stdlib can carry them: ``png``
  (``functions/png.py``, zlib+struct) and ``wav`` (stdlib ``wave``)
  decode actual bytes on executors, each oracle-gated end-to-end
  (``q_mm_png_decode`` / ``q_mm_wav_decode``). The remaining formats
  (jpeg/webp/mp3/flac/h264/vp9) need codec libraries absent from this
  container and stay STUBBED with ``NotImplementedError`` — for those
  the Spark-side plumbing (schema, partitioning, UDF signature, batch
  shape) is real and tested; only the byte→pixels step is a
  deterministic fake, clearly marked.

Scale notes: payloads never pass through the driver; ``mapInPandas``
streams Arrow record batches per partition, so memory is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` × max payload size.
Feature extraction keeps narrow outputs (drop the payload column as
early as possible — column pruning cannot remove a column the UDF
yields). Frame sampling fans out rows; partition count is inherited,
so repartition upstream by asset_id if frames-per-asset is skewed.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

KINDS = ["image", "audio", "video"]

#: Codecs that are METADATA-ONLY BY DESIGN — requesting sample decode
#: raises NotImplementedError, loudly. The scope line is principled,
#: not a TODO (settled in round 5 per review r4 #8): this engine
#: implements every codec whose decode is integer-exact and therefore
#: closed-form oracle-checkable by another engine (FLAC, ADPCM, G.711,
#: PNG, VP8L, GIF, TIFF, BMP, JPEG; see the graduation list below).
#: mp3/h264/vp9 are lossy PERCEPTUAL transform codecs: their sample
#: output depends on hundreds of spec coefficient tables (ISO 11172-3
#: Annex B synthesis windows and allocation tables, H.264/VP9
#: transform + loop-filter pipelines) whose reimplementation cannot be
#: conformance-verified in this sandbox (no reference streams, no
#: reference decoders) and whose float output has no integer-exact
#: DuckDB replay. Corpus GOVERNANCE over these assets — duration,
#: bitrate, resolution, codec identification, VBR stats — is fully
#: implemented via real container/frame parsers
#: (``functions/mediainfo.py``: mp3 frame walk + VBR, ISO BMFF, EBML,
#: H.264 SPS), which is what a 100 TB curation pipeline actually runs.
#: Graduated out of this set with REAL stdlib implementations:
#: ``png`` (``functions/png.py``, zlib+struct W3C profile → use
#: :func:`synthesize_png_assets` / :func:`decode_png_features`),
#: ``wav`` (stdlib ``wave`` RIFF/PCM → :func:`synthesize_wav_assets` /
#: :func:`decode_wav_features`), and ``jpeg`` (``functions/jpeg.py``,
#: baseline sequential DCT from the public T.81 spec →
#: :func:`synthesize_jpeg_assets` / :func:`decode_jpeg_features`), and
#: ``flac`` (``functions/flac.py``, RFC 9639 profile →
#: :func:`synthesize_flac_assets` / :func:`decode_flac_features`), and
#: ``webp`` LOSSLESS (``functions/vp8l.py``, the VP8L bitstream incl.
#: all four transforms → :func:`synthesize_webp_assets` /
#: :func:`decode_webp_features`; LOSSY VP8 stays a loud stub).
REAL_CODECS = frozenset({"mp3", "h264", "vp9"})

ASSET_SCHEMA = (
    "asset_id bigint, kind string, payload binary, "
    "meta struct<codec: string, width: int, height: int, "
    "sample_rate: int, duration_ms: int>"
)

FEATURE_SCHEMA = (
    "asset_id bigint, kind string, n_bytes int, n_frames int, hexmean double"
)

FRAME_SCHEMA = "asset_id bigint, frame_idx int, frame_bytes int"

FRAME_SIZE = 32  # synthetic frame = one sha256 digest


def synthesize_assets(documents: DataFrame) -> DataFrame:
    """documents → deterministic multimodal assets (JVM-side, no UDF).

    kind cycles image/audio/video by doc_id; payload is 1-4 sha256
    digests of the text (32-128 bytes); meta fields are arithmetic on
    doc_id. Oracle (DuckDB):
    ``unhex(repeat(sha256(text), 1 + doc_id % 4))``.
    """
    k = (F.col("doc_id") % 3).cast("int")
    reps = (F.lit(1) + F.col("doc_id") % 4).cast("int")
    kind = F.element_at(F.array(*[F.lit(s) for s in KINDS]), k + 1)
    return documents.select(
        F.col("doc_id").alias("asset_id"),
        kind.alias("kind"),
        F.unhex(F.repeat(F.sha2(F.col("text").cast("binary"), 256), reps)).alias(
            "payload"
        ),
        F.struct(
            F.lit("fake").alias("codec"),
            F.when(k == 0, (16 + F.col("doc_id") % 64).cast("int")).alias("width"),
            F.when(k == 0, (16 + F.col("doc_id") % 48).cast("int")).alias("height"),
            F.when(k == 1, F.lit(16000)).cast("int").alias("sample_rate"),
            F.when(k != 0, (1000 + F.col("doc_id") % 9000).cast("int")).alias(
                "duration_ms"
            ),
        ).alias("meta"),
    )


def _require_fake(codec: str) -> None:
    if codec in REAL_CODECS:
        raise NotImplementedError(
            f"STUB: real {codec!r} decode needs a media codec library not "
            "present in this environment; only the deterministic 'fake' "
            "codec is implemented (Spark plumbing is real)"
        )
    if codec == "png":
        raise ValueError(
            "png payloads have a real decoder: use decode_png_features"
        )
    if codec == "wav":
        raise ValueError(
            "wav payloads have a real decoder: use decode_wav_features"
        )
    if codec == "jpeg":
        raise ValueError(
            "jpeg payloads have a real decoder: use decode_jpeg_features"
        )
    if codec == "flac":
        raise ValueError(
            "flac payloads have a real decoder: use decode_flac_features"
        )
    if codec == "webp":
        raise ValueError(
            "webp payloads have a real LOSSLESS (VP8L) decoder: use "
            "decode_webp_features; lossy VP8 remains stubbed inside it"
        )
    if codec != "fake":
        raise ValueError(f"unknown codec {codec!r}")


def synthesize_wav_assets(documents: DataFrame) -> DataFrame:
    """documents → REAL 16-bit mono PCM WAV payloads (stdlib ``wave``).

    Deterministic closed-form audio: n_samples = 64 + doc_id % 256 at
    8000 or 16000 Hz (by doc_id parity), sample[i] =
    ((doc_id·37 + i·101) mod 2001) − 1000 — integer PCM, so a SQL
    oracle predicts every decoded statistic exactly (no float DSP in
    the contract). Encode runs executor-side in Arrow batches.
    """

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import io
        import wave

        import numpy as np
        import pandas as pd

        for pdf in it:
            ids, kinds, payloads, metas = [], [], [], []
            for did in pdf["doc_id"]:
                did = int(did)
                n = 64 + did % 256
                rate = 16000 if did % 2 == 0 else 8000
                # vectorized sample synthesis (optimization r11, guide
                # §4.2): byte-identical to the per-sample loop — int64
                # modular arithmetic, little-endian int16 pack
                samples = (
                    (did * 37 + np.arange(n, dtype=np.int64) * 101)
                    % 2001
                ) - 1000
                buf = io.BytesIO()
                w = wave.open(buf, "wb")
                w.setnchannels(1)
                w.setsampwidth(2)
                w.setframerate(rate)
                w.writeframes(samples.astype("<i2").tobytes())
                w.close()
                ids.append(did)
                kinds.append("audio")
                payloads.append(buf.getvalue())
                metas.append(
                    {
                        "codec": "wav",
                        "width": None,
                        "height": None,
                        "sample_rate": rate,
                        "duration_ms": (n * 1000) // rate,
                    }
                )
            yield pd.DataFrame(
                {"asset_id": ids, "kind": kinds, "payload": payloads, "meta": metas}
            )

    return documents.select("doc_id").mapInPandas(batches, schema=ASSET_SCHEMA)


def synthesize_flac_assets(documents: DataFrame) -> DataFrame:
    """documents → REAL FLAC payloads (``functions/flac.py``).

    Same closed-form contract as :func:`synthesize_wav_assets` with
    different constants: n_samples = 64 + doc_id % 256 at 16000/8000 Hz
    (doc_id parity), sample[i] = ((doc_id·53 + i·71) mod 2001) − 1000.
    FLAC is LOSSLESS, so the compressing encode (FIXED predictors +
    Rice residuals, real entropy coding) round-trips the integers
    bit-exactly and the SQL oracle stays closed-form — this is the
    compressed-audio twin of the WAV query, exercising a genuinely
    non-trivial decode path (frame sync, CRCs, Rice, predictors).
    """
    from pg_logical_replication_spark.functions.flac import encode_flac

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in it:
            ids, kinds, payloads, metas = [], [], [], []
            for did in pdf["doc_id"]:
                did = int(did)
                n = 64 + did % 256
                rate = 16000 if did % 2 == 0 else 8000
                samples = [((did * 53 + i * 71) % 2001) - 1000 for i in range(n)]
                ids.append(did)
                kinds.append("audio")
                payloads.append(
                    encode_flac(samples, sample_rate=rate, block_size=256)
                )
                metas.append(
                    {
                        "codec": "flac",
                        "width": None,
                        "height": None,
                        "sample_rate": rate,
                        "duration_ms": (n * 1000) // rate,
                    }
                )
            yield pd.DataFrame(
                {"asset_id": ids, "kind": kinds, "payload": payloads, "meta": metas}
            )

    return documents.select("doc_id").mapInPandas(batches, schema=ASSET_SCHEMA)


WAV_FEATURE_SCHEMA = (
    "asset_id bigint, sample_rate int, n_samples int, "
    "duration_ms int, sum_abs bigint, peak int"
)


def decode_flac_features(assets: DataFrame) -> DataFrame:
    """REAL byte→samples FLAC decode per asset (frame sync, CRC-8/16,
    Rice residuals, predictors, MD5 verify), emitting the same integer
    amplitude stats as :func:`decode_wav_features` — null-feature rows
    for undecodable payloads."""

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        from pg_logical_replication_spark.functions.flac import decode_flac

        for pdf in it:
            rows = []
            for aid, buf in zip(pdf["asset_id"], pdf["payload"]):
                try:
                    rate, _nc, _bps, chans = decode_flac(bytes(buf))
                    s = chans[0]
                    rows.append(
                        (
                            aid,
                            rate,
                            len(s),
                            (len(s) * 1000) // rate,
                            sum(abs(v) for v in s),
                            max((abs(v) for v in s), default=None),
                        )
                    )
                except Exception:
                    rows.append((aid, None, None, None, None, None))
            yield pd.DataFrame(
                rows,
                columns=[
                    "asset_id", "sample_rate", "n_samples",
                    "duration_ms", "sum_abs", "peak",
                ],
            )

    return assets.select("asset_id", "payload").mapInPandas(
        batches, schema=WAV_FEATURE_SCHEMA
    )


def decode_wav_features(assets: DataFrame) -> DataFrame:
    """REAL byte→samples decode per asset: parse the RIFF/PCM container
    (stdlib ``wave``), emit rate, frame count, duration, integer
    amplitude stats. Undecodable payloads yield null-feature rows, the
    decode stages' DLQ-friendly contract.
    """

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import io
        import wave

        import numpy as np
        import pandas as pd

        for pdf in it:
            rows = []
            for aid, buf in zip(pdf["asset_id"], pdf["payload"]):
                try:
                    r = wave.open(io.BytesIO(bytes(buf)), "rb")
                    n = r.getnframes()
                    rate = r.getframerate()
                    if r.getsampwidth() != 2 or r.getnchannels() != 1:
                        raise ValueError("profile: 16-bit mono only")
                    # vectorized amplitude stats (optimization r11,
                    # guide §4.2): |int16| ≤ 32768 and n ≤ Arrow batch
                    # rows, so the int64 sum is exact — identical to
                    # the per-sample loop
                    s = np.abs(
                        np.frombuffer(r.readframes(n), dtype="<i2")
                        .astype(np.int64)
                    )
                    rows.append(
                        (
                            aid,
                            rate,
                            n,
                            (n * 1000) // rate,
                            int(s.sum()) if n else 0,
                            int(s.max()) if n else 0,
                        )
                    )
                except Exception:
                    rows.append((aid, None, None, None, None, None))
            yield pd.DataFrame(
                rows,
                columns=[
                    "asset_id", "sample_rate", "n_samples",
                    "duration_ms", "sum_abs", "peak",
                ],
            )

    return assets.select("asset_id", "payload").mapInPandas(
        batches, schema=WAV_FEATURE_SCHEMA
    )


WAV_FRAME_SCHEMA = (
    "asset_id bigint, n_frames int, loudest_frame int, loudest_energy bigint"
)


def wav_loudest_frame(assets: DataFrame, frame: int = 32) -> DataFrame:
    """Frame-level audio analysis over REAL decoded PCM: split each
    asset's samples into ``frame``-sample windows, find the loudest
    (max Σ sample², first index on ties) — the audio twin of the video
    ``sample_frames`` stage, and the shape of any frame-feature
    extractor (VAD, energy gating, clip detection). Integer arithmetic
    end-to-end, so the oracle replays it exactly.
    """

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import io
        import struct as _struct
        import wave

        import pandas as pd

        for pdf in it:
            rows = []
            for aid, buf in zip(pdf["asset_id"], pdf["payload"]):
                try:
                    r = wave.open(io.BytesIO(bytes(buf)), "rb")
                    n = r.getnframes()
                    samples = _struct.unpack(f"<{n}h", r.readframes(n))
                    sums = [
                        sum(s * s for s in samples[f * frame : (f + 1) * frame])
                        for f in range((n + frame - 1) // frame)
                    ]
                    loud = max(sums)
                    rows.append((aid, len(sums), sums.index(loud), loud))
                except Exception:
                    rows.append((aid, None, None, None))
            yield pd.DataFrame(
                rows,
                columns=[
                    "asset_id", "n_frames", "loudest_frame", "loudest_energy",
                ],
            )

    return assets.select("asset_id", "payload").mapInPandas(
        batches, schema=WAV_FRAME_SCHEMA
    )


def synthesize_png_assets(documents: DataFrame) -> DataFrame:
    """documents → REAL greyscale PNG payloads (``functions/png.py``).

    Deterministic: width = 8 + doc_id%16, height = 8 + doc_id%8,
    pixel[i] = (doc_id·31 + i·7) mod 256 — closed-form, so a SQL oracle
    can predict every decoded statistic without ever parsing a PNG.
    Encode runs executor-side in Arrow batches (one-row PNGs never pass
    the driver), the production ingest shape.
    """
    from pg_logical_replication_spark.functions.png import encode_png

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in it:
            ids, kinds, payloads, metas = [], [], [], []
            for did in pdf["doc_id"]:
                did = int(did)
                w, h = 8 + did % 16, 8 + did % 8
                px = bytes((did * 31 + i * 7) % 256 for i in range(w * h))
                ids.append(did)
                kinds.append("image")
                payloads.append(encode_png(w, h, px, channels=1))
                metas.append(
                    {
                        "codec": "png",
                        "width": w,
                        "height": h,
                        "sample_rate": None,
                        "duration_ms": None,
                    }
                )
            yield pd.DataFrame(
                {"asset_id": ids, "kind": kinds, "payload": payloads, "meta": metas}
            )

    return documents.select("doc_id").mapInPandas(batches, schema=ASSET_SCHEMA)


PNG_FEATURE_SCHEMA = (
    "asset_id bigint, width int, height int, channels int, "
    "n_pixels int, mean_pixel double"
)


def decode_png_features(assets: DataFrame) -> DataFrame:
    """REAL byte→pixels decode per asset: parse the PNG (CRC-checked,
    all filter types), emit dimensions + mean pixel value (round 6).

    Same Arrow-batched executor shape as :func:`decode_features`; an
    undecodable payload yields a null-feature row rather than a worker
    crash (the DLQ-friendly contract of the decode stages).
    """

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        from pg_logical_replication_spark.functions.png import decode_png

        for pdf in it:
            rows = []
            for aid, buf in zip(pdf["asset_id"], pdf["payload"]):
                try:
                    w, h, ch, px = decode_png(bytes(buf))
                    rows.append(
                        (
                            aid,
                            w,
                            h,
                            ch,
                            w * h,
                            round(sum(px) / len(px), 6) if px else None,
                        )
                    )
                except Exception:
                    rows.append((aid, None, None, None, None, None))
            yield pd.DataFrame(
                rows,
                columns=[
                    "asset_id", "width", "height", "channels",
                    "n_pixels", "mean_pixel",
                ],
            )

    return assets.select("asset_id", "payload").mapInPandas(
        batches, schema=PNG_FEATURE_SCHEMA
    )


def synthesize_jpeg_assets(documents: DataFrame) -> DataFrame:
    """documents → REAL baseline JPEG payloads (``functions/jpeg.py``).

    Deterministic and — by construction — LOSSLESS through the lossy
    codec: quality=100 maps to all-ones quantization tables (IJG
    scaling), and every 8×8 block is constant, so the only nonzero DCT
    coefficient per block is the DC term, which round-trips exactly.
    Grid: blocks_w = 1 + doc_id%4, blocks_h = 1 + doc_id%3,
    block value = (doc_id·31 + b·7) mod 256 for block index
    b = by·blocks_w + bx. A SQL oracle therefore predicts the decoded
    mean pixel in closed form while Spark actually runs marker parse →
    Huffman decode → dequant → IDCT on executors. Encode is
    executor-side in Arrow batches (the production ingest shape).
    """
    from pg_logical_replication_spark.functions.jpeg import encode_jpeg

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in it:
            ids, kinds, payloads, metas = [], [], [], []
            for did in pdf["doc_id"]:
                did = int(did)
                bw, bh = 1 + did % 4, 1 + did % 3
                w, h = 8 * bw, 8 * bh
                px = bytes(
                    (did * 31 + ((y // 8) * bw + (x // 8)) * 7) % 256
                    for y in range(h)
                    for x in range(w)
                )
                ids.append(did)
                kinds.append("image")
                payloads.append(
                    encode_jpeg(w, h, px, channels=1, quality=100)
                )
                metas.append(
                    {
                        "codec": "jpeg",
                        "width": w,
                        "height": h,
                        "sample_rate": None,
                        "duration_ms": None,
                    }
                )
            yield pd.DataFrame(
                {"asset_id": ids, "kind": kinds, "payload": payloads, "meta": metas}
            )

    return documents.select("doc_id").mapInPandas(batches, schema=ASSET_SCHEMA)


def decode_jpeg_features(assets: DataFrame) -> DataFrame:
    """REAL byte→pixels JPEG decode per asset: full baseline pipeline
    (markers, Huffman, dequant, IDCT, level shift), emitting dimensions
    + mean pixel — the jpeg twin of :func:`decode_png_features`, same
    Arrow-batched executor shape and null-row DLQ contract."""

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        from pg_logical_replication_spark.functions.jpeg import decode_jpeg

        for pdf in it:
            rows = []
            for aid, buf in zip(pdf["asset_id"], pdf["payload"]):
                try:
                    w, h, ch, px = decode_jpeg(bytes(buf))
                    rows.append(
                        (
                            aid,
                            w,
                            h,
                            ch,
                            w * h,
                            round(sum(px) / len(px), 6) if px else None,
                        )
                    )
                except Exception:
                    rows.append((aid, None, None, None, None, None))
            yield pd.DataFrame(
                rows,
                columns=[
                    "asset_id", "width", "height", "channels",
                    "n_pixels", "mean_pixel",
                ],
            )

    return assets.select("asset_id", "payload").mapInPandas(
        batches, schema=PNG_FEATURE_SCHEMA
    )


ARCHIVE_MEMBER_SCHEMA = (
    "asset_id bigint, member_idx int, name string, n_bytes bigint, "
    "archive_format string"
)


def synthesize_archive_assets(documents: DataFrame) -> DataFrame:
    """documents → REAL zip (even doc_ids) / tar.gz (odd) archives
    (stdlib zipfile/tarfile): 1 + doc_id % 5 members named
    ``doc<did>/part<j>.txt`` with ``'y' × (5 + (doc_id·3 + j·11) mod
    40)`` bytes — the dataset-distribution containers, closed-form."""
    import gzip as _gzip
    import io
    import tarfile
    import zipfile

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in it:
            ids, kinds, payloads, metas = [], [], [], []
            for did in pdf["doc_id"]:
                did = int(did)
                members = [
                    (
                        f"doc{did}/part{j}.txt",
                        b"y" * (5 + (did * 3 + j * 11) % 40),
                    )
                    for j in range(1 + did % 5)
                ]
                buf = io.BytesIO()
                if did % 2 == 0:
                    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
                        for name, body in members:
                            z.writestr(
                                zipfile.ZipInfo(name), body
                            )
                else:
                    raw = io.BytesIO()
                    with tarfile.open(fileobj=raw, mode="w") as tf:
                        for name, body in members:
                            info = tarfile.TarInfo(name)
                            info.size = len(body)
                            tf.addfile(info, io.BytesIO(body))
                    buf.write(_gzip.compress(raw.getvalue(), mtime=0))
                ids.append(did)
                kinds.append("archive")
                payloads.append(buf.getvalue())
                metas.append(
                    {
                        "codec": "zip" if did % 2 == 0 else "tar.gz",
                        "width": None,
                        "height": None,
                        "sample_rate": None,
                        "duration_ms": None,
                    }
                )
            yield pd.DataFrame(
                {"asset_id": ids, "kind": kinds, "payload": payloads, "meta": metas}
            )

    return documents.select("doc_id").mapInPandas(batches, schema=ASSET_SCHEMA)


def archive_members(assets: DataFrame) -> DataFrame:
    """Enumerate zip / tar(.gz) members per asset (stdlib, magic-byte
    dispatch) — the first step of ingesting dataset tarballs: one row
    per member with name + UNCOMPRESSED size, before extracting a
    single byte of content. Unreadable payloads yield a null row."""

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import io
        import tarfile
        import zipfile

        import pandas as pd

        for pdf in it:
            rows = []
            for aid, buf in zip(pdf["asset_id"], pdf["payload"]):
                b = bytes(buf)
                try:
                    if b[:4] == b"PK\x03\x04" or b[:4] == b"PK\x05\x06":
                        with zipfile.ZipFile(io.BytesIO(b)) as z:
                            for i, zi in enumerate(z.infolist()):
                                rows.append(
                                    (aid, i, zi.filename, zi.file_size, "zip")
                                )
                    else:
                        with tarfile.open(
                            fileobj=io.BytesIO(b), mode="r:*"
                        ) as tf:
                            for i, m in enumerate(tf.getmembers()):
                                rows.append(
                                    (aid, i, m.name, m.size, "tar")
                                )
                except Exception:
                    rows.append((aid, None, None, None, None))
            yield pd.DataFrame(
                rows,
                columns=[
                    "asset_id", "member_idx", "name", "n_bytes",
                    "archive_format",
                ],
            )

    return assets.select("asset_id", "payload").mapInPandas(
        batches, schema=ARCHIVE_MEMBER_SCHEMA
    )


WARC_PAGE_SCHEMA = (
    "asset_id bigint, rec_idx int, uri string, status int, html string"
)


def synthesize_web_warc_assets(documents: DataFrame) -> DataFrame:
    """documents → WARC files whose response blocks are REAL HTTP
    responses carrying deterministic HTML — the web-scrape shape the
    composite pipeline query ingests. Per doc: 1 + doc_id % 3 response
    records, uri = https://Site<doc_id%7>.COM/p<j>?b=<j%2>&a=<doc_id%5>,
    html = title/paragraph/script/comment page keyed by (doc_id, j)."""
    from pg_logical_replication_spark.functions.warc import build_warc

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in it:
            ids, kinds, payloads, metas = [], [], [], []
            for did in pdf["doc_id"]:
                did = int(did)
                recs = [{"type": "warcinfo", "block": b"software: plrs\r\n"}]
                for j in range(1 + did % 3):
                    html = (
                        f"<html><head><title>T{did}</title></head>"
                        f"<BODY><p>doc {did}-{j} says &amp;hello&lt;w&gt;</p>"
                        f"<script>var x={j};</script>"
                        f"<!-- c{did} -->"
                        f"<div>tail {(did + j) % 10}</div></BODY></html>"
                    )
                    block = (
                        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
                        + html.encode()
                    )
                    recs.append(
                        {
                            "type": "response",
                            "uri": f"https://Site{did % 7}.COM/p{j}"
                            f"?b={j % 2}&a={did % 5}#frag",
                            "block": block,
                        }
                    )
                ids.append(did)
                kinds.append("archive")
                payloads.append(build_warc(recs))
                metas.append(
                    {
                        "codec": "warc",
                        "width": None,
                        "height": None,
                        "sample_rate": None,
                        "duration_ms": None,
                    }
                )
            yield pd.DataFrame(
                {"asset_id": ids, "kind": kinds, "payload": payloads, "meta": metas}
            )

    return documents.select("doc_id").mapInPandas(batches, schema=ASSET_SCHEMA)


def warc_html_pages(assets: DataFrame) -> DataFrame:
    """WARC assets → one row per HTTP response with its raw HTML — the
    fan-out between archive bytes and the JVM-side text pipeline
    (html_to_text / quality / canonical-URL all run as expressions on
    the result). Python touches only container framing, never text
    analytics."""

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        from pg_logical_replication_spark.functions.warc import (
            parse_warc,
            split_http_response,
        )

        for pdf in it:
            rows = []
            for aid, buf in zip(pdf["asset_id"], pdf["payload"]):
                try:
                    for i, rec in enumerate(parse_warc(bytes(buf))):
                        if rec["headers"].get("WARC-Type") != "response":
                            continue
                        status, _h, body = split_http_response(rec["block"])
                        rows.append(
                            (
                                aid,
                                i,
                                rec["headers"].get("WARC-Target-URI"),
                                status,
                                body.decode("utf-8", "replace"),
                            )
                        )
                except Exception:
                    rows.append((aid, None, None, None, None))
            yield pd.DataFrame(
                rows,
                columns=["asset_id", "rec_idx", "uri", "status", "html"],
            )

    return assets.select("asset_id", "payload").mapInPandas(
        batches, schema=WARC_PAGE_SCHEMA
    )


WARC_RECORD_SCHEMA = (
    "asset_id bigint, rec_idx int, warc_type string, uri string, "
    "block_bytes int"
)


def synthesize_warc_assets(documents: DataFrame) -> DataFrame:
    """documents → REAL WARC payloads (``functions/warc.py``), the
    Common Crawl ingestion shape: one warcinfo + 1 + doc_id % 4
    response records per asset, response block j =
    'x' × (10 + (doc_id·7 + j·13) mod 50); odd doc_ids use the
    record-per-gzip-member ``.warc.gz`` layout — both container forms
    exercised, all counts closed-form."""
    import gzip as _gzip

    from pg_logical_replication_spark.functions.warc import build_warc

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in it:
            ids, kinds, payloads, metas = [], [], [], []
            for did in pdf["doc_id"]:
                did = int(did)
                recs = [{"type": "warcinfo", "block": b"software: plrs\r\n"}]
                for j in range(1 + did % 4):
                    recs.append(
                        {
                            "type": "response",
                            "uri": f"https://example.com/{did}/{j}",
                            "block": b"x" * (10 + (did * 7 + j * 13) % 50),
                        }
                    )
                if did % 2:
                    payload = b"".join(
                        _gzip.compress(build_warc([r]), mtime=0)
                        for r in recs
                    )
                else:
                    payload = build_warc(recs)
                ids.append(did)
                kinds.append("archive")
                payloads.append(payload)
                metas.append(
                    {
                        "codec": "warc",
                        "width": None,
                        "height": None,
                        "sample_rate": None,
                        "duration_ms": None,
                    }
                )
            yield pd.DataFrame(
                {"asset_id": ids, "kind": kinds, "payload": payloads, "meta": metas}
            )

    return documents.select("doc_id").mapInPandas(batches, schema=ASSET_SCHEMA)


def warc_records(assets: DataFrame) -> DataFrame:
    """REAL WARC record split per asset (version line, header parse,
    Content-Length framing, gzip-member handling): one row per record
    with type/URI/block size — the fan-out step of web-archive
    ingestion. Unparseable payloads yield one null-typed row."""

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        from pg_logical_replication_spark.functions.warc import parse_warc

        for pdf in it:
            rows = []
            for aid, buf in zip(pdf["asset_id"], pdf["payload"]):
                try:
                    for i, rec in enumerate(parse_warc(bytes(buf))):
                        rows.append(
                            (
                                aid,
                                i,
                                rec["headers"].get("WARC-Type"),
                                rec["headers"].get("WARC-Target-URI"),
                                len(rec["block"]),
                            )
                        )
                except Exception:
                    rows.append((aid, None, None, None, None))
            yield pd.DataFrame(
                rows,
                columns=[
                    "asset_id", "rec_idx", "warc_type", "uri", "block_bytes",
                ],
            )

    return assets.select("asset_id", "payload").mapInPandas(
        batches, schema=WARC_RECORD_SCHEMA
    )


def synthesize_tiff_assets(documents: DataFrame) -> DataFrame:
    """documents → REAL TIFF payloads (``functions/tiff.py``,
    PackBits-compressed grayscale strips): width = 8 + doc_id % 20,
    height = 8 + doc_id % 10, pixel[i] = (doc_id·29 + i·13) mod 256 —
    the scanned-document format, lossless, closed-form."""
    from pg_logical_replication_spark.functions.tiff import encode_tiff

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in it:
            ids, kinds, payloads, metas = [], [], [], []
            for did in pdf["doc_id"]:
                did = int(did)
                w, h = 8 + did % 20, 8 + did % 10
                px = bytes(
                    (did * 29 + i * 13) % 256 for i in range(w * h)
                )
                ids.append(did)
                kinds.append("image")
                payloads.append(encode_tiff(w, h, px, 1, "packbits"))
                metas.append(
                    {
                        "codec": "tiff",
                        "width": w,
                        "height": h,
                        "sample_rate": None,
                        "duration_ms": None,
                    }
                )
            yield pd.DataFrame(
                {"asset_id": ids, "kind": kinds, "payload": payloads, "meta": metas}
            )

    return documents.select("doc_id").mapInPandas(batches, schema=ASSET_SCHEMA)


def decode_tiff_features(assets: DataFrame) -> DataFrame:
    """REAL byte→pixels TIFF decode (IFD walk, strip reassembly,
    PackBits/LZW): dims + mean pixel, null rows for undecodable."""

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        from pg_logical_replication_spark.functions.tiff import decode_tiff

        for pdf in it:
            rows = []
            for aid, buf in zip(pdf["asset_id"], pdf["payload"]):
                try:
                    w, h, ch, px, _pages = decode_tiff(bytes(buf))
                    rows.append(
                        (
                            aid, w, h, ch, w * h,
                            round(sum(px) / len(px), 6) if px else None,
                        )
                    )
                except Exception:
                    rows.append((aid, None, None, None, None, None))
            yield pd.DataFrame(
                rows,
                columns=[
                    "asset_id", "width", "height", "channels",
                    "n_pixels", "mean_pixel",
                ],
            )

    return assets.select("asset_id", "payload").mapInPandas(
        batches, schema=PNG_FEATURE_SCHEMA
    )


def synthesize_gif_assets(documents: DataFrame) -> DataFrame:
    """documents → REAL GIF payloads (``functions/gif.py``, real LZW).

    Deterministic 8-bit indexed images over the grayscale ramp:
    width = 8 + doc_id % 24, height = 8 + doc_id % 12,
    index[i] = (doc_id·31 + i·7) mod 256 — lossless through genuine
    LZW compression, interlaced for odd doc_ids so both row orders are
    exercised, so the closed-form oracle survives the full codec.
    """
    from pg_logical_replication_spark.functions.gif import encode_gif

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in it:
            ids, kinds, payloads, metas = [], [], [], []
            for did in pdf["doc_id"]:
                did = int(did)
                w, h = 8 + did % 24, 8 + did % 12
                px = bytes(
                    (did * 31 + i * 7) % 256 for i in range(w * h)
                )
                ids.append(did)
                kinds.append("image")
                payloads.append(
                    encode_gif(w, h, px, interlace=bool(did % 2))
                )
                metas.append(
                    {
                        "codec": "gif",
                        "width": w,
                        "height": h,
                        "sample_rate": None,
                        "duration_ms": None,
                    }
                )
            yield pd.DataFrame(
                {"asset_id": ids, "kind": kinds, "payload": payloads, "meta": metas}
            )

    return documents.select("doc_id").mapInPandas(batches, schema=ASSET_SCHEMA)


def decode_gif_features(assets: DataFrame) -> DataFrame:
    """REAL byte→pixels GIF decode (LZW, interlace, color tables):
    dims + mean pixel over the grayscale palette — same feature shape
    as the PNG/JPEG queries, null rows for undecodable payloads."""

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        from pg_logical_replication_spark.functions.gif import decode_gif

        for pdf in it:
            rows = []
            for aid, buf in zip(pdf["asset_id"], pdf["payload"]):
                try:
                    w, h, frames = decode_gif(bytes(buf))
                    idx = frames[0]["indices"]
                    pal = frames[0]["palette"]
                    # grayscale ramp ⇒ pixel value == palette red channel
                    vals = [pal[i][0] for i in idx]
                    rows.append(
                        (
                            aid, w, h, 1, w * h,
                            round(sum(vals) / len(vals), 6)
                            if vals else None,
                        )
                    )
                except Exception:
                    rows.append((aid, None, None, None, None, None))
            yield pd.DataFrame(
                rows,
                columns=[
                    "asset_id", "width", "height", "channels",
                    "n_pixels", "mean_pixel",
                ],
            )

    return assets.select("asset_id", "payload").mapInPandas(
        batches, schema=PNG_FEATURE_SCHEMA
    )


def synthesize_webp_assets(documents: DataFrame) -> DataFrame:
    """documents → REAL lossless WebP payloads (``functions/vp8l.py``).

    Deterministic ARGB: width = 4 + doc_id % 12, height = 4 + doc_id %
    8, pixel[i] channels a=255, r=(doc_id·31+i·7)%256,
    g=(doc_id·17+i·11)%256, b=(doc_id·13+i·5)%256 — VP8L is lossless,
    so the closed-form oracle survives a real prefix-coded bitstream
    round-trip (the image twin of the FLAC query).
    """
    from pg_logical_replication_spark.functions.vp8l import (
        encode_webp_lossless,
    )

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in it:
            ids, kinds, payloads, metas = [], [], [], []
            for did in pdf["doc_id"]:
                did = int(did)
                w, h = 4 + did % 12, 4 + did % 8
                px = [
                    (255 << 24)
                    | (((did * 31 + i * 7) % 256) << 16)
                    | (((did * 17 + i * 11) % 256) << 8)
                    | ((did * 13 + i * 5) % 256)
                    for i in range(w * h)
                ]
                ids.append(did)
                kinds.append("image")
                payloads.append(encode_webp_lossless(w, h, px))
                metas.append(
                    {
                        "codec": "webp",
                        "width": w,
                        "height": h,
                        "sample_rate": None,
                        "duration_ms": None,
                    }
                )
            yield pd.DataFrame(
                {"asset_id": ids, "kind": kinds, "payload": payloads, "meta": metas}
            )

    return documents.select("doc_id").mapInPandas(batches, schema=ASSET_SCHEMA)


WEBP_FEATURE_SCHEMA = (
    "asset_id bigint, width int, height int, n_pixels int, "
    "mean_r double, mean_g double, mean_b double"
)


def decode_webp_features(assets: DataFrame) -> DataFrame:
    """REAL byte→pixels VP8L decode per asset (prefix codes, LZ77,
    color cache, transforms), emitting dims + per-channel means; lossy
    VP8 payloads and undecodable bytes yield null-feature rows."""

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        from pg_logical_replication_spark.functions.vp8l import (
            decode_webp_lossless,
        )

        for pdf in it:
            rows = []
            for aid, buf in zip(pdf["asset_id"], pdf["payload"]):
                try:
                    w, h, px = decode_webp_lossless(bytes(buf))
                    n = len(px)
                    rows.append(
                        (
                            aid, w, h, n,
                            round(sum((p >> 16) & 0xFF for p in px) / n, 6),
                            round(sum((p >> 8) & 0xFF for p in px) / n, 6),
                            round(sum(p & 0xFF for p in px) / n, 6),
                        )
                    )
                except Exception:
                    rows.append((aid, None, None, None, None, None, None))
            yield pd.DataFrame(
                rows,
                columns=[
                    "asset_id", "width", "height", "n_pixels",
                    "mean_r", "mean_g", "mean_b",
                ],
            )

    return assets.select("asset_id", "payload").mapInPandas(
        batches, schema=WEBP_FEATURE_SCHEMA
    )


MEDIA_PROBE_SCHEMA = (
    "asset_id bigint, media_format string, width int, height int, "
    "duration_ms int, sample_rate int, n_frames int"
)


def synthesize_media_assets(documents: DataFrame) -> DataFrame:
    """documents → REAL container bytes for the still-stubbed codecs:
    mp3 (MPEG-1 Layer III CBR frames), webp (RIFF/VP8L), mp4 (ISO BMFF
    ftyp+moov), webm (EBML/Matroska with a V_VP9 track) and a raw h264
    SPS NAL, cycling by doc_id % 5.

    Deterministic closed forms (all integers):
    mp3:  n_frames = 4 + doc_id % 8 at 44100 Hz / 128 kbps
    webp: width = 16 + doc_id % 64, height = 16 + doc_id % 48
    mp4:  duration_ms = 1000 + doc_id % 9000,
          width = 320 + 16·(doc_id % 8), height = 240 + 16·(doc_id % 4)
    webm: duration_ms = 2000 + doc_id % 8000,
          width = 320 + 16·(doc_id % 10), height = 180 + 8·(doc_id % 10)
    h264: width = 16·(2 + doc_id % 8), height = 16·(2 + doc_id % 6)

    The PAYLOAD bytes are spec-valid containers (frame syncs, RIFF
    chunks, BMFF boxes, EBML elements, Exp-Golomb SPS fields) whose
    sample data is filler — exactly the honest boundary: the metadata
    pass is real, the entropy decode stays a loud stub.
    """
    import struct as _struct

    def _mp3(n_frames: int) -> bytes:
        # MPEG-1 Layer III, 44100 Hz, 128 kbps: header FF FB 90 00,
        # frame size 144·128000/44100 = 417 bytes
        frame = bytes([0xFF, 0xFB, 0x90, 0x00]) + b"\x00" * (417 - 4)
        return frame * n_frames

    def _webp(w: int, h: int) -> bytes:
        bits = (w - 1) | ((h - 1) << 14)
        body = bytes([0x2F]) + _struct.pack("<I", bits)
        chunk = b"VP8L" + _struct.pack("<I", len(body)) + body
        if len(body) & 1:
            chunk += b"\x00"
        return b"RIFF" + _struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk

    def _box(typ: bytes, payload: bytes) -> bytes:
        return _struct.pack(">I", 8 + len(payload)) + typ + payload

    def _mp4(w: int, h: int, dur_ms: int) -> bytes:
        mvhd = _box(
            b"mvhd",
            b"\x00" * 4 + b"\x00" * 8
            + _struct.pack(">II", 1000, dur_ms) + b"\x00" * 80,
        )
        # tkhd v0: FullBox + 5×u32, then 52 bytes to 16.16 dims
        tkhd = _box(
            b"tkhd",
            b"\x00" * 24 + b"\x00" * 52
            + _struct.pack(">II", w << 16, h << 16),
        )
        hdlr = _box(b"hdlr", b"\x00" * 8 + b"vide" + b"\x00" * 12)
        trak = _box(b"trak", tkhd + _box(b"mdia", hdlr))
        return _box(b"ftyp", b"isom\x00\x00\x02\x00isom") + _box(
            b"moov", mvhd + trak
        )

    def _ebml(eid: bytes, body: bytes) -> bytes:
        n = len(body)
        size = bytes([0x80 | n]) if n < 0x7F else bytes(
            [0x40 | (n >> 8), n & 0xFF]
        )
        return eid + size + body

    def _webm(w: int, h: int, dur_ms: int) -> bytes:
        video = _ebml(b"\xb0", w.to_bytes(2, "big")) + _ebml(
            b"\xba", h.to_bytes(2, "big")
        )
        track = _ebml(b"\x86", b"V_VP9") + _ebml(b"\xe0", video)
        info = _ebml(
            b"\x2a\xd7\xb1", (1_000_000).to_bytes(3, "big")
        ) + _ebml(b"\x44\x89", _struct.pack(">f", float(dur_ms)))
        segment = _ebml(b"\x15\x49\xa9\x66", info) + _ebml(
            b"\x16\x54\xae\x6b", _ebml(b"\xae", track)
        )
        return _ebml(b"\x1a\x45\xdf\xa3", b"") + _ebml(
            b"\x18\x53\x80\x67", segment
        )

    def _sps(mbs_w: int, mbs_h: int) -> bytes:
        bits: list[int] = []

        def b(v, n):
            for i in range(n - 1, -1, -1):
                bits.append((v >> i) & 1)

        def ue(v):
            k = v + 1
            n = k.bit_length()
            b(0, n - 1)
            b(k, n)

        b(66, 8)   # profile_idc baseline
        b(0, 8)    # constraint flags
        b(30, 8)   # level_idc 3.0
        ue(0)      # sps id
        ue(4)      # log2_max_frame_num_minus4
        ue(0)      # poc type 0
        ue(4)      # log2_max_poc_lsb_minus4
        ue(1)      # max refs
        b(0, 1)    # gaps flag
        ue(mbs_w - 1)
        ue(mbs_h - 1)
        b(1, 1)    # frame_mbs_only
        b(0, 1)    # direct_8x8
        b(0, 1)    # no cropping
        b(0, 1)    # no VUI
        while len(bits) % 8:
            bits.append(0)
        out = bytearray([0x67])
        for i in range(0, len(bits), 8):
            byte = 0
            for bit in bits[i : i + 8]:
                byte = (byte << 1) | bit
            out.append(byte)
        return bytes(out)

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in it:
            ids, kinds, payloads, metas = [], [], [], []
            for did in pdf["doc_id"]:
                did = int(did)
                which = did % 5
                if which == 0:
                    payload = _mp3(4 + did % 8)
                    kind, codec = "audio", "mp3"
                elif which == 1:
                    payload = _webp(16 + did % 64, 16 + did % 48)
                    kind, codec = "image", "webp"
                elif which == 2:
                    payload = _mp4(
                        320 + 16 * (did % 8),
                        240 + 16 * (did % 4),
                        1000 + did % 9000,
                    )
                    kind, codec = "video", "h264"
                elif which == 3:
                    payload = _webm(
                        320 + 16 * (did % 10),
                        180 + 8 * (did % 10),
                        2000 + did % 8000,
                    )
                    kind, codec = "video", "vp9"
                else:
                    payload = _sps(2 + did % 8, 2 + did % 6)
                    kind, codec = "video", "h264"
                ids.append(did)
                kinds.append(kind)
                payloads.append(payload)
                metas.append(
                    {
                        "codec": codec,
                        "width": None,
                        "height": None,
                        "sample_rate": None,
                        "duration_ms": None,
                    }
                )
            yield pd.DataFrame(
                {"asset_id": ids, "kind": kinds, "payload": payloads, "meta": metas}
            )

    return documents.select("doc_id").mapInPandas(batches, schema=ASSET_SCHEMA)


def probe_media_features(assets: DataFrame) -> DataFrame:
    """REAL container-metadata extraction for the stubbed-codec formats
    (``functions/mediainfo.py``): dims / duration / rate / frame count
    straight from mp3 frame headers, WEBP chunks and BMFF boxes — the
    filter pass a training pipeline runs BEFORE paying for any decode.
    Unprobeable payloads yield null-feature rows (DLQ contract)."""

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        from pg_logical_replication_spark.functions.mediainfo import (
            h264_sps_info,
            mp3_info,
            mp4_info,
            webm_info,
            webp_info,
        )

        for pdf in it:
            rows = []
            for aid, buf in zip(pdf["asset_id"], pdf["payload"]):
                b = bytes(buf)
                row = None
                try:
                    if b[:4] == b"RIFF" and b[8:12] == b"WEBP":
                        w = webp_info(b)
                        row = (aid, "webp", w["width"], w["height"],
                               None, None, None)
                    elif len(b) > 8 and b[4:8] == b"ftyp":
                        m = mp4_info(b)
                        t0 = next(
                            (t for t in m["tracks"] if "width" in t), {}
                        )
                        row = (aid, "mp4", t0.get("width"), t0.get("height"),
                               m.get("duration_ms"), None, None)
                    elif b[:4] == b"\x1a\x45\xdf\xa3":
                        m = webm_info(b)
                        t0 = next(
                            (t for t in m.get("tracks", []) if "width" in t),
                            {},
                        )
                        row = (aid, "webm", t0.get("width"), t0.get("height"),
                               m.get("duration_ms"), None, None)
                    elif b and (b[0] & 0x1F) == 7 and (b[0] >> 5) <= 3:
                        s = h264_sps_info(b)
                        row = (aid, "h264", s["width"], s["height"],
                               None, None, None)
                    else:
                        a = mp3_info(b)
                        row = (aid, "mp3", None, None, a["duration_ms"],
                               a["sample_rate"], a["n_frames"])
                except Exception:
                    row = (aid, None, None, None, None, None, None)
                rows.append(row)
            yield pd.DataFrame(
                rows,
                columns=[
                    "asset_id", "media_format", "width", "height",
                    "duration_ms", "sample_rate", "n_frames",
                ],
            )

    return assets.select("asset_id", "payload").mapInPandas(
        batches, schema=MEDIA_PROBE_SCHEMA
    )


def decode_features(assets: DataFrame, codec: str = "fake") -> DataFrame:
    """Per-asset decoded features via Arrow-batched ``mapInPandas``.

    Features are chosen to be DuckDB-mirrorable on the synthesized
    payloads: byte length, frame count (⌈bytes/32⌉), and ``hexmean`` —
    mean ASCII code of the payload's hex form (a stand-in for a pixel
    statistic that a real decoder would emit).
    """
    _require_fake(codec)

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in it:
            # null payloads (e.g. synthesized from a null source text)
            # yield null features, not a worker crash (review r2)
            payload = pdf["payload"]
            hexes = payload.map(lambda b: None if b is None else b.hex())
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "kind": pdf["kind"],
                    "n_bytes": payload.map(
                        lambda b: None if b is None else len(b)
                    ),
                    "n_frames": payload.map(
                        lambda b: None
                        if b is None
                        else (len(b) + FRAME_SIZE - 1) // FRAME_SIZE
                    ),
                    "hexmean": hexes.map(
                        lambda h: sum(map(ord, h)) / len(h) if h else None
                    ),
                }
            )

    return assets.mapInPandas(batches, schema=FEATURE_SCHEMA)


def sample_frames(
    assets: DataFrame, every_k: int = 2, codec: str = "fake"
) -> DataFrame:
    """Frame sampling: one asset row → rows for frames 0, k, 2k, …

    The one-to-many batch shape of a real video frame sampler; frames
    are fixed 32-byte synthetic GOPs. Keeps only narrow columns out.
    """
    if every_k < 1:
        raise ValueError("every_k must be >= 1")
    _require_fake(codec)

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in it:
            ids, idxs, sizes = [], [], []
            for aid, buf in zip(pdf["asset_id"], pdf["payload"]):
                if buf is None:
                    continue
                n = (len(buf) + FRAME_SIZE - 1) // FRAME_SIZE
                for i in range(0, n, every_k):
                    ids.append(aid)
                    idxs.append(i)
                    sizes.append(min(FRAME_SIZE, len(buf) - i * FRAME_SIZE))
            yield pd.DataFrame(
                {"asset_id": ids, "frame_idx": idxs, "frame_bytes": sizes}
            )

    return assets.filter(F.col("kind") == "video").mapInPandas(
        batches, schema=FRAME_SCHEMA
    )


def resize_images(
    assets: DataFrame, width: int, height: int, codec: str = "fake"
) -> DataFrame:
    """Image resize plumbing: payload → payload' with updated meta.

    Fake resize = truncate/cycle payload to width×height bytes (a real
    implementation decodes, interpolates, re-encodes — STUBBED; see
    ``_require_fake``). Output keeps ASSET_SCHEMA so stages compose.
    """
    _require_fake(codec)
    target = width * height

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            out = pdf.copy()
            out["payload"] = out["payload"].map(
                lambda b: b
                if b is None or not len(b)
                else (b * (target // len(b) + 1))[:target]
            )
            out["meta"] = out["meta"].map(
                lambda m: {**m, "width": width, "height": height}
            )
            yield out

    return assets.filter(F.col("kind") == "image").mapInPandas(
        batches, schema=ASSET_SCHEMA
    )


def synthesize_adpcm_assets(documents: DataFrame) -> DataFrame:
    """documents → REAL IMA-ADPCM WAVE payloads (functions/adpcm.py,
    fmt 0x0011, 68-byte blocks ⇒ 129 samples/block).

    Deterministic closed-form audio: n = 64 + doc_id % 200 samples at
    16000/8000 Hz (doc_id parity), sample[i] =
    ((doc_id·41 + i·97) mod 2001) − 1000. ADPCM is LOSSY, but every
    block's first sample is stored verbatim in the block header — the
    exact anchor the SQL oracle pins; the rest carries a bounded-error
    contract.
    """

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        from pg_logical_replication_spark.functions.adpcm import (
            encode_wav_adpcm,
        )

        for pdf in it:
            ids, kinds, payloads, metas = [], [], [], []
            for did in pdf["doc_id"]:
                did = int(did)
                n = 64 + did % 200
                rate = 16000 if did % 2 == 0 else 8000
                sig = [((did * 41 + i * 97) % 2001) - 1000 for i in range(n)]
                ids.append(did)
                kinds.append("audio")
                payloads.append(encode_wav_adpcm(sig, rate, block_align=68))
                metas.append(
                    {
                        "codec": "adpcm",
                        "width": None,
                        "height": None,
                        "sample_rate": rate,
                        "duration_ms": (n * 1000) // rate,
                    }
                )
            yield pd.DataFrame(
                {"asset_id": ids, "kind": kinds, "payload": payloads, "meta": metas}
            )

    return documents.select("doc_id").mapInPandas(batches, schema=ASSET_SCHEMA)


ADPCM_FEATURE_SCHEMA = (
    "asset_id bigint, sample_rate int, n_samples int, n_blocks int, "
    "first_sample int, sum_block_preds bigint, err_ok boolean"
)


def decode_adpcm_features(assets: DataFrame) -> DataFrame:
    """REAL IMA-ADPCM decode per asset: RIFF walk, fmt 0x0011 check,
    per-block header + nibble expansion (functions/adpcm.py), then
    structural stats (rate / counts / block predictors — exact) and the
    bounded-error contract |decoded−synth| ≤ 4095, mean ≤ 512 against
    the known closed-form signal. Undecodable payloads yield
    null-feature rows.
    """

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        from pg_logical_replication_spark.functions.adpcm import (
            decode_wav_adpcm,
        )

        spb = (68 - 4) * 2 + 1
        for pdf in it:
            rows = []
            for aid, buf in zip(pdf["asset_id"], pdf["payload"]):
                try:
                    aid = int(aid)
                    rate, dec, nb = decode_wav_adpcm(bytes(buf))
                    n = len(dec)
                    sig = [
                        ((aid * 41 + i * 97) % 2001) - 1000 for i in range(n)
                    ]
                    errs = [abs(a - b) for a, b in zip(sig, dec)]
                    rows.append(
                        (
                            aid,
                            rate,
                            n,
                            nb,
                            dec[0],
                            sum(dec[b * spb] for b in range(nb)),
                            max(errs) <= 4095 and sum(errs) <= 512 * n,
                        )
                    )
                except Exception:
                    rows.append((aid, None, None, None, None, None, None))
            yield pd.DataFrame(
                rows,
                columns=[
                    "asset_id", "sample_rate", "n_samples", "n_blocks",
                    "first_sample", "sum_block_preds", "err_ok",
                ],
            )

    return assets.select("asset_id", "payload").mapInPandas(
        batches, schema=ADPCM_FEATURE_SCHEMA
    )


SHARD_SCHEMA = (
    "shard_id bigint, n_members int, total_payload_bytes bigint, "
    "tar_bytes bigint, payload binary, members_ok boolean"
)


def pack_tar_shards(
    documents: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    docs_per_shard: int = 50,
) -> DataFrame:
    """Corpus → WebDataset-style tar training shards — the standard
    EXPORT container for large-scale (multimodal) training data: one
    uncompressed POSIX tar per shard, members keyed ``<doc_id:012d>.txt``
    in doc order, deterministic bytes (mtime=0).

    Shard assignment is ``doc_id DIV docs_per_shard`` — sequential
    locality like webdataset's ``shard-%06d.tar`` convention — so the
    ONE shuffle co-locates each shard's members; the tar assembly is
    Arrow-batched Python per shard group (binary emission has no JVM
    expression form). Before emitting, each shard RE-ENUMERATES its own
    tar (stdlib tarfile) and checks names/sizes round-trip
    (``members_ok``) — the write path is verified by the read path.

    The tar byte size is structurally determined (512-byte header +
    512-padded body per member + 1024 end-of-archive, blocked to
    10240), so the oracle pins ``tar_bytes`` exactly without parsing a
    tar: any framing bug changes the length.
    """
    import pandas as pd  # noqa: F401

    def build(pdf: "pd.DataFrame") -> "pd.DataFrame":
        import io
        import tarfile

        import pandas as pd

        pdf = pdf.sort_values("__id")
        sid = int(pdf["__sid"].iloc[0])
        members = [
            (f"{int(i):012d}.txt", str(t).encode("utf-8"))
            for i, t in zip(pdf["__id"], pdf["__text"])
        ]
        raw = io.BytesIO()
        with tarfile.open(fileobj=raw, mode="w") as tf:
            for name, body in members:
                info = tarfile.TarInfo(name)
                info.size = len(body)
                info.mtime = 0
                tf.addfile(info, io.BytesIO(body))
        blob = raw.getvalue()
        back = []
        with tarfile.open(fileobj=io.BytesIO(blob), mode="r") as tf:
            for m in tf.getmembers():
                back.append((m.name, m.size))
        ok = back == [(n, len(b)) for n, b in members]
        return pd.DataFrame(
            [
                (
                    sid,
                    len(members),
                    sum(len(b) for _, b in members),
                    len(blob),
                    blob,
                    ok,
                )
            ],
            columns=[
                "shard_id", "n_members", "total_payload_bytes",
                "tar_bytes", "payload", "members_ok",
            ],
        )

    base = documents.select(
        F.col(id_col).alias("__id"),
        F.col(text_col).alias("__text"),
        F.expr(f"{id_col} DIV {docs_per_shard}").alias("__sid"),
    )
    return base.groupBy("__sid").applyInPandas(build, schema=SHARD_SCHEMA)


def synthesize_bmp_assets(documents: DataFrame) -> DataFrame:
    """documents → REAL BMP payloads (functions/bmp.py), cycling the
    profile by doc_id % 3: 8-bit paletted raw, 24-bit BGR, 8-bit RLE8.
    Closed-form pixels: w = 8 + doc_id % 16, h = 8 + doc_id % 8,
    pixel[i] = (doc_id·29 + i·11) mod 256.
    """

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        from pg_logical_replication_spark.functions.bmp import encode_bmp

        for pdf in it:
            ids, kinds, payloads, metas = [], [], [], []
            for did in pdf["doc_id"]:
                did = int(did)
                w, h = 8 + did % 16, 8 + did % 8
                px = [(did * 29 + i * 11) % 256 for i in range(w * h)]
                mode = did % 3
                payloads.append(
                    encode_bmp(
                        w, h, px,
                        bits=24 if mode == 1 else 8,
                        rle=mode == 2,
                    )
                )
                ids.append(did)
                kinds.append("image")
                metas.append(
                    {
                        "codec": "bmp",
                        "width": w,
                        "height": h,
                        "sample_rate": None,
                        "duration_ms": None,
                    }
                )
            yield pd.DataFrame(
                {"asset_id": ids, "kind": kinds, "payload": payloads, "meta": metas}
            )

    return documents.select("doc_id").mapInPandas(batches, schema=ASSET_SCHEMA)


BMP_FEATURE_SCHEMA = (
    "asset_id bigint, width int, height int, bits int, rle boolean, "
    "n_pixels int, mean_pixel double"
)


def decode_bmp_features(assets: DataFrame) -> DataFrame:
    """REAL BMP decode per asset (header walk, bottom-up rows, padding,
    palette/truecolor/RLE8) → dims + profile + mean pixel; undecodable
    payloads yield null-feature rows."""

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import struct as _struct

        import pandas as pd

        from pg_logical_replication_spark.functions.bmp import decode_bmp

        for pdf in it:
            rows = []
            for aid, buf in zip(pdf["asset_id"], pdf["payload"]):
                try:
                    data = bytes(buf)
                    w, h, px = decode_bmp(data)
                    bits, comp = _struct.unpack("<HI", data[28:34])
                    rows.append(
                        (
                            int(aid), w, h, bits, comp == 1, len(px),
                            round(sum(px) / len(px), 6),
                        )
                    )
                except Exception:
                    rows.append(
                        (int(aid), None, None, None, None, None, None)
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "asset_id", "width", "height", "bits", "rle",
                    "n_pixels", "mean_pixel",
                ],
            )

    return assets.select("asset_id", "payload").mapInPandas(
        batches, schema=BMP_FEATURE_SCHEMA
    )


def wav_frame_energies(assets: DataFrame, frame: int = 32) -> DataFrame:
    """(asset_id, frame_idx, energy) — per-window integer PCM energy
    (Σ sample²) from REAL WAV decode. Python touches bytes only for the
    codec (Arrow-batched); everything downstream is Catalyst."""

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import io
        import wave

        import numpy as np
        import pandas as pd

        for pdf in it:
            aids, fidxs, ens = [], [], []
            for aid, buf in zip(pdf["asset_id"], pdf["payload"]):
                r = wave.open(io.BytesIO(bytes(buf)), "rb")
                n = r.getnframes()
                if n == 0:
                    continue
                # vectorized window energies (optimization r11, guide
                # §4.2): int16 → int64 squares, per-window sums via
                # reduceat — exact (Σ of ≤256 squares ≤ 2.8e11 ≪ 2^63),
                # value-identical to the per-sample Python loop
                s = np.frombuffer(
                    r.readframes(n), dtype="<i2"
                ).astype(np.int64)
                en = np.add.reduceat(s * s, np.arange(0, n, frame))
                aids.append(np.full(len(en), int(aid), dtype=np.int64))
                fidxs.append(np.arange(len(en), dtype=np.int32))
                ens.append(en)
            if not aids:
                continue
            yield pd.DataFrame(
                {
                    "asset_id": np.concatenate(aids),
                    "frame_idx": np.concatenate(fidxs),
                    "energy": np.concatenate(ens),
                }
            )

    return assets.select("asset_id", "payload").mapInPandas(
        batches, schema="asset_id long, frame_idx int, energy long"
    )


def wav_vad_segments(
    assets: DataFrame,
    frame: int = 32,
    threshold_num: int = 1,
    threshold_den: int = 4,
) -> DataFrame:
    """Energy-threshold voice-activity segmentation — the silence-trim
    / utterance-split pass a speech-corpus pipeline runs before ASR or
    TTS training: a frame is VOICED when its energy reaches
    ``threshold_num/threshold_den`` of the asset's loudest frame
    (integer cross-multiplied — exact), and voiced frames group into
    maximal contiguous segments via the gaps-and-islands rule
    (frame_idx − ROW_NUMBER over voiced frames).

    Per asset: n_frames, n_voiced, n_segments, longest_segment,
    first_voiced_frame. Decode is the only Python (codec necessity);
    thresholding, islands, and rollup are whole-stage-codegen SQL —
    the shape that scales to a million-hour corpus (everything keys on
    asset_id; segments never leave the executors).

    Single-pass shape (optimization r11, guide §2.4): the former
    groupBy-max + join-back + row_number-over-voiced + left-join rollup
    referenced the decode subtree THREE times — Catalyst does not share
    common subplans across joins, so the Python synthesize+decode
    lineage executed once per branch. The max threshold is now a window
    over asset_id, the islands rank a running count of voiced frames
    (identical to row_number over the voiced-only rows), unvoiced rows
    fold into one NULL island per asset, and the two-level aggregate
    derives every output — one evaluation of the decode, one exchange,
    rows and values identical (the NULL-island bookkeeping reproduces
    the left-join's zero/NULL fields for assets with no voiced frame).
    """
    from pyspark.sql import Window

    en = wav_frame_energies(assets, frame)
    wa = Window.partitionBy("asset_id")
    run = (
        Window.partitionBy("asset_id")
        .orderBy("frame_idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    is_voiced = (
        F.col("energy") * threshold_den
        >= F.max("energy").over(wa) * threshold_num
    )
    marked = (
        en.withColumn("_v", is_voiced)
        .withColumn(
            "_grp",
            F.when(
                F.col("_v"),
                F.col("frame_idx")
                - F.sum(F.col("_v").cast("int")).over(run),
            ),
        )
    )
    islands = marked.groupBy("asset_id", "_grp").agg(
        F.count("*").alias("_n"),
        F.min("frame_idx").alias("_start"),
    )
    seg_n = F.when(F.col("_grp").isNotNull(), F.col("_n"))
    return islands.groupBy("asset_id").agg(
        F.sum("_n").cast("int").alias("n_frames"),
        F.coalesce(F.sum(seg_n), F.lit(0)).cast("int").alias("n_voiced"),
        F.count(F.col("_grp")).cast("int").alias("n_segments"),
        F.coalesce(F.max(seg_n), F.lit(0)).cast("int").alias(
            "longest_segment"
        ),
        F.min(F.when(F.col("_grp").isNotNull(), F.col("_start")))
        .cast("int")
        .alias("first_voiced_frame"),
    )


def synthesize_g711_assets(documents: DataFrame) -> DataFrame:
    """documents → REAL G.711 telephone-audio payloads
    (``functions/g711.py``): RIFF/WAVE with format tag 7 (μ-law, even
    doc_id) or 6 (A-law, odd doc_id) at 8 kHz — the container every
    telephone-speech corpus (Switchboard/Fisher) ships in.

    Closed-form source signal: n = 64 + doc_id % 192 samples,
    sample[i] = ((doc_id·43 + i·89) mod 2001) − 1000. G.711 companding
    is memoryless integer arithmetic, so the SQL oracle replays the
    LOSSY decode(encode(s)) round-trip exactly.
    """
    from pg_logical_replication_spark.functions.g711 import encode_wav_g711

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in it:
            ids, kinds, payloads, metas = [], [], [], []
            for did in pdf["doc_id"]:
                did = int(did)
                n = 64 + did % 192
                law = "ulaw" if did % 2 == 0 else "alaw"
                samples = [((did * 43 + i * 89) % 2001) - 1000 for i in range(n)]
                ids.append(did)
                kinds.append("audio")
                payloads.append(encode_wav_g711(samples, 8000, law))
                metas.append(
                    {
                        "codec": law,
                        "width": None,
                        "height": None,
                        "sample_rate": 8000,
                        "duration_ms": (n * 1000) // 8000,
                    }
                )
            yield pd.DataFrame(
                {"asset_id": ids, "kind": kinds, "payload": payloads, "meta": metas}
            )

    return documents.select("doc_id").mapInPandas(batches, schema=ASSET_SCHEMA)


def g711_decode_features(assets: DataFrame) -> DataFrame:
    """REAL G.711 decode executor-side: per asset the recovered-PCM
    statistics (law, rate, count, sum, max |sample|) — every value
    integer-exact against the closed-form companding oracle."""
    from pg_logical_replication_spark.functions.g711 import decode_wav_g711

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in it:
            rows = []
            for aid, buf in zip(pdf["asset_id"], pdf["payload"]):
                samples, rate, law = decode_wav_g711(bytes(buf))
                rows.append(
                    (
                        aid,
                        law,
                        rate,
                        len(samples),
                        sum(samples),
                        max(abs(s) for s in samples),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "asset_id", "law", "sample_rate", "n_samples",
                    "sum_decoded", "max_abs_decoded",
                ],
            )

    return assets.select("asset_id", "payload").mapInPandas(
        batches,
        schema="asset_id long, law string, sample_rate int, "
        "n_samples int, sum_decoded long, max_abs_decoded long",
    )


def png_pixels(assets: DataFrame) -> DataFrame:
    """REAL PNG decode returning the raw greyscale pixel array —
    the bridge from codec-Python to Catalyst image analytics: every
    downstream pixel computation (perceptual hashing, downsampling,
    histogram) stays in whole-stage-codegen SQL over ``array<int>``."""

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        from pg_logical_replication_spark.functions.png import decode_png

        for pdf in it:
            rows = []
            for aid, buf in zip(pdf["asset_id"], pdf["payload"]):
                w, h, _ch, px = decode_png(bytes(buf))
                rows.append((aid, w, h, list(px)))
            yield pd.DataFrame(
                rows, columns=["asset_id", "width", "height", "pixels"]
            )

    return assets.select("asset_id", "payload").mapInPandas(
        batches,
        schema="asset_id long, width int, height int, pixels array<int>",
    )


def image_grid_expr(
    pixel_col: str = "pixels", w_col: str = "width", h_col: str = "height"
) -> str:
    """SQL for the 8×8 nearest-neighbor downsample grid (src row =
    r·h DIV 8, col = c·w DIV 8) as one ``array<bigint>`` of 64 samples.
    Callers MUST materialize this as its own projected column before
    referencing it repeatedly: inlining it into per-bit CASE arms makes
    the interpreted HOF re-evaluate the 64-element transform once per
    reference (~130× per row — measured 11.7 s vs 1.0 s for the same
    decode base before this split)."""
    return (
        f"transform(sequence(0, 63), k -> element_at({pixel_col}, "
        f"CAST((k DIV 8) * {h_col} DIV 8 AS INT) * {w_col} + "
        f"CAST((k % 8) * {w_col} DIV 8 AS INT) + 1))"
    )


def image_ahash_words(
    grid_col: str = "ahash_grid", total_col: str = "ahash_total"
) -> tuple["Column", "Column"]:
    """Average-hash (aHash — the classic perceptual-hash family member)
    as pure SQL over a MATERIALIZED 64-sample grid column and its
    precomputed sum: set bit (r·8+c) when the sample exceeds the
    64-sample mean — exact integer comparison ``p·64 > Σ`` — and pack
    into two 32-bit words (the BQ trick: carry-free power-of-two sums,
    XOR+popcount-ready). ``grid_col``/``total_col`` are plain attribute
    references here, so each word costs 32 array reads, not 32 grid
    recomputes; build them with :func:`image_grid_expr` first."""

    def word(lo: int) -> "Column":
        return F.expr(
            f"aggregate(sequence({lo}, {lo + 31}), 0L, (a, k) -> a + "
            f"(CASE WHEN element_at({grid_col}, k + 1) * 64 > {total_col} "
            f"THEN shiftleft(1L, k - {lo}) ELSE 0L END))"
        )

    return word(0), word(32)


def image_ahash_dedup(assets: DataFrame) -> DataFrame:
    """Perceptual-duplicate groups by aHash: decode (codec Python),
    hash + group (Catalyst). Output one row per hash with >1 image —
    the image twin of ``exact_dedup``: only 16-byte hash words
    shuffle, never pixels. The grid and its sum are projected as real
    columns in two steps (CollapseProject keeps non-cheap producers
    referenced >1× un-inlined), so the 64-element downsample runs once
    per row instead of once per CASE arm."""
    px = png_pixels(assets)
    grid = px.select(
        "asset_id", F.expr(image_grid_expr()).alias("ahash_grid")
    )
    grid = grid.select(
        "asset_id",
        "ahash_grid",
        F.expr("aggregate(ahash_grid, 0L, (a, x) -> a + x)").alias(
            "ahash_total"
        ),
    )
    w0, w1 = image_ahash_words()
    hashed = grid.select(
        "asset_id", w0.alias("hash_w0"), w1.alias("hash_w1")
    )
    return (
        hashed.groupBy("hash_w0", "hash_w1")
        .agg(
            F.count("*").cast("long").alias("n_images"),
            F.min("asset_id").alias("representative_id"),
        )
        .where(F.col("n_images") > 1)
    )


def image_grid9_expr(
    pixel_col: str = "pixels", w_col: str = "width", h_col: str = "height"
) -> str:
    """9-column × 8-row nearest-neighbor sample grid for dHash as one
    ``array<bigint>`` of 72 values, row-major (sample(r, c) =
    grid9[r·9 + c + 1]). Materialized once per row like
    :func:`image_grid_expr` — the inlined form evaluated 2 samples per
    bit (128 element_at + index arithmetic per row); here adjacent
    bits SHARE the 72 samples and the words read plain array cells."""
    return (
        f"transform(sequence(0, 71), k -> element_at({pixel_col}, "
        f"CAST((k DIV 9) * {h_col} DIV 8 AS INT) * {w_col} + "
        f"CAST((k % 9) * {w_col} DIV 9 AS INT) + 1))"
    )


def image_dhash_words(
    grid_col: str = "dhash_grid",
) -> tuple["Column", "Column"]:
    """Difference-hash (dHash): bit (r·8+c) set when grid9[r][c] is
    strictly brighter than its right neighbour grid9[r][c+1] —
    gradient structure, robust to global brightness shifts where aHash
    is not. Same carry-free two-word pack as :func:`image_ahash_words`;
    operates on the MATERIALIZED :func:`image_grid9_expr` column (bit
    k compares cells k DIV 8 · 9 + k % 8 and +1)."""

    def cell(off: int) -> str:
        # DIV yields BIGINT; element_at's index must be INT
        return (
            f"element_at({grid_col}, "
            f"CAST((k DIV 8) * 9 + (k % 8) + {off + 1} AS INT))"
        )

    def word(lo: int) -> "Column":
        return F.expr(
            f"aggregate(sequence({lo}, {lo + 31}), 0L, (a, k) -> a + "
            f"(CASE WHEN {cell(0)} > {cell(1)} "
            f"THEN shiftleft(1L, k - {lo}) ELSE 0L END))"
        )

    return word(0), word(32)


def image_dhash_pairs(assets: DataFrame, max_hamming: int = 6) -> DataFrame:
    """NEAR-duplicate image pairs by dHash: band each 64-bit hash into
    four 16-bit keys, candidate pairs agree on >= 1 band (the LSH
    guarantee: hamming <= 3 pairs ALWAYS share a clean band; <= 6
    usually), then exact XOR+popcount Hamming gates the candidates.
    Only hash words shuffle; the band join is the same inverted-index
    shape as MinHash-LSH."""
    px = png_pixels(assets)
    grid = px.select(
        "asset_id", F.expr(image_grid9_expr()).alias("dhash_grid")
    )
    w0, w1 = image_dhash_words()
    hashed = grid.select(
        F.col("asset_id"), w0.alias("hw0"), w1.alias("hw1")
    )
    bands = hashed.select(
        "asset_id",
        "hw0",
        "hw1",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band_idx"),
                        F.expr(e).alias("band_val"),
                    )
                    for i, e in enumerate(
                        (
                            "hw0 & 65535",
                            "shiftright(hw0, 16) & 65535",
                            "hw1 & 65535",
                            "shiftright(hw1, 16) & 65535",
                        )
                    )
                ]
            )
        ).alias("b"),
    ).select("asset_id", "hw0", "hw1", "b.band_idx", "b.band_val")
    a = bands.select(
        F.col("band_idx"),
        F.col("band_val"),
        F.col("asset_id").alias("a_id"),
        F.col("hw0").alias("a0"),
        F.col("hw1").alias("a1"),
    )
    b = bands.select(
        F.col("band_idx").alias("band_idx_b"),
        F.col("band_val").alias("band_val_b"),
        F.col("asset_id").alias("b_id"),
        F.col("hw0").alias("b0"),
        F.col("hw1").alias("b1"),
    )
    cand = (
        a.join(
            b,
            (a.band_idx == b.band_idx_b)
            & (a.band_val == b.band_val_b)
            & (a.a_id < b.b_id),
        )
        .select("a_id", "b_id", "a0", "a1", "b0", "b1")
        .distinct()
    )
    ham = (
        F.bit_count(F.expr("a0 ^ b0")) + F.bit_count(F.expr("a1 ^ b1"))
    ).cast("int")
    return (
        cand.select("a_id", "b_id", ham.alias("hamming"))
        .where(F.col("hamming") <= max_hamming)
    )


def synthesize_ogg_assets(documents: DataFrame) -> DataFrame:
    """documents → spec-valid Ogg streams (``functions/ogg.py``):
    Vorbis (even doc_id, 44100 Hz) or Opus (odd, 48000 Hz), channels =
    1 + doc_id%2, 2 + doc_id%5 data pages of 4800 samples each —
    every probed fact closed-form."""
    from pg_logical_replication_spark.functions.ogg import encode_ogg_stream

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in it:
            ids, kinds, payloads, metas = [], [], [], []
            for did in pdf["doc_id"]:
                did = int(did)
                codec = "vorbis" if did % 2 == 0 else "opus"
                rate = 44100 if codec == "vorbis" else 48000
                ch = 1 + did % 2
                n = 2 + did % 5
                ids.append(did)
                kinds.append("audio")
                payloads.append(
                    encode_ogg_stream(codec, ch, rate, n, 4800,
                                      serial=did + 1)
                )
                metas.append(
                    {
                        "codec": codec,
                        "width": None,
                        "height": None,
                        "sample_rate": rate,
                        "duration_ms": (n * 4800 * 1000) // rate,
                    }
                )
            yield pd.DataFrame(
                {"asset_id": ids, "kind": kinds, "payload": payloads, "meta": metas}
            )

    return documents.select("doc_id").mapInPandas(batches, schema=ASSET_SCHEMA)


def probe_ogg_features(assets: DataFrame) -> DataFrame:
    """REAL Ogg page walk executor-side (capture pattern + page CRC
    verified, first packet reassembled from lacing values): codec,
    channels, rate, page count, duration — the filter-before-decode
    pass for the web's free-audio container."""
    from pg_logical_replication_spark.functions.ogg import probe_ogg

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in it:
            rows = []
            for aid, buf in zip(pdf["asset_id"], pdf["payload"]):
                info = probe_ogg(bytes(buf))
                rows.append(
                    (
                        aid,
                        info["codec_name"],
                        info["channels"],
                        info["sample_rate"],
                        info["n_pages"],
                        info["duration_ms"],
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "asset_id", "codec_name", "channels", "sample_rate",
                    "n_pages", "duration_ms",
                ],
            )

    return assets.select("asset_id", "payload").mapInPandas(
        batches,
        schema="asset_id long, codec_name string, channels int, "
        "sample_rate int, n_pages int, duration_ms long",
    )


def wav_robust_fingerprint(
    assets: DataFrame, bands: int = 4, band_samples: int = 8
) -> DataFrame:
    """Haitsma-Kalker-style robust audio hash (Philips, ISMIR 2002: "A
    Highly Robust Audio Fingerprinting System") over REAL decoded PCM —
    the perceptual near-dup primitive for audio corpora, the audio
    sibling of aHash/dHash for images.

    Classic HK takes 32 FFT sub-bands; this integer-exact variant takes
    ``bands`` consecutive TIME sub-blocks of ``band_samples`` samples
    per frame and emits, per frame n ≥ 1, one bit per adjacent band
    pair m: ``bit(n,m) = [ (E(n,m) − E(n,m+1)) − (E(n−1,m) −
    E(n−1,m+1)) > 0 ]`` — the sign of the energy
    difference-of-differences, HK's eq. (1) with time-domain energies
    so the whole hash is integer arithmetic an SQL oracle replays
    exactly (no FFT floats in the contract; a production variant swaps
    the energy projection for filter-bank outputs and keeps this exact
    shape).

    Per asset: ``n_frames`` (complete frames), ``n_fp_frames`` (hashed
    = frames with a predecessor), ``fp_ones`` (Σ set bits — the bit
    bias a matcher thresholds on), ``fp_checksum``
    (Σ frame_hash·(frame+1), exact BIGINT — pins every bit of the
    fingerprint). Decode is the only Python (Arrow-batched); band
    pivot, lag, sign bits and rollup are whole-stage-codegen SQL keyed
    on asset_id — embarrassingly parallel at a million-hour corpus.
    """
    if bands < 2:
        raise ValueError(
            f"bands must be >= 2 (each bit compares adjacent band pairs), "
            f"got {bands}"
        )
    if band_samples < 1:
        raise ValueError(f"band_samples must be >= 1, got {band_samples}")
    from pyspark.sql import Window

    # Single-pass shape (optimization r11, guide §2.4): the former
    # n_complete branch + left join re-evaluated the whole
    # synthesize+decode+pivot subtree a second time (Catalyst shares no
    # common subplans across joins). Frame 0 now stays in the stream
    # with a NULL predecessor instead of being filtered, every hash
    # contribution is conditioned on having one, and a single grouped
    # aggregate emits both the complete-frame count and the fingerprint
    # fields — one evaluation of the decode. The up-front repartition
    # on asset_id satisfies the (asset_id, frame) pivot, the lag window
    # AND the final rollup (hash partitioning on a subset of the
    # grouping keys), so the whole chain runs on ONE exchange where the
    # join shape paid four.
    sub = wav_frame_energies(assets, band_samples).repartition("asset_id")
    piv = (
        sub.groupBy(
            "asset_id",
            F.expr(f"frame_idx div {bands}").alias("frame"),
        )
        .agg(
            F.count("*").alias("_nb"),
            *[
                F.max(
                    F.when(F.col("frame_idx") % bands == m, F.col("energy"))
                ).alias(f"e{m}")
                for m in range(bands)
            ],
        )
        .where(F.col("_nb") == bands)  # complete frames only (tail drops)
    )
    w = Window.partitionBy("asset_id").orderBy("frame")
    lagged = piv.select(
        "asset_id",
        "frame",
        *[F.col(f"e{m}") for m in range(bands)],
        *[F.lag(f"e{m}").over(w).alias(f"p{m}") for m in range(bands)],
    )
    h = None
    for m in range(bands - 1):
        bit = (
            (F.col(f"e{m}") - F.col(f"e{m+1}"))
            - (F.col(f"p{m}") - F.col(f"p{m+1}"))
            > 0
        ).cast("long") * (1 << (bands - 2 - m))
        h = bit if h is None else h + bit
    hashed = lagged.select(
        "asset_id",
        "frame",
        F.col("p0").isNotNull().alias("_hp"),
        h.alias("h"),
    )
    ones = sum(
        (F.expr(f"(h div {1 << b}) % 2") for b in range(bands - 1)),
        F.lit(0),
    )
    return hashed.groupBy("asset_id").agg(
        F.count("*").cast("int").alias("n_frames"),
        F.count_if(F.col("_hp")).cast("int").alias("n_fp_frames"),
        F.coalesce(F.sum(F.when(F.col("_hp"), ones)), F.lit(0))
        .cast("long")
        .alias("fp_ones"),
        F.coalesce(
            F.sum(F.when(F.col("_hp"), F.col("h") * (F.col("frame") + 1))),
            F.lit(0),
        )
        .cast("long")
        .alias("fp_checksum"),
    )
