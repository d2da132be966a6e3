"""Multimodal operators: schema/batch-shape/determinism tests plus the
codec-stub contract (real codecs raise, plumbing works on 'fake')."""

import pytest
from pyspark.sql import functions as F

from pg_logical_replication_spark.operators import multimodal as MM

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def assets(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    return MM.synthesize_assets(docs).cache()


def test_asset_schema_and_determinism(spark, assets):
    assert dict(assets.dtypes)["payload"] == "binary"
    assert dict(assets.dtypes)["meta"].startswith("struct<codec:string,width:int")
    row = assets.filter("asset_id = 3").first()
    # doc_id=3 → kind=image (3%3=0), payload = 4 sha256 digests = 128 B
    assert row["kind"] == "image" and len(row["payload"]) == 128
    # deterministic: same input → same bytes on re-run
    again = MM.synthesize_assets(
        spark.read.parquet(f"{SF}/documents.parquet")
    ).filter("asset_id = 3").first()
    assert again["payload"] == row["payload"]
    # image meta populated, audio/video fields null
    assert row["meta"]["width"] == 16 + 3 % 64 and row["meta"]["sample_rate"] is None


def test_decode_features_matches_payload(assets):
    feats = MM.decode_features(assets)
    joined = (
        feats.join(assets, "asset_id")
        .withColumn("real_bytes", F.length("payload"))
        .filter("n_bytes <> real_bytes")
    )
    assert joined.count() == 0
    f3 = feats.filter("asset_id = 3").first()
    assert f3["n_frames"] == 4 and 48 <= f3["hexmean"] <= 103  # hex chars 0-9a-f


def test_frame_sample_fanout(assets):
    frames = MM.sample_frames(assets, every_k=2)
    rows = frames.filter("asset_id = 5").collect()  # 5%3=2 → video, 2 frames
    assert [(r["frame_idx"], r["frame_bytes"]) for r in rows] == [(0, 32)]
    # every video asset yields ceil(n_frames/2) sampled frames
    got = frames.groupBy("asset_id").count()
    expect = assets.filter("kind = 'video'").select(
        "asset_id",
        F.ceil((F.ceil(F.length("payload") / 32) / 2)).cast("long").alias("want"),
    )
    assert got.join(expect, "asset_id").filter("count <> want").count() == 0
    assert frames.count() > 0


def test_resize_rewrites_payload_and_meta(assets):
    out = MM.resize_images(assets, width=8, height=8)
    assert dict(out.dtypes) == dict(assets.dtypes)  # composable stage
    bad = out.filter(
        (F.length("payload") != 64)
        | (F.col("meta.width") != 8)
        | (F.col("meta.height") != 8)
    )
    assert bad.count() == 0 and out.count() > 0


def test_real_codecs_are_stubbed(assets):
    for fn in (
        lambda: MM.decode_features(assets, codec="vp9"),
        lambda: MM.sample_frames(assets, codec="h264"),
        lambda: MM.resize_images(assets, 8, 8, codec="mp3"),
    ):
        with pytest.raises(NotImplementedError, match="STUB"):
            fn()
    # png, wav and jpeg are REAL now — the generic fake-codec stages
    # refuse them with a pointer at the real path, not a stub error
    with pytest.raises(ValueError, match="decode_png_features"):
        MM.decode_features(assets, codec="png")
    with pytest.raises(ValueError, match="decode_wav_features"):
        MM.decode_features(assets, codec="wav")
    with pytest.raises(ValueError, match="decode_jpeg_features"):
        MM.decode_features(assets, codec="jpeg")
    with pytest.raises(ValueError, match="decode_flac_features"):
        MM.decode_features(assets, codec="flac")
    with pytest.raises(ValueError, match="decode_webp_features"):
        MM.decode_features(assets, codec="webp")
    with pytest.raises(ValueError, match="unknown codec"):
        MM.decode_features(assets, codec="nope")
    with pytest.raises(ValueError):
        MM.sample_frames(assets, every_k=0)


def test_wav_codec_real_roundtrip(spark):
    """synthesize_wav_assets emits genuine RIFF/PCM containers (stdlib
    wave re-parses them) and decode_wav_features recovers the exact
    integer stats; corrupt payloads yield null-feature rows."""
    import io
    import wave

    docs = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    assets = MM.synthesize_wav_assets(docs)
    rows = {r["asset_id"]: r for r in assets.collect()}
    r0 = wave.open(io.BytesIO(bytes(rows[0]["payload"])), "rb")
    assert (r0.getnchannels(), r0.getsampwidth()) == (1, 2)
    assert r0.getframerate() == 16000 and rows[1]["meta"]["sample_rate"] == 8000

    feats = {r["asset_id"]: r for r in MM.decode_wav_features(assets).collect()}
    for did in range(6):
        n = 64 + did % 256
        assert feats[did]["n_samples"] == n
        want_sum = sum(abs(((did * 37 + i * 101) % 2001) - 1000) for i in range(n))
        assert feats[did]["sum_abs"] == want_sum

    bad = spark.createDataFrame(
        [(99, bytearray(b"RIFFgarbage"))], "asset_id long, payload binary"
    )
    out = MM.decode_wav_features(bad).first()
    assert out["sample_rate"] is None and out["sum_abs"] is None


def test_pack_tar_shards_roundtrips_through_tarfile(spark):
    """The shard writer's payload must be a valid POSIX tar whose
    members reproduce the input docs byte-for-byte, in doc order with
    zero-padded keys — and shard bytes must be deterministic across
    runs (mtime=0)."""
    import io
    import tarfile

    from pg_logical_replication_spark.operators.multimodal import (
        pack_tar_shards,
    )

    docs = spark.createDataFrame(
        [(i, f"text body {i} " + "x" * (i * 7 % 300)) for i in range(120)],
        "doc_id long, text string",
    )
    shards = {r["shard_id"]: r for r in pack_tar_shards(docs).collect()}
    assert sorted(shards) == [0, 1, 2]
    seen = {}
    for sid, r in shards.items():
        assert r["members_ok"]
        with tarfile.open(fileobj=io.BytesIO(bytes(r["payload"]))) as tf:
            names = []
            for m in tf.getmembers():
                body = tf.extractfile(m).read()
                names.append(m.name)
                seen[int(m.name.split(".")[0])] = body
            assert names == sorted(names)  # doc order within shard
        assert r["tar_bytes"] == len(bytes(r["payload"]))
    assert len(seen) == 120
    for i in range(120):
        assert seen[i].decode() == f"text body {i} " + "x" * (i * 7 % 300)
    again = {r["shard_id"]: bytes(r["payload"])
             for r in pack_tar_shards(docs).collect()}
    assert all(again[s] == bytes(shards[s]["payload"]) for s in shards)


def test_streaming_shard_export_via_foreach_batch(spark, tmp_path):
    """Live corpus ingestion → per-micro-batch tar shard export (the
    foreachBatch write-path pattern): each batch's documents pack into
    deterministic shards on executors, and the accumulated shard set
    must round-trip every streamed document exactly once."""
    import io
    import json
    import os
    import tarfile
    import time

    from pg_logical_replication_spark.operators.multimodal import (
        pack_tar_shards,
    )

    d = str(tmp_path / "docs")
    os.makedirs(d)
    for b in range(2):
        with open(os.path.join(d, f"b{b}.jsonl"), "w") as f:
            for i in range(b * 60, b * 60 + 60):
                f.write(json.dumps({"doc_id": i, "text": f"doc {i}"}) + "\n")

    shards = []
    stream = spark.readStream.schema("doc_id long, text string").option(
        "maxFilesPerTrigger", 1
    ).json(d)
    q = (
        stream.writeStream.foreachBatch(
            lambda df, _b: shards.extend(pack_tar_shards(df).collect())
        )
        .option("checkpointLocation", str(tmp_path / "cp"))
        .start()
    )
    try:
        deadline = time.monotonic() + 60
        while time.monotonic() < deadline:
            q.processAllAvailable()
            if sum(r["n_members"] for r in shards) >= 120:
                break
            time.sleep(0.2)
    finally:
        q.stop()

    seen = {}
    for r in shards:
        assert r["members_ok"]
        with tarfile.open(fileobj=io.BytesIO(bytes(r["payload"]))) as tf:
            for m in tf.getmembers():
                did = int(m.name.split(".")[0])
                assert did not in seen  # batches don't overlap shards
                seen[did] = tf.extractfile(m).read().decode()
    assert sorted(seen) == list(range(120))
    assert all(seen[i] == f"doc {i}" for i in range(120))


def test_codec_decode_runs_on_a_stream(spark, tmp_path):
    """Arrow-batched codec decode (mapInPandas) is stateless, so the
    SAME operator runs on a readStream of asset files — the live-ingest
    shape: bytes arrive, features come out, no batch/stream fork."""
    import os

    from pg_logical_replication_spark.operators.multimodal import (
        g711_decode_features, synthesize_g711_assets,
    )

    docs = spark.createDataFrame(
        [(i,) for i in range(12)], "doc_id long"
    )
    assets = synthesize_g711_assets(docs).select("asset_id", "payload")
    d = str(tmp_path / "assets")
    assets.write.mode("overwrite").parquet(d)
    want = {
        r["asset_id"]: (r["law"], r["n_samples"], r["sum_decoded"])
        for r in g711_decode_features(spark.read.parquet(d)).collect()
    }

    got = {}
    stream = spark.readStream.schema("asset_id long, payload binary").parquet(d)
    q = (
        g711_decode_features(stream)
        .writeStream.foreachBatch(
            lambda df, _b: got.update(
                {r["asset_id"]: (r["law"], r["n_samples"], r["sum_decoded"])
                 for r in df.collect()}
            )
        )
        .option("checkpointLocation", str(tmp_path / "cp"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(90)
    assert got == want and len(got) == 12


def test_wav_robust_fingerprint_invariance(spark):
    """Haitsma-Kalker robustness: identical audio → identical
    fingerprint; a 2x amplitude-scaled copy ALSO matches (all band
    energies scale by 4, so every difference-of-differences keeps its
    sign) — while a genuinely different signal does not."""
    import io
    import struct as _struct
    import wave

    from pg_logical_replication_spark.operators.multimodal import (
        wav_robust_fingerprint,
    )

    def wav(samples):
        buf = io.BytesIO()
        w = wave.open(buf, "wb")
        w.setnchannels(1); w.setsampwidth(2); w.setframerate(8000)
        w.writeframes(b"".join(_struct.pack("<h", s) for s in samples))
        w.close()
        return buf.getvalue()

    base = [((i * 31) % 997) - 498 for i in range(96)]     # 3 full frames
    scaled = [s * 2 for s in base]
    other = [((i * 17) % 997) - 498 for i in range(96)]
    assets = spark.createDataFrame(
        [(1, bytearray(wav(base))), (2, bytearray(wav(base))),
         (3, bytearray(wav(scaled))), (4, bytearray(wav(other)))],
        "asset_id long, payload binary",
    )
    out = {r["asset_id"]: r for r in wav_robust_fingerprint(assets).collect()}
    sig = lambda r: (r["n_frames"], r["n_fp_frames"], r["fp_ones"],
                     r["fp_checksum"])
    assert sig(out[1]) == sig(out[2])          # bit-identical copy
    assert sig(out[1]) == sig(out[3])          # amplitude-invariant
    assert out[1]["n_frames"] == 3 and out[1]["n_fp_frames"] == 2
    assert sig(out[4]) != sig(out[1])          # different content differs
