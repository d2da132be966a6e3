"""Streaming deduplication — the pipeline dedup family's streaming twin.

Batch dedup (operators/dedup.py) assumes the corpus is at rest; a live
ingest (CDC-fed document stream, crawler output) needs duplicates
dropped ACROSS micro-batches with bounded state. Spark 4's
``dropDuplicatesWithinWatermark`` is exactly that operator: state holds
one entry per key seen within the watermark horizon and is evicted as
event time advances — O(arrival-rate × horizon) state, not O(corpus).

Scale: the dedup key is the md5 digest (32 bytes), never the document
text — the same shuffle-digests-not-payloads rule as
``operators.dedup.exact_dedup``; at 100 TB/day the state store carries
only the horizon's digests, and eviction is what makes the operator
run forever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_exact_dedup(
    stream: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Drop exact-duplicate documents across micro-batches.

    Emits the FIRST arrival of each distinct ``text_col`` digest;
    re-arrivals within the watermark horizon are suppressed (exactly
    the at-least-once-ingest case: retried batches, crawler revisits).
    A duplicate arriving after the horizon re-emits — the documented
    bounded-state trade every streaming dedup makes.
    """
    return (
        stream.withColumn("_text_hash", F.md5(F.col(text_col)))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["_text_hash"])
        .drop("_text_hash")
    )


def minhash_bands_expr(
    text_col: str = "text",
    num_hashes: int = 8,
    band_size: int = 2,
    shingle_n: int = 3,
):
    """MinHash LSH band keys as ONE array expression — no aggregation.

    Same hash family and band fold as the batch path
    (``operators.dedup.minhash_signature`` / ``minhash_bands``:
    minhash_i = min(md5('<i>:'||shingle)), band = md5(mh_2b||mh_2b+1))
    but computed with ``array_min(transform(...))`` over the per-row
    shingle array instead of explode+groupBy. The batch form exists for
    100 TB-of-text scans (shuffle partial minima, not shingles); a
    STREAMING gate must stay single-stateful-operator, and a per-row
    expression keeps the only stateful op the dedup itself.
    Agreement with the batch signature is test-pinned.
    """
    from pg_logical_replication_spark.operators.dedup import (
        word_shingles_expr,
    )

    sh = word_shingles_expr(text_col, shingle_n)

    # NB: a `lambda s, i=i:` default-arg closure is WRONG here — pyspark
    # reads the lambda's arity, treats two parameters as the
    # (element, index) form, and binds the array index over the default
    def _mh(seed: int):
        prefix = F.lit(f"{seed}:")
        return F.array_min(
            F.transform(sh, lambda s: F.md5(F.concat(prefix, s)))
        )

    mh = [_mh(i) for i in range(num_hashes)]
    return F.array(
        *[
            F.struct(
                F.lit(b).alias("band_idx"),
                F.md5(
                    F.concat(*[mh[b * band_size + j] for j in range(band_size)])
                ).alias("band_key"),
            )
            for b in range(num_hashes // band_size)
        ]
    )


def stream_near_dup_gate(
    stream: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ts_col: str = "ts",
    watermark: str = "10 minutes",
    num_hashes: int = 8,
    band_size: int = 2,
    shingle_n: int = 3,
) -> DataFrame:
    """MinHash-LSH NEAR-duplicate gate across micro-batches — the
    streaming twin of ``minhash_candidate_pairs``: each document's band
    keys try to claim their (band_idx, band_key) slot; a slot already
    claimed within the watermark horizon is suppressed by
    ``dropDuplicatesWithinWatermark``. Downstream, a document that
    claims ALL its bands is novel; one that loses ANY band collided
    with an earlier near-duplicate (use :func:`near_dup_gate_rollup`
    per micro-batch — a document's bands always ride one batch, so the
    rollup needs no second stateful operator).

    State: one 32-byte key per claimed band within the horizon —
    O(rate × horizon × bands), evicted by event time, never O(corpus).
    """
    exploded = exploded_band_claims(
        stream, text_col, id_col, ts_col, num_hashes, band_size, shingle_n
    )
    return exploded.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        ["band_idx", "band_key"]
    )


def exploded_band_claims(
    stream: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ts_col: str = "ts",
    num_hashes: int = 8,
    band_size: int = 2,
    shingle_n: int = 3,
    id_out: str | None = None,
    ts_out: str | None = None,
) -> DataFrame:
    """The band-claim projection shared by :func:`stream_near_dup_gate`
    and its tws twin: (id, ts, band_idx, band_key) — one row per band
    per document, the key structure both gates claim on. ``id_out`` /
    ``ts_out`` rename the carried columns (the tws processor needs
    canonical names); the band struct fields stay the single source of
    truth here so the twins cannot silently diverge."""
    entries = minhash_bands_expr(text_col, num_hashes, band_size, shingle_n)
    id_out = id_out or id_col
    ts_out = ts_out or ts_col
    return stream.select(
        F.col(id_col).alias(id_out),
        F.col(ts_col).alias(ts_out),
        F.explode(entries).alias("e"),
    ).select(id_out, ts_out, "e.band_idx", "e.band_key")


def near_dup_gate_rollup(
    claimed: DataFrame, n_bands: int, id_col: str = "doc_id"
) -> DataFrame:
    """Per-document verdict over a micro-batch of claimed bands:
    novel ⇔ the document claimed all ``n_bands`` of its bands."""
    return claimed.groupBy(id_col).agg(
        F.count("*").cast("int").alias("n_claimed"),
        (F.count("*") == n_bands).alias("novel"),
    )
