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
