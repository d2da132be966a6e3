"""Streaming sequence packing — fill training windows from a LIVE
document stream.

The batch operator (``operators/packing.py``) packs each doc_id bucket
greedily in doc_id order. A stream cannot re-sort across micro-batches,
so the streaming twin packs in ARRIVAL order (sorted by doc_id WITHIN
each micro-batch) and carries each bucket's open bin across batches in
``applyInPandasWithState``: state = (next local bin, tokens already in
it, last seq) — O(1) per bucket, evicted never (buckets are bounded by
the id space, and an idle bucket holds three longs). When arrival order
equals doc_id order the stream packs bit-identically to the batch
operator (agreement test).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pg_logical_replication_spark.operators.dedup import tokens_expr
from pg_logical_replication_spark.operators.packing import BIN_STRIDE

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql.streaming.state import GroupState


def _make_pack(budget: int):
    def _pack(key: tuple, pdfs: Iterator[pd.DataFrame], state: "GroupState"):
        (bucket,) = key
        if state.exists:
            nbin, acc, seq = state.get
        else:
            nbin, acc, seq = -1, budget + 1, 0
        pdf = pd.concat(list(pdfs), ignore_index=True)
        if pdf.empty:
            return
        pdf = pdf.sort_values("doc_id")
        out_bin, out_seq = [], []
        for n in pdf["n_tokens"]:
            n = int(n)
            if acc + n > budget:
                nbin += 1
                acc = n
                seq = 0
            else:
                acc += n
                seq += 1
            out_bin.append(nbin)
            out_seq.append(seq)
        if nbin >= BIN_STRIDE:
            raise ValueError(
                f"pack_sequences_stream: bucket {bucket} exceeded the "
                f"{BIN_STRIDE} per-bucket bin band"
            )
        state.update((int(nbin), int(acc), int(seq)))
        yield pdf.assign(
            bin_id=pdf["bucket"] * BIN_STRIDE
            + pd.Series(out_bin, index=pdf.index),
            bin_seq=out_seq,
        )

    return _pack


def pack_sequences_stream(
    stream: DataFrame,
    budget: int = 512,
    bucket_size: int = 100,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Streaming twin of ``pack_sequences``: same greedy rule, same
    output schema; a bucket's open bin CONTINUES across micro-batches
    (a half-filled training window is not wasted at batch boundaries).
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    counted = stream.select(
        F.col(id_col).alias("doc_id"),
        F.size(tokens_expr(text_col)).cast("int").alias("n_tokens"),
        F.expr(f"{id_col} div {bucket_size}").alias("bucket"),
    )
    return counted.groupBy("bucket").applyInPandasWithState(
        _make_pack(budget),
        outputStructType=(
            "doc_id long, n_tokens int, bucket long, bin_id long, "
            "bin_seq int"
        ),
        stateStructType="nbin long, acc long, seq long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
