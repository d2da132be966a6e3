"""Streaming drift monitoring — CUSUM alarms on a live stream.

The batch change-point query (``q_events_cusum``) computes its mean
from the whole series; a LIVE monitor compares against a FIXED
reference mean (the "in-control" rate calibrated offline — exactly how
industrial CUSUM charts are deployed) and carries the cumulative sums
across micro-batches in ``applyInPandasWithState``. State per key is
two longs (upper and lower sums) — bounded forever.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql.streaming.state import GroupState


def _make_cusum(mean_ref: int, k: int, h: int):
    def _fold(key: tuple, pdfs: Iterator[pd.DataFrame], state: "GroupState"):
        (mkey,) = key
        s_hi, s_lo = state.get if state.exists else (0, 0)
        pdf = pd.concat(list(pdfs), ignore_index=True)
        if pdf.empty:
            return
        pdf = pdf.sort_values("ord")
        rows = []
        for _, r in pdf.iterrows():
            x = int(r["value"])
            s_hi = max(0, s_hi + x - mean_ref - k)
            s_lo = max(0, s_lo + mean_ref - x - k)
            if s_hi >= h or s_lo >= h:
                rows.append(
                    (
                        mkey,
                        int(r["ord"]),
                        x,
                        int(s_hi),
                        int(s_lo),
                        "high" if s_hi >= h else "low",
                    )
                )
                # alarm resets the chart, the standard restart rule
                s_hi, s_lo = 0, 0
        state.update((int(s_hi), int(s_lo)))
        if rows:
            yield pd.DataFrame(
                rows,
                columns=["key", "ord", "value", "s_hi", "s_lo", "direction"],
            )

    return _fold


def cusum_stream(
    stream: DataFrame,
    mean_ref: int,
    k: int,
    h: int,
    key_col: str = "key",
    value_col: str = "value",
    ord_col: str = "ord",
) -> DataFrame:
    """Two-sided CUSUM over a keyed value stream: emits one alarm row
    whenever the upper or lower cumulative sum crosses ``h`` (slack
    ``k``, reference mean ``mean_ref`` — all integers, exact), then
    resets that key's chart. Values fold in ``ord_col`` order within a
    micro-batch and carry across batches.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    df = stream.select(
        F.col(key_col).alias("key"),
        F.col(ord_col).cast("long").alias("ord"),
        F.col(value_col).cast("long").alias("value"),
    )
    return df.groupBy("key").applyInPandasWithState(
        _make_cusum(mean_ref, k, h),
        outputStructType=(
            "key string, ord long, value long, s_hi long, s_lo long, "
            "direction string"
        ),
        stateStructType="s_hi long, s_lo long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
