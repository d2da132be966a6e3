"""Transaction framing: attach xid / commit_ts to DML rows by wire order.

The reference's stream is transactionally framed — every committed txn
arrives as ``begin → changes* → commit`` (asserted at
``decoder-pgoutput.spec.ts:260-272``); pgoutput carries xid only on Begin
and test_decoding only on BEGIN/COMMIT lines, so DML rows inherit their
transaction from position. Transactions are contiguous in wire order,
hence each DML belongs to the greatest ``begin.seq <= dml.seq`` — an
interval join against the begins set.

Scale: begins are one row per transaction (orders of magnitude smaller
than the stream). The ``lead()`` window runs over begins only; the
interval join broadcast-plans when begins fit memory, else AQE falls back
to a shuffled join — never a global sort of the full stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def assign_transactions(
    events: DataFrame,
    seq_col: str = "seq",
    attach_xid: bool = True,
    attach_ts: bool = True,
) -> DataFrame:
    """Fill xid and commit_ts on every row from its enclosing transaction.

    commit_ts is taken from whichever marker carries it: pgoutput puts the
    commit timestamp on Begin AND Commit (``pgoutput-parser.ts:54-73``),
    test_decoding only on COMMIT (``decoder.ts:17`` grammar trx_commit).

    ``attach_xid=False`` / ``attach_ts=False`` suppress the field in the
    OUTPUT (framing still runs internally — the ts fill joins by xid) —
    the consumer side of test_decoding's include-xids/include-timestamp
    option pushdown. Both off skips the framing joins entirely.
    """
    if not attach_xid and not attach_ts:
        return events.withColumn("xid", F.lit(None).cast("long")).withColumn(
            "commit_ts", F.lit(None).cast("timestamp")
        )
    begins = (
        events.filter(F.col("op") == "begin")
        .select(
            F.col(seq_col).alias("_bseq"),
            F.col("xid").alias("_bxid"),
            F.col("commit_ts").alias("_bts"),
        )
        .withColumn("_next_bseq", F.lead("_bseq").over(Window.orderBy("_bseq")))
    )
    seq_ref = events[seq_col]  # disambiguate: begins derives from events
    framed = (
        events.join(
            F.broadcast(begins),
            (seq_ref >= begins["_bseq"])
            & (begins["_next_bseq"].isNull() | (seq_ref < begins["_next_bseq"])),
            "left",
        )
        .withColumn("xid", F.coalesce("xid", "_bxid"))
        .withColumn("commit_ts", F.coalesce("commit_ts", "_bts"))
        .drop("_bseq", "_bxid", "_bts", "_next_bseq")
    )

    # commit-side timestamps (test_decoding): one row per xid, tiny.
    commits = (
        framed.filter(
            (F.col("op") == "commit")
            & F.col("xid").isNotNull()
            & F.col("commit_ts").isNotNull()
        )
        .select(F.col("xid").alias("_cxid"), F.col("commit_ts").alias("_cts"))
        .dropDuplicates(["_cxid"])
    )
    out = (
        framed.join(F.broadcast(commits), framed["xid"] == commits["_cxid"], "left")
        .withColumn("commit_ts", F.coalesce("commit_ts", "_cts"))
        .drop("_cxid", "_cts")
    )
    if not attach_xid:
        out = out.withColumn("xid", F.lit(None).cast("long"))
    if not attach_ts:
        out = out.withColumn("commit_ts", F.lit(None).cast("timestamp"))
    return out
