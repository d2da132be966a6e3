"""CDC-layer queries over the driver's `events` table.

`events` is the CDC-shaped fixture (FIXTURES.md §4): `event_type` ≙ op,
`(ts, event_id)` ≙ LSN order, `user_id` ≙ key. These queries express the
reference's actual consumer surface — per-kind counts
(decoder-wal2json.spec.ts:40-42), apply-changes materialization, LSN
arithmetic — and push two decoders THROUGH the DuckDB oracle gate by
encoding events into wire format in-query and decoding with the engine.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pg_logical_replication_spark.model import lsn_long_expr, lsn_str_expr
from pg_logical_replication_spark.plans.registry import register, t, table_rows

_OP_CASE = (
    "CASE WHEN event_type = 'signup' THEN 'insert' "
    "WHEN event_type = 'error' THEN 'delete' ELSE 'update' END"
)


@register(
    "q_cdc_op_counts",
    "SELECT event_type AS op, COUNT(*) AS n FROM events GROUP BY event_type",
    "per-kind event counts — the reference's own consumer query "
    "(decoder-wal2json.spec.ts:40-42 filter(kind).length)",
)
def q_cdc_op_counts(spark, sf_dir):
    return (
        t(spark, sf_dir, "events")
        .groupBy(F.col("event_type").alias("op"))
        .agg(F.count("*").alias("n"))
    )


# Per-transaction seq-block wire layout shared by the streamed / 2PC /
# origin / mixed encoders (review r2 folded four hand-synchronized
# copies of these magic constants). ADVICE r1 history: 10k-wide blocks
# collided once a txn straddled 5+ Arrow batches (s>=4 hit the fate
# slots, s>=5 invaded the next txn's block) — _seg_base fails loudly
# instead of silently corrupting attribution.
_TXN_BLOCK = 1_000_000   # seq space per transaction
_SEG_WIDTH = 2000        # seq space per segment / frame within it
_MAX_SEGS = 499          # segments fit strictly below the fate slots
_FATE_A = 999_998        # secondary fate slot (e.g. subxact abort)
_FATE_B = 999_999        # primary fate slot (commit / abort / prepared)
_SUBXID_OFF = 1_000_000  # subtransaction xid offset from the top xid


def _seg_base(t: int, s: int) -> int:
    assert s < _MAX_SEGS, f"txn {t}: segment {s} overflows seq block"
    return t * _TXN_BLOCK + s * _SEG_WIDTH


def _rel_info(pgf, rel_buf: bytes, oid: int):
    """RelationInfo parsed back from an encode_relation buffer — the
    evolution fixtures hand decode_pgoutput a versioned registry built
    from the very 'R' buffers they just encoded (optimization r11),
    skipping the pre-scan collect that would only rediscover them."""
    tmp: dict = {}
    pgf.parse_message(bytes(rel_buf), tmp)
    return tmp[oid]


def _newest_per_user(spark, sf_dir, bound: str | None = None):
    """The latest_image twin over the raw events table: newest row per
    user (ts desc, event_id desc tie-break), 'error' rows acting as
    delete tombstones dropped. One definition serves apply/as-of/diff/
    checksum (review r2 folded four hand-synchronized copies). Returns
    the surviving full rows."""
    from pyspark.sql import Window as W

    ev = t(spark, sf_dir, "events")
    if bound:
        ev = ev.filter(F.col("ts") <= bound)
    # Rank-1 window, adjudicated in r11 (VERDICT r10 #2, same result as
    # operators/apply_changes.latest_image): the rn=1 filter plans as a
    # map-side partial WindowGroupLimit, so each task ships at most one
    # candidate per user — the r10 max_by(struct) form's shuffle
    # reduction without its slower struct-buffer SortAggregate pair
    # (scripts/r11_maxby_ab.py: window 13-19% faster in every regime).
    # The r10 projection stays (guide §2.3 "project before the
    # exchange"): the four consumers read only (user_id, event_type,
    # value) + the order key (ts, event_id) — keeping `props` out of
    # the scan and the shuffle.
    cols = ["event_id", "ts", "user_id", "event_type", "value"]
    ev = ev.select(*cols)
    w = W.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("event_type") != "error"))
        .drop("rn")
    )


@register(
    "q_cdc_apply_events",
    """
    SELECT user_id, event_type AS last_op, value AS last_value FROM (
      SELECT user_id, event_type, value,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events) WHERE rn = 1 AND event_type <> 'error'
    """,
    "apply-changes over the event stream: newest-per-key wins, "
    "'error' ≙ delete tombstone (operators/apply_changes.py semantics)",
)


def q_cdc_apply_events(spark, sf_dir):
    """Same per-key window as apply_changes.latest_image — one shuffle
    on the key, newest event wins, tombstones drop."""
    return _newest_per_user(spark, sf_dir).select(
        "user_id",
        F.col("event_type").alias("last_op"),
        F.col("value").alias("last_value"),
    )


@register(
    "q_cdc_asof_snapshot",
    """
    SELECT user_id, event_type AS last_op, value AS last_value FROM (
      SELECT user_id, event_type, value,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events WHERE ts <= TIMESTAMP '2024-01-16 00:00:00')
    WHERE rn = 1 AND event_type <> 'error'
    """,
    "table-as-of: snapshot reconstructed at a mid-stream position — the "
    "CDC-native time-travel query (streaming twin: "
    "MergeOnReadTable.snapshot(as_of_lsn), tests/test_streaming.py)",
)
def q_cdc_asof_snapshot(spark, sf_dir):
    """As-of = a pushed-down bound filter + the same newest-per-key
    window as apply_changes.latest_image. The bound reaches the parquet
    reader (PushedFilters), so a 100 TB history priced by time-partition
    pruning, not by scan."""
    return _newest_per_user(spark, sf_dir, bound="2024-01-16 00:00:00").select(
        "user_id",
        F.col("event_type").alias("last_op"),
        F.col("value").alias("last_value"),
    )


@register(
    "q_cdc_debezium_roundtrip",
    f"""
    SELECT {_OP_CASE} AS op,
           COUNT(*) AS n,
           CAST(SUM(event_id) AS BIGINT) AS sum_eid,
           CAST(SUM(event_id * 8 + 16) AS BIGINT) AS sum_lsn_long
    FROM events GROUP BY 1
    """,
    "Debezium-envelope ENCODE→DECODE round-trip: events serialized to "
    "the industry-standard CDC JSON (to_debezium), decoded by "
    "sources/debezium.py — the interop format consumers already speak",
)
def q_cdc_debezium_roundtrip(spark, sf_dir):

    from pg_logical_replication_spark.sources.debezium import decode_debezium

    ev = t(spark, sf_dir, "events")
    op = (
        F.when(F.col("event_type") == "signup", "c")
        .when(F.col("event_type") == "error", "d")
        .otherwise("u")
    )
    after = F.create_map(
        F.lit("event_id"), F.col("event_id").cast("string"),
        F.lit("user_id"), F.col("user_id").cast("string"),
    )
    raw = ev.select(
        F.to_json(
            F.struct(
                F.when(op == "d", after).alias("before"),
                F.when(op != "d", after).alias("after"),
                F.struct(
                    F.lit("public").alias("schema"),
                    F.lit("events").alias("table"),
                    (F.col("event_id") * 8 + 16).alias("lsn"),
                    F.col("event_id").alias("txId"),
                ).alias("source"),
                op.alias("op"),
                # ts may arrive as TIMESTAMP_NTZ (parquet isAdjustedToUTC=
                # false); session TZ is pinned UTC, so the cast is exact
                F.unix_millis(F.col("ts").cast("timestamp")).alias("ts_ms"),
            )
        ).alias("value")
    )
    decoded = decode_debezium(raw.repartition(spark.sparkContext.defaultParallelism))
    eid = F.coalesce(
        F.col("after").getItem("event_id"), F.col("before").getItem("event_id")
    ).cast("bigint")
    return decoded.groupBy("op").agg(
        F.count("*").alias("n"),
        F.sum(eid).alias("sum_eid"),
        F.sum("lsn_long").alias("sum_lsn_long"),
    )


@register(
    "q_cdc_snapshot_diff",
    """
    WITH snap AS (
      SELECT user_id, value FROM (
        SELECT user_id, event_type, value,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events) WHERE rn = 1 AND event_type <> 'error'),
    snap_old AS (
      SELECT user_id, value FROM (
        SELECT user_id, event_type, value,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE ts <= TIMESTAMP '2024-01-16 00:00:00')
      WHERE rn = 1 AND event_type <> 'error')
    SELECT CASE WHEN o.user_id IS NULL THEN 'insert'
                WHEN n.user_id IS NULL THEN 'delete'
                ELSE 'update' END AS op,
           COALESCE(o.user_id, n.user_id) AS user_id,
           o.value AS old_value, n.value AS new_value
    FROM snap_old o FULL OUTER JOIN snap n ON o.user_id = n.user_id
    WHERE o.user_id IS NULL OR n.user_id IS NULL
       OR o.value IS DISTINCT FROM n.value
    """,
    "reverse CDC: diff two as-of snapshots into the implied change set "
    "(insert/delete/update with old+new values)",
)
def q_cdc_snapshot_diff(spark, sf_dir):
    """operators.apply_changes.snapshot_diff over the mid-stream as-of
    state vs the final state — one full-outer key-aligned shuffle; at
    rest, bucketed snapshots diff with zero exchange."""
    from pyspark.sql import Window as W

    from pg_logical_replication_spark.operators.apply_changes import snapshot_diff

    def snap(bound=None):
        return _newest_per_user(spark, sf_dir, bound).select(
            "user_id", "value"
        )

    return snapshot_diff(
        snap("2024-01-16 00:00:00"), snap(), key_columns=["user_id"]
    ).select("op", "user_id", F.col("old_value"), F.col("new_value"))


@register(
    "q_cdc_wal2json_v2_roundtrip",
    f"""
    SELECT {_OP_CASE} AS op,
           COUNT(*) AS n,
           CAST(SUM(event_id) AS BIGINT) AS sum_eid,
           CAST(SUM(event_id * 8 + 16) AS BIGINT) AS sum_lsn_long
    FROM events GROUP BY 1
    """,
    "wal2json format-version 2 ENCODE→DECODE round-trip (one JSON per "
    "action, columns/identity entry arrays) — same oracle as v1, proving "
    "the two format paths agree end-to-end",
)
def q_cdc_wal2json_v2_roundtrip(spark, sf_dir):
    from pg_logical_replication_spark.sources.wal2json import decode_wal2json

    ev = t(spark, sf_dir, "events")
    action = (
        F.when(F.col("event_type") == "signup", "I")
        .when(F.col("event_type") == "error", "D")
        .otherwise("U")
    )
    lsn = lsn_str_expr(F.col("event_id") * 8 + 16)

    def entry(name, value):
        return F.struct(
            F.lit(name).alias("name"), F.lit("bigint").alias("type"),
            value.cast("string").alias("value"),
        )

    cols = F.array(
        entry("event_id", F.col("event_id")), entry("user_id", F.col("user_id"))
    )
    raw = ev.select(
        F.to_json(
            F.struct(
                action.alias("action"),
                F.lit("public").alias("schema"),
                F.lit("events").alias("table"),
                F.col("event_id").alias("xid"),
                lsn.alias("lsn"),
                F.when(action != "D", cols).alias("columns"),
                F.when(action == "D", F.array(entry("event_id", F.col("event_id"))))
                .alias("identity"),
            )
        ).alias("value")
    )
    decoded = decode_wal2json(
        raw.repartition(spark.sparkContext.defaultParallelism), format_version=2
    )
    eid = F.coalesce(
        F.col("after").getItem("event_id"), F.col("key").getItem("event_id")
    ).cast("bigint")
    return decoded.groupBy("op").agg(
        F.count("*").alias("n"),
        F.sum(eid).alias("sum_eid"),
        F.sum("lsn_long").alias("sum_lsn_long"),
    )


@register(
    "q_cdc_wal2json_roundtrip",
    f"""
    SELECT {_OP_CASE} AS op,
           COUNT(*) AS n,
           CAST(SUM(event_id) AS BIGINT) AS sum_eid,
           CAST(SUM(event_id * 8 + 16) AS BIGINT) AS sum_lsn_long
    FROM events GROUP BY 1
    """,
    "wal2json ENCODE→DECODE round-trip through the oracle gate: events "
    "are serialized to wal2json changesets in-query, decoded by "
    "sources/wal2json.py, and the aggregate must match DuckDB computing "
    "directly on the source rows — proves decoder + LSN math end-to-end",
)
def q_cdc_wal2json_roundtrip(spark, sf_dir):
    from pg_logical_replication_spark.sources.wal2json import decode_wal2json

    ev = t(spark, sf_dir, "events")
    kind = (
        F.when(F.col("event_type") == "signup", "insert")
        .when(F.col("event_type") == "error", "delete")
        .otherwise("update")
    )
    lsn = lsn_str_expr(F.col("event_id") * 8 + 16)
    change = F.struct(
        kind.alias("kind"),
        F.lit("public").alias("schema"),
        F.lit("events").alias("table"),
        F.array(F.lit("event_id"), F.lit("user_id")).alias("columnnames"),
        F.array(F.lit("bigint"), F.lit("bigint")).alias("columntypes"),
        F.array(
            F.col("event_id").cast("string"), F.col("user_id").cast("string")
        ).alias("columnvalues"),
        F.when(
            kind == "delete",
            F.struct(
                F.array(F.lit("event_id")).alias("keynames"),
                F.array(F.lit("bigint")).alias("keytypes"),
                F.array(F.col("event_id").cast("string")).alias("keyvalues"),
            ),
        ).alias("oldkeys"),
    )
    raw = ev.select(
        F.to_json(
            F.struct(
                F.array(change).alias("change"),
                F.col("event_id").alias("xid"),
                lsn.alias("nextlsn"),
            )
        ).alias("value")
    )
    # The testdata parquet is one row group ⇒ one input split; decode is
    # CPU-bound, so spread the encoded lines across all cores first (at
    # scale the event log is many files and arrives pre-parallel).
    decoded = decode_wal2json(raw.repartition(spark.sparkContext.defaultParallelism))
    eid = F.coalesce(
        F.col("after").getItem("event_id"), F.col("key").getItem("event_id")
    ).cast("bigint")
    return decoded.groupBy("op").agg(
        F.count("*").alias("n"),
        F.sum(eid).alias("sum_eid"),
        F.sum("lsn_long").alias("sum_lsn_long"),
    )


@register(
    "q_cdc_wal2json_chunked",
    f"""
    SELECT {_OP_CASE} AS op,
           COUNT(*) AS n,
           CAST(SUM(event_id) AS BIGINT) AS sum_eid,
           CAST(SUM(event_id * 8 + 16) AS BIGINT) AS sum_lsn_long
    FROM events GROUP BY 1
    """,
    "wal2json write-in-chunks tolerant decode (review r3 #4): every "
    "changeset is split into header / change / footer fragments (the "
    "plugin's chunked output shape), stitched back by "
    "reassemble_json_documents (JVM window + brace-depth scan, zero "
    "UDF), and must aggregate IDENTICALLY to the unchunked "
    "q_cdc_wal2json_roundtrip oracle",
)
def q_cdc_wal2json_chunked(spark, sf_dir):
    """Chunk fragments are built structurally (never splitting a string
    literal — the plugin's own chunking contract), with seq giving wire
    order; any reassembly bug (ordering, depth tracking, incomplete-doc
    holdback) breaks the hash match against the same closed-form oracle
    as the whole-document roundtrip."""
    from pg_logical_replication_spark.sources.wal2json import decode_wal2json

    ev = t(spark, sf_dir, "events")
    kind = (
        F.when(F.col("event_type") == "signup", "insert")
        .when(F.col("event_type") == "error", "delete")
        .otherwise("update")
    )
    lsn = lsn_str_expr(F.col("event_id") * 8 + 16)
    change = F.struct(
        kind.alias("kind"),
        F.lit("public").alias("schema"),
        F.lit("events").alias("table"),
        F.array(F.lit("event_id"), F.lit("user_id")).alias("columnnames"),
        F.array(F.lit("bigint"), F.lit("bigint")).alias("columntypes"),
        F.array(
            F.col("event_id").cast("string"), F.col("user_id").cast("string")
        ).alias("columnvalues"),
        F.when(
            kind == "delete",
            F.struct(
                F.array(F.lit("event_id")).alias("keynames"),
                F.array(F.lit("bigint")).alias("keytypes"),
                F.array(F.col("event_id").cast("string")).alias("keyvalues"),
            ),
        ).alias("oldkeys"),
    )
    # the plugin's write-in-chunks shape: header, one chunk per change,
    # footer — assembled as fragments with a global wire order
    frags = ev.select(
        F.col("event_id"),
        F.posexplode(
            F.array(
                F.lit('{"change":['),
                F.to_json(change),
                F.concat(
                    F.lit('],"xid":'),
                    F.col("event_id").cast("string"),
                    F.lit(',"nextlsn":"'),
                    lsn,
                    F.lit('"}'),
                ),
            )
        ).alias("pos", "value"),
    ).select((F.col("event_id") * 3 + F.col("pos")).alias("seq"), "value")
    # Reassemble per frame-log SEGMENT (1000 changesets per segment
    # here): chunk boundaries never cross segment seals, so the depth-
    # scan window parallelizes across segments instead of running one
    # global serial pass — the documented scale path of
    # reassemble_json_documents(partition_col=...). The stitched
    # documents then spread across all cores for the CPU-heavy
    # from_json decode.
    from pg_logical_replication_spark.sources.wal2json import (
        reassemble_json_documents,
    )

    frags = frags.withColumn("seg", F.expr("(seq DIV 3) DIV 1000"))
    docs = reassemble_json_documents(frags, partition_col="seg")
    # the per-(seg, doc) stitch already hash-spread the documents across
    # all shuffle partitions — re-repartitioning here would shuffle the
    # full stitched-document bytes a second time for nothing
    decoded = decode_wal2json(docs)
    eid = F.coalesce(
        F.col("after").getItem("event_id"), F.col("key").getItem("event_id")
    ).cast("bigint")
    return decoded.groupBy("op").agg(
        F.count("*").alias("n"),
        F.sum(eid).alias("sum_eid"),
        F.sum("lsn_long").alias("sum_lsn_long"),
    )


@register(
    "q_cdc_test_decoding_roundtrip",
    """
    SELECT event_type AS etype, COUNT(*) AS n,
           CAST(SUM(event_id) AS BIGINT) AS sum_eid
    FROM events GROUP BY event_type
    """,
    "test_decoding ENCODE→DECODE round-trip: events serialized to the "
    "text format (with quote-escaping) and decoded by "
    "sources/test_decoding.py's regex grammar",
)
def q_cdc_test_decoding_roundtrip(spark, sf_dir):
    from pg_logical_replication_spark.sources.test_decoding import decode_test_decoding

    ev = t(spark, sf_dir, "events")
    line = F.concat(
        F.lit("table public.events: INSERT: event_id[bigint]:"),
        F.col("event_id").cast("string"),
        F.lit(" user_id[bigint]:"),
        F.col("user_id").cast("string"),
        F.lit(" etype[text]:'"),
        F.replace(F.col("event_type"), F.lit("'"), F.lit("''")),
        F.lit("'"),
    )
    decoded = decode_test_decoding(
        # single-row-group input ⇒ pre-spread the CPU-bound regex decode
        ev.select(line.alias("value")).repartition(spark.sparkContext.defaultParallelism)
    )
    return decoded.groupBy(F.col("after").getItem("etype").alias("etype")).agg(
        F.count("*").alias("n"),
        F.sum(F.col("after").getItem("event_id").cast("bigint")).alias("sum_eid"),
    )


@register(
    "q_lsn_roundtrip",
    """
    SELECT event_id % 50 AS g,
           CAST(SUM(event_id * 268435456 + 17) AS BIGINT) AS sum_lsn_long
    FROM events GROUP BY 1
    """,
    "LSN hex-pair ↔ long round-trip across the 32-bit word boundary "
    "(model.lsn_str_expr/lsn_long_expr ≙ binary-reader.ts:75-86), "
    "JVM-side conv/hex only",
)
def q_lsn_roundtrip(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    # event_id << 28 pushes into the upper LSN word for ids ≥ 16
    v = F.col("event_id") * F.lit(268435456).cast("long") + 17
    roundtripped = lsn_long_expr(lsn_str_expr(v))
    return (
        ev.select((F.col("event_id") % 50).alias("g"), roundtripped.alias("rt"))
        .groupBy("g")
        .agg(F.sum("rt").alias("sum_lsn_long"))
    )


@register(
    "q_cdc_pgoutput_roundtrip",
    """
    SELECT event_type AS etype, COUNT(*) AS n,
           CAST(SUM(event_id) AS BIGINT) AS sum_eid,
           CAST(SUM(user_id) AS BIGINT) AS sum_uid
    FROM events GROUP BY event_type
    """,
    "pgoutput BINARY encode→decode round-trip: events serialized to the "
    "wire format (R/I messages, pgoutput-parser.ts message shapes) in a "
    "mapInPandas stage, decoded by the engine's Arrow-batched binary "
    "decoder, aggregates checked against DuckDB on the source rows — the "
    "reference's huge-transaction throughput scenario "
    "(decoder-pgoutput.spec.ts:324-373) as an oracle-gated query",
)
def q_cdc_pgoutput_roundtrip(spark, sf_dir):
    from collections.abc import Iterator

    import pandas as pd

    from pg_logical_replication_spark.sources import pgoutput_format as pgf
    from pg_logical_replication_spark.sources.pgoutput import decode_pgoutput

    OID = 51234
    rel = pgf.encode_relation(
        OID,
        "public",
        "events",
        [("event_id", 20), ("user_id", 20), ("etype", 25)],
        key_columns=["event_id"],
    )

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "seq": pdf["event_id"] + 1,
                    "lsn": (pdf["event_id"] * 8 + 16).map(lambda v: f"0/{v:X}"),
                    "data": [
                        pgf.encode_insert(
                            OID,
                            [("t", str(e)), ("t", str(u)), ("t", et)],
                        )
                        for e, u, et in zip(
                            pdf["event_id"], pdf["user_id"], pdf["event_type"]
                        )
                    ],
                }
            )

    ev = t(spark, sf_dir, "events").select("event_id", "user_id", "event_type")
    # single-row-group input ⇒ pre-spread the CPU-bound encode/decode
    wire = ev.repartition(spark.sparkContext.defaultParallelism).mapInPandas(
        encode, schema="seq long, lsn string, data binary"
    )
    rel_df = spark.createDataFrame([(0, "0/0", bytearray(rel))], "seq long, lsn string, data binary")
    # pass the relation cache up front — the in-band pre-scan would
    # recompute the whole encode stage just to find one 'R' message
    cache: dict = {}
    pgf.parse_message(rel, cache)
    decoded = decode_pgoutput(wire.unionByName(rel_df), relations=cache)
    return decoded.filter(F.col("op") == "insert").groupBy(
        F.col("after").getItem("etype").alias("etype")
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.col("after").getItem("event_id").cast("bigint")).alias("sum_eid"),
        F.sum(F.col("after").getItem("user_id").cast("bigint")).alias("sum_uid"),
    )


@register(
    "q_cdc_decoderbufs_roundtrip",
    """
    SELECT event_type AS etype, COUNT(*) AS n,
           CAST(SUM(event_id) AS BIGINT) AS sum_eid,
           CAST(SUM(user_id) AS BIGINT) AS sum_uid
    FROM events GROUP BY event_type
    """,
    "decoderbufs PROTOBUF encode→decode round-trip: events serialized to "
    "RowMessage wire bytes (pg_logicaldec.proto field layout) in a "
    "mapInPandas stage, decoded by sources/decoderbufs.py — with this all "
    "FOUR output-plugin formats pass the value-hash oracle gate",
)
def q_cdc_decoderbufs_roundtrip(spark, sf_dir):
    from collections.abc import Iterator

    import pandas as pd

    from pg_logical_replication_spark.sources import decoderbufs_format as dbf
    from pg_logical_replication_spark.sources.decoderbufs import decode_decoderbufs

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "lsn": (pdf["event_id"] * 8 + 16).map(lambda v: f"0/{v:X}"),
                    "data": [
                        dbf.encode_row_message(
                            "insert",
                            xid=int(e),
                            table="public.events",
                            new_tuple=[
                                dbf.encode_datum("event_id", 20, int64=int(e)),
                                dbf.encode_datum("user_id", 20, int64=int(u)),
                                dbf.encode_datum("etype", 25, string=et),
                            ],
                        )
                        for e, u, et in zip(
                            pdf["event_id"], pdf["user_id"], pdf["event_type"]
                        )
                    ],
                }
            )

    ev = t(spark, sf_dir, "events").select("event_id", "user_id", "event_type")
    wire = ev.repartition(spark.sparkContext.defaultParallelism).mapInPandas(
        encode, schema="lsn string, data binary"
    )
    decoded = decode_decoderbufs(wire)
    return decoded.filter(F.col("op") == "insert").groupBy(
        F.col("after").getItem("etype").alias("etype")
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.col("after").getItem("event_id").cast("bigint")).alias("sum_eid"),
        F.sum(F.col("after").getItem("user_id").cast("bigint")).alias("sum_uid"),
    )


@register(
    "q_cdc_scd2_history",
    """
    SELECT user_id, val AS value_str, valid_from,
           CAST(valid_to AS VARCHAR) AS valid_to,
           valid_to IS NULL AS is_current
    FROM (
      SELECT user_id, event_type,
             CAST(CAST(value AS DECIMAL(38,6)) AS VARCHAR) AS val,
             event_id AS valid_from,
             LEAD(event_id) OVER (PARTITION BY user_id ORDER BY event_id)
               AS valid_to
      FROM events)
    WHERE event_type <> 'error'
    """,
    "SCD Type 2 history (operators.apply_changes.scd2_history): every "
    "change image becomes a version row with [valid_from, valid_to) "
    "stream-position validity; deletes close versions without emitting "
    "rows; is_current marks open versions",
)
def q_cdc_scd2_history(spark, sf_dir):
    """Events → ChangeEvent stream ('error' ≙ delete) → full version
    history. One (table, key) shuffle + lead window — the same exchange
    apply_changes uses."""
    from pg_logical_replication_spark.operators.apply_changes import scd2_history

    ev = t(spark, sf_dir, "events")
    is_del = F.col("event_type") == "error"
    img = F.create_map(
        F.lit("user_id"), F.col("user_id").cast("string"),
        F.lit("value"), F.col("value").cast("decimal(38,6)").cast("string"),
    )
    changes = ev.select(
        F.when(is_del, "delete").otherwise("update").alias("op"),
        F.col("event_id").alias("lsn_long"),
        F.lit("events").alias("table"),
        F.create_map(F.lit("user_id"), F.col("user_id").cast("string")).alias("key"),
        F.when(~is_del, img).alias("after"),
    )
    hist = scd2_history(changes, key_columns=["user_id"])
    return hist.select(
        F.col("after").getItem("user_id").cast("bigint").alias("user_id"),
        F.col("after").getItem("value").alias("value_str"),
        F.col("valid_from_lsn").alias("valid_from"),
        # string-typed in the OUTPUT so the open-version NULL can't
        # coerce the whole column to float in pandas-mediated
        # comparators (the temporal JOIN keeps longs — its valid_to
        # never reaches an output)
        F.col("valid_to_lsn").cast("string").alias("valid_to"),
        "is_current",
    )


@register(
    "q_cdc_incremental_agg",
    """
    SELECT CAST(user_id % 10 AS INTEGER) AS grp,
           COUNT(*) AS n_live,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value
    FROM (SELECT user_id, event_type, value,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                                    ORDER BY event_id DESC) AS rn
          FROM events)
    WHERE rn = 1 AND event_type <> 'error'
    GROUP BY 1
    """,
    "incremental view maintenance (operators.apply_changes."
    "incremental_agg): per-group SUM/COUNT maintained purely from "
    "signed change deltas — the oracle recomputes from the final "
    "snapshot, proving delta-maintenance ≡ recompute",
)
def q_cdc_incremental_agg(spark, sf_dir):
    """The events table replayed as a consistent insert/update/delete
    stream (before images from the per-user prior event), folded by
    incremental_agg into per-group sums with NO snapshot scan: deltas
    telescope per user, so against the empty baseline the net equals
    the final snapshot aggregate exactly (decimal accumulation).

    The encode step needs a per-user lag (that's the SOURCE's job of
    carrying before images, REPLICA IDENTITY FULL); the maintenance
    itself is one shuffle-free flatMap + a partial-aggregated groupBy
    over 10 groups — at 100 TB the refresh costs O(day's changes)."""
    from pyspark.sql import Window as W

    from pg_logical_replication_spark.operators.apply_changes import incremental_agg

    ev = t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("event_id")
    prev_type = F.lag("event_type").over(w)
    prev_value = F.lag("value").over(w)
    is_err = F.col("event_type") == "error"
    prev_live = prev_type.isNotNull() & (prev_type != "error")
    op = (
        F.when(is_err & prev_live, "delete")
        .when(is_err, None)  # delete of a dead row — not a change
        .when(prev_live, "update")
        .otherwise("insert")
    )

    def img(val):
        return F.create_map(
            F.lit("user_id"), F.col("user_id").cast("string"),
            F.lit("grp"), (F.col("user_id") % 10).cast("string"),
            F.lit("value"), val.cast("decimal(38,6)").cast("string"),
        )

    changes = (
        ev.withColumn("op", op)
        .filter(F.col("op").isNotNull())
        .select(
            "op",
            F.when(F.col("op").isin("update", "delete"), img(prev_value)).alias(
                "before"
            ),
            F.when(F.col("op").isin("insert", "update"), img(F.col("value"))).alias(
                "after"
            ),
        )
    )
    agg = incremental_agg(
        changes,
        group_fn=lambda im: im.getItem("grp").cast("int"),
        value_fn=lambda im: im.getItem("value").cast("decimal(38,6)"),
    )
    return agg.filter(F.col("n_delta") > 0).select(
        "grp",
        F.col("n_delta").alias("n_live"),
        F.col("sum_delta").cast("double").alias("total_value"),
    )


@register(
    "q_cdc_replica_checksum",
    """
    WITH snap AS (
      SELECT user_id, event_type AS last_op,
             CAST(CAST(value AS DECIMAL(38,6)) AS VARCHAR) AS value_str
      FROM (SELECT user_id, event_type, value,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY ts DESC, event_id DESC) AS rn
            FROM events)
      WHERE rn = 1 AND event_type <> 'error')
    SELECT CAST(user_id % 16 AS INTEGER) AS bucket,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(CAST('0x' || substring(md5(concat_ws(chr(31),
                 coalesce(CAST(user_id AS VARCHAR), chr(30)),
                 coalesce(last_op, chr(30)),
                 coalesce(value_str, chr(30)))), 1, 15) AS BIGINT)
               AS DECIMAL(38,0))) AS VARCHAR) AS checksum
    FROM snap GROUP BY 1
    """,
    "replica verification (operators.verify.bucket_checksums): the "
    "applied snapshot summarized as per-key-bucket md5 checksums — the "
    "oracle recomputes the identical digests in DuckDB, proving the "
    "canonical form is engine-portable (a real replica could be "
    "verified by running this SQL on PostgreSQL directly)",
)
def q_cdc_replica_checksum(spark, sf_dir):
    """One scan + a 16-group aggregate: at 100 TB the comparison ships
    only the bucket table; diverged buckets re-scan as pushed-down
    key-range predicates (operators.verify.checksum_diff)."""
    from pg_logical_replication_spark.operators.verify import bucket_checksums

    snap = _newest_per_user(spark, sf_dir).select(
        "user_id",
        F.col("event_type").alias("last_op"),
        F.col("value").cast("decimal(38,6)").cast("string").alias("value_str"),
    )
    # checksum rendered as a STRING: a decimal(38,0) survives every
    # comparator (pandas converts big decimals to float, losing the low
    # digits — exactly what a checksum can't afford); digit strings
    # compare exactly everywhere
    return bucket_checksums(
        snap,
        columns=["user_id", "last_op", "value_str"],
        bucket=(F.col("user_id") % 16).cast("int"),
    ).withColumn("checksum", F.col("checksum").cast("string"))


@register(
    "q_cdc_message_roundtrip",
    """
    SELECT event_type AS prefix, COUNT(*) AS n,
           CAST(SUM(COALESCE(strlen(props), 0)) AS BIGINT) AS content_bytes,
           CAST(SUM(event_id * 8 + 16) AS BIGINT) AS sum_lsn_long
    FROM events WHERE event_type IN ('click', 'view') GROUP BY 1
    """,
    "pg_logical_emit_message surface (reference decoder-pgoutput."
    "spec.ts:276-322): app-level logical messages encoded to pgoutput "
    "'M' wire bytes, decoded to op='message' rows with prefix/content "
    "metadata, prefix-filtered (wal2json filter-msg-prefixes "
    "semantics), content length recovered from the bytea-hex payload",
)
def q_cdc_message_roundtrip(spark, sf_dir):
    from collections.abc import Iterator

    import pandas as pd

    from pg_logical_replication_spark.sources import pgoutput_format as pgf
    from pg_logical_replication_spark.sources.pgoutput import decode_pgoutput

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            lsns = [f"0/{v * 8 + 16:X}" for v in pdf["event_id"]]
            yield pd.DataFrame(
                {
                    "seq": pdf["event_id"] + 1,
                    "lsn": lsns,
                    "data": [
                        pgf.encode_logical_message(
                            lsn, prefix, (props or "").encode()
                        )
                        for lsn, prefix, props in zip(
                            lsns, pdf["event_type"], pdf["props"]
                        )
                    ],
                }
            )

    ev = t(spark, sf_dir, "events").select("event_id", "event_type", "props")
    wire = ev.repartition(spark.sparkContext.defaultParallelism).mapInPandas(
        encode, schema="seq long, lsn string, data binary"
    )
    # logical messages are relation-free: empty cache skips the pre-scan
    decoded = decode_pgoutput(wire, relations={})
    return (
        decoded.filter(F.col("op") == "message")
        .filter(F.col("meta").getItem("prefix").isin("click", "view"))
        .groupBy(F.col("meta").getItem("prefix").alias("prefix"))
        .agg(
            F.count("*").alias("n"),
            F.sum(
                ((F.length(F.col("meta").getItem("content")) - 2) / 2).cast("long")
            ).alias("content_bytes"),
            F.sum("lsn_long").alias("sum_lsn_long"),
        )
    )


@register(
    "q_cdc_txn_frames",
    """
    SELECT CAST(event_id // 100 AS BIGINT) AS xid,
           COUNT(*) AS n_changes,
           CAST(SUM(event_id) AS BIGINT) AS sum_eid,
           MAX(ts) AS commit_ts
    FROM events GROUP BY 1
    """,
    "transaction framing (operators.transactions.assign_transactions): "
    "the events table replayed as a wire-ordered begin→DML*→commit "
    "stream where xid lives only on BEGIN and commit_ts only on COMMIT "
    "(test_decoding semantics, reference decoder.ts:11-43 grammar); DML "
    "rows recover both purely from stream position, then per-txn stats "
    "must match DuckDB grouping the source rows directly",
)
def q_cdc_txn_frames(spark, sf_dir):
    """Wire-order framing: DML row → greatest begin.seq <= dml.seq.
    begins/commits are one row per txn (100× smaller than the stream) so
    the interval join broadcast-plans; no global sort of the stream."""
    from pg_logical_replication_spark.operators.transactions import (
        assign_transactions,
    )

    ev = t(spark, sf_dir, "events")
    txn = F.expr("event_id div 100")
    dml = ev.select(
        F.lit("insert").alias("op"),
        (F.col("event_id") * 10).alias("seq"),
        F.lit(None).cast("long").alias("xid"),
        F.lit(None).cast("timestamp").alias("commit_ts"),
        F.col("event_id").alias("eid"),
    )
    per_txn = ev.groupBy(txn.alias("txn")).agg(F.max("ts").alias("max_ts"))
    begins = per_txn.select(
        F.lit("begin").alias("op"),
        (F.col("txn") * 1000 - 5).alias("seq"),
        F.col("txn").alias("xid"),
        F.lit(None).cast("timestamp").alias("commit_ts"),
        F.lit(None).cast("long").alias("eid"),
    )
    commits = per_txn.select(
        F.lit("commit").alias("op"),
        # +994, not +995: txn t+1's begin sits at 1000(t+1)-5 = 1000t+995,
        # so +995 would TIE the fill-forward window on seq (ADVICE r6) —
        # correctness then hangs on commit rows carrying their own
        # xid/commit_ts through coalesce, not on deterministic framing
        (F.col("txn") * 1000 + 994).alias("seq"),
        F.col("txn").alias("xid"),
        F.col("max_ts").cast("timestamp").alias("commit_ts"),
        F.lit(None).cast("long").alias("eid"),
    )
    stream = dml.unionByName(begins).unionByName(commits)
    framed = assign_transactions(stream, seq_col="seq")
    return (
        framed.filter(F.col("op") == "insert")
        .groupBy("xid")
        .agg(
            F.count("*").alias("n_changes"),
            F.sum("eid").alias("sum_eid"),
            F.max("commit_ts").alias("commit_ts"),
        )
    )


@register(
    "q_cdc_txn_frames_partitioned",
    """
    SELECT CAST(event_id // 100 AS BIGINT) AS xid,
           COUNT(*) AS n_changes,
           CAST(SUM(event_id) AS BIGINT) AS sum_eid,
           MAX(ts) AS commit_ts
    FROM events GROUP BY 1
    """,
    "the 100 TB WAL-backfill shape of q_cdc_txn_frames: the SAME framed "
    "stream split into frame-log segments whose cuts deliberately "
    "MISALIGN with transaction boundaries (seg = seq div 1700 vs txns "
    "spanning 1000), framed with assign_transactions(partition_col=) — "
    "per-segment fill-forward windows + exact cross-partition carry, "
    "no global lead over begin markers, no broadcast of the txn set; "
    "identical oracle to the broadcast form",
)
def q_cdc_txn_frames_partitioned(spark, sf_dir):
    """See operators/transactions.py module docstring (partition_col
    mode, VERDICT r5 #6). Every ~10th transaction spans a segment cut
    at this stride, so the carry path is load-bearing, not decorative."""
    from pg_logical_replication_spark.operators.transactions import (
        assign_transactions,
    )

    ev = t(spark, sf_dir, "events")
    txn = F.expr("event_id div 100")
    dml = ev.select(
        F.lit("insert").alias("op"),
        (F.col("event_id") * 10).alias("seq"),
        F.lit(None).cast("long").alias("xid"),
        F.lit(None).cast("timestamp").alias("commit_ts"),
        F.col("event_id").alias("eid"),
    )
    per_txn = ev.groupBy(txn.alias("txn")).agg(F.max("ts").alias("max_ts"))
    begins = per_txn.select(
        F.lit("begin").alias("op"),
        (F.col("txn") * 1000 - 5).alias("seq"),
        F.col("txn").alias("xid"),
        F.lit(None).cast("timestamp").alias("commit_ts"),
        F.lit(None).cast("long").alias("eid"),
    )
    commits = per_txn.select(
        F.lit("commit").alias("op"),
        # +994, not +995: txn t+1's begin sits at 1000(t+1)-5 = 1000t+995,
        # so +995 would TIE the fill-forward window on seq (ADVICE r6) —
        # correctness then hangs on commit rows carrying their own
        # xid/commit_ts through coalesce, not on deterministic framing
        (F.col("txn") * 1000 + 994).alias("seq"),
        F.col("txn").alias("xid"),
        F.col("max_ts").cast("timestamp").alias("commit_ts"),
        F.lit(None).cast("long").alias("eid"),
    )
    stream = (
        dml.unionByName(begins)
        .unionByName(commits)
        .withColumn("seg", F.expr("seq div 1700"))
    )
    framed = assign_transactions(stream, seq_col="seq", partition_col="seg")
    return (
        framed.filter(F.col("op") == "insert")
        .groupBy("xid")
        .agg(
            F.count("*").alias("n_changes"),
            F.sum("eid").alias("sum_eid"),
            F.max("commit_ts").alias("commit_ts"),
        )
    )


@register(
    "q_cdc_streamed_txn",
    """
    SELECT CAST(event_id // 100 AS BIGINT) AS top_xid,
           COUNT(*) AS n,
           CAST(SUM(event_id) AS BIGINT) AS sum_eid
    FROM events
    WHERE (event_id // 100) % 7 <> 0
      AND NOT ((event_id % 100) >= 90 AND (event_id // 100) % 3 = 0)
    GROUP BY 1
    """,
    "pgoutput protocol-v2 streamed in-progress transactions, oracle-"
    "gated: events encoded as S/E-framed segments with per-message "
    "spliced xids (last 10 rows of each txn under a SUBtransaction "
    "xid), every 7th txn top-aborted and every 3rd txn's subxact "
    "aborted; decode_pgoutput tracks segment state, resolve_streamed "
    "commit-gates — surviving rows must equal DuckDB filtering the "
    "source directly (the streamed twin of rollback invisibility, "
    "reference decoder-pgoutput.spec.ts:235-274, at huge-transaction "
    "scale, :324-373)",
)
def q_cdc_streamed_txn(spark, sf_dir):
    """Each txn = 100 events, streamed in (possibly several) [S,E)
    segments — seq blocks of 1e6 per txn keep segment intervals
    disjoint, so resolve_streamed's broadcast interval-join maps every
    change to its segment without sorting the stream. Fate messages
    (c/A) are built from a tiny per-txn aggregate and unioned in —
    position-independent, as in the protocol."""
    from collections.abc import Iterator

    import pandas as pd

    from pg_logical_replication_spark.operators.transactions import resolve_streamed
    from pg_logical_replication_spark.sources import pgoutput_format as pgf
    from pg_logical_replication_spark.sources.pgoutput import decode_pgoutput

    OID = 51235
    rel = pgf.encode_relation(
        OID, "public", "events", [("event_id", 20)], key_columns=["event_id"]
    )

    def encode_segments(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # rows arrive sorted by (txn, event_id) within the partition;
        # a txn straddling Arrow batches just opens another segment —
        # valid v2 (first_segment=false), disjoint seq sub-blocks.
        seg_idx: dict[int, int] = {}
        for pdf in batches:
            seqs: list[int] = []
            data: list[bytes] = []
            for txn, grp in pdf.groupby(pdf["event_id"] // 100, sort=True):
                t = int(txn)
                s = seg_idx.get(t, 0)
                seg_idx[t] = s + 1
                base = _seg_base(t, s)
                seqs.append(base)
                data.append(pgf.encode_stream_start(t, first_segment=(s == 0)))
                for off, e in enumerate(grp["event_id"]):
                    eid = int(e)
                    sub = eid % 100 >= 90
                    xid = t + _SUBXID_OFF if sub else t
                    seqs.append(base + 1 + off)
                    data.append(pgf.with_stream_xid(xid, pgf.encode_insert(
                        OID, [("t", str(eid))]
                    )))
                seqs.append(base + 1999)
                data.append(pgf.encode_stream_stop())
            yield pd.DataFrame(
                {"lsn": [f"0/{q * 8 + 16:X}" for q in seqs], "seq": seqs,
                 "data": data}
            )

    def encode_fates(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            seqs, data = [], []
            for t in pdf["txn"]:
                t = int(t)
                if t % 7 == 0:
                    seqs.append(t * _TXN_BLOCK + _FATE_B)
                    data.append(pgf.encode_stream_abort(t))  # top-level
                    continue
                if t % 3 == 0:
                    seqs.append(t * _TXN_BLOCK + _FATE_A)
                    data.append(pgf.encode_stream_abort(t, t + _SUBXID_OFF))
                seqs.append(t * _TXN_BLOCK + _FATE_B)
                data.append(pgf.encode_stream_commit(
                    t, f"0/{t * 8 + 16:X}", f"0/{t * 8 + 24:X}", 1_700_000_000_000_000
                ))
            yield pd.DataFrame(
                {"lsn": [f"0/{q * 8 + 16:X}" for q in seqs], "seq": seqs,
                 "data": data}
            )

    ev = t(spark, sf_dir, "events").select("event_id")
    wire = (
        ev.repartition(spark.sparkContext.defaultParallelism,
                       F.expr("event_id div 100"))
        .sortWithinPartitions("event_id")
        .mapInPandas(encode_segments, schema="lsn string, seq long, data binary")
    )
    fates = (
        ev.select(F.expr("event_id div 100").alias("txn")).distinct()
        .mapInPandas(encode_fates, schema="lsn string, seq long, data binary")
    )
    cache: dict = {}
    pgf.parse_message(rel, cache)
    # resolve_streamed reads the decoded stream four ways (data, segment
    # controls, commits, aborts); persist so the Arrow decode runs ONCE
    # and the three tiny extractions hit cached partitions. At scale the
    # durable log keeps control messages in their own partition, so the
    # extractions are partition-pruned scans instead (SCALE.md).
    decoded = decode_pgoutput(wire.unionByName(fates), relations=cache).persist()
    resolved = resolve_streamed(decoded)
    return (
        resolved.filter(F.col("op") == "insert")
        .groupBy("top_xid")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("after").getItem("event_id").cast("bigint")).alias("sum_eid"),
        )
    )


@register(
    "q_cdc_two_phase",
    """
    SELECT CAST(event_id // 100 AS BIGINT) AS xid,
           'gid-' || CAST((event_id // 100) AS VARCHAR) AS gid,
           COUNT(*) AS n,
           CAST(SUM(event_id) AS BIGINT) AS sum_eid
    FROM events
    WHERE (event_id // 100) % 5 <> 0
    GROUP BY 1, 2
    """,
    "two-phase commit (two_phase slot option, PG 15+), oracle-gated: "
    "events encoded as begin_prepare→I*→prepare frames on the pgoutput "
    "wire, fates (commit_prepared / rollback_prepared for every 5th "
    "txn) arriving separately; resolve_prepared withholds prepared "
    "changes until their commit_prepared and drops rolled-back ones — "
    "surviving per-txn stats (with the 2PC gid) must match DuckDB "
    "filtering the source directly",
)
def q_cdc_two_phase(spark, sf_dir):
    """Same disjoint seq-block framing as the streamed-txn query: frame
    rows are per-txn (100× smaller than the stream) so attribution and
    fate gating are broadcast joins, never a sort of the stream."""
    from collections.abc import Iterator

    import pandas as pd

    from pg_logical_replication_spark.operators.transactions import resolve_prepared
    from pg_logical_replication_spark.sources import pgoutput_format as pgf
    from pg_logical_replication_spark.sources.pgoutput import decode_pgoutput

    OID = 51236
    rel = pgf.encode_relation(
        OID, "public", "events", [("event_id", 20)], key_columns=["event_id"]
    )
    TS = 1_700_000_000_000_000

    def encode_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        seg_idx: dict[int, int] = {}
        for pdf in batches:
            seqs: list[int] = []
            data: list[bytes] = []
            for txn, grp in pdf.groupby(pdf["event_id"] // 100, sort=True):
                t = int(txn)
                s = seg_idx.get(t, 0)
                seg_idx[t] = s + 1
                base = _seg_base(t, s)
                gid = f"gid-{t}"
                seqs.append(base)
                data.append(pgf.encode_begin_prepare(
                    f"0/{base * 8 + 16:X}", f"0/{base * 8 + 24:X}", TS, t, gid
                ))
                for off, e in enumerate(grp["event_id"]):
                    seqs.append(base + 1 + off)
                    data.append(pgf.encode_insert(OID, [("t", str(int(e)))]))
                seqs.append(base + 1999)
                data.append(pgf.encode_prepare(
                    f"0/{base * 8 + 16:X}", f"0/{base * 8 + 24:X}", TS, t, gid
                ))
            yield pd.DataFrame(
                {"lsn": [f"0/{q * 8 + 16:X}" for q in seqs], "seq": seqs,
                 "data": data}
            )

    def encode_fates(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            seqs, data = [], []
            for t in pdf["txn"]:
                t = int(t)
                gid = f"gid-{t}"
                seqs.append(t * _TXN_BLOCK + _FATE_B)
                if t % 5 == 0:
                    data.append(pgf.encode_rollback_prepared(
                        f"0/{t:X}", f"0/{t + 8:X}", TS, TS + 1_000_000, t, gid
                    ))
                else:
                    data.append(pgf.encode_commit_prepared(
                        f"0/{t:X}", f"0/{t + 8:X}", TS + 1_000_000, t, gid
                    ))
            yield pd.DataFrame(
                {"lsn": [f"0/{q * 8 + 16:X}" for q in seqs], "seq": seqs,
                 "data": data}
            )

    ev = t(spark, sf_dir, "events").select("event_id")
    wire = (
        ev.repartition(spark.sparkContext.defaultParallelism,
                       F.expr("event_id div 100"))
        .sortWithinPartitions("event_id")
        .mapInPandas(encode_frames, schema="lsn string, seq long, data binary")
    )
    fates = (
        ev.select(F.expr("event_id div 100").alias("txn")).distinct()
        .mapInPandas(encode_fates, schema="lsn string, seq long, data binary")
    )
    cache: dict = {}
    pgf.parse_message(rel, cache)
    # resolve_prepared reads the decoded stream four ways — one decode
    decoded = decode_pgoutput(wire.unionByName(fates), relations=cache).persist()
    resolved = resolve_prepared(decoded)
    return (
        resolved.filter(F.col("op") == "insert")
        .groupBy("xid", "gid")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("after").getItem("event_id").cast("bigint")).alias("sum_eid"),
        )
    )


@register(
    "q_cdc_origin_filter",
    """
    SELECT CAST(event_id // 100 AS BIGINT) AS txn,
           COUNT(*) AS n,
           CAST(SUM(event_id) AS BIGINT) AS sum_eid
    FROM events
    WHERE (event_id // 100) % 4 <> 0
    GROUP BY 1
    """,
    "replication-origin loop guard, oracle-gated: every 4th txn carries "
    "an in-frame 'O' origin marker (pgoutput wire) and must vanish "
    "wholesale after filter_by_origin — the engine-side equivalent of "
    "wal2json's filter-origins option for the pgoutput format",
)
def q_cdc_origin_filter(spark, sf_dir):
    """begins/origins are per-txn rows → broadcast interval joins; the
    change stream itself never sorts or shuffles until the final
    100-group aggregate."""
    from collections.abc import Iterator

    import pandas as pd

    from pg_logical_replication_spark.operators.transactions import filter_by_origin
    from pg_logical_replication_spark.sources import pgoutput_format as pgf
    from pg_logical_replication_spark.sources.pgoutput import decode_pgoutput

    OID = 51237
    rel = pgf.encode_relation(
        OID, "public", "events", [("event_id", 20)], key_columns=["event_id"]
    )
    TS = 1_700_000_000_000_000

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        seg_idx: dict[int, int] = {}
        for pdf in batches:
            seqs: list[int] = []
            data: list[bytes] = []
            for txn, grp in pdf.groupby(pdf["event_id"] // 100, sort=True):
                t = int(txn)
                s = seg_idx.get(t, 0)
                seg_idx[t] = s + 1
                base = _seg_base(t, s)
                seqs.append(base)
                data.append(pgf.encode_begin(f"0/{base * 8 + 16:X}", TS, t))
                if t % 4 == 0:
                    seqs.append(base + 1)
                    data.append(pgf.encode_origin(f"0/{base * 8 + 16:X}", "replica-a"))
                for off, e in enumerate(grp["event_id"]):
                    seqs.append(base + 2 + off)
                    data.append(pgf.encode_insert(OID, [("t", str(int(e)))]))
                seqs.append(base + 1999)
                data.append(pgf.encode_commit(
                    f"0/{base * 8 + 16:X}", f"0/{base * 8 + 24:X}", TS
                ))
            yield pd.DataFrame(
                {"lsn": [f"0/{q * 8 + 16:X}" for q in seqs], "seq": seqs,
                 "data": data}
            )

    ev = t(spark, sf_dir, "events").select("event_id")
    wire = (
        ev.repartition(spark.sparkContext.defaultParallelism,
                       F.expr("event_id div 100"))
        .sortWithinPartitions("event_id")
        .mapInPandas(encode, schema="lsn string, seq long, data binary")
    )
    cache: dict = {}
    pgf.parse_message(rel, cache)
    decoded = decode_pgoutput(wire, relations=cache).persist()
    kept = filter_by_origin(decoded)
    return (
        kept.filter(F.col("op") == "insert")
        .groupBy(F.expr("cast(after['event_id'] as bigint) div 100").alias("txn"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("after").getItem("event_id").cast("bigint")).alias("sum_eid"),
        )
    )


@register(
    "q_cdc_schema_evolution",
    """
    WITH n AS (SELECT COUNT(*) AS c FROM events)
    SELECT CAST(event_id % 10 AS BIGINT) AS g,
           COUNT(*) AS n_rows,
           CAST(SUM(CASE WHEN event_id < (SELECT c // 2 FROM n)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_v1,
           CAST(SUM(CASE WHEN event_id >= (SELECT c // 2 FROM n)
                         THEN user_id END) AS BIGINT) AS sum_uid_evolved
    FROM events GROUP BY 1
    """,
    "in-band schema evolution, oracle-gated: the relation announces "
    "itself mid-stream a second time with an added column (pgoutput 'R' "
    "messages in the wire, no upfront cache — the pre-scan collects "
    "both versions and every DML resolves the newest schema <= its own "
    "wire position, sources/pgoutput.py _VersionedRelations ≙ the "
    "reference's _relationCache under ALTER TABLE, "
    "pgoutput-parser.ts:86-110); rows decoded under v1 must lack the "
    "new column, rows under v2 must carry it",
)
def q_cdc_schema_evolution(spark, sf_dir):
    from collections.abc import Iterator

    import pandas as pd

    from pg_logical_replication_spark.sources import pgoutput_format as pgf
    from pg_logical_replication_spark.sources.pgoutput import decode_pgoutput

    OID = 51238
    ev = t(spark, sf_dir, "events").select("event_id", "user_id")
    half = table_rows(sf_dir, "events") // 2  # dense 0..N-1; footer count

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            seqs, data = [], []
            for e, u in zip(pdf["event_id"], pdf["user_id"]):
                eid = int(e)
                seqs.append(eid * 10 + 10)
                if eid < half:
                    data.append(pgf.encode_insert(OID, [("t", str(eid))]))
                else:
                    data.append(pgf.encode_insert(
                        OID, [("t", str(eid)), ("t", str(int(u)))]
                    ))
            yield pd.DataFrame(
                {"lsn": [f"0/{q * 8 + 16:X}" for q in seqs], "seq": seqs,
                 "data": data}
            )

    wire = ev.repartition(spark.sparkContext.defaultParallelism).mapInPandas(
        encode, schema="lsn string, seq long, data binary"
    )
    rels = spark.createDataFrame(
        [
            ("0/0", 0, bytearray(pgf.encode_relation(
                OID, "public", "events", [("event_id", 20)],
                key_columns=["event_id"],
            ))),
            # the ALTER: same OID re-announced mid-stream with a new column
            (f"0/{half * 10:X}", half * 10 + 1, bytearray(pgf.encode_relation(
                OID, "public", "events",
                [("event_id", 20), ("user_id", 20)],
                key_columns=["event_id"],
            ))),
        ],
        "lsn string, seq long, data binary",
    )
    # NO relations= : the in-band pre-scan must find both 'R' versions.
    # persist: the pre-scan and the decode would otherwise each execute
    # the Python encode lineage (review r2 — double mapInPandas cost)
    src = wire.unionByName(rels).persist()
    decoded = decode_pgoutput(src)
    eid = F.col("after").getItem("event_id").cast("bigint")
    return (
        decoded.filter(F.col("op") == "insert")
        .groupBy((eid % 10).alias("g"))
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(
                F.when(F.col("after").getItem("user_id").isNull(), 1).otherwise(0)
            ).alias("n_v1"),
            F.sum(F.col("after").getItem("user_id").cast("bigint")).alias(
                "sum_uid_evolved"
            ),
        )
    )


@register(
    "q_cdc_apply_schema_evolution",
    """
    WITH n AS (SELECT COUNT(*) AS c FROM events)
    SELECT CAST(event_id % 10 AS BIGINT) AS g,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN event_id >= (SELECT c // 4 FROM n)
                          AND event_id < (SELECT c // 2 FROM n)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_backfilled,
           CAST(SUM(CASE WHEN event_id < (SELECT c // 4 FROM n)
                          OR event_id >= (SELECT c // 2 FROM n)
                         THEN user_id END) AS BIGINT) AS sum_uid
    FROM events GROUP BY 1 ORDER BY 1
    """,
    "schema evolution through MATERIALIZATION, oracle-gated (VERDICT "
    "r8 #2): the relation re-announces itself mid-stream with an added "
    "user_id column; the decoded stream flows through apply_changes "
    "with columns='evolve' and the SNAPSHOT schema widens — v1-era rows "
    "surface the new column NULL-backfilled, a later v2 UPDATE of a "
    "v1-inserted key fills it, and the per-group census over the "
    "widened typed snapshot (rows, backfilled-NULL count, sum of the "
    "evolved column) must match the relational replay exactly",
)
def q_cdc_apply_schema_evolution(spark, sf_dir):
    """Consumer-side completion of q_cdc_schema_evolution (which stops
    at decode): operators/schema_evolution.stream_column_contract folds
    the in-band relation versions (≙ the reference's _relationCache
    under ALTER, pgoutput-parser.ts:86-110; consumer-side this is what
    Debezium's schema-change topic feeds) into an additive output
    contract, and apply_changes materializes the snapshot under it.
    Wire: v1 inserts the first half (event_id only), an 'R' v2 adds
    user_id, the second half inserts both, and the first QUARTER is
    re-updated under v2 — proving pre-ALTER keys acquire the widened
    column through later changes while untouched v1 rows backfill NULL.
    Scale: the contract fold reads only the 'R' rows (registry-sized);
    the snapshot is latest_image's one key shuffle; the census is one
    hash aggregate."""
    from collections.abc import Iterator

    import pandas as pd

    from pg_logical_replication_spark.operators.apply_changes import (
        apply_changes,
    )
    from pg_logical_replication_spark.sources import pgoutput_format as pgf
    from pg_logical_replication_spark.sources.pgoutput import decode_pgoutput

    OID = 51239
    ev = t(spark, sf_dir, "events").select("event_id", "user_id")
    n = table_rows(sf_dir, "events")  # dense 0..N-1; footer count
    half, quarter = n // 2, n // 4

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            seqs, data = [], []
            for e, u in zip(pdf["event_id"], pdf["user_id"]):
                eid, uid = int(e), int(u)
                seqs.append(eid * 10 + 10)
                if eid < half:
                    data.append(pgf.encode_insert(OID, [("t", str(eid))]))
                else:
                    data.append(pgf.encode_insert(
                        OID, [("t", str(eid)), ("t", str(uid))]
                    ))
                if eid < quarter:
                    # post-ALTER update of a v1-inserted key: the
                    # widened column reaches the old row
                    seqs.append(n * 10 + 10 + eid * 10)
                    data.append(pgf.encode_update(
                        OID, [("t", str(eid)), ("t", str(uid))]
                    ))
            yield pd.DataFrame(
                {"lsn": [f"0/{q * 8 + 16:X}" for q in seqs], "seq": seqs,
                 "data": data}
            )

    wire = ev.repartition(spark.sparkContext.defaultParallelism).mapInPandas(
        encode, schema="lsn string, seq long, data binary"
    )
    v2_seq = half * 10 + 5
    rel_v1 = pgf.encode_relation(
        OID, "public", "events", [("event_id", 20)],
        key_columns=["event_id"],
    )
    rel_v2 = pgf.encode_relation(
        OID, "public", "events", [("event_id", 20), ("user_id", 20)],
        key_columns=["event_id"],
    )
    rels = spark.createDataFrame(
        [
            ("0/10", 0, bytearray(rel_v1)),
            (f"0/{v2_seq * 8 + 16:X}", v2_seq, bytearray(rel_v2)),
        ],
        "lsn string, seq long, data binary",
    )
    # The versioned registry is parsed from the very buffers this
    # fixture just encoded (optimization r11, guide §2.4): the pre-scan
    # collect existed only to rediscover relation versions the query
    # itself constructed. The contract fold likewise reads ONLY the
    # 'R' rows — and every 'R' row in the union comes from `rels` —
    # but the fold's filter cannot push below the opaque mapInPandas
    # decode, so folding over the full stream forced a persist of the
    # whole decoded stream just to avoid running encode+decode twice
    # (the q_cdc_schema_evolution lesson, review r2). Feeding the SAME
    # fold the decoded relation sub-stream keeps the contract derived
    # from in-band relation messages by the standard operator (byte-
    # identical: the fold ignores DML rows whenever any 'R' row exists)
    # while making the full decode single-consumer — encode, decode,
    # key shuffle and census pipeline in ONE unpersisted action.
    # Production decodes without a registry still pre-scan and full-
    # stream-fold exactly as before.
    from pg_logical_replication_spark.operators.schema_evolution import (
        stream_column_contract,
    )

    registry = {OID: [(0, _rel_info(pgf, rel_v1, OID)),
                      (v2_seq, _rel_info(pgf, rel_v2, OID))]}
    contract = stream_column_contract(
        decode_pgoutput(rels, relations=registry), table="events"
    )
    decoded = decode_pgoutput(wire.unionByName(rels), relations=registry)
    # no_truncates/no_key_splits hold BY CONSTRUCTION of this wire (only
    # inserts + updates without a 'K' old-key submessage are encoded, so
    # key_change_predicate is provably false on every row; no truncate
    # message exists): latest_image's barrier join and tombstone union
    # would each evaluate the unpersisted encode+decode lineage again —
    # with the flags the snapshot consumes the stream exactly once.
    snap = apply_changes(
        decoded,
        key_columns=["event_id"],
        table="events",
        columns=contract,
        no_truncates=True,
        no_key_splits=True,
    )
    return (
        snap.groupBy((F.col("event_id") % 10).alias("g"))
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.sum(F.when(F.col("user_id").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_backfilled"),
            F.sum("user_id").cast("long").alias("sum_uid"),
        )
        .orderBy("g")
    )


@register(
    "q_cdc_apply_type_widening",
    """
    WITH n AS (SELECT COUNT(*) AS c FROM events)
    SELECT CAST(event_id % 10 AS BIGINT) AS g,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN event_id < (SELECT c // 2 FROM n)
                         THEN event_id
                         ELSE event_id + 3000000000 END) AS BIGINT)
             AS sum_amount
    FROM events GROUP BY 1 ORDER BY 1
    """,
    "type WIDENING through materialization, oracle-gated: the relation "
    "re-announces amount as bigint mid-stream (integer -> bigint, the "
    "classic int4 overflow migration) and post-ALTER values exceed the "
    "int32 range — apply_changes columns='evolve' must take the newest "
    "(wider) type so the snapshot sums are exact; a contract stuck on "
    "the v1 type would overflow or NULL every post-ALTER value",
)
def q_cdc_apply_type_widening(spark, sf_dir):
    """The merge_type widening path (operators/schema_evolution.py)
    end-to-end: v1 (event_id, amount integer) inserts the first half
    with int4-sized amounts; an in-band 'R' widens amount to bigint and
    the second half inserts amounts > 2^31. The evolved snapshot types
    amount as bigint — every value exact, gated per decade group.
    Scale: identical shape to q_cdc_apply_schema_evolution (registry-
    sized contract fold + one key shuffle + one hash aggregate)."""
    from collections.abc import Iterator

    import pandas as pd

    from pg_logical_replication_spark.operators.apply_changes import (
        apply_changes,
    )
    from pg_logical_replication_spark.sources import pgoutput_format as pgf
    from pg_logical_replication_spark.sources.pgoutput import decode_pgoutput

    OID = 51241
    ev = t(spark, sf_dir, "events").select("event_id")
    n = table_rows(sf_dir, "events")  # footer count, no Spark job
    half = n // 2

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            seqs, data = [], []
            for e in pdf["event_id"]:
                eid = int(e)
                amount = eid if eid < half else eid + 3_000_000_000
                seqs.append(eid * 10 + 10)
                data.append(pgf.encode_insert(
                    OID, [("t", str(eid)), ("t", str(amount))]
                ))
            yield pd.DataFrame(
                {"lsn": [f"0/{q * 8 + 16:X}" for q in seqs], "seq": seqs,
                 "data": data}
            )

    wire = ev.repartition(spark.sparkContext.defaultParallelism).mapInPandas(
        encode, schema="lsn string, seq long, data binary"
    )
    v2_seq = half * 10 + 5
    rel_v1 = pgf.encode_relation(
        OID, "public", "events", [("event_id", 20), ("amount", 23)],
        key_columns=["event_id"],
    )
    rel_v2 = pgf.encode_relation(
        OID, "public", "events", [("event_id", 20), ("amount", 20)],
        key_columns=["event_id"],
    )
    rels = spark.createDataFrame(
        [
            ("0/10", 0, bytearray(rel_v1)),
            (f"0/{v2_seq * 8 + 16:X}", v2_seq, bytearray(rel_v2)),
        ],
        "lsn string, seq long, data binary",
    )
    # versioned registry + rel-substream contract fold (optimization
    # r11): drops the pre-scan collect, the wire persist AND the full-
    # stream decode persist — see q_cdc_apply_schema_evolution for the
    # full argument
    from pg_logical_replication_spark.operators.schema_evolution import (
        stream_column_contract,
    )

    registry = {OID: [(0, _rel_info(pgf, rel_v1, OID)),
                      (v2_seq, _rel_info(pgf, rel_v2, OID))]}
    contract = stream_column_contract(
        decode_pgoutput(rels, relations=registry), table="events"
    )
    decoded = decode_pgoutput(wire.unionByName(rels), relations=registry)
    # flags hold by construction: insert-only wire, no truncates — the
    # stream is consumed exactly once (see q_cdc_apply_schema_evolution)
    snap = apply_changes(
        decoded, key_columns=["event_id"], table="events", columns=contract,
        no_truncates=True, no_key_splits=True,
    )
    return (
        snap.groupBy((F.col("event_id") % 10).alias("g"))
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.sum("amount").cast("long").alias("sum_amount"),
        )
        .orderBy("g")
    )


@register(
    "q_cdc_schema_change_log",
    """
    WITH n AS (SELECT COUNT(*) AS c FROM events),
    eras AS (SELECT event_id,
               CASE WHEN event_id < (SELECT c // 3 FROM n) THEN 1
                    WHEN event_id < 2 * (SELECT c // 3 FROM n) THEN 2
                    ELSE 3 END AS version
             FROM events),
    stats AS (SELECT version, CAST(COUNT(*) AS BIGINT) AS n_dml,
                     CAST(SUM(event_id) AS BIGINT) AS sum_eid
              FROM eras GROUP BY 1),
    vers AS (
      SELECT 1 AS version, 1 AS n_columns, 'event_id' AS added,
             '' AS dropped, '' AS widened, CAST(16 AS BIGINT) AS at_lsn_long
      UNION ALL SELECT 2, 2, 'user_id', '', '',
             CAST(((SELECT c // 3 FROM n) * 10 + 5) * 8 + 16 AS BIGINT)
      UNION ALL SELECT 3, 2, '', '', 'user_id:integer->bigint',
             CAST((2 * (SELECT c // 3 FROM n) * 10 + 5) * 8 + 16 AS BIGINT)
      UNION ALL SELECT 4, 1, '', 'user_id', '',
             CAST(((SELECT c FROM n) * 10 + 5) * 8 + 16 AS BIGINT))
    SELECT CAST(v.version AS BIGINT) AS version,
           CAST(v.n_columns AS BIGINT) AS n_columns,
           v.added, v.dropped, v.widened, v.at_lsn_long,
           CAST(COALESCE(s.n_dml, 0) AS BIGINT) AS n_dml_in_era,
           CAST(COALESCE(s.sum_eid, 0) AS BIGINT) AS sum_eid_era
    FROM vers v LEFT JOIN stats s USING (version) ORDER BY version
    """,
    "schema-change LOG, oracle-gated: four in-band relation versions "
    "(add user_id, widen integer->bigint, drop user_id) become one "
    "change-log row each — version, column diff vs predecessor, wire "
    "position — plus per-era DML attribution (row count and event_id "
    "mass decoded under each version); the batch form of Debezium's "
    "schema-change topic, derived from the 'R' announcements the "
    "reference's relation cache consumes (pgoutput-parser.ts:86-110)",
)
def q_cdc_schema_change_log(spark, sf_dir):
    """operators/schema_evolution.schema_change_log + era attribution.
    Scale: relation rows are registry-sized (the per-table window sort
    never sees data rows); era attribution broadcasts the 4-row version
    interval table against the decoded stream — one scan, no shuffle of
    the DML side beyond the final 4-group aggregate."""
    from collections.abc import Iterator

    import pandas as pd

    from pg_logical_replication_spark.operators.schema_evolution import (
        schema_change_log,
    )
    from pg_logical_replication_spark.sources import pgoutput_format as pgf
    from pg_logical_replication_spark.sources.pgoutput import decode_pgoutput

    OID = 51240
    ev = t(spark, sf_dir, "events").select("event_id", "user_id")
    n = table_rows(sf_dir, "events")  # footer count, no Spark job
    third = n // 3

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            seqs, data = [], []
            for e, u in zip(pdf["event_id"], pdf["user_id"]):
                eid, uid = int(e), int(u)
                seqs.append(eid * 10 + 10)
                if eid < third:
                    data.append(pgf.encode_insert(OID, [("t", str(eid))]))
                else:
                    data.append(pgf.encode_insert(
                        OID, [("t", str(eid)), ("t", str(uid))]
                    ))
            yield pd.DataFrame(
                {"lsn": [f"0/{q * 8 + 16:X}" for q in seqs], "seq": seqs,
                 "data": data}
            )

    wire = ev.repartition(spark.sparkContext.defaultParallelism).mapInPandas(
        encode, schema="lsn string, seq long, data binary"
    )

    rel_bufs = [
        (seq, pgf.encode_relation(
            OID, "public", "events", cols, key_columns=["event_id"]
        ))
        for seq, cols in (
            (0, [("event_id", 20)]),
            (third * 10 + 5, [("event_id", 20), ("user_id", 23)]),
            (2 * third * 10 + 5, [("event_id", 20), ("user_id", 20)]),
            (n * 10 + 5, [("event_id", 20)]),
        )
    ]
    rels = spark.createDataFrame(
        [(f"0/{seq * 8 + 16:X}", seq, bytearray(buf))
         for seq, buf in rel_bufs],
        "lsn string, seq long, data binary",
    )
    # versioned registry from the fixture's own buffers (optimization
    # r11): drops the pre-scan collect + wire persist — see
    # q_cdc_apply_schema_evolution for the full argument. The stream
    # persist STAYS here (measured, r11 session 2): the log is
    # referenced twice (interval broadcast + final join) and the DML
    # attribution once — three cheap cache reads. The rel-substream
    # variant (log from a tiny decode of `rels` alone, stream
    # unpersisted) measured 0.2-0.7 s SLOWER in every form (min-of-4
    # A/B: persist 2.47/2.59 s vs substream 3.26, substream+checkpoint
    # 2.67-2.74 s) — each extra reference to the tiny mapInPandas
    # subtree pays a fixed Python-stage cost that the single cache
    # population does not.
    registry = {OID: [(seq, _rel_info(pgf, buf, OID))
                      for seq, buf in rel_bufs]}
    decoded = decode_pgoutput(
        wire.unionByName(rels), relations=registry
    ).persist()
    log = schema_change_log(decoded, table="events")

    from pyspark.sql import Window as W

    # the log is 4 rows — the unpartitioned window is over THAT, never
    # the stream; intervals broadcast back against the DML scan
    wv = W.orderBy("version")
    intervals = log.select(
        "version",
        F.col("lsn_long").alias("lo"),
        F.coalesce(
            F.lead("lsn_long").over(wv), F.lit(1 << 62)
        ).alias("hi"),
    )
    dml = decoded.filter(F.col("op") == "insert").select(
        F.col("lsn_long").alias("dlsn"),
        F.col("after").getItem("event_id").cast("long").alias("eid"),
    )
    stats = (
        dml.join(
            F.broadcast(intervals),
            (F.col("dlsn") >= F.col("lo")) & (F.col("dlsn") < F.col("hi")),
        )
        .groupBy("version")
        .agg(
            F.count("*").cast("long").alias("n_dml_in_era"),
            F.sum("eid").cast("long").alias("sum_eid_era"),
        )
    )
    return (
        log.join(stats, "version", "left")
        .select(
            F.col("version").cast("long").alias("version"),
            "n_columns",
            "added",
            "dropped",
            "widened",
            F.col("lsn_long").alias("at_lsn_long"),
            F.coalesce("n_dml_in_era", F.lit(0)).cast("long")
            .alias("n_dml_in_era"),
            F.coalesce("sum_eid_era", F.lit(0)).cast("long")
            .alias("sum_eid_era"),
        )
        .orderBy("version")
    )


@register(
    "q_cdc_truncate_apply",
    """
    WITH n AS (SELECT COUNT(*) AS c FROM events)
    SELECT event_id, user_id FROM events
    WHERE event_id >= (SELECT c // 2 FROM n)
    """,
    "truncate barrier in apply-changes, oracle-gated: a TRUNCATE event "
    "lands mid-stream and the materialized snapshot must contain "
    "exactly the rows whose changes came after it (reference truncate "
    "message semantics, pgoutput-parser.ts:271-290) — the barrier is "
    "one tiny broadcast aggregate, never a shuffle of the stream",
)
def q_cdc_truncate_apply(spark, sf_dir):
    from pg_logical_replication_spark.operators.apply_changes import apply_changes

    ev = t(spark, sf_dir, "events")
    half = table_rows(sf_dir, "events") // 2  # dense 0..N-1; footer count
    ins = ev.select(
        F.lit("insert").alias("op"),
        (F.col("event_id") * 2).alias("lsn_long"),
        F.lit("events").alias("table"),
        F.create_map(F.lit("event_id"), F.col("event_id").cast("string")).alias("key"),
        F.create_map(
            F.lit("event_id"), F.col("event_id").cast("string"),
            F.lit("user_id"), F.col("user_id").cast("string"),
        ).alias("after"),
    )
    trunc = spark.createDataFrame(
        [("truncate", half * 2 - 1, "events", None, None)],
        "op string, lsn_long long, table string, "
        "key map<string,string>, after map<string,string>",
    )
    snap = apply_changes(
        ins.unionByName(trunc),
        key_columns=["event_id"],
        table="events",
        columns={"event_id": "bigint", "user_id": "bigint"},
    )
    return snap.select("event_id", "user_id")


@register(
    "q_cdc_toast_fill",
    """
    SELECT user_id, event_id,
      (last_value(CASE WHEN event_id % 3 = 0
                       THEN struct_pack(v := props) END IGNORE NULLS)
        OVER (PARTITION BY user_id ORDER BY event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)).v
        AS props_filled
    FROM events
    """,
    "unchanged-TOAST stream fill (operators.apply_changes.toast_fill): "
    "events become per-user updates where 2 of 3 omit `props` with an "
    "unchanged_toast marker (pgoutput 'u' kind, reference "
    "pgoutput-parser.ts:231-269); each toasted image takes the newest "
    "previously-seen props — last(ignore nulls) running window, one "
    "key-hash shuffle shared with apply_changes' partitioning",
)
def q_cdc_toast_fill(spark, sf_dir):
    from pg_logical_replication_spark.operators.apply_changes import toast_fill

    ev0 = t(spark, sf_dir, "events")
    toasted = (F.col("event_id") % 3) != 0
    base_after = F.create_map(
        F.lit("user_id"),
        F.col("user_id").cast("string"),
        F.lit("event_id"),
        F.col("event_id").cast("string"),
    )
    ev = ev0.select(
        F.lit("update").alias("op"),
        F.lit(None).cast("string").alias("lsn"),
        F.col("event_id").alias("lsn_long"),
        F.lit(None).cast("long").alias("xid"),
        F.lit(None).cast("timestamp").alias("commit_ts"),
        F.lit("public").alias("schema"),
        F.lit("events").alias("table"),
        F.create_map(F.lit("user_id"), F.col("user_id").cast("string")).alias("key"),
        F.lit(None).cast("map<string,string>").alias("before"),
        F.when(toasted, base_after)
        .otherwise(
            F.map_concat(base_after, F.create_map(F.lit("props"), F.col("props")))
        )
        .alias("after"),
        F.when(
            toasted, F.create_map(F.lit("unchanged_toast"), F.lit("props"))
        ).alias("meta"),
    )
    filled = toast_fill(ev, key_columns=["user_id"])
    return filled.select(
        F.col("after").getItem("user_id").cast("bigint").alias("user_id"),
        F.col("after").getItem("event_id").cast("bigint").alias("event_id"),
        F.col("after").getItem("props").alias("props_filled"),
    )


@register(
    "q_cdc_mixed_txns",
    """
    WITH base AS (SELECT event_id, event_id // 100 AS t FROM events),
    kept AS (
      SELECT event_id, t FROM base
      WHERE t % 7 <> 0
        AND NOT (t % 2 = 0 AND t % 3 = 0 AND event_id % 100 >= 90)
    )
    SELECT CAST(t AS BIGINT) AS top_xid,
           CASE WHEN t % 2 = 1 THEN 'gid-' || CAST(t AS VARCHAR) END AS gid,
           COUNT(*) AS n,
           CAST(SUM(event_id) AS BIGINT) AS sum_eid
    FROM kept GROUP BY 1, 2
    """,
    "MIXED transaction shapes on one wire (the r1-advice scenario at "
    "data scale): even txns stream as v2 S/E segments (subxact for the "
    "last 10 rows), odd txns arrive as plain two-phase b..P frames; "
    "every 7th txn's fate is an abort/rollback_prepared, every 3rd "
    "even txn's subxact aborts. resolve_transactions chains the two "
    "gates — each consumes only the prepared fates it owns — and the "
    "survivors (with the 2PC gid on plain txns only) must equal DuckDB "
    "filtering the source directly",
)
def q_cdc_mixed_txns(spark, sf_dir):
    """Even txns reuse q_cdc_streamed_txn's segment encoding (spliced
    sub-xids), odd txns q_cdc_two_phase's frame encoding; fates for
    both land in the same per-txn 1e6-wide seq block. One decode, one
    resolve_transactions chain, one aggregate."""
    from collections.abc import Iterator

    import pandas as pd

    from pg_logical_replication_spark.operators.transactions import (
        resolve_transactions,
    )
    from pg_logical_replication_spark.sources import pgoutput_format as pgf
    from pg_logical_replication_spark.sources.pgoutput import decode_pgoutput

    OID = 51237
    rel = pgf.encode_relation(
        OID, "public", "events", [("event_id", 20)], key_columns=["event_id"]
    )
    TS = 1_700_000_000_000_000

    def encode_bodies(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        seg_idx: dict[int, int] = {}
        for pdf in batches:
            seqs: list[int] = []
            data: list[bytes] = []
            for txn, grp in pdf.groupby(pdf["event_id"] // 100, sort=True):
                t_ = int(txn)
                s = seg_idx.get(t_, 0)
                seg_idx[t_] = s + 1
                base = _seg_base(t_, s)
                if t_ % 2 == 0:  # streamed v2 segments
                    seqs.append(base)
                    data.append(pgf.encode_stream_start(t_, first_segment=(s == 0)))
                    for off, e in enumerate(grp["event_id"]):
                        eid = int(e)
                        sub = eid % 100 >= 90
                        xid = t_ + _SUBXID_OFF if sub else t_
                        seqs.append(base + 1 + off)
                        data.append(pgf.with_stream_xid(
                            xid, pgf.encode_insert(OID, [("t", str(eid))])
                        ))
                    seqs.append(base + 1999)
                    data.append(pgf.encode_stream_stop())
                else:  # plain two-phase frame
                    gid = f"gid-{t_}"
                    seqs.append(base)
                    data.append(pgf.encode_begin_prepare(
                        f"0/{base * 8 + 16:X}", f"0/{base * 8 + 24:X}", TS, t_, gid
                    ))
                    for off, e in enumerate(grp["event_id"]):
                        seqs.append(base + 1 + off)
                        data.append(pgf.encode_insert(OID, [("t", str(int(e)))]))
                    seqs.append(base + 1999)
                    data.append(pgf.encode_prepare(
                        f"0/{base * 8 + 16:X}", f"0/{base * 8 + 24:X}", TS, t_, gid
                    ))
            yield pd.DataFrame(
                {"lsn": [f"0/{q * 8 + 16:X}" for q in seqs], "seq": seqs,
                 "data": data}
            )

    def encode_fates(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            seqs, data = [], []
            for t_ in pdf["txn"]:
                t_ = int(t_)
                if t_ % 2 == 0:  # streamed fates
                    if t_ % 7 == 0:
                        seqs.append(t_ * _TXN_BLOCK + _FATE_B)
                        data.append(pgf.encode_stream_abort(t_))
                        continue
                    if t_ % 3 == 0:
                        seqs.append(t_ * _TXN_BLOCK + _FATE_A)
                        data.append(pgf.encode_stream_abort(t_, t_ + _SUBXID_OFF))
                    seqs.append(t_ * _TXN_BLOCK + _FATE_B)
                    data.append(pgf.encode_stream_commit(
                        t_, f"0/{t_ * 8 + 16:X}", f"0/{t_ * 8 + 24:X}", TS
                    ))
                else:  # prepared fates
                    gid = f"gid-{t_}"
                    seqs.append(t_ * _TXN_BLOCK + _FATE_B)
                    if t_ % 7 == 0:
                        data.append(pgf.encode_rollback_prepared(
                            f"0/{t_:X}", f"0/{t_ + 8:X}", TS, TS + 1_000_000, t_, gid
                        ))
                    else:
                        data.append(pgf.encode_commit_prepared(
                            f"0/{t_:X}", f"0/{t_ + 8:X}", TS + 1_000_000, t_, gid
                        ))
            yield pd.DataFrame(
                {"lsn": [f"0/{q * 8 + 16:X}" for q in seqs], "seq": seqs,
                 "data": data}
            )

    ev = t(spark, sf_dir, "events").select("event_id")
    wire = (
        ev.repartition(spark.sparkContext.defaultParallelism,
                       F.expr("event_id div 100"))
        .sortWithinPartitions("event_id")
        .mapInPandas(encode_bodies, schema="lsn string, seq long, data binary")
    )
    fates = (
        ev.select(F.expr("event_id div 100").alias("txn")).distinct()
        .mapInPandas(encode_fates, schema="lsn string, seq long, data binary")
    )
    cache: dict = {}
    pgf.parse_message(rel, cache)
    decoded = decode_pgoutput(wire.unionByName(fates), relations=cache).persist()
    resolved = resolve_transactions(decoded)
    return (
        resolved.filter(F.col("op") == "insert")
        .groupBy(
            F.coalesce(F.col("top_xid"), F.col("xid")).alias("top_xid"),
            F.col("gid"),
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("after").getItem("event_id").cast("bigint")).alias("sum_eid"),
        )
    )


@register(
    "q_cdc_changed_columns",
    """
    WITH ev AS (SELECT event_id FROM events)
    SELECT col, CAST(COUNT(*) AS BIGINT) AS n_changed,
           CAST(SUM(event_id) AS BIGINT) AS sum_eid
    FROM (
      SELECT event_id, 'value' AS col FROM ev
      UNION ALL
      SELECT event_id, 'status' FROM ev WHERE event_id % 3 = 0
    ) GROUP BY col
    """,
    "change-audit over replica-identity-FULL updates: every event "
    "becomes a U message with old ('O') and new images; value changes "
    "on every update, status only on every 3rd — per-column change "
    "counts from before/after map comparison must equal DuckDB "
    "deriving them from the source",
)
def q_cdc_changed_columns(spark, sf_dir):
    """Which columns actually change — the schema-drift / hot-column
    audit every CDC consumer eventually writes. before/after are map
    columns out of decode, so the comparison is a JVM map_filter; one
    explode of CHANGED columns only (≤2 per row here), then a tiny
    aggregate. Scale: the U+O encode doubles message size, not shuffle
    size — comparisons happen in the scan projection."""
    from collections.abc import Iterator

    import pandas as pd

    from pg_logical_replication_spark.sources import pgoutput_format as pgf
    from pg_logical_replication_spark.sources.pgoutput import decode_pgoutput

    OID = 51238
    rel = pgf.encode_relation(
        OID, "public", "events",
        [("event_id", 20), ("value", 25), ("status", 25)],
        key_columns=["event_id"],
    )

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            seqs, data = [], []
            for e in pdf["event_id"]:
                eid = int(e)
                old = [("t", str(eid)), ("t", f"v{eid}"),
                       ("t", "ok" if eid % 3 else "old")]
                new = [("t", str(eid)), ("t", f"v{eid}x"),
                       ("t", "ok" if eid % 3 else "new")]
                seqs.append(eid)
                data.append(pgf.encode_update(OID, new, old=old))
            yield pd.DataFrame(
                {"lsn": [f"0/{q * 8 + 16:X}" for q in seqs], "seq": seqs,
                 "data": data}
            )

    ev = t(spark, sf_dir, "events").select("event_id")
    wire = ev.repartition(spark.sparkContext.defaultParallelism).mapInPandas(
        encode, schema="lsn string, seq long, data binary"
    )
    cache: dict = {}
    pgf.parse_message(rel, cache)
    upd = decode_pgoutput(wire, relations=cache).filter(F.col("op") == "update")
    changed = upd.select(
        F.col("after").getItem("event_id").cast("bigint").alias("event_id"),
        F.map_keys(
            F.map_filter(
                F.col("after"),
                lambda k, v: (k != F.lit("event_id"))
                & ~v.eqNullSafe(F.try_element_at(F.col("before"), k)),
            )
        ).alias("cols"),
    )
    return (
        changed.select("event_id", F.explode("cols").alias("col"))
        .groupBy("col")
        .agg(
            F.count("*").alias("n_changed"),
            F.sum("event_id").alias("sum_eid"),
        )
    )


@register(
    "q_cdc_logical_messages",
    """
    SELECT 'app' || CAST(event_id % 3 AS VARCHAR) AS prefix,
           COUNT(*) AS n,
           CAST(SUM(event_id) AS BIGINT) AS sum_content
    FROM events WHERE event_id % 10 = 0
    GROUP BY 1
    """,
    "pg_logical_emit_message consumption ('M' messages, the in-WAL "
    "application side-channel — markers, outbox events): every 10th "
    "event emits one; decoded prefix routing + content aggregation "
    "must match DuckDB on the source",
)
def q_cdc_logical_messages(spark, sf_dir):
    """'M' payloads surface as meta{prefix, content(bytea-hex),
    transactional}; content decodes JVM-side (unhex → string → bigint).
    The reference decodes M too (pgoutput-parser.ts:193-204) but its
    tests never consume one — this query is the consumer pattern."""
    from collections.abc import Iterator

    import pandas as pd

    from pg_logical_replication_spark.sources.pgoutput import decode_pgoutput

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pg_logical_replication_spark.sources import pgoutput_format as pgf

        for pdf in batches:
            seqs, data = [], []
            for e in pdf["event_id"]:
                eid = int(e)
                seqs.append(eid)
                data.append(pgf.encode_logical_message(
                    f"0/{eid * 8 + 16:X}", f"app{eid % 3}",
                    str(eid).encode(), transactional=(eid % 2 == 0),
                ))
            yield pd.DataFrame(
                {"lsn": [f"0/{q * 8 + 16:X}" for q in seqs], "seq": seqs,
                 "data": data}
            )

    ev = (
        t(spark, sf_dir, "events").select("event_id")
        .filter(F.col("event_id") % 10 == 0)
    )
    wire = ev.repartition(spark.sparkContext.defaultParallelism).mapInPandas(
        encode, schema="lsn string, seq long, data binary"
    )
    decoded = decode_pgoutput(wire, relations={})
    msgs = decoded.filter(F.col("op") == "message")
    return (
        msgs.select(
            F.col("meta").getItem("prefix").alias("prefix"),
            F.unhex(F.substring(F.col("meta").getItem("content"), 3, 1_000_000))
            .cast("string").cast("bigint").alias("content_val"),
        )
        .groupBy("prefix")
        .agg(
            F.count("*").alias("n"),
            F.sum("content_val").alias("sum_content"),
        )
    )


@register(
    "q_cdc_sequence_state",
    """
    SELECT 'seq_' || CAST(event_id % 4 AS VARCHAR) AS seq_name,
           COUNT(*) AS n_updates,
           CAST(MAX(event_id * 10) AS BIGINT) AS max_last_value,
           CAST(SUM(event_id % 2) AS BIGINT) AS n_transactional
    FROM events WHERE event_id % 50 = 0
    GROUP BY 1
    """,
    "include-sequences consumption (PG 16+ pg_decode_sequence, "
    "test_decoding text lines): every 50th event updates one of four "
    "sequences; decoded op='sequence' state (last_value, transactional "
    "flag from meta) aggregates to DuckDB on the source — the reference "
    "only pushes the option down, its grammar never parses these lines",
)
def q_cdc_sequence_state(spark, sf_dir):
    """Sequence lines are text_decoding format — decoded by the layered
    regex built-ins entirely JVM-side (zero Python); meta carries
    last_value/log_cnt/is_called/transactional as strings, cast in the
    projection."""
    from pg_logical_replication_spark.sources.test_decoding import (
        decode_test_decoding,
    )

    ev = (
        t(spark, sf_dir, "events").select("event_id")
        .filter(F.col("event_id") % 50 == 0)
    )
    lines = ev.select(
        F.concat(
            F.lit("sequence public.seq_"),
            (F.col("event_id") % 4).cast("string"),
            F.lit(": transactional:"),
            (F.col("event_id") % 2).cast("string"),
            F.lit(" last_value: "),
            (F.col("event_id") * 10).cast("string"),
            F.lit(" log_cnt: 0 is_called:1"),
        ).alias("value")
    )
    seqs = decode_test_decoding(lines).filter(F.col("op") == "sequence")
    return (
        seqs.groupBy(F.col("table").alias("seq_name"))
        .agg(
            F.count("*").alias("n_updates"),
            F.max(F.col("meta").getItem("last_value").cast("bigint")).alias(
                "max_last_value"
            ),
            F.sum(F.col("meta").getItem("transactional").cast("bigint")).alias(
                "n_transactional"
            ),
        )
    )


@register(
    "q_cdc_temporal_join",
    """
    WITH dim AS (
      SELECT user_id,
             CAST(CAST(value AS DECIMAL(38,6)) AS VARCHAR) AS val,
             event_type,
             event_id AS valid_from,
             LEAD(event_id) OVER (PARTITION BY user_id ORDER BY event_id)
               AS valid_to
      FROM events WHERE event_id % 2 = 0),
    versions AS (SELECT * FROM dim WHERE event_type <> 'error'),
    facts AS (SELECT user_id, event_id FROM events WHERE event_id % 2 = 1)
    SELECT CAST(f.user_id % 16 AS INTEGER) AS bucket,
           COUNT(*) AS n_matched,
           CAST(SUM(CAST(v.val AS DECIMAL(38,6))) AS DOUBLE) AS dim_value_sum
    FROM facts f JOIN versions v
      ON f.user_id = v.user_id
     AND f.event_id >= v.valid_from
     AND (v.valid_to IS NULL OR f.event_id < v.valid_to)
    GROUP BY 1
    """,
    "temporal (SCD2 as-of) join — THE CDC analytics pattern: facts "
    "(odd events) join the dimension version (SCD2 history built from "
    "even events, errors = deletes closing versions) valid at their "
    "stream position; facts landing in a deleted gap match nothing",
)
def q_cdc_temporal_join(spark, sf_dir):
    """Equality on the key + range on stream position: Spark plans a
    sort-merge join on user_id with the validity range as a join-level
    filter — per-key version chains are short, so no quadratic blowup
    and no broadcast-nested-loop. At 100 TB both sides pre-partition by
    the key; the history side is the small one (one row per change,
    not per fact)."""
    from pg_logical_replication_spark.operators.apply_changes import scd2_history
    from pg_logical_replication_spark.plans.registry import ssum

    ev = t(spark, sf_dir, "events")
    dim_ev = ev.filter(F.col("event_id") % 2 == 0)
    is_del = F.col("event_type") == "error"
    img = F.create_map(
        F.lit("user_id"), F.col("user_id").cast("string"),
        F.lit("value"), F.col("value").cast("decimal(38,6)").cast("string"),
    )
    changes = dim_ev.select(
        F.when(is_del, "delete").otherwise("update").alias("op"),
        F.col("event_id").alias("lsn_long"),
        F.lit("events").alias("table"),
        F.create_map(F.lit("user_id"), F.col("user_id").cast("string")).alias("key"),
        F.when(~is_del, img).alias("after"),
    )
    versions = scd2_history(changes, key_columns=["user_id"]).select(
        F.col("after").getItem("user_id").cast("bigint").alias("user_id"),
        F.col("after").getItem("value").alias("val"),
        F.col("valid_from_lsn").alias("valid_from"),
        # stays BIGINT: valid_to never reaches the output (the join
        # bound only), so the long comparison stays exact — no string
        # coercion through double (review r2)
        F.col("valid_to_lsn").alias("valid_to"),
    )
    facts = ev.filter(F.col("event_id") % 2 == 1).select("user_id", "event_id")
    joined = facts.join(
        versions,
        (facts["user_id"] == versions["user_id"])
        & (facts["event_id"] >= versions["valid_from"])
        & (versions["valid_to"].isNull()
           | (facts["event_id"] < versions["valid_to"])),
    )
    return joined.groupBy(
        (facts["user_id"] % 16).cast("int").alias("bucket")
    ).agg(
        F.count("*").alias("n_matched"),
        ssum("val").alias("dim_value_sum"),
    )


@register(
    "q_cdc_bootstrap",
    """
    WITH boot AS (
      SELECT c_custkey AS id, 'insert' AS op, c_acctbal AS val, -1 AS eid
      FROM customer),
    ev AS (
      SELECT user_id AS id,
             CASE WHEN event_type = 'signup' THEN 'insert'
                  WHEN event_type = 'error' THEN 'delete'
                  ELSE 'update' END AS op,
             value AS val, event_id AS eid
      FROM events),
    u AS (SELECT * FROM boot UNION ALL SELECT * FROM ev),
    last AS (SELECT id, op, val,
                    ROW_NUMBER() OVER (PARTITION BY id ORDER BY eid DESC) AS rn
             FROM u)
    SELECT id, val FROM last WHERE rn = 1 AND op <> 'delete'
    """,
    "initial load + stream catchup (Debezium snapshot.mode=initial): "
    "customer is the consistent snapshot at LSN 0, events is the live "
    "stream above it — bootstrap_events unions synthetic inserts under "
    "the stream and ONE apply_changes resolves both (stream wins per "
    "key, deletes drop snapshot rows, updates upsert unseen keys)",
)
def q_cdc_bootstrap(spark, sf_dir):
    """Snapshot scan → events (no shuffle) ∪ stream → one key-window
    shuffle in apply_changes; at 100 TB the bootstrap side is a plain
    parquet scan and the union adds no exchange."""
    from pg_logical_replication_spark.operators.apply_changes import (
        apply_changes,
        bootstrap_events,
    )

    snap = t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id"), F.col("c_acctbal").alias("val")
    )
    boot = bootstrap_events(snap, key_columns=["id"], table="users")

    ev = t(spark, sf_dir, "events")
    op = (
        F.when(F.col("event_type") == "signup", "insert")
        .when(F.col("event_type") == "error", "delete")
        .otherwise("update")
    )
    lsn_long = (F.col("event_id") * 8 + 16).cast("long")
    stream = ev.select(
        op.alias("op"),
        lsn_str_expr(lsn_long).alias("lsn"),
        lsn_long.alias("lsn_long"),
        F.col("event_id").alias("xid"),
        F.col("ts").cast("timestamp").alias("commit_ts"),
        F.lit("public").alias("schema"),
        F.lit("users").alias("table"),
        F.create_map(F.lit("id"), F.col("user_id").cast("string")).alias("key"),
        F.lit(None).cast("map<string,string>").alias("before"),
        F.when(
            op != "delete",
            F.create_map(
                F.lit("id"), F.col("user_id").cast("string"),
                F.lit("val"), F.col("value").cast("string"),
            ),
        ).alias("after"),
        F.lit(None).cast("map<string,string>").alias("meta"),
    )

    return apply_changes(
        boot.unionByName(stream),
        key_columns=["id"],
        table="users",
        columns={"id": "bigint", "val": "double precision"},
    )


@register(
    "q_cdc_format_agreement",
    """
    WITH agg AS (SELECT COUNT(*) AS n,
                        CAST(SUM(event_id) AS BIGINT) AS sum_eid,
                        CAST(SUM(user_id) AS BIGINT) AS sum_uid
                 FROM events)
    SELECT f.format, agg.n, agg.sum_eid, agg.sum_uid
    FROM agg, (VALUES ('decoderbufs'), ('pgoutput'), ('test_decoding'),
               ('wal2json')) f(format)
    """,
    "cross-format decoder agreement, oracle-gated: the SAME inserts are "
    "encoded through all FOUR output-plugin wire formats and decoded by "
    "each engine decoder — every format's aggregate must equal the "
    "direct source aggregate, so a divergence in any one codec fails "
    "the gate (the reference runs one spec per decoder over one "
    "scenario matrix, decoder-*.spec.ts; this is that matrix as one "
    "relational query)",
)
def q_cdc_format_agreement(spark, sf_dir):
    """Four independent encode→decode pipelines, each one scan + one
    tiny aggregate; the union is 4 rows. No cross-format shuffle — the
    agreement check IS the equality of four broadcast-sized aggregates.
    """
    from collections.abc import Iterator

    import pandas as pd

    from pg_logical_replication_spark.sources import decoderbufs_format as dbf
    from pg_logical_replication_spark.sources import pgoutput_format as pgf
    from pg_logical_replication_spark.sources.decoderbufs import decode_decoderbufs
    from pg_logical_replication_spark.sources.pgoutput import decode_pgoutput
    from pg_logical_replication_spark.sources.test_decoding import (
        decode_test_decoding,
    )
    from pg_logical_replication_spark.sources.wal2json import decode_wal2json

    par = spark.sparkContext.defaultParallelism
    ev = t(spark, sf_dir, "events").select("event_id", "user_id")

    def agg(decoded, fmt):
        eid = F.col("after").getItem("event_id").cast("bigint")
        uid = F.col("after").getItem("user_id").cast("bigint")
        return decoded.filter(F.col("op") == "insert").agg(
            F.count("*").alias("n"),
            F.sum(eid).alias("sum_eid"),
            F.sum(uid).alias("sum_uid"),
        ).select(F.lit(fmt).alias("format"), "n", "sum_eid", "sum_uid")

    # wal2json: declarative JSON encode, built-in decode
    change = F.struct(
        F.lit("insert").alias("kind"),
        F.lit("public").alias("schema"),
        F.lit("events").alias("table"),
        F.array(F.lit("event_id"), F.lit("user_id")).alias("columnnames"),
        F.array(F.lit("bigint"), F.lit("bigint")).alias("columntypes"),
        F.array(
            F.col("event_id").cast("string"), F.col("user_id").cast("string")
        ).alias("columnvalues"),
    )
    w2j_raw = ev.repartition(par).select(
        F.to_json(F.struct(F.array(change).alias("change"))).alias("value")
    )
    w2j = agg(decode_wal2json(w2j_raw), "wal2json")

    # test_decoding: text line encode, regex decode
    line = F.concat(
        F.lit("table public.events: INSERT: event_id[bigint]:"),
        F.col("event_id").cast("string"),
        F.lit(" user_id[bigint]:"),
        F.col("user_id").cast("string"),
    )
    td = agg(
        decode_test_decoding(ev.repartition(par).select(line.alias("value"))),
        "test_decoding",
    )

    # pgoutput: binary wire encode in pandas, Arrow-batched binary decode
    OID = 51299
    rel = pgf.encode_relation(
        OID, "public", "events",
        [("event_id", 20), ("user_id", 20)], key_columns=["event_id"],
    )

    def enc_pg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "seq": pdf["event_id"] + 1,
                    "lsn": (pdf["event_id"] * 8 + 16).map(lambda v: f"0/{v:X}"),
                    "data": [
                        pgf.encode_insert(OID, [("t", str(e)), ("t", str(u))])
                        for e, u in zip(pdf["event_id"], pdf["user_id"])
                    ],
                }
            )

    cache: dict = {}
    pgf.parse_message(rel, cache)
    pg = agg(
        decode_pgoutput(
            ev.repartition(par).mapInPandas(
                enc_pg, schema="seq long, lsn string, data binary"
            ),
            relations=cache,
        ),
        "pgoutput",
    )

    # decoderbufs: protobuf wire encode in pandas, pure-Python decode
    def enc_db(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "lsn": (pdf["event_id"] * 8 + 16).map(lambda v: f"0/{v:X}"),
                    "data": [
                        dbf.encode_row_message(
                            "insert",
                            xid=int(e),
                            table="public.events",
                            new_tuple=[
                                dbf.encode_datum("event_id", 20, int64=int(e)),
                                dbf.encode_datum("user_id", 20, int64=int(u)),
                            ],
                        )
                        for e, u in zip(pdf["event_id"], pdf["user_id"])
                    ],
                }
            )

    db = agg(
        decode_decoderbufs(
            ev.repartition(par).mapInPandas(enc_db, schema="lsn string, data binary")
        ),
        "decoderbufs",
    )

    return w2j.unionByName(td).unionByName(pg).unionByName(db)


@register(
    "q_cdc_masked_apply",
    """
    WITH contact AS (
      SELECT doc_id, source,
             'user' || CAST(doc_id AS VARCHAR) || '@example.com ip 10.0.0.'
               || CAST(doc_id % 256 AS VARCHAR) || ' acct '
               || CAST(100000000 + doc_id AS VARCHAR) AS c
      FROM documents),
    masked AS (
      SELECT doc_id, source,
             regexp_replace(
               regexp_replace(
                 regexp_replace(
                   c,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                   '<EMAIL>', 'g'),
                 '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b',
                 '<IP>', 'g'),
               '\\b\\d{9,}\\b', '<NUM>', 'g') AS mc
      FROM contact)
    SELECT source, COUNT(*) AS n_docs,
           CAST(SUM(len(mc)) AS BIGINT) AS sum_masked_len,
           CAST(SUM(CASE WHEN mc LIKE '%<EMAIL>%' THEN 1 ELSE 0 END)
             AS BIGINT) AS n_email_redacted
    FROM masked GROUP BY source ORDER BY source
    """,
    "in-stream PII masking policy: documents ride the wire as wal2json "
    "inserts with a synthesized contact column, the DECODED stream is "
    "masked (email/IP/account-number → tags) via transform_values "
    "BEFORE materialization, apply_changes builds the clean snapshot — "
    "the GDPR column-policy pattern where raw PII never reaches the "
    "replica",
)
def q_cdc_masked_apply(spark, sf_dir):
    """Masking runs inside the decode projection (JVM regexp on the
    after-image map via transform_values — no Python, no extra pass),
    so the materialized table and every downstream consumer only ever
    see redacted values; at 100 TB this costs zero extra jobs. The
    apply itself is the standard newest-per-key window. Cites the
    wal2json option surface (wal2json-plugin-options.type.ts:1-131) —
    the reference can filter tables server-side but has no value-level
    policy; this is the engine-side completion of that idea."""
    from pg_logical_replication_spark.operators.apply_changes import (
        apply_changes,
    )
    from pg_logical_replication_spark.operators.text import scrub_expr
    from pg_logical_replication_spark.sources.wal2json import decode_wal2json

    docs = t(spark, sf_dir, "documents")
    contact = F.concat(
        F.lit("user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com ip 10.0.0."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(" acct "),
        (F.col("doc_id") + 100000000).cast("string"),
    )
    change = F.struct(
        F.lit("insert").alias("kind"),
        F.lit("public").alias("schema"),
        F.lit("documents").alias("table"),
        F.array(F.lit("doc_id"), F.lit("source"), F.lit("contact")).alias(
            "columnnames"
        ),
        F.array(F.lit("bigint"), F.lit("text"), F.lit("text")).alias(
            "columntypes"
        ),
        F.array(
            F.col("doc_id").cast("string"), F.col("source"), contact
        ).alias("columnvalues"),
        F.lit(None)
        .cast(
            "struct<keynames:array<string>,keytypes:array<string>,"
            "keyvalues:array<string>>"
        )
        .alias("oldkeys"),
    )
    raw = docs.select(
        F.to_json(
            F.struct(
                F.array(change).alias("change"),
                F.col("doc_id").alias("xid"),
                lsn_str_expr(F.col("doc_id") * 8 + 16).alias("nextlsn"),
            )
        ).alias("value")
    )
    decoded = decode_wal2json(
        raw.repartition(spark.sparkContext.defaultParallelism)
    )

    masked = decoded.withColumn(
        "after",
        F.transform_values(
            F.col("after"),
            lambda k, v: F.when(k == "contact", scrub_expr(v)).otherwise(v),
        ),
    )
    snap = apply_changes(
        masked,
        key_columns=["doc_id"],
        table="documents",
        columns={"doc_id": "bigint", "source": "text", "contact": "text"},
    )
    return (
        snap.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.length("contact")).alias("sum_masked_len"),
            F.sum(
                F.when(F.col("contact").contains("<EMAIL>"), 1).otherwise(0)
            ).alias("n_email_redacted"),
        )
        .orderBy("source")
    )


@register(
    "q_cdc_msg_prefix_filter",
    """
    SELECT op, prefix, n, sum_val FROM (
      SELECT 'insert' AS op, CAST(NULL AS VARCHAR) AS prefix,
             COUNT(*) AS n, CAST(SUM(event_id) AS BIGINT) AS sum_val
      FROM events
      UNION ALL
      SELECT 'message' AS op, 'app' || CAST(event_id % 4 AS VARCHAR) AS prefix,
             COUNT(*) AS n, CAST(SUM(event_id) AS BIGINT) AS sum_val
      FROM events WHERE event_id % 5 = 0 AND event_id % 4 IN (1, 2)
      GROUP BY 2
    )
    """,
    "wal2json message-prefix option pushdown (filter-msg-prefixes excludes "
    "app0, then add-msg-prefixes keeps app1/app2 — the plugin's documented "
    "filter-before-add order, options type :100-109) with add-tables active, "
    "proving logical messages survive table predicates",
)
def q_cdc_msg_prefix_filter(spark, sf_dir):
    """Every event encodes a v1 changeset with one insert change; every
    5th also carries a kind='message' entry (wal2json messages support:
    prefix 'app<eid%4>', content = event_id). The decoder applies
    add_tables=['public.events'] (messages have no table — they must be
    exempt), filter_msg_prefixes=['app0'] and
    add_msg_prefixes=['app1','app2'] (so app3 drops via the add-list and
    app0 via the filter-list). Oracle replays the surviving set from the
    source rows."""
    from pg_logical_replication_spark.sources.wal2json import decode_wal2json

    ev = t(spark, sf_dir, "events")
    eid = F.col("event_id")
    lsn = lsn_str_expr(eid * 8 + 16)
    ins = F.struct(
        F.lit("insert").alias("kind"),
        F.lit("public").alias("schema"),
        F.lit("events").alias("table"),
        F.array(F.lit("event_id")).alias("columnnames"),
        F.array(F.lit("bigint")).alias("columntypes"),
        F.array(eid.cast("string")).alias("columnvalues"),
        F.lit(None).cast("string").alias("prefix"),
        F.lit(None).cast("string").alias("content"),
        F.lit(None).cast("boolean").alias("transactional"),
    )
    msg = F.struct(
        F.lit("message").alias("kind"),
        F.lit(None).cast("string").alias("schema"),
        F.lit(None).cast("string").alias("table"),
        F.lit(None).cast("array<string>").alias("columnnames"),
        F.lit(None).cast("array<string>").alias("columntypes"),
        F.lit(None).cast("array<string>").alias("columnvalues"),
        F.concat(F.lit("app"), (eid % 4).cast("string")).alias("prefix"),
        eid.cast("string").alias("content"),
        F.lit(True).alias("transactional"),
    )
    raw = ev.select(
        F.to_json(
            F.struct(
                F.when(eid % 5 == 0, F.array(ins, msg)).otherwise(F.array(ins))
                .alias("change"),
                eid.alias("xid"),
                lsn.alias("nextlsn"),
            )
        ).alias("value")
    )
    decoded = decode_wal2json(
        raw.repartition(spark.sparkContext.defaultParallelism),
        add_tables=["public.events"],
        filter_msg_prefixes=["app0"],
        add_msg_prefixes=["app1", "app2"],
    )
    val = F.coalesce(
        F.col("meta").getItem("content"), F.col("after").getItem("event_id")
    ).cast("bigint")
    return (
        decoded.groupBy("op", F.col("meta").getItem("prefix").alias("prefix"))
        .agg(F.count("*").alias("n"), F.sum(val).alias("sum_val"))
    )


@register(
    "q_cdc_pgoutput_jvm_encode",
    """
    SELECT CASE WHEN event_type = 'signup' THEN 'insert'
                WHEN event_type = 'error' THEN 'delete'
                ELSE 'update' END AS op,
           COUNT(*) AS n,
           CAST(SUM(event_id) AS BIGINT) AS sum_eid
    FROM events GROUP BY 1
    """,
    "DECLARATIVE pgoutput encode (sources/pgoutput_encode_sql.py: wire "
    "bytes from concat/unhex/lpad JVM expressions, zero Python on the "
    "encode side) -> Python decode -> aggregate: proves the two codecs "
    "agree end-to-end and that producing a pgoutput stream scales in "
    "whole-stage codegen",
)
def q_cdc_pgoutput_jvm_encode(spark, sf_dir):
    from pg_logical_replication_spark.sources import pgoutput_encode_sql as E
    from pg_logical_replication_spark.sources import pgoutput_format as pgf
    from pg_logical_replication_spark.sources.pgoutput import decode_pgoutput

    ev = t(spark, sf_dir, "events").select("event_id", "user_id", "event_type")
    eid = F.col("event_id")
    lsn = eid * 8 + 16
    new_tup = E.tuple_data(eid, F.col("user_id"))
    key_tup = E.tuple_data(eid)
    dml = (
        F.when(F.col("event_type") == "signup", E.encode_insert(16385, new_tup))
        .when(F.col("event_type") == "error", E.encode_delete(16385, key_tup))
        .otherwise(E.encode_update(16385, new_tup, old_key=key_tup))
    )
    msgs = ev.select(
        F.posexplode(
            F.array(E.encode_begin(lsn, 0, eid + 1), dml, E.encode_commit(lsn, lsn + 8, 0))
        ).alias("k", "data"),
        lsn.alias("_lsn"),
    ).select(
        F.lit(None).cast("string").alias("lsn"),
        (F.col("_lsn") * 4 + F.col("k")).alias("seq"),
        "data",
    )
    rel: dict = {}
    pgf.parse_message(
        pgf.encode_relation(
            16385, "public", "events",
            [("event_id", 20), ("user_id", 20)], key_columns=["event_id"],
        ),
        rel,
    )
    decoded = decode_pgoutput(
        msgs.repartition(spark.sparkContext.defaultParallelism), relations=rel
    )
    val = F.coalesce(
        F.col("after").getItem("event_id"), F.col("key").getItem("event_id")
    ).cast("bigint")
    return (
        decoded.filter(F.col("op").isin("insert", "update", "delete"))
        .groupBy("op")
        .agg(F.count("*").alias("n"), F.sum(val).alias("sum_eid"))
    )


@register(
    "q_cdc_dlq_stats",
    """
    SELECT CASE WHEN event_id % 13 = 0 THEN 'dead' ELSE 'decoded' END
             AS channel,
           COUNT(*) AS n,
           CAST(SUM(CASE WHEN event_id % 13 <> 0 THEN event_id END)
                AS BIGINT) AS sum_decoded_eid
    FROM events GROUP BY 1
    """,
    "the error channel (#24), oracle-gated: every 13th changeset is "
    "corrupted in-flight; the decode keeps flowing and dead_letters "
    "accounts for exactly the corrupted lines - decoded + dead must "
    "partition the input",
)
def q_cdc_dlq_stats(spark, sf_dir):
    """Happy path and DLQ come from ONE scan (Catalyst shares the
    from_json between decode and dead_letters when both run in a job) -
    the reference's per-message error events (:213-216) as a partition
    of the stream, never a halt."""
    from pg_logical_replication_spark.sources.registry import dead_letters
    from pg_logical_replication_spark.sources.wal2json import decode_wal2json

    ev = t(spark, sf_dir, "events").select("event_id")
    eid = F.col("event_id")
    good = F.to_json(
        F.struct(
            F.array(
                F.struct(
                    F.lit("insert").alias("kind"),
                    F.lit("public").alias("schema"),
                    F.lit("events").alias("table"),
                    F.array(F.lit("event_id")).alias("columnnames"),
                    F.array(F.lit("bigint")).alias("columntypes"),
                    F.array(eid.cast("string")).alias("columnvalues"),
                )
            ).alias("change"),
            eid.alias("xid"),
            lsn_str_expr(eid * 8 + 16).alias("nextlsn"),
        )
    )
    # corruption: truncate the JSON mid-object (a torn relay write)
    raw = ev.select(
        F.when(eid % 13 == 0, F.substring(good, 1, 25)).otherwise(good)
        .alias("value")
    ).repartition(spark.sparkContext.defaultParallelism)
    decoded = decode_wal2json(raw).select(
        F.lit("decoded").alias("channel"),
        F.col("after").getItem("event_id").cast("bigint").alias("eid"),
    )
    dead = dead_letters(raw, "wal2json").select(
        F.lit("dead").alias("channel"), F.lit(None).cast("bigint").alias("eid")
    )
    return (
        decoded.unionByName(dead)
        .groupBy("channel")
        .agg(F.count("*").alias("n"), F.sum("eid").alias("sum_decoded_eid"))
    )


@register(
    "q_cdc_copy_text_roundtrip",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(doc_id) AS BIGINT) AS sum_ids,
           CAST(SUM(LENGTH(text) + 3) AS BIGINT) AS sum_chars,
           CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
           CAST(COUNT(*) AS BIGINT) AS n_suffix_ok
    FROM documents
    """,
    "PostgreSQL COPY text-format render/parse roundtrip at corpus "
    "scale: every document (with a planted tab+newline+backslash "
    "suffix forcing the escape paths) renders via to_copy_text and "
    "parses back via parse_copy_lines — the bootstrap-snapshot and "
    "bulk-load (COPY FROM STDIN) codecs proven mutual inverses, all "
    "in whole-stage codegen; the oracle is the identity on documents",
)
def q_cdc_copy_text_roundtrip(spark, sf_dir):
    """sources/bootstrap.py: to_copy_text ∘ parse_copy_lines = id.
    The suffix plants the three escape-relevant characters in every
    row so the roundtrip exercises the fold/render pair corpus-wide,
    not just on fixture rows."""
    from pg_logical_replication_spark.sources.bootstrap import (
        parse_copy_lines,
        to_copy_text,
    )

    docs = t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(F.col("text"), F.lit("\t\n\\")).alias("text"),
        "lang",
    )
    lines = to_copy_text(docs, ["doc_id", "text", "lang"])
    back = parse_copy_lines(
        lines, {"doc_id": "bigint", "text": "text", "lang": "text"}
    )
    return back.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("doc_id").cast("long").alias("sum_ids"),
        F.sum(F.length("text")).cast("long").alias("sum_chars"),
        F.countDistinct("lang").cast("long").alias("n_langs"),
        F.sum(F.col("text").endswith("\t\n\\").cast("long"))
        .cast("long")
        .alias("n_suffix_ok"),
    )


@register(
    "q_cdc_bootstrap_apply",
    """
    WITH snap AS (SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0),
    stream AS (
      SELECT doc_id, text || ' v2' AS text FROM documents
      WHERE doc_id % 3 = 0
      UNION ALL
      SELECT doc_id + 1000000 AS doc_id, text FROM documents
      WHERE doc_id % 5 = 0),
    final AS (
      SELECT doc_id,
             COALESCE(
               (SELECT s.text FROM stream s WHERE s.doc_id = u.doc_id),
               (SELECT sn.text FROM snap sn WHERE sn.doc_id = u.doc_id))
               AS text
      FROM (SELECT doc_id FROM snap UNION SELECT doc_id FROM stream) u)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(doc_id) AS BIGINT) AS sum_ids,
           CAST(SUM(LENGTH(text)) AS BIGINT) AS sum_chars,
           CAST(SUM(CASE WHEN text LIKE '% v2' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_updated
    FROM final
    """,
    "the full bootstrap deployment flow as one oracle-gated plan: "
    "even-id documents arrive as a COPY snapshot (rendered to real "
    "COPY text and parsed back — the escape codec in the loop), "
    "multiples of 3 arrive as streamed wal2json updates and multiples "
    "of 5 as streamed inserts of NEW keys; ONE apply_changes over "
    "bootstrap_events UNION decode gives streamed rows precedence by "
    "LSN — snapshot-only keys keep snapshot text, streamed keys win",
)
def q_cdc_bootstrap_apply(spark, sf_dir):
    """sources/bootstrap.py end-to-end: to_copy_text → parse_copy_lines
    → bootstrap_events at the consistent point, unioned with a decoded
    wal2json stream carrying later LSNs, one apply_changes."""
    from pg_logical_replication_spark.operators.apply_changes import (
        apply_changes,
    )
    from pg_logical_replication_spark.sources.bootstrap import (
        bootstrap_events,
        parse_copy_lines,
        to_copy_text,
    )
    from pg_logical_replication_spark.sources.wal2json import decode_wal2json

    docs = t(spark, sf_dir, "documents")
    snap = parse_copy_lines(
        to_copy_text(
            docs.filter(F.col("doc_id") % 2 == 0).select("doc_id", "text"),
            ["doc_id", "text"],
        ),
        {"doc_id": "bigint", "text": "text"},
    )
    snap_ev = bootstrap_events(snap, "docs", lsn="0/00000010")

    def change(kind, id_col, text_col):
        return F.to_json(
            F.struct(
                F.array(
                    F.struct(
                        F.lit(kind).alias("kind"),
                        F.lit("public").alias("schema"),
                        F.lit("docs").alias("table"),
                        F.array(F.lit("doc_id"), F.lit("text")).alias(
                            "columnnames"
                        ),
                        F.array(F.lit("bigint"), F.lit("text")).alias(
                            "columntypes"
                        ),
                        F.array(
                            id_col.cast("string"), text_col
                        ).alias("columnvalues"),
                    )
                ).alias("change"),
                lsn_str_expr((id_col * 8 + 0x1000).cast("long")).alias(
                    "nextlsn"
                ),
            )
        ).alias("value")

    updates = docs.filter(F.col("doc_id") % 3 == 0).select(
        change("update", F.col("doc_id"), F.concat("text", F.lit(" v2")))
    )
    inserts = docs.filter(F.col("doc_id") % 5 == 0).select(
        change("insert", F.col("doc_id") + 1_000_000, F.col("text"))
    )
    stream_ev = decode_wal2json(updates.unionByName(inserts))
    events = snap_ev.unionByName(stream_ev, allowMissingColumns=True)
    # flags hold by construction (insert/update-only changesets whose
    # updates carry no oldkeys -> key NULL -> key_change_predicate is
    # provably false; no truncates): the unpersisted copy-text parse +
    # JVM decode lineage is consumed once instead of three times
    # (optimization r11 — see apply_changes' contract)
    table = apply_changes(
        events,
        key_columns=["doc_id"],
        table="docs",
        columns={"doc_id": "bigint", "text": "text"},
        no_truncates=True,
        no_key_splits=True,
    )
    return table.agg(
        F.count("*").cast("long").alias("n_rows"),
        F.sum("doc_id").cast("long").alias("sum_ids"),
        F.sum(F.length("text")).cast("long").alias("sum_chars"),
        F.sum(F.col("text").endswith(" v2").cast("long"))
        .cast("long")
        .alias("n_updated"),
    )


@register(
    "q_cdc_update_conflicts",
    """
    WITH w AS (SELECT event_id // 100 AS win, event_id % 3 AS origin,
                      user_id, event_id
               FROM events),
    per_key AS (SELECT win, user_id,
                       COUNT(DISTINCT origin) AS n_origins,
                       CAST(COUNT(*) AS BIGINT) AS n_writes,
                       CAST(arg_max(origin, event_id) AS BIGINT)
                         AS winner_origin
                FROM w GROUP BY 1, 2)
    SELECT CAST(win AS BIGINT) AS win, winner_origin,
           CAST(COUNT(*) AS BIGINT) AS n_conflict_keys,
           CAST(SUM(n_writes) AS BIGINT) AS n_conflict_writes
    FROM per_key WHERE n_origins >= 2
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
    "multi-origin write-write conflict detection (the pglogical/BDR "
    "conflict dashboard): within each reconciliation window (txn "
    "block), keys written from >=2 replication origins are conflicts, "
    "resolved last-writer-wins by stream position (arg_max / max_by) — "
    "per (window, winning origin): conflicted keys + writes involved",
)
def q_cdc_update_conflicts(spark, sf_dir):
    """Three synthetic origins interleave on event_id % 3 (the same
    per-txn-block convention as q_cdc_origin_filter's every-4th-txn
    marker). Scale: ONE shuffle keyed (window, key) — state is bounded
    by the reconciliation window, not the stream; the winner falls out
    of the same aggregate via max_by (no second pass, no window sort).
    Reference parity: the reference surfaces origin per message
    (pgoutput 'O' frames) but leaves conflict resolution to the
    consumer — this is that consumer query, engine-side.
    """
    ev = t(spark, sf_dir, "events")
    per_key = (
        ev.select(
            F.expr("event_id div 100").alias("win"),
            (F.col("event_id") % 3).alias("origin"),
            "user_id",
            "event_id",
        )
        .groupBy("win", "user_id")
        .agg(
            # ">=2 distinct origins" as min!=max: same predicate, no
            # count-distinct Expand and no extra shuffle
            F.min("origin").alias("o_min"),
            F.max("origin").alias("o_max"),
            F.count("*").cast("long").alias("n_writes"),
            F.max_by("origin", "event_id").cast("long").alias(
                "winner_origin"
            ),
        )
    )
    return (
        per_key.filter(F.col("o_min") != F.col("o_max"))
        .groupBy("win", "winner_origin")
        .agg(
            F.count("*").cast("long").alias("n_conflict_keys"),
            F.sum("n_writes").cast("long").alias("n_conflict_writes"),
        )
        .orderBy("win", "winner_origin")
    )


@register(
    "q_cdc_slot_retention",
    """
    WITH rec AS (SELECT event_id // 100 AS seg,
                        (event_id * 8 + 16) AS lsn_long,
                        24 + len(COALESCE(props, '')) +
                        len(COALESCE(event_type, '')) AS wal_bytes
                 FROM events),
    segs AS (SELECT seg,
                    CAST(SUM(wal_bytes) AS BIGINT) AS seg_bytes,
                    CAST(MAX(lsn_long) AS BIGINT) AS end_lsn_long
             FROM rec GROUP BY 1),
    tot AS (SELECT CAST(SUM(seg_bytes) AS BIGINT) AS total_bytes FROM segs),
    cum AS (SELECT seg, seg_bytes, end_lsn_long,
                   CAST(SUM(seg_bytes) OVER (ORDER BY seg
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_bytes
            FROM segs)
    SELECT seg,
           upper(lpad(to_hex(end_lsn_long // 4294967296), 8, '0')) || '/' ||
           upper(lpad(to_hex(end_lsn_long % 4294967296), 8, '0'))
             AS ack_lsn,
           seg_bytes,
           CAST(total_bytes - cum_bytes AS BIGINT) AS bytes_retained,
           CAST((total_bytes - cum_bytes) * 1000000 // total_bytes
                AS BIGINT) AS retained_ppm
    FROM cum, tot ORDER BY seg
    """,
    "slot retention projection — logical replication's disk-pressure "
    "model: per acknowledgeable position (segment end LSN), how many "
    "WAL bytes the server must retain if the consumer's "
    "confirmed_flush_lsn stops there; the operational readout behind "
    "the reference's acknowledge() contract (a consumer that never "
    "acks retains 100%)",
)
def q_cdc_slot_retention(spark, sf_dir):
    """Prefix sum over per-segment WAL byte totals via
    operators/layout.py global_running_sum (range exchange, no
    SinglePartition window) — segments are the ack granularity, so the
    running table is |segments| rows regardless of stream size. WAL
    record cost model: 24-byte header + payload lengths; LSN = the
    q_cdc family's event_id*8+16 convention."""
    from pg_logical_replication_spark.operators.layout import (
        global_running_sum,
    )

    ev = t(spark, sf_dir, "events")
    rec = ev.select(
        F.expr("event_id div 100").alias("seg"),
        (F.col("event_id") * 8 + 16).alias("lsn_long"),
        (
            F.lit(24)
            + F.length(F.coalesce("props", F.lit("")))
            + F.length(F.coalesce("event_type", F.lit("")))
        ).alias("wal_bytes"),
    )
    segs = rec.groupBy("seg").agg(
        F.sum("wal_bytes").cast("long").alias("seg_bytes"),
        F.max("lsn_long").cast("long").alias("end_lsn_long"),
    )
    cum = global_running_sum(segs, ["seg"], "seg_bytes", out_col="cum_bytes")
    tot = segs.agg(F.sum("seg_bytes").cast("long").alias("total_bytes"))
    return (
        cum.crossJoin(F.broadcast(tot))
        .select(
            "seg",
            lsn_str_expr("end_lsn_long").alias("ack_lsn"),
            "seg_bytes",
            (F.col("total_bytes") - F.col("cum_bytes"))
            .cast("long")
            .alias("bytes_retained"),
            F.expr(
                "(total_bytes - cum_bytes) * 1000000 div total_bytes"
            ).cast("long").alias("retained_ppm"),
        )
        .orderBy("seg")
    )


@register(
    "q_cdc_apply_multi_evolution",
    """
    WITH n AS (SELECT COUNT(*) AS c FROM events),
    e AS (SELECT event_id, user_id FROM events WHERE event_id % 3 = 0),
    o AS (SELECT 'orders' AS tbl, CAST(event_id % 5 AS BIGINT) AS g,
                 CAST(COUNT(*) AS BIGINT) AS n_rows,
                 CAST(SUM(CASE WHEN event_id < (SELECT c // 2 FROM n)
                               THEN 1 ELSE 0 END) AS BIGINT) AS n_backfilled,
                 CAST(SUM(CASE WHEN event_id >= (SELECT c // 2 FROM n)
                               THEN user_id END) AS BIGINT) AS sum_val
          FROM e GROUP BY 2),
    u AS (SELECT 'users' AS tbl, CAST(event_id % 5 AS BIGINT) AS g,
                 CAST(COUNT(*) AS BIGINT) AS n_rows,
                 CAST(SUM(CASE WHEN event_id < (SELECT c // 3 FROM n)
                               THEN 1 ELSE 0 END) AS BIGINT) AS n_backfilled,
                 CAST(SUM(CASE WHEN event_id >= (SELECT c // 3 FROM n)
                               THEN 2 * event_id END) AS BIGINT) AS sum_val
          FROM e GROUP BY 2),
    i AS (SELECT 'items' AS tbl, CAST(event_id % 5 AS BIGINT) AS g,
                 CAST(COUNT(*) AS BIGINT) AS n_rows,
                 CAST(0 AS BIGINT) AS n_backfilled,
                 CAST(SUM(event_id % 7 + 1) AS BIGINT) AS sum_val
          FROM e GROUP BY 2)
    SELECT * FROM (SELECT * FROM o UNION ALL SELECT * FROM u
                   UNION ALL SELECT * FROM i)
    ORDER BY tbl, g
    """,
    "MULTI-TABLE schema evolution under ONE stream, oracle-gated "
    "(VERDICT r9 #4): three relations interleave in a single pgoutput "
    "stream — orders gains a column at the halfway point, users gains "
    "one at the third (independent ALTER positions), items never "
    "evolves — and three columns='evolve' materializations must each "
    "fold ONLY their own relation's versions (the OID-keyed relation "
    "cache semantics, pgoutput-parser.ts:22,107): orders' pre-ALTER "
    "rows NULL-backfill its column, users' its own, and items' "
    "contract never widens",
)
def q_cdc_apply_multi_evolution(spark, sf_dir):
    """Per-table isolation of the evolution fold: one decoded stream,
    three per-table evolved snapshots, one census.
    Scale: ONE decode pass (single-consumer — no persist), one
    registry-sized contract fold for all tables over the relation
    sub-stream, ONE key shuffle shared by the three tables
    (latest_image keys on (schema, table, identity)), one grouped
    census over it."""
    from collections.abc import Iterator

    import pandas as pd

    from pg_logical_replication_spark.sources import pgoutput_format as pgf
    from pg_logical_replication_spark.sources.pgoutput import decode_pgoutput

    OID_O, OID_U, OID_I = 51301, 51302, 51303
    ev_all = t(spark, sf_dir, "events").select("event_id", "user_id")
    n = table_rows(sf_dir, "events")  # dense 0..N-1; footer count
    half, third = n // 2, n // 3
    # three messages per event would make the SYNTHETIC encode (test-
    # harness side — at scale the wire is the input) 3x the single-
    # table fixtures' cost; every third event keeps the per-query wire
    # volume in family while eras/groups stay fully populated
    ev = ev_all.filter(F.col("event_id") % 3 == 0)

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            seqs, data = [], []
            for e, uval in zip(pdf["event_id"], pdf["user_id"]):
                eid, uid = int(e), int(uval)
                base = eid * 30 + 10
                # orders: v2 (adds amount=user_id) from the halfway point
                seqs.append(base)
                if eid < half:
                    data.append(pgf.encode_insert(OID_O, [("t", str(eid))]))
                else:
                    data.append(pgf.encode_insert(
                        OID_O, [("t", str(eid)), ("t", str(uid))]
                    ))
                # users: v2 (adds score=2*event_id) from the third
                seqs.append(base + 1)
                if eid < third:
                    data.append(pgf.encode_insert(OID_U, [("t", str(eid))]))
                else:
                    data.append(pgf.encode_insert(
                        OID_U, [("t", str(eid)), ("t", str(2 * eid))]
                    ))
                # items: never evolves
                seqs.append(base + 2)
                data.append(pgf.encode_insert(
                    OID_I, [("t", str(eid)), ("t", str(eid % 7 + 1))]
                ))
            yield pd.DataFrame(
                {"lsn": [f"0/{q * 8 + 16:X}" for q in seqs], "seq": seqs,
                 "data": data}
            )

    wire = ev.repartition(spark.sparkContext.defaultParallelism).mapInPandas(
        encode, schema="lsn string, seq long, data binary"
    )

    rel_bufs = [
        (seq, oid, pgf.encode_relation(
            oid, "public", name, cols, key_columns=[key]
        ))
        for seq, oid, name, cols, key in (
            (0, OID_O, "orders", [("order_id", 20)], "order_id"),
            (1, OID_U, "users", [("uid", 20)], "uid"),
            (2, OID_I, "items", [("item_id", 20), ("qty", 20)], "item_id"),
            # independent ALTER positions: orders at n/2, users at n/3
            (half * 30 + 5, OID_O, "orders",
             [("order_id", 20), ("amount", 20)], "order_id"),
            (third * 30 + 6, OID_U, "users",
             [("uid", 20), ("score", 20)], "uid"),
        )
    ]
    rels = spark.createDataFrame(
        [(f"0/{seq * 8 + 16:X}", seq, bytearray(buf))
         for seq, _, buf in rel_bufs],
        "lsn string, seq long, data binary",
    )
    # versioned registry + rel-substream contract fold (optimization
    # r11): the one-pass multi-table fold (optimization r10) reads ONLY
    # the 'R' rows, and every 'R' row in the union comes from `rels` —
    # folding over the decoded relation sub-stream (byte-identical per
    # table) makes the full decode single-consumer (the shared
    # latest_image pass below), so the stream persist goes away and
    # encode, decode, key shuffle and census pipeline in ONE action.
    # See q_cdc_apply_schema_evolution for the full argument.
    _registry: dict = {}
    for seq, oid, buf in rel_bufs:
        _registry.setdefault(oid, []).append((seq, _rel_info(pgf, buf, oid)))
    decoded = decode_pgoutput(wire.unionByName(rels), relations=_registry)
    from pg_logical_replication_spark.operators.schema_evolution import (
        stream_column_contracts,
    )

    contracts = stream_column_contracts(
        decode_pgoutput(rels, relations=_registry),
        ["orders", "users", "items"],
    )
    # Shared-pass precondition (ADVICE r10 low): the union identity
    # list is only equivalent to three per-table applies while no table
    # carries another table's key NAME as a non-key column — an
    # evolution adding e.g. a 'uid' column to orders would make that
    # identity slot non-NULL inside orders groups and split one order's
    # events into multiple groups. Assert it against the contracts the
    # stream itself declared, so a future fixture edit fails loudly
    # here instead of shipping a wrong snapshot.
    _own_key = {"orders": "order_id", "users": "uid", "items": "item_id"}
    for _t, _cols in contracts.items():
        _foreign = (set(_own_key.values()) - {_own_key[_t]}) & set(_cols)
        assert not _foreign, (
            f"shared latest_image precondition violated: table {_t!r} "
            f"carries foreign key name(s) {sorted(_foreign)} — split "
            "into per-table apply_changes calls"
        )

    # ONE combined newest-per-key pass for all three tables
    # (optimization r10, guide §2.1 "remove shuffles outright"):
    # latest_image already keys its aggregate on (schema, table,
    # _identity), so the three per-table apply_changes shuffles
    # collapse into a single exchange over the same decoded rows — the
    # union key list builds an identity array whose foreign-table
    # slots are NULL inside each table's group, grouping exactly as
    # that table's single-key identity does (table is in the grouping
    # key; grouping treats NULL = NULL). The snapshot semantics are
    # apply_changes' own — op filter, typed pg_value casts under each
    # table's contract — applied per row after the shared pass, and
    # the three censuses fold into ONE grouped aggregate instead of a
    # union whose branches each re-ran the pass.
    from pg_logical_replication_spark.functions import pg_value
    from pg_logical_replication_spark.operators.apply_changes import (
        latest_image,
    )

    ev = decoded.select(
        "op", "schema", "table", "key", "after", "lsn_long", "seq", "meta"
    )
    # flags hold by construction: insert-only wire, no truncates — the
    # unpersisted stream is consumed exactly once (see
    # q_cdc_apply_schema_evolution)
    live = latest_image(
        ev, key_columns=["order_id", "uid", "item_id"],
        no_truncates=True, no_key_splits=True,
    ).filter(F.col("op") != "delete")

    def typed(tname, cname):
        if cname not in contracts[tname]:
            return F.lit(None)
        return pg_value(
            F.col("after").getItem(cname), contracts[tname][cname]
        )

    tbl = F.col("table")
    key_val = (
        F.when(tbl == "orders", typed("orders", "order_id"))
        .when(tbl == "users", typed("users", "uid"))
        .otherwise(typed("items", "item_id"))
    )
    val = (
        F.when(tbl == "orders", typed("orders", "amount"))
        .when(tbl == "users", typed("users", "score"))
        .otherwise(typed("items", "qty"))
    )
    return (
        live.groupBy(tbl.alias("tbl"), (key_val % 5).alias("g"))
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.sum(F.when(val.isNull(), 1).otherwise(0))
            .cast("long").alias("n_backfilled"),
            F.sum(val).cast("long").alias("sum_val"),
        )
        .orderBy("tbl", "g")
    )


@register(
    "q_cdc_evolve_wal2json",
    """
    WITH n AS (SELECT COUNT(*) AS c FROM events)
    SELECT CAST(event_id % 10 AS BIGINT) AS g,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN event_id < (SELECT c // 3 FROM n)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_backfilled,
           CAST(CAST(SUM(CASE WHEN event_id >= (SELECT c // 3 FROM n)
                              THEN CAST(user_id AS DECIMAL(38,18)) + 0.25 END)
                     AS DECIMAL(38,2)) AS DOUBLE) AS sum_bal,
           CAST(SUM(CASE WHEN event_id >= (SELECT c // 3 FROM n)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_tagged
    FROM events GROUP BY 1 ORDER BY 1
    """,
    "schema evolution through wal2json's PER-ROW typmod'd coltypes, "
    "oracle-gated (ADVICE r9 medium): wal2json carries no relation "
    "messages — the contract folds from DISTINCT per-row column "
    "signatures whose type names keep their typmods by default "
    "(numeric(10,2), character varying(20)); the embedded commas must "
    "survive the signature split, two added columns NULL-backfill the "
    "first era, and the second ALTER widens both typmods "
    "(numeric(10,2)->numeric(12,2), varchar(20)->varchar(40)) so the "
    "fold keeps the wider declarations; sums over the evolved decimal "
    "column stay exact in decimal and surface as DOUBLE (the sibling "
    "aggregate idiom — a raw DECIMAL(38,18) output column was the one "
    "representation the driver's sf0.01 hash compare rejected, r10)",
)
def q_cdc_evolve_wal2json(spark, sf_dir):
    """The wal2json leg of the evolution story, end-to-end and fully
    JVM-declarative: events serialize to wal2json v1 changesets in-query
    (to_json — zero UDF), decode_wal2json keeps typmod'd coltypes
    (include_typmod default), apply_changes columns='evolve' folds the
    three per-row signatures, and the census gates the widened snapshot.
    Scale: the signature fold is one DISTINCT (names, types) hash
    aggregate over the stream (tiny output); the snapshot is
    latest_image's one key shuffle; the census one hash aggregate."""
    from pg_logical_replication_spark.operators.apply_changes import (
        apply_changes,
    )
    from pg_logical_replication_spark.sources.wal2json import decode_wal2json

    ev = t(spark, sf_dir, "events").select("event_id", "user_id")
    n = table_rows(sf_dir, "events")  # dense 0..N-1; footer count
    third = n // 3
    lsn = lsn_str_expr(F.col("event_id") * 8 + 16)
    era = (
        F.when(F.col("event_id") < third, 1)
        .when(F.col("event_id") < 2 * third, 2)
        .otherwise(3)
    )
    bal = F.concat(F.col("user_id").cast("string"), F.lit(".25"))
    tag2 = F.concat(F.lit("u"), F.col("user_id").cast("string"))
    tag3 = F.concat(F.lit("user_"), F.col("user_id").cast("string"))
    change = F.when(
        era == 1,
        F.struct(
            F.lit("insert").alias("kind"),
            F.lit("public").alias("schema"),
            F.lit("events").alias("table"),
            F.array(F.lit("event_id")).alias("columnnames"),
            F.array(F.lit("bigint")).alias("columntypes"),
            F.array(F.col("event_id").cast("string")).alias("columnvalues"),
        ),
    ).otherwise(
        F.struct(
            F.lit("insert").alias("kind"),
            F.lit("public").alias("schema"),
            F.lit("events").alias("table"),
            F.array(
                F.lit("event_id"), F.lit("balance"), F.lit("tag")
            ).alias("columnnames"),
            F.when(
                era == 2,
                F.array(F.lit("bigint"), F.lit("numeric(10,2)"),
                        F.lit("character varying(20)")),
            ).otherwise(
                F.array(F.lit("bigint"), F.lit("numeric(12,2)"),
                        F.lit("character varying(40)")),
            ).alias("columntypes"),
            F.array(
                F.col("event_id").cast("string"),
                bal,
                F.when(era == 2, tag2).otherwise(tag3),
            ).alias("columnvalues"),
        ),
    )
    raw = ev.select(
        F.to_json(
            F.struct(F.array(change).alias("change"), lsn.alias("nextlsn"))
        ).alias("value")
    )
    # persist stays (measured, r11: the JVM to_json+from_json lineage
    # evaluated twice is SLOWER than one persist — unpersisted variant
    # 2.47-2.70 s vs 1.90 s min-of-4); the per-row signature fold and
    # the snapshot both read the cache. Skip flags hold by construction
    # (insert-only changesets, no truncates), cutting latest_image's
    # extra cache reads: 2.14-2.53 -> 1.90 s.
    decoded = decode_wal2json(
        raw.repartition(spark.sparkContext.defaultParallelism)
    ).persist()
    snap = apply_changes(
        decoded, key_columns=["event_id"], table="events", columns="evolve",
        no_truncates=True, no_key_splits=True,
    )
    return (
        snap.groupBy((F.col("event_id") % 10).alias("g"))
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.sum(F.when(F.col("balance").isNull(), 1).otherwise(0))
            .cast("long").alias("n_backfilled"),
            F.sum("balance").cast("double").alias("sum_bal"),
            F.sum(F.when(F.col("tag").isNotNull(), 1).otherwise(0))
            .cast("long").alias("n_tagged"),
        )
        .orderBy("g")
    )


@register(
    "q_cdc_net_changes",
    f"""
    WITH ranked AS (
      SELECT user_id, {_OP_CASE} AS op, event_id,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY event_id) AS rn_a,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY event_id DESC) AS rn_d,
             COUNT(*) OVER (PARTITION BY user_id) AS n_ch
      FROM events),
    f AS (SELECT user_id, op AS first_op FROM ranked WHERE rn_a = 1),
    l AS (SELECT user_id, op AS last_op, event_id AS last_eid, n_ch
          FROM ranked WHERE rn_d = 1),
    net AS (
      SELECT f.user_id,
             CASE WHEN f.first_op = 'insert' AND l.last_op = 'delete'
                    THEN 'none'
                  WHEN f.first_op = 'insert' THEN 'insert'
                  WHEN l.last_op = 'delete' THEN 'delete'
                  ELSE 'update' END AS net_op,
             l.last_eid, l.n_ch
      FROM f JOIN l ON f.user_id = l.user_id)
    SELECT net_op, CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(SUM(last_eid) AS BIGINT) AS sum_last_lsn,
           CAST(SUM(n_ch) AS BIGINT) AS n_changes
    FROM net GROUP BY 1 ORDER BY 1
    """,
    "per-key NET-effect compaction of a change batch (Debezium event-"
    "flattening + changelog-compaction semantics): first insert + last "
    "delete cancel to 'none', first insert folds to one net insert of "
    "the last image, a delete on a pre-existing key nets 'delete', "
    "everything else nets 'update' — the squash a warehouse sink "
    "applies before an expensive MERGE; gated per net_op on key count, "
    "last-position mass, and folded change count",
)
def q_cdc_net_changes(spark, sf_dir):
    """operators/apply_changes.net_changes end-to-end: events lift to
    ChangeEvent rows JVM-side (no wire encode — the squash is the thing
    under test), one min_by/max_by hash aggregation per key, census by
    net_op. Scale: the squash is ONE key shuffle with map-side partial
    aggregation (no window sort); the census a 4-row hash aggregate."""
    from pg_logical_replication_spark.operators.apply_changes import (
        net_changes,
    )

    ev = t(spark, sf_dir, "events").select("event_id", "user_id", "event_type")
    changes = ev.select(
        F.expr(_OP_CASE).alias("op"),
        F.col("event_id").alias("lsn_long"),
        F.lit("events").alias("table"),
        F.create_map(
            F.lit("user_id"), F.col("user_id").cast("string")
        ).alias("key"),
        F.when(
            F.expr(_OP_CASE) != "delete",
            F.create_map(
                F.lit("user_id"), F.col("user_id").cast("string"),
                F.lit("event_id"), F.col("event_id").cast("string"),
            ),
        ).alias("after"),
    )
    net = net_changes(changes, key_columns=["user_id"])
    return (
        net.groupBy("net_op")
        .agg(
            F.count("*").cast("long").alias("n_keys"),
            F.sum("last_lsn_long").cast("long").alias("sum_last_lsn"),
            F.sum("n_changes").cast("long").alias("n_changes"),
        )
        .orderBy("net_op")
    )


@register(
    "q_cdc_bitemporal_snapshot",
    """
    WITH n AS (SELECT COUNT(*) AS c FROM events),
    b AS (
      SELECT user_id, event_type, value, event_id,
             ts - (event_id % 7) * INTERVAL 1 DAY AS valid_ts
      FROM events
      WHERE event_id < 3 * (SELECT c FROM n) // 5)
    SELECT user_id, event_type AS last_op, value AS last_value FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                ORDER BY valid_ts DESC, event_id DESC) AS rn
      FROM b WHERE valid_ts <= TIMESTAMP '2024-01-16 00:00:00')
    WHERE rn = 1 AND event_type <> 'error'
    """,
    "BITEMPORAL as-of: two independent time axes — transaction time "
    "(wire position: only changes replicated by T exist) and valid time "
    "(each change backdates its business-effective timestamp by a "
    "per-row lag, the late-arriving-correction pattern) — snapshot at "
    "(valid V, transaction T): among versions known by T and valid by "
    "V, the newest VALID one wins per key, tombstones drop; extends "
    "q_cdc_asof_snapshot's single transaction-time axis",
)
def q_cdc_bitemporal_snapshot(spark, sf_dir):
    """Bitemporal table-as-of over the CDC stream: the transaction-time
    cut is the pushed-down wire-position filter (identical to as-of),
    valid time is a derived business timestamp ordered per key. Scale:
    the transaction cut AND a coarse valid bound (valid_ts <= V implies
    ts <= V + max-lag, a plain column predicate) both reach the parquet
    scan, so a 100 TB history prices by partition pruning; what remains
    is the one per-key window apply_changes already pays."""
    from pyspark.sql import Window as W

    ev = t(spark, sf_dir, "events")
    n = table_rows(sf_dir, "events")  # footer count, no Spark job
    tcut = 3 * n // 5
    v = F.lit("2024-01-16 00:00:00").cast("timestamp")
    b = (
        ev.filter(F.col("event_id") < tcut)
        # redundant coarse bound in the PUSHABLE column: lag is 0-6
        # days, so valid_ts <= V implies ts <= V + 7d — this one hits
        # the reader while the exact predicate below runs post-derive
        .filter(F.col("ts") <= F.lit("2024-01-23 00:00:00").cast("timestamp"))
        .withColumn(
            "valid_ts",
            F.col("ts")
            - F.expr("make_dt_interval(CAST(event_id % 7 AS INT), 0, 0, 0)"),
        )
        .filter(F.col("valid_ts") <= v)
    )
    w = W.partitionBy("user_id").orderBy(
        F.col("valid_ts").desc(), F.col("event_id").desc()
    )
    return (
        b.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("event_type") != "error"))
        .select(
            "user_id",
            F.col("event_type").alias("last_op"),
            F.col("value").alias("last_value"),
        )
    )
