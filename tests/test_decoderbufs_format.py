"""decoderbufs protobuf codec unit tests — pure Python, no SparkSession.

Shape contract per the reference's proto mirror
(pg_logicaldec.proto.ts:2-159) and plugin (decoderbufs-plugin.ts:38-40)."""

from pg_logical_replication_spark.sources import decoderbufs_format as fmt


def test_insert_roundtrip():
    msg = fmt.encode_row_message(
        "insert",
        xid=771,
        commit_time_us=1_755_000_000_000_000,
        table="public.users",
        new_tuple=[
            fmt.encode_datum("id", 20, int64=1),
            fmt.encode_datum("firstname", 25, string="alice"),
            fmt.encode_datum("deleted", 16, boolean=False),
            fmt.encode_datum("score", 701, float64=1.5),
            fmt.encode_datum("ratio", 700, float32=0.5),
            fmt.encode_datum("blob", 17, binary=b"\x00\xff"),
            fmt.encode_datum("loc", 600, point=(1.0, -2.0)),
        ],
    )
    ev = fmt.parse_row_message(msg)
    assert ev["op"] == "insert"
    assert ev["xid"] == 771
    assert ev["commit_ts_us"] == 1_755_000_000_000_000
    assert ev["schema"] == "public" and ev["table"] == "users"
    a = ev["after"]
    assert a["id"] == "1"
    assert a["firstname"] == "alice"
    assert a["deleted"] == "false"
    assert a["score"] == "1.5"
    assert a["ratio"] == "0.5"
    assert a["blob"] == "\\x00ff"
    assert a["loc"] == "(1.0,-2.0)"


def test_update_with_old_tuple_and_key():
    msg = fmt.encode_row_message(
        "update",
        xid=5,
        table="public.users",
        new_tuple=[fmt.encode_datum("id", 20, int64=2), fmt.encode_datum("v", 25, string="new")],
        old_tuple=[fmt.encode_datum("id", 20, int64=1)],
    )
    ev = fmt.parse_row_message(msg)
    assert ev["op"] == "update"
    assert ev["before"] == {"id": "1"}
    assert ev["key"] == {"id": "1"}
    assert ev["after"] == {"id": "2", "v": "new"}


def test_delete_and_markers():
    d = fmt.parse_row_message(
        fmt.encode_row_message(
            "delete", table="public.users", old_tuple=[fmt.encode_datum("id", 20, int64=9)]
        )
    )
    assert d["op"] == "delete" and d["key"] == {"id": "9"} and d["after"] is None

    b = fmt.parse_row_message(fmt.encode_row_message("begin", xid=7))
    assert b["op"] == "begin" and b["xid"] == 7 and b["table"] is None
    c = fmt.parse_row_message(fmt.encode_row_message("commit", xid=7))
    assert c["op"] == "commit"


def test_missing_datum_is_toast():
    """datum_missing ≙ pgoutput unchanged-TOAST: absent from the image,
    recorded in meta (proto field 11, pg_logicaldec.proto.ts)."""
    msg = fmt.encode_row_message(
        "update",
        table="public.t",
        new_tuple=[
            fmt.encode_datum("id", 20, int64=1),
            fmt.encode_datum("big", 25, missing=True),
        ],
    )
    ev = fmt.parse_row_message(msg)
    assert ev["after"] == {"id": "1"}
    assert ev["meta"]["unchanged_toast"] == "big"


def test_negative_int32_and_unknown_op():
    ev = fmt.parse_row_message(
        fmt.encode_row_message(
            "insert", table="public.t", new_tuple=[fmt.encode_datum("n", 23, int32=-42)]
        )
    )
    assert ev["after"]["n"] == "-42"
    u = fmt.parse_row_message(fmt.encode_row_message("unknown"))
    assert u["op"] == "unknown"


def test_parse_row_message_fuzz_never_hangs():
    """Hypothesis fuzz for the pure-Python protobuf wire codec: random
    bytes either parse (protobuf is permissive — unknown fields skip) or
    raise cleanly; no hangs, no non-dict results."""
    from hypothesis import given, settings, strategies as st

    from pg_logical_replication_spark.sources import decoderbufs_format as dbf

    @settings(max_examples=300, deadline=1000)
    @given(st.binary(min_size=0, max_size=64))
    def run(buf):
        try:
            msg = dbf.parse_row_message(buf)
        except Exception as ex:  # noqa: BLE001 — raising IS the contract
            assert not isinstance(ex, (SystemExit, KeyboardInterrupt))
            return
        assert isinstance(msg, dict)

    run()
