"""START_REPLICATION option serialization — byte-exact against each
reference plugin's start() (wal2json-plugin.ts:18-29,
test-decoding-plugin.ts:47-58, pgoutput-plugin.ts:24-33,
decoderbufs-plugin.ts:32)."""

import pytest

from pg_logical_replication_spark.sources.plugin_options import (
    dash_case,
    options_clause,
    start_replication_sql,
)


def test_dash_case():
    assert dash_case("includeXids") == "include-xids"
    assert dash_case("filter_msg_prefixes") == "filter-msg-prefixes"
    assert dash_case("format-version") == "format-version"


def test_wal2json_serialization():
    sql = start_replication_sql(
        "wal2json",
        "my_slot",
        "0/16B3E00",
        {
            "includeXids": True,
            "includeTimestamp": False,
            "filterTables": "public.skip_me",
            "formatVersion": "2",
        },
    )
    assert sql == (
        'START_REPLICATION SLOT "my_slot" LOGICAL 0/16B3E00 '
        "(\"include-xids\" 'on' , \"include-timestamp\" 'off' , "
        "\"filter-tables\" 'public.skip_me' , \"format-version\" '2')"
    )
    # no options → no clause (wal2json-plugin.ts:26 'if options.length')
    assert start_replication_sql("wal2json", "s") == (
        'START_REPLICATION SLOT "s" LOGICAL 0/00000000'
    )


def test_test_decoding_serialization():
    # include-xids / include-timestamp ALWAYS present; flags only when on
    assert options_clause("test_decoding", {}) == (
        " (\"include-xids\" 'off' , \"include-timestamp\" 'off')"
    )
    assert options_clause(
        "test_decoding",
        {"includeXids": True, "skipEmptyXacts": True, "streamChanges": True},
    ) == (
        " (\"include-xids\" 'on' , \"include-timestamp\" 'off' , "
        "\"skip-empty-xacts\" 'on' , \"stream-changes\" 'on')"
    )


def test_pgoutput_serialization():
    # unquoted keys, messages defaults to the string 'false'
    assert options_clause(
        "pgoutput", {"protoVersion": 1, "publicationNames": ["pub1", "pub2"]}
    ) == " (proto_version '1', publication_names 'pub1,pub2', messages 'false')"
    assert options_clause(
        "pgoutput",
        {"protoVersion": 2, "publicationNames": "p", "messages": True},
    ) == " (proto_version '2', publication_names 'p', messages 'true')"


def test_pgoutput_origin_validation():
    """ADVICE r6: origin must be validated like the strict booleans —
    a typo or quote-bearing value otherwise interpolates a malformed
    START_REPLICATION clause instead of raising."""
    assert options_clause(
        "pgoutput", {"protoVersion": 1, "publicationNames": "p", "origin": "NONE"}
    ).endswith("origin 'none')")
    assert options_clause(
        "pgoutput", {"protoVersion": 1, "publicationNames": "p", "origin": "any"}
    ).endswith("origin 'any')")
    for bad in ("anny", "none'", "", "true"):
        with pytest.raises(ValueError, match="origin"):
            options_clause(
                "pgoutput",
                {"protoVersion": 1, "publicationNames": "p", "origin": bad},
            )


def test_decoderbufs_and_unknown():
    assert options_clause("decoderbufs", {"anything": True}) == ""
    with pytest.raises(ValueError, match="unknown plugin"):
        options_clause("nope", {})


def test_walsender_uses_plugin_serialization():
    """transport.start_replication(plugin=...) must emit the exact
    reference statement."""
    from tests.test_transport import _FakePgServer

    from pg_logical_replication_spark.sources.transport import (
        WalsenderTransport,
    )

    srv = _FakePgServer(password=None, frames=[])
    t = WalsenderTransport("127.0.0.1", srv.port, user="rep", database="app")
    t.start_replication(
        "slot_a", "0/AA0000",
        options={"protoVersion": 1, "publicationNames": ["pub"]},
        plugin="pgoutput",
    )
    assert srv.start_replication_sql == (
        'START_REPLICATION SLOT "slot_a" LOGICAL 0/AA0000 '
        "(proto_version '1', publication_names 'pub', messages 'false')"
    )
    t.close()
    srv.close()
