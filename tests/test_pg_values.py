"""functions.pg_values — PG text-format parsers as Column expressions.

Adversarial cases follow the quoting rules the reference's PEG grammar
documents (decoder.ts:29-37): double-quoted elements, backslash escapes,
unquoted NULL, empty array."""

import pytest
from pyspark.sql import functions as F

from pg_logical_replication_spark.functions import (
    OID_TO_PG_TYPE,
    oid_to_spark,
    pg_array,
    pg_bool,
    pg_bytea,
    pg_numeric,
    pg_value,
)


def _one(spark, value, expr):
    df = spark.createDataFrame([(value,)], "v string")
    return df.select(expr.alias("r")).first()["r"]


@pytest.mark.parametrize(
    "text,want",
    [("t", True), ("true", True), ("f", False), ("false", False),
     ("maybe", None), (None, None)],
)
def test_pg_bool(spark, text, want):
    assert _one(spark, text, pg_bool("v")) is want


def test_pg_bytea_hex(spark):
    assert _one(spark, "\\xdeadBEEF", pg_bytea("v")) == bytes.fromhex("deadbeef")
    assert _one(spark, "plain text", pg_bytea("v")) is None
    assert _one(spark, "\\x", pg_bytea("v")) == b""


@pytest.mark.parametrize(
    "lit,want",
    [
        ("{a,b,c}", ["a", "b", "c"]),
        ("{}", []),
        ("{NULL}", [None]),
        ("{1,NULL,3}", ["1", None, "3"]),
        ('{"a,b",c}', ["a,b", "c"]),
        ('{"he said \\"hi\\""}', ['he said "hi"']),
        ('{"back\\\\slash"}', ["back\\slash"]),
        ('{"NULL"}', ["NULL"]),  # quoted NULL is the string, not null
        ("not an array", None),
        (None, None),
    ],
)
def test_pg_array(spark, lit, want):
    assert _one(spark, lit, pg_array("v")) == want


def test_pg_array_typed_cast(spark):
    got = _one(spark, "{1,2,3}", pg_array("v").cast("array<int>"))
    assert got == [1, 2, 3]


def test_pg_numeric_nan(spark):
    from decimal import Decimal

    assert _one(spark, "12.5", pg_numeric("v")) == Decimal("12.5")
    assert _one(spark, "NaN", pg_numeric("v")) is None


def test_pg_value_dispatch(spark):
    assert _one(spark, "42", pg_value("v", "bigint")) == 42
    assert _one(spark, "t", pg_value("v", "boolean")) is True
    assert _one(spark, "{x,y}", pg_value("v", "text[]")) == ["x", "y"]
    assert _one(spark, "\\x00ff", pg_value("v", "bytea")) == b"\x00\xff"
    ts = _one(spark, "2026-08-13 01:02:03.000004+00",
              pg_value("v", "timestamp with time zone"))
    assert ts.microsecond == 4
    # unknown type name falls back to string passthrough
    assert _one(spark, "zzz", pg_value("v", "sometype")) == "zzz"


def test_oid_registry():
    assert oid_to_spark(16) == "boolean"
    assert oid_to_spark(1700) == "decimal(38,18)"
    assert oid_to_spark(999999) == "string"  # getTypeParser identity fallback
    assert OID_TO_PG_TYPE[25] == "text"


def test_typed_view_uses_parsers(spark):
    from pg_logical_replication_spark.model import typed_view

    ev = spark.createDataFrame(
        [("insert", 1, "public", "tb", {"ok": "t", "tags": "{a,b}", "n": "1.5"})],
        "op string, lsn_long long, schema string, table string, after map<string,string>",
    )
    row = typed_view(ev, {"ok": "boolean", "tags": "text[]", "n": "numeric"}).first()
    assert row["ok"] is True and row["tags"] == ["a", "b"]
    assert float(row["n"]) == 1.5


def test_pg_array_roundtrip_property(spark):
    """Hypothesis: serialize random element lists with PG's array_out
    quoting rule, parse with pg_array, get the original list back."""
    from hypothesis import given, settings, strategies as st

    elem = st.one_of(
        st.none(),
        st.text(
            alphabet=st.characters(
                codec="utf-8", exclude_characters="\x00"
            ),
            max_size=12,
        ),
    )

    def serialize(els):
        parts = []
        for e in els:
            if e is None:
                parts.append("NULL")
                continue
            needs_quote = (
                e == ""
                or e.upper() == "NULL"
                or any(c in e for c in ',"\\{} \t\n')
            )
            if needs_quote:
                parts.append(
                    '"' + e.replace("\\", "\\\\").replace('"', '\\"') + '"'
                )
            else:
                parts.append(e)
        return "{" + ",".join(parts) + "}"

    @settings(max_examples=12, deadline=None)
    @given(st.lists(elem, max_size=6))
    def run(els):
        # one literal per example keeps the Spark job tiny
        got = _one(spark, serialize(els), pg_array("v"))
        assert got == els

    run()


def test_pg_array_multidim_returns_null(spark):
    """Multi-dimensional literals return NULL, not a mangled split
    (review r2)."""
    from pyspark.sql import functions as F

    from pg_logical_replication_spark.functions.pg_values import pg_array

    rows = (
        spark.createDataFrame(
            [("{1,2}",), ("{{1,2},{3,4}}",)], "v string"
        )
        .select(pg_array(F.col("v")).alias("a"))
        .collect()
    )
    assert rows[0]["a"] == ["1", "2"]
    assert rows[1]["a"] is None
