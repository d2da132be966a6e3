"""Declarative pgoutput ENCODE — wire bytes built by JVM expressions.

The Python codec (``pgoutput_format.encode_*``) is the reference
implementation; this module builds the same bytes with Catalyst
expressions (``concat`` over binary, ``unhex(lpad(hex(x), w))`` for
big-endian integers), so producing a pgoutput stream — replay logs,
CDC export, fixture synthesis — runs in whole-stage codegen with zero
Python workers. Agreement with the Python codec is oracle-gated
(``q_cdc_pgoutput_jvm_encode``: JVM-encode → Python-decode → aggregate
hash-match) and unit-pinned byte-for-byte.

Covered: the hot data-plane messages R (relation), I (insert),
U (update, with optional old tuple), D (delete, key tuple), B/C framing.
The long tail (2PC, streamed-txn segments, logical messages) stays on
the Python codec — those are control-plane-rate, not row-rate.

Wire layout per the public PostgreSQL logicalrep protocol
(protocol.sgml; same layout as ``pgoutput_format`` and the reference's
``pgoutput-parser.ts``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from pg_logical_replication_spark.sources.pgoutput_format import (
    PG_EPOCH_OFFSET_US,
)


def _b(s: bytes) -> Column:
    return F.lit(s)


def u8(v: Column | int) -> Column:
    # mask BEFORE hex: lpad truncates from the LEFT, so a negative
    # long's 16-char two's-complement hex would keep the wrong digits
    c = F.lit(v) if isinstance(v, int) else v
    return F.unhex(F.lpad(F.hex(c.cast("long").bitwiseAND(F.lit(0xFF))), 2, "0"))


def u16(v: Column | int) -> Column:
    c = F.lit(v) if isinstance(v, int) else v
    return F.unhex(
        F.lpad(F.hex(c.cast("long").bitwiseAND(F.lit(0xFFFF))), 4, "0")
    )


def u32(v: Column | int) -> Column:
    c = F.lit(v) if isinstance(v, int) else v
    return F.unhex(
        F.lpad(F.hex(c.cast("long").bitwiseAND(F.lit(0xFFFFFFFF))), 8, "0")
    )


def u64(v: Column | int) -> Column:
    c = F.lit(v) if isinstance(v, int) else v
    return F.unhex(F.lpad(F.hex(c.cast("long")), 16, "0"))


def cstr(c: Column | str) -> Column:
    col = F.lit(c) if isinstance(c, str) else c
    return F.concat(col.cast("binary"), _b(b"\x00"))


def pg_time(us_unix: Column | int) -> Column:
    """µs since unix epoch → signed i64 µs since the PG 2000 epoch.

    hex() of a negative long is its two's-complement form already, so
    the same u64 path serializes pre-2000 values correctly.
    """
    c = F.lit(us_unix) if isinstance(us_unix, int) else us_unix
    return u64(c.cast("long") - F.lit(PG_EPOCH_OFFSET_US))


def lsn_bytes(lsn_long: Column | int) -> Column:
    return u64(lsn_long)


def text_datum(value: Column) -> Column:
    """TupleData column: NULL → 'n'; else 't' + u32 length + utf-8 bytes.

    Spark's cast(string as binary) is utf-8, and ``length`` on the cast
    binary counts BYTES (a direct length(string) would count characters
    and corrupt the frame for any multi-byte text).
    """
    vb = value.cast("string").cast("binary")
    return F.when(value.isNull(), _b(b"n")).otherwise(
        F.concat(_b(b"t"), u32(F.length(vb)), vb)
    )


def tuple_data(*values: Column) -> Column:
    """u16 column count + each column's datum."""
    return F.concat(u16(len(values)), *[text_datum(v) for v in values])


def encode_begin(lsn_long: Column, ts_us: Column | int, xid: Column) -> Column:
    return F.concat(_b(b"B"), lsn_bytes(lsn_long), pg_time(ts_us), u32(xid))


def encode_commit(
    lsn_long: Column, end_lsn_long: Column, ts_us: Column | int
) -> Column:
    return F.concat(
        _b(b"C"), u8(0), lsn_bytes(lsn_long), lsn_bytes(end_lsn_long),
        pg_time(ts_us),
    )


def encode_relation(
    oid: int,
    schema: str,
    name: str,
    columns: list[tuple[str, int]],
    key_columns: list[str] | None = None,
    replica_identity: str = "d",
) -> Column:
    """Relation message — plan-constant (schema registry), so this folds
    to one binary literal at optimization time."""
    keys = set(key_columns or [])
    cols = [
        F.concat(
            u8(1 if cname in keys else 0), cstr(cname), u32(type_oid), u32(0xFFFFFFFF)
        )
        for cname, type_oid in columns
    ]
    return F.concat(
        _b(b"R"), u32(oid), cstr(schema), cstr(name),
        _b(replica_identity.encode()), u16(len(columns)), *cols,
    )


def encode_insert(oid: int, new_tuple: Column) -> Column:
    return F.concat(_b(b"I"), u32(oid), _b(b"N"), new_tuple)


def encode_update(
    oid: int, new_tuple: Column, old_key: Column | None = None
) -> Column:
    old = (
        F.concat(_b(b"K"), old_key) if old_key is not None else _b(b"")
    )
    return F.concat(_b(b"U"), u32(oid), old, _b(b"N"), new_tuple)


def encode_delete(oid: int, old_key: Column) -> Column:
    return F.concat(_b(b"D"), u32(oid), _b(b"K"), old_key)
