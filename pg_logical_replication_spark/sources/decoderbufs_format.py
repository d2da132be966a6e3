"""decoderbufs protobuf wire format — pure-Python codec, zero dependencies.

The reference decodes Debezium's ``pg_logicaldec.proto`` ``RowMessage``
with protobufjs (``src/output-plugins/decoderbufs/decoderbufs-plugin.ts:38-40``;
schema mirrored in ``pg_logicaldec.proto.ts:2-159``, upstream:
https://github.com/debezium/postgres-decoderbufs/blob/main/proto/pg_logicaldec.proto).

We implement the protobuf wire format directly (varint / fixed32 /
fixed64 / length-delimited — public spec:
https://protobuf.dev/programming-guides/encoding/) because the container
has no protobuf runtime and Spark's ``from_protobuf`` needs the
spark-protobuf jar. The message is small and fixed, so a hand decoder is
~100 lines and unit-testable without Spark.

Field numbers (pg_logicaldec.proto):
  RowMessage: 1 transaction_id u32, 2 commit_time u64 (µs since Unix
  epoch), 3 table "schema.name", 4 op enum (UNKNOWN=-1 INSERT=0 UPDATE=1
  DELETE=2 BEGIN=3 COMMIT=4), 5 new_tuple rep DatumMessage, 6 old_tuple
  rep DatumMessage, 7 new_typeinfo rep TypeInfo.
  DatumMessage: 1 column_name, 2 column_type i64, oneof datum: 3 i32,
  4 i64, 5 float, 6 double, 7 bool, 8 string, 9 bytes, 10 Point, 11
  missing bool.  Point: 1 x double, 2 y double.
"""

from __future__ import annotations

import struct
from typing import Any

_OPS = {0: "insert", 1: "update", 2: "delete", 3: "begin", 4: "commit"}


# ------------------------------------------------------------ wire reading
def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7
        if shift > 70:
            raise ValueError("protobuf: varint too long")


def _signed(v: int, bits: int = 64) -> int:
    """Two's-complement reinterpretation (proto int32/int64/enum)."""
    if v >= 1 << (bits - 1):
        v -= 1 << bits
    return v


def _read_fields(buf: bytes) -> list[tuple[int, int, Any]]:
    """→ [(field_number, wire_type, raw_value)]"""
    out = []
    pos = 0
    n = len(buf)
    while pos < n:
        tag, pos = _read_varint(buf, pos)
        field, wt = tag >> 3, tag & 0x7
        if wt == 0:
            v, pos = _read_varint(buf, pos)
        elif wt == 1:
            v = buf[pos : pos + 8]
            pos += 8
        elif wt == 5:
            v = buf[pos : pos + 4]
            pos += 4
        elif wt == 2:
            ln, pos = _read_varint(buf, pos)
            v = buf[pos : pos + ln]
            pos += ln
        else:
            raise ValueError(f"protobuf: unsupported wire type {wt}")
        out.append((field, wt, v))
    return out


def _parse_point(buf: bytes) -> tuple[float, float]:
    x = y = 0.0
    for field, _, v in _read_fields(buf):
        if field == 1:
            (x,) = struct.unpack("<d", v)
        elif field == 2:
            (y,) = struct.unpack("<d", v)
    return x, y


def _parse_datum(buf: bytes) -> dict[str, Any]:
    """DatumMessage → {name, type_oid, value(text), missing}."""
    name = None
    type_oid = None
    value: str | None = None
    missing = False
    for field, _, v in _read_fields(buf):
        if field == 1:
            name = v.decode("utf-8")
        elif field == 2:
            type_oid = _signed(v)
        elif field == 3:
            # negative int32 travels as 64-bit two's-complement varint
            value = str(_signed(v))
        elif field == 4:
            value = str(_signed(v))
        elif field == 5:
            value = repr(struct.unpack("<f", v)[0])
        elif field == 6:
            value = repr(struct.unpack("<d", v)[0])
        elif field == 7:
            value = "true" if v else "false"
        elif field == 8:
            value = v.decode("utf-8")
        elif field == 9:
            value = "\\x" + v.hex()
        elif field == 10:
            x, y = _parse_point(v)
            value = f"({x},{y})"
        elif field == 11:
            missing = bool(v)
    return {"name": name, "type_oid": type_oid, "value": value, "missing": missing}


def parse_row_message(buf: bytes) -> dict[str, Any]:
    """RowMessage bytes → normalized ChangeEvent dict.

    Normalization mirrors the engine's other decoders: ``after`` from
    new_tuple, ``before`` from old_tuple, ``key`` = non-null old values
    (decoderbufs sends the replica identity as old_tuple). ``missing``
    datums (unchanged TOAST, ≙ pgoutput kind 'u') become absent keys
    recorded in ``meta['unchanged_toast']``.
    """
    xid = None
    commit_us = None
    table = None
    op_num = None
    new_tuple: list[dict] = []
    old_tuple: list[dict] = []
    for field, _, v in _read_fields(buf):
        if field == 1:
            xid = v
        elif field == 2:
            commit_us = v
        elif field == 3:
            table = v.decode("utf-8")
        elif field == 4:
            op_num = _signed(v)
        elif field == 5:
            new_tuple.append(_parse_datum(v))
        elif field == 6:
            old_tuple.append(_parse_datum(v))

    op = _OPS.get(op_num, "unknown")
    schema = name = None
    if table:
        schema, _, name = table.partition(".")
        if not name:
            schema, name = None, table

    after = {d["name"]: d["value"] for d in new_tuple if not d["missing"]} or None
    before = {d["name"]: d["value"] for d in old_tuple if not d["missing"]} or None
    key = {k: v for k, v in (before or {}).items() if v is not None} or None
    toasted = [d["name"] for d in new_tuple if d["missing"]]

    ev: dict[str, Any] = {
        "op": op,
        "xid": xid,
        "commit_ts_us": commit_us,
        "schema": schema,
        "table": name if op in ("insert", "update", "delete") else None,
        "key": key if op in ("update", "delete") else None,
        "before": before if op in ("update", "delete") else None,
        "after": after if op in ("insert", "update") else None,
    }
    if toasted:
        ev["meta"] = {"unchanged_toast": ",".join(toasted)}
    return ev


# ----------------------------------------------------------------- encoder
def _varint(v: int) -> bytes:
    if v < 0:
        v += 1 << 64  # two's complement, 10-byte negative varint
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _field(num: int, wt: int, payload: bytes) -> bytes:
    return _varint((num << 3) | wt) + payload


def _ld(num: int, payload: bytes) -> bytes:
    return _field(num, 2, _varint(len(payload)) + payload)


def encode_datum(
    name: str,
    type_oid: int = 25,
    *,
    int32: int | None = None,
    int64: int | None = None,
    float32: float | None = None,
    float64: float | None = None,
    boolean: bool | None = None,
    string: str | None = None,
    binary: bytes | None = None,
    point: tuple[float, float] | None = None,
    missing: bool = False,
) -> bytes:
    out = _ld(1, name.encode()) + _field(2, 0, _varint(type_oid))
    if int32 is not None:
        out += _field(3, 0, _varint(int32 if int32 >= 0 else int32 + (1 << 64)))
    elif int64 is not None:
        out += _field(4, 0, _varint(int64))
    elif float32 is not None:
        out += _field(5, 5, struct.pack("<f", float32))
    elif float64 is not None:
        out += _field(6, 1, struct.pack("<d", float64))
    elif boolean is not None:
        out += _field(7, 0, _varint(1 if boolean else 0))
    elif string is not None:
        out += _ld(8, string.encode())
    elif binary is not None:
        out += _ld(9, binary)
    elif point is not None:
        out += _ld(10, _field(1, 1, struct.pack("<d", point[0])) + _field(2, 1, struct.pack("<d", point[1])))
    elif missing:
        out += _field(11, 0, _varint(1))
    return out


def encode_row_message(
    op: str,
    *,
    xid: int | None = None,
    commit_time_us: int | None = None,
    table: str | None = None,
    new_tuple: list[bytes] | None = None,
    old_tuple: list[bytes] | None = None,
) -> bytes:
    op_num = {v: k for k, v in _OPS.items()}.get(op, -1)
    out = b""
    if xid is not None:
        out += _field(1, 0, _varint(xid))
    if commit_time_us is not None:
        out += _field(2, 0, _varint(commit_time_us))
    if table is not None:
        out += _ld(3, table.encode())
    out += _field(4, 0, _varint(op_num))
    for d in new_tuple or []:
        out += _ld(5, d)
    for d in old_tuple or []:
        out += _ld(6, d)
    return out
