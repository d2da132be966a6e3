"""Vendored mini-protobuf runtime (_vendor/pbshim): wire-format codec,
descriptor parsing, and execution of pyspark's generated StateMessage
pb2 module. Skipped when the REAL protobuf package is installed (the
shim never activates there)."""

import importlib.util

import pytest

import pg_logical_replication_spark  # noqa: F401  (installs the shim path)

try:
    _spec = importlib.util.find_spec("google.protobuf")
except ModuleNotFoundError:
    _spec = None
# the shim itself is importable once the package added it to sys.path —
# "real protobuf" means a spec resolving OUTSIDE _vendor/pbshim
_real = _spec is not None and "pbshim" not in (_spec.origin or "")

pytestmark = pytest.mark.skipif(
    _real, reason="real protobuf installed; shim inactive by design"
)


def test_varint_roundtrip_including_negatives():
    from google.protobuf._mini import read_varint, write_varint

    for v in (0, 1, 127, 128, 300, 2**32, 2**63 - 1, -1, -5, -(2**31)):
        buf = bytearray()
        write_varint(buf, v)
        got, pos = read_varint(bytes(buf), 0)
        assert pos == len(buf)
        if v >= 0:
            assert got == v
        else:
            assert got - (1 << 64) == v  # two's complement


def test_generated_pb2_executes_and_roundtrips():
    import pyspark.sql.streaming.proto.StateMessage_pb2 as sm

    cmd = sm.StateCallCommand()
    cmd.stateName = "s"
    cmd.ttl.durationMs = 1234
    req = sm.StateRequest(
        statefulProcessorCall=sm.StatefulProcessorCall(getListState=cmd)
    )
    out = sm.StateRequest()
    out.ParseFromString(req.SerializeToString())
    got = out.statefulProcessorCall.getListState
    assert got.stateName == "s"
    assert got.ttl.durationMs == 1234
    # enum constants are module-level, like generated code exposes them
    assert sm.PRE_INIT == 0 and sm.CLOSED == 5
    # proto3 defaults readable without presence
    r = sm.StateResponse()
    r.ParseFromString(sm.StateResponse(statusCode=7).SerializeToString())
    assert (r.statusCode, r.errorMessage, r.value) == (7, "", b"")


def test_repeated_fields_and_unknown_field_skip():
    import pyspark.sql.streaming.proto.StateMessage_pb2 as sm
    from google.protobuf._mini import write_varint

    put = sm.ListStatePut(value=[b"a", b"bb", b""], fetchWithArrow=True)
    p2 = sm.ListStatePut()
    p2.ParseFromString(put.SerializeToString())
    assert list(p2.value) == [b"a", b"bb", b""]
    assert p2.fetchWithArrow is True

    # splice an unknown field (number 15, varint) — must be skipped
    extra = bytearray()
    write_varint(extra, (15 << 3) | 0)
    write_varint(extra, 42)
    p3 = sm.ListStatePut()
    p3.ParseFromString(put.SerializeToString() + bytes(extra))
    assert list(p3.value) == [b"a", b"bb", b""]


def test_repeated_message_and_negative_int64():
    import pyspark.sql.streaming.proto.StateMessage_pb2 as sm

    resp = sm.StateResponseWithTimer(
        statusCode=0,
        timer=[
            sm.TimerInfo(key=b"k", timestampMs=1_700_000_000_000),
            sm.TimerInfo(timestampMs=-9),
        ],
        requireNextFetch=True,
    )
    r2 = sm.StateResponseWithTimer()
    r2.ParseFromString(resp.SerializeToString())
    assert [t.timestampMs for t in r2.timer] == [1_700_000_000_000, -9]
    assert r2.timer[0].key == b"k" and r2.timer[1].key == b""
    assert r2.requireNextFetch is True


def test_unknown_attribute_raises():
    import pyspark.sql.streaming.proto.StateMessage_pb2 as sm

    with pytest.raises(AttributeError):
        sm.StateResponse().nope
    with pytest.raises(AttributeError):
        sm.StateResponse().nope = 1
