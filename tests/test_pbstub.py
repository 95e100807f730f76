"""pbstub (vendored pure-stdlib protobuf subset) certification.

Three layers, mirroring the repo's codec-certification pattern:

1. behavioral tests through the REAL generated module
   (pyspark's StateMessage_pb2) — implementation-agnostic, they hold
   for the genuine protobuf runtime too;
2. a hypothesis property: random StateRequest trees survive
   serialize→parse→serialize with byte-stable output;
3. cross-implementation checks against protobuf-JAVA inside the Spark
   JVM (the exact peer the TWS state server uses): our bytes must
   parse there and re-serialize BYTE-IDENTICALLY, and theirs must
   parse here — complementary encode/decode bugs cannot cancel across
   two independent implementations.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from postrack_spark.streaming.stateful import ensure_protobuf

assert ensure_protobuf()  # activates the shim iff real protobuf absent

import pyspark.sql.streaming.proto.StateMessage_pb2 as sm  # noqa: E402


# ------------------------------------------------------------ behavior


def test_scalar_roundtrip_negative_int64():
    for v in (0, 1, -1, -5, 2**62, -(2**62), 2**63 - 1, -(2**63)):
        msg = sm.RegisterTimer(expiryTimestampMs=v)
        out = sm.RegisterTimer()
        out.ParseFromString(msg.SerializeToString())
        assert out.expiryTimestampMs == v


def test_string_bytes_bool_fields():
    msg = sm.StateCallCommand(stateName="s±π", schema="struct<a:int>",
                              ttl=sm.TTLConfig(durationMs=1234))
    out = sm.StateCallCommand()
    out.ParseFromString(msg.SerializeToString())
    assert out.stateName == "s±π"
    assert out.schema == "struct<a:int>"
    assert out.ttl.durationMs == 1234
    lp = sm.ListStatePut(value=[b"", b"\x00\xff", b"abc"], fetchWithArrow=True)
    out2 = sm.ListStatePut()
    out2.ParseFromString(lp.SerializeToString())
    assert list(out2.value) == [b"", b"\x00\xff", b"abc"]
    assert out2.fetchWithArrow is True


def test_unset_fields_read_defaults():
    msg = sm.StateResponse()
    assert msg.statusCode == 0
    assert msg.errorMessage == ""
    assert msg.value == b""
    assert list(sm.StateResponseWithListGet().value) == []
    # unset singular message reads as empty message
    assert sm.StateCallCommand().ttl.durationMs == 0


def test_oneof_last_set_wins():
    msg = sm.ValueStateCall(stateName="x", get=sm.Get())
    msg.exists = sm.Exists()  # same oneof "method": replaces get
    data = msg.SerializeToString()
    out = sm.ValueStateCall()
    out.ParseFromString(data)
    assert out.HasField("exists")
    assert not out.HasField("get")
    assert out.WhichOneof("method") == "exists"


def test_repeated_message_field():
    resp = sm.StateResponseWithMapIterator(
        statusCode=7,
        kvPair=[sm.KeyAndValuePair(key=b"k1", value=b"v1"),
                sm.KeyAndValuePair(key=b"k2", value=b"v2")],
        requireNextFetch=True,
    )
    out = sm.StateResponseWithMapIterator()
    out.ParseFromString(resp.SerializeToString())
    assert [(p.key, p.value) for p in out.kvPair] == [
        (b"k1", b"v1"), (b"k2", b"v2")]
    assert out.statusCode == 7 and out.requireNextFetch


def test_proto3_optional_presence():
    with_key = sm.TimerInfo(key=b"kk", timestampMs=5)
    out = sm.TimerInfo()
    out.ParseFromString(with_key.SerializeToString())
    assert out.HasField("key") and out.key == b"kk"
    without = sm.TimerInfo(timestampMs=5)
    out2 = sm.TimerInfo()
    out2.ParseFromString(without.SerializeToString())
    assert not out2.HasField("key")


def test_file_level_enum_constants():
    assert [sm.PRE_INIT, sm.CREATED, sm.INITIALIZED, sm.DATA_PROCESSED,
            sm.TIMER_PROCESSED, sm.CLOSED] == [0, 1, 2, 3, 4, 5]
    msg = sm.SetHandleState(state=sm.TIMER_PROCESSED)
    out = sm.SetHandleState()
    out.ParseFromString(msg.SerializeToString())
    assert out.state == sm.TIMER_PROCESSED


def test_unknown_fields_are_skipped():
    # append unknown field 1000 in each wire format; parser must skip
    base = sm.StateResponse(statusCode=3, value=b"v").SerializeToString()
    import struct as _s

    def varint(v):
        out = b""
        while True:
            b7 = v & 0x7F
            v >>= 7
            out += bytes([b7 | (0x80 if v else 0)])
            if not v:
                return out

    extra = (varint((1000 << 3) | 0) + varint(99)          # varint
             + varint((1001 << 3) | 2) + varint(3) + b"abc"  # len
             + varint((1002 << 3) | 1) + _s.pack("<d", 1.5)  # i64
             + varint((1003 << 3) | 5) + _s.pack("<f", 2.5))  # i32
    out = sm.StateResponse()
    out.ParseFromString(base + extra)
    assert out.statusCode == 3 and out.value == b"v"


# ----------------------------------------------------------- hypothesis


_calls = st.one_of(
    st.builds(lambda: sm.Exists()),
    st.builds(lambda: sm.Get()),
    st.builds(lambda v: sm.ValueStateUpdate(value=v), st.binary(max_size=40)),
    st.builds(lambda: sm.Clear()),
)


@st.composite
def _state_requests(draw):
    name = draw(st.text(max_size=12))
    call = draw(_calls)
    kwargs = {"stateName": name}
    kwargs[{sm.Exists: "exists", sm.Get: "get",
            sm.ValueStateUpdate: "valueStateUpdate",
            sm.Clear: "clear"}[type(call)]] = call
    return sm.StateRequest(
        version=draw(st.integers(min_value=0, max_value=2**31 - 1)),
        stateVariableRequest=sm.StateVariableRequest(
            valueStateCall=sm.ValueStateCall(**kwargs)))


@settings(max_examples=200, deadline=None)
@given(_state_requests())
def test_roundtrip_property(req):
    data = req.SerializeToString()
    out = sm.StateRequest()
    out.ParseFromString(data)
    assert out.SerializeToString() == data  # byte-stable
    assert (out.stateVariableRequest.valueStateCall.stateName
            == req.stateVariableRequest.valueStateCall.stateName)


# ------------------------------------------- cross-JVM (protobuf-java)


@pytest.fixture(scope="module")
def jproto(spark):
    jvm = spark._jvm
    gw = spark.sparkContext._gateway

    def parse(java_class_name: str, data: bytes):
        cls = jvm.java.lang.Class.forName(
            "org.apache.spark.sql.execution.streaming.state.StateMessage$"
            + java_class_name)
        argtypes = gw.new_array(jvm.java.lang.Class, 1)
        argtypes[0] = jvm.java.lang.Class.forName("[B")
        m = cls.getMethod("parseFrom", argtypes)
        args = gw.new_array(jvm.java.lang.Object, 1)
        args[0] = data
        return m.invoke(None, args)

    return parse


_JVM_CASES = [
    ("StateRequest", lambda: sm.StateRequest(
        version=2,
        statefulProcessorCall=sm.StatefulProcessorCall(
            getValueState=sm.StateCallCommand(
                stateName="latest", schema="s",
                ttl=sm.TTLConfig(durationMs=60000))))),
    ("StateRequest", lambda: sm.StateRequest(
        implicitGroupingKeyRequest=sm.ImplicitGroupingKeyRequest(
            setImplicitKey=sm.SetImplicitKey(key=b"\x00\x01\xfe\xff")))),
    ("StateRequest", lambda: sm.StateRequest(
        timerRequest=sm.TimerRequest(
            expiryTimerRequest=sm.ExpiryTimerRequest(
                iteratorId="it-1", expiryTimestampMs=1 << 40)))),
    ("StateResponseWithTimer", lambda: sm.StateResponseWithTimer(
        statusCode=0,
        timer=[sm.TimerInfo(key=b"a", timestampMs=1),
               sm.TimerInfo(timestampMs=2)],
        requireNextFetch=True)),
    ("StateResponseWithListGet", lambda: sm.StateResponseWithListGet(
        statusCode=0, value=[b"", b"x" * 300], requireNextFetch=False)),
]


@pytest.mark.parametrize("case", range(len(_JVM_CASES)))
def test_java_parses_our_bytes_and_reserializes_identically(jproto, case):
    name, build = _JVM_CASES[case]
    msg = build()
    data = msg.SerializeToString()
    jmsg = jproto(name, data)
    assert bytes(jmsg.toByteArray()) == data
    # and our parser accepts Java's serialization of the same message
    back = type(msg)()
    back.ParseFromString(bytes(jmsg.toByteArray()))
    assert back == msg


def test_malformed_wire_input_raises_cleanly():
    """Truncated varints, truncated length-delimited fields, and
    out-of-range union indexes must raise (ValueError-shaped), never
    hang, loop, or silently mis-parse."""
    msg = sm.StateRequest()
    with pytest.raises(Exception):
        msg.ParseFromString(b"\xff" * 11)  # varint never terminates
    with pytest.raises(Exception):
        # field 3 (stateVariableRequest) LEN with length past the end
        msg.ParseFromString(b"\x1a\x7fABC")
    vs = sm.ValueStateCall()
    ok = sm.ValueStateCall(stateName="x", get=sm.Get()).SerializeToString()
    vs.ParseFromString(ok)  # sanity: well-formed still parses
    # unknown wire type 7 in a tag
    with pytest.raises(Exception):
        sm.StateResponse().ParseFromString(bytes([0x0F]) + b"\x00")


def test_unknown_field_name_raises_attribute_error():
    with pytest.raises(AttributeError):
        sm.StateResponse(nonexistent=1)
    with pytest.raises(AttributeError):
        _ = sm.StateResponse().nonexistent
