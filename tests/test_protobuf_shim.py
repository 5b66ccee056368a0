"""Vendored minimal protobuf runtime (vendor/google/protobuf, r11):
wire-format byte vectors from the public encoding spec, round-trips
through the REAL protoc-generated StateMessage_pb2 PySpark ships, oneof
semantics, negative varints, unknown-field skipping, and the
loud-failure contract for out-of-subset descriptors.

The end-to-end proof is tests/test_streaming.py::
test_tws_totals_match_apply_in_pandas_twin (transformWithStateInPandas
over the shim's serialized protocol against the JVM state server).
"""

from __future__ import annotations

import sys

import pytest

from instacart_medallion_lakehouse_spark.session import (
    ensure_vendored_protobuf,
)

ensure_vendored_protobuf()

if "google.protobuf" not in sys.modules:
    import google.protobuf  # noqa: F401

needs_shim = pytest.mark.skipif(
    not getattr(
        __import__("google.protobuf", fromlist=["__version__"]),
        "__version__",
        "",
    ).endswith("-shim"),
    reason="real protobuf wheel installed — shim not in use",
)


@needs_shim
class TestWireFormat:
    def test_varint_spec_vectors(self):
        from google.protobuf._shim import decode_varint, encode_varint

        # spec examples: 1 -> 01, 150 -> 9601, 300 -> ac02
        assert encode_varint(1) == b"\x01"
        assert encode_varint(150) == b"\x96\x01"
        assert encode_varint(300) == b"\xac\x02"
        # negative: 64-bit two's complement, 10 bytes
        assert len(encode_varint(-1)) == 10
        for v in (0, 1, 127, 128, 150, 300, 2**32, 2**63 - 1, -1, -5):
            enc = encode_varint(v)
            dec, pos = decode_varint(enc, 0)
            if dec >= 1 << 63:
                dec -= 1 << 64
            assert dec == v and pos == len(enc)

    def test_statemessage_request_bytes(self):
        import pyspark.sql.streaming.proto.StateMessage_pb2 as sm

        cmd = sm.StateCallCommand(stateName="s", schema="v INT")
        msg = sm.StateRequest(
            version=1,
            statefulProcessorCall=sm.StatefulProcessorCall(
                getValueState=cmd
            ),
        )
        data = msg.SerializeToString()
        # field 1 (version) varint 1; field 2 len-delimited message
        assert data.startswith(b"\x08\x01\x12")
        back = sm.StateRequest()
        back.ParseFromString(data)
        assert back.version == 1
        assert back.WhichOneof("method") == "statefulProcessorCall"
        assert back.statefulProcessorCall.getValueState.stateName == "s"

    def test_oneof_set_clears_siblings(self):
        import pyspark.sql.streaming.proto.StateMessage_pb2 as sm

        m = sm.StateRequest(
            statefulProcessorCall=sm.StatefulProcessorCall()
        )
        m.timerRequest = sm.TimerRequest()
        assert m.WhichOneof("method") == "timerRequest"
        assert not m.HasField("statefulProcessorCall")

    def test_repeated_and_bool_roundtrip(self):
        import pyspark.sql.streaming.proto.StateMessage_pb2 as sm

        lp = sm.ListStatePut(value=[b"a", b"bb", b""], fetchWithArrow=True)
        back = sm.ListStatePut()
        back.ParseFromString(lp.SerializeToString())
        assert back.value == [b"a", b"bb", b""]
        assert back.fetchWithArrow is True

    def test_enum_constants_and_default_skipping(self):
        import pyspark.sql.streaming.proto.StateMessage_pb2 as sm

        assert sm.PRE_INIT == 0 and sm.CLOSED == 5
        # proto3: singular scalar at default value serializes to nothing
        assert sm.StateResponse(statusCode=0).SerializeToString() == b""
        r = sm.StateResponse(statusCode=3, errorMessage="x")
        back = sm.StateResponse()
        back.ParseFromString(r.SerializeToString())
        assert (back.statusCode, back.errorMessage, back.value) == (
            3, "x", b"",
        )

    def test_unknown_fields_skipped(self):
        import pyspark.sql.streaming.proto.StateMessage_pb2 as sm

        from google.protobuf._shim import encode_varint

        # statusCode=7 plus an unknown field 99 (varint) and an unknown
        # len-delimited field 100 — a newer JVM may send either
        data = (
            b"\x08\x07"
            + encode_varint(99 << 3) + b"\x2a"
            + encode_varint((100 << 3) | 2) + b"\x03abc"
        )
        m = sm.StateResponse()
        m.ParseFromString(data)
        assert m.statusCode == 7

    def test_out_of_subset_descriptor_fails_loudly(self):
        from google.protobuf._shim import (
            encode_varint,
            parse_file_descriptor,
        )

        # FileDescriptorProto with one message holding a TYPE_DOUBLE
        # (1) field — outside the shim's subset: must raise, not
        # silently corrupt a stream later
        field = b"\x0a\x01x" + b"\x18\x01" + b"\x20\x01" + b"\x28\x01"
        msg = b"\x0a\x01M" + b"\x12" + encode_varint(len(field)) + field
        fdp = b"\x22" + encode_varint(len(msg)) + msg
        with pytest.raises(NotImplementedError):
            parse_file_descriptor(fdp)
