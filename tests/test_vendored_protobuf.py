"""ADVICE r8 (low): the vendored pure-python protobuf runtime reports
6.33.0 to pass PySpark's gencode validation while actually being
6.32.0-dev. If a future PySpark gencode relied on a real 6.33+ runtime
feature, the spoofed version would turn a clean version-mismatch error
into silent misparsing — so pin a round-trip of the EXACT
StateMessage_pb2 descriptors the transformWithState worker protocol
uses: any real incompatibility surfaces here as a test failure instead
of corrupted state messages at runtime.

These tests run only when protobuf resolves (vendored or real) — the
same gate the transformWithState tests use.
"""

from __future__ import annotations

import pytest

from dimagi_data_platform_spark.compat import ensure_protobuf


def _has_protobuf() -> bool:
    if not ensure_protobuf():
        return False
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:  # pragma: no cover
        return False


pytestmark = pytest.mark.skipif(
    not _has_protobuf(), reason="no protobuf runtime available"
)


def test_statemessage_roundtrips_through_runtime():
    """Serialize → parse the nested request messages the TWS Python
    worker exchanges; every field must survive byte-exact."""
    from pyspark.sql.streaming.proto import StateMessage_pb2 as SM

    # a representative deeply-nested request: StateRequest wrapping a
    # StatefulProcessorCall wrapping a getValueState with a TTL
    req = SM.StateRequest(
        version=2,
        statefulProcessorCall=SM.StatefulProcessorCall(
            getValueState=SM.StateCallCommand(
                stateName="totals",
                schema="n long, total double",
                ttl=SM.TTLConfig(durationMs=60000),
            )
        ),
    )
    raw = req.SerializeToString()
    back = SM.StateRequest()
    back.ParseFromString(raw)
    assert back.version == 2
    call = back.statefulProcessorCall.getValueState
    assert call.stateName == "totals"
    assert call.schema == "n long, total double"
    assert call.ttl.durationMs == 60000
    assert back.SerializeToString() == raw

    # timer + implicit-key requests (the other protocol arms the
    # session processor exercises)
    timer = SM.StateRequest(
        timerRequest=SM.TimerRequest(
            timerValueRequest=SM.TimerValueRequest(
                getProcessingTimer=SM.GetProcessingTime()
            )
        )
    )
    t2 = SM.StateRequest()
    t2.ParseFromString(timer.SerializeToString())
    assert t2.WhichOneof("method") == "timerRequest"

    key_req = SM.ImplicitGroupingKeyRequest(
        setImplicitKey=SM.SetImplicitKey(key=b"\x01\x02\x03")
    )
    k2 = SM.ImplicitGroupingKeyRequest()
    k2.ParseFromString(key_req.SerializeToString())
    assert k2.setImplicitKey.key == b"\x01\x02\x03"


def test_statemessage_response_enum_and_oneof_semantics():
    """Enum values, oneof discrimination, and default-field skipping —
    the parsing behaviors a runtime/gencode mismatch corrupts first."""
    from pyspark.sql.streaming.proto import StateMessage_pb2 as SM

    resp = SM.StateResponse(statusCode=1, errorMessage="boom")
    r2 = SM.StateResponse()
    r2.ParseFromString(resp.SerializeToString())
    assert (r2.statusCode, r2.errorMessage) == (1, "boom")

    # HandleState enum constants used by the worker state machine
    assert SM.PRE_INIT == 0 or isinstance(SM.PRE_INIT, int)
    for name in ("CREATED", "INITIALIZED", "DATA_PROCESSED", "CLOSED"):
        assert isinstance(getattr(SM, name), int)

    # oneof: setting one arm clears the other
    call = SM.StateVariableRequest(
        valueStateCall=SM.ValueStateCall(
            stateName="s", get=SM.Get()
        )
    )
    assert call.WhichOneof("method") == "valueStateCall"
    parsed = SM.StateVariableRequest()
    parsed.ParseFromString(call.SerializeToString())
    assert parsed.valueStateCall.WhichOneof("method") == "get"
