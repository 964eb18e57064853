"""Kafka delivery-confirm transport (reference WriterKafka.cpp:97-125):
the hand-built wire-protocol peer (ApiVersions/Metadata/Produce v0),
delivery-report-gated confirm, idempotent re-delivery, and the refused-
delivery path that must leave the watermark untouched."""

import pytest
from pyspark.sql import functions as F

from openlogreplicator_spark.sinks.kafka_wire import (
    ERR_NONE,
    KafkaBrokerStub,
    KafkaConfirmSink,
    KafkaWireProducer,
    _message_set,
    _parse_message_set,
)


@pytest.fixture()
def messages(spark):
    return spark.range(0, 57).select(
        F.concat(F.lit('{"k":'), F.col("id").cast("string"), F.lit("}"))
        .alias("message")
    ).repartition(4)


def test_message_set_roundtrip_and_crc():
    vals = [b"alpha", b"", b"\x00binary\xff"]
    assert _parse_message_set(_message_set(vals)) == vals
    corrupt = bytearray(_message_set([b"x" * 32]))
    corrupt[-1] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        _parse_message_set(bytes(corrupt))


def test_producer_handshake_metadata_produce():
    srv = KafkaBrokerStub({"t": 3})
    try:
        with KafkaWireProducer("127.0.0.1", srv.port) as p:
            assert p.metadata("t")["partitions"] == [0, 1, 2]
            err, base = p.produce("t", 2, [b"a", b"b"])
            assert err == ERR_NONE and base == 0
            err, base = p.produce("t", 2, [b"c"])
            assert err == ERR_NONE and base == 2  # monotone offsets
            err, _ = p.produce("missing", 0, [b"x"])
            assert err != ERR_NONE
        assert srv.log[("t", 2)] == [b"a", b"b", b"c"]
    finally:
        srv.close()


def test_epoch_produces_and_confirms(spark, messages, tmp_path):
    srv = KafkaBrokerStub({"olr-changes": 4})
    try:
        sink = KafkaConfirmSink("127.0.0.1", srv.port,
                                confirmed_path=str(tmp_path / "wm"))
        assert sink.last_confirmed_epoch() == -1
        assert sink.send_epoch(messages, 0) is True
        assert sink.last_confirmed_epoch() == 0
        got = sorted(srv.values("olr-changes"))
        want = sorted(
            r["message"].encode() for r in messages.collect()
        )
        assert got == want
    finally:
        srv.close()


def test_refused_delivery_leaves_watermark_then_redelivers(
    spark, messages, tmp_path
):
    """A failed delivery report (broker refuses the produce) must NOT
    advance the watermark — the reference's dr_msg_cb error path — and the
    next send must deliver the epoch whole."""
    srv = KafkaBrokerStub({"olr-changes": 4}, refuse_produces=100)
    try:
        sink = KafkaConfirmSink("127.0.0.1", srv.port,
                                confirmed_path=str(tmp_path / "wm"))
        assert sink.send_epoch(messages, 0) is False
        assert sink.last_confirmed_epoch() == -1
        assert srv.values("olr-changes") == []  # refused ⇒ nothing appended
        srv.refuse_produces = 0
        assert sink.send_epoch(messages, 0) is True
        assert sink.last_confirmed_epoch() == 0
        assert len(srv.values("olr-changes")) == messages.count()
    finally:
        srv.close()


def test_confirmed_epoch_redelivery_is_noop(spark, messages, tmp_path):
    srv = KafkaBrokerStub({"olr-changes": 4})
    try:
        sink = KafkaConfirmSink("127.0.0.1", srv.port,
                                confirmed_path=str(tmp_path / "wm"))
        assert sink.send_epoch(messages, 0) is True
        n0 = len(srv.values("olr-changes"))
        assert sink.send_epoch(messages, 0) is True  # idempotent skip
        assert len(srv.values("olr-changes")) == n0
    finally:
        srv.close()


def test_partition_routing_is_stable(spark, tmp_path):
    """Messages land on topic-partition spark_partition % n_partitions —
    per-partition order is the (epoch, part, offset) total order the
    consumer relies on."""
    srv = KafkaBrokerStub({"olr-changes": 2})
    try:
        sink = KafkaConfirmSink("127.0.0.1", srv.port,
                                confirmed_path=str(tmp_path / "wm"))
        df = spark.range(0, 40).select(
            F.col("id").cast("string").alias("message")
        ).repartition(4)
        assert sink.send_epoch(df, 5) is True
        assert sink.last_confirmed_epoch() == 5
        per_part = {p: srv.log[("olr-changes", p)] for p in (0, 1)}
        assert sum(len(v) for v in per_part.values()) == 40
        # both topic partitions used (4 spark partitions % 2)
        assert all(len(v) > 0 for v in per_part.values())
    finally:
        srv.close()


def test_send_epoch_refuses_watermark_gap(tmp_path):
    # the watermark is a single max-epoch integer: jumping past an
    # unconfirmed epoch would silently mark it confirmed forever, so a gap
    # above an existing watermark must raise (checked before any connection)
    wm = tmp_path / "confirmed"
    wm.write_text("3")
    sink = KafkaConfirmSink("127.0.0.1", 1, confirmed_path=str(wm))
    assert sink.send_epoch(None, 2) is True  # at/below watermark: noop
    with pytest.raises(ValueError, match="non-sequential"):
        sink.send_epoch(None, 5)
