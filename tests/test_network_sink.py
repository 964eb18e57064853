"""Network client-confirm transport (reference WriterStream/StreamNetwork):
frames, per-partition streaming, the CONFIRM-driven exactly-once watermark,
and idempotent re-delivery."""

import json
import socket
import threading

import pytest
from pyspark.sql import functions as F

from openlogreplicator_spark.sinks.network import (
    NetworkConfirmSink,
    ReferenceConsumer,
    _RawTransport,
    recv_frame,
    send_frame,
)

ConsumerServer = ReferenceConsumer
from openlogreplicator_spark.sinks.zmtp import ZmtpPair


@pytest.fixture()
def messages(spark):
    return spark.range(0, 57).select(
        F.concat(F.lit('{"k":'), F.col("id").cast("string"), F.lit("}"))
        .alias("message")
    ).repartition(4)


@pytest.mark.parametrize("framing", ["raw", "zmtp"])
def test_epoch_streams_and_confirms(spark, messages, tmp_path, framing):
    srv = ConsumerServer(framing=framing)
    sink = NetworkConfirmSink("127.0.0.1", srv.port,
                              confirmed_path=str(tmp_path / "wm"),
                              framing=framing)
    assert sink.last_confirmed_epoch() == -1
    assert sink.send_epoch(messages, 0) is True
    assert sink.last_confirmed_epoch() == 0

    def frames(epoch):
        return [m for part in srv.redo[epoch].values() for m in part]

    got = sorted(json.loads(m)["k"] for m in frames(0))
    assert got == list(range(57))  # every partition's frames arrived
    assert set(srv.redo[0]) == {0, 1, 2, 3}  # one slot per partition id
    # re-delivery of a confirmed epoch is a NO-OP (idempotent)
    assert sink.send_epoch(messages, 0) is True
    assert len(frames(0)) == 57
    srv.close()


def test_unconfirmed_epoch_does_not_advance_watermark(spark, messages, tmp_path):
    srv = ConsumerServer(confirm=False)
    sink = NetworkConfirmSink("127.0.0.1", srv.port,
                              confirmed_path=str(tmp_path / "wm"))
    assert sink.send_epoch(messages, 0) is False
    assert sink.last_confirmed_epoch() == -1  # gate held: replay will resend
    srv.close()


def test_info_handshake_reports_watermark(spark, tmp_path):
    srv = ConsumerServer()
    wm = tmp_path / "wm"
    wm.write_text("7")
    sink = NetworkConfirmSink("127.0.0.1", srv.port, confirmed_path=str(wm))
    resp = sink.handshake_info()
    assert resp["code"] == "INFO_OK"
    assert srv.infos[0]["confirmed_epoch"] == 7
    srv.close()


def test_zmtp_info_handshake(tmp_path):
    srv = ConsumerServer(framing="zmtp")
    wm = tmp_path / "wm"
    wm.write_text("3")
    sink = NetworkConfirmSink("127.0.0.1", srv.port, confirmed_path=str(wm),
                              framing="zmtp")
    resp = sink.handshake_info()
    assert resp["code"] == "INFO_OK"
    assert srv.infos[0]["confirmed_epoch"] == 3
    srv.close()


def test_task_retry_does_not_duplicate_partition(tmp_path):
    """A Spark task retry re-streams the same partition on a fresh
    connection: the consumer must collapse the two deliveries of
    (epoch, part) into one — the exactly-once hole the per-frame partition
    id exists to close."""
    from openlogreplicator_spark.sinks.network import open_transport

    srv = ConsumerServer()

    def stream_partition(part, payloads):
        chan = open_transport("127.0.0.1", srv.port, 10.0, "raw")
        try:
            for seq, p in enumerate(payloads):
                chan.send(json.dumps(
                    {"code": "REDO", "epoch": 5, "part": part, "seq": seq}
                ).encode())
                chan.send(p)
            chan.send(json.dumps(
                {"code": "PARTITION_END", "epoch": 5, "part": part,
                 "n": len(payloads)}
            ).encode())
        finally:
            chan.close()

    payloads = [b'{"k":1}', b'{"k":2}', b'{"k":3}']
    stream_partition(0, payloads)
    stream_partition(1, [b'{"k":9}'])
    stream_partition(0, payloads)  # the retry: same partition, new connection

    import time

    deadline = time.time() + 5
    while time.time() < deadline and set(srv.redo.get(5, {})) != {0, 1}:
        time.sleep(0.05)
    assert srv.redo[5][0] == payloads  # one copy, not two
    assert srv.redo[5][1] == [b'{"k":9}']
    srv.close()


def test_send_epoch_refuses_watermark_gap(tmp_path):
    # same sequential-epoch contract as the Kafka sink: a max-epoch
    # watermark cannot represent a hole
    wm = tmp_path / "confirmed"
    wm.write_text("3")
    sink = NetworkConfirmSink("127.0.0.1", 1, confirmed_path=str(wm))
    assert sink.send_epoch(None, 3) is True
    with pytest.raises(ValueError, match="non-sequential"):
        sink.send_epoch(None, 7)
