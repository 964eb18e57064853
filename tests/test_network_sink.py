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
    _RawTransport,
    recv_frame,
    send_frame,
)
from openlogreplicator_spark.sinks.zmtp import ZmtpPair


class ConsumerServer:
    """Reference consumer: accepts control + data connections, buffers REDO
    frames per (epoch, partition) and COMMITS the buffer at PARTITION_END —
    the last complete delivery of a partition wins, which is what makes a
    Spark task retry (same partition re-streamed on a new connection)
    idempotent. Confirms an epoch at END (optionally refuses).
    ``framing="zmtp"`` performs the server side of the ZMTP 3.0 PAIR
    handshake on every accepted connection."""

    def __init__(self, confirm: bool = True, framing: str = "raw"):
        self.confirm = confirm
        self.framing = framing
        self.redo: dict[int, dict[int, list[bytes]]] = {}
        self.infos: list[dict] = []
        self.lock = threading.Lock()
        self.srv = socket.create_server(("127.0.0.1", 0))
        self.port = self.srv.getsockname()[1]
        self._stop = False
        self.thread = threading.Thread(target=self._accept_loop, daemon=True)
        self.thread.start()

    def _accept_loop(self):
        while not self._stop:
            try:
                conn, _ = self.srv.accept()
            except OSError:
                return
            threading.Thread(
                target=self._serve, args=(conn,), daemon=True
            ).start()

    def _serve(self, conn: socket.socket):
        with conn:
            if self.framing == "zmtp":
                try:
                    chan = ZmtpPair(conn, as_server=True)
                except ConnectionError:
                    return
            else:
                chan = _RawTransport(conn)
            pending: dict[tuple, list[bytes]] = {}
            while True:
                try:
                    frame = chan.recv()
                except ConnectionError:
                    return
                if frame is None:
                    return
                msg = json.loads(frame)
                code = msg["code"]
                if code == "INFO":
                    self.infos.append(msg)
                    chan.send(json.dumps(
                        {"code": "INFO_OK", "client_confirmed": -1}
                    ).encode())
                elif code == "BEGIN":
                    chan.send(json.dumps({"code": "READY"}).encode())
                elif code == "REDO":
                    payload = chan.recv()
                    pending.setdefault(
                        (msg["epoch"], msg.get("part", 0)), []
                    ).append(payload)
                elif code == "PARTITION_END":
                    key = (msg["epoch"], msg.get("part", 0))
                    with self.lock:
                        self.redo.setdefault(key[0], {})[key[1]] = (
                            pending.pop(key, [])
                        )
                elif code == "END":
                    code_out = "CONFIRM" if self.confirm else "REFUSED"
                    chan.send(json.dumps(
                        {"code": code_out, "epoch": msg["epoch"]}
                    ).encode())

    def close(self):
        self._stop = True
        self.srv.close()


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
