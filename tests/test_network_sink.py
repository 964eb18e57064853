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
    """Reference consumer: accepts control + data connections, counts REDO
    frames per epoch, confirms an epoch at END (optionally refuses).
    ``framing="zmtp"`` performs the server side of the ZMTP 3.0 PAIR
    handshake on every accepted connection."""

    def __init__(self, confirm: bool = True, framing: str = "raw"):
        self.confirm = confirm
        self.framing = framing
        self.redo: dict[int, list[bytes]] = {}
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
                    with self.lock:
                        self.redo.setdefault(msg["epoch"], []).append(payload)
                elif code == "PARTITION_END":
                    pass
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
    got = sorted(json.loads(m)["k"] for m in srv.redo[0])
    assert got == list(range(57))  # every partition's frames arrived
    # re-delivery of a confirmed epoch is a NO-OP (idempotent)
    assert sink.send_epoch(messages, 0) is True
    assert len(srv.redo[0]) == 57
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
