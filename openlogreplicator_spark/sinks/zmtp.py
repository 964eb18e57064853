"""Pure-Python ZMTP 3.0 PAIR transport — the ZeroMQ framing variant of the
network client-confirm sink (SURVEY.md §3.2; reference
src/stream/StreamZeroMQ.cpp:40-98).

The reference offers the same Writer stream over two transports: raw
length-prefixed TCP (StreamNetwork.cpp) and a ZMQ_PAIR socket
(StreamZeroMQ.cpp:45 — ``zmq_socket(context, ZMQ_PAIR)`` over a ``tcp://``
URI). libzmq's wire protocol for that socket is ZMTP 3.0, a public spec
(ZeroMQ RFC 23, https://rfc.zeromq.org/spec/23/). The sandbox has no zmq
library, so this module implements the PAIR/NULL-mechanism subset of ZMTP
3.0 directly on a TCP socket:

* greeting  — 64 octets: 10-octet signature (%xFF 8%x00 %x7F), version
  3.0, 20-octet space-padded mechanism ("NULL"), as-server flag, filler.
* handshake — NULL mechanism: each peer sends a READY command carrying a
  ``Socket-Type`` metadata property; a PAIR peer only accepts PAIR.
* framing   — flags octet (bit0 MORE, bit1 LONG, bit2 COMMAND) + 1-octet
  (short) or 8-octet network-order (long) size + body.

Messages sent with ``send`` are single-part, exactly like the reference's
``StreamZeroMQ::sendMessage`` (one ``zmq_send`` per message,
StreamZeroMQ.cpp:65-78); ``recv`` reassembles multi-part messages from a
real libzmq peer by concatenating MORE-flagged frames.
"""

from __future__ import annotations

import socket
import struct

SIGNATURE_HEAD = b"\xff"
SIGNATURE_TAIL = b"\x7f"
VERSION_MAJOR = 3
VERSION_MINOR = 0

FLAG_MORE = 0x01
FLAG_LONG = 0x02
FLAG_COMMAND = 0x04


class ZmtpError(ConnectionError):
    pass


def _recv_exact(sock: socket.socket, n: int) -> bytes | None:
    buf = b""
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            return None
        buf += chunk
    return buf


def _greeting(as_server: bool, mechanism: bytes = b"NULL") -> bytes:
    return (
        SIGNATURE_HEAD + b"\x00" * 8 + SIGNATURE_TAIL
        + bytes([VERSION_MAJOR, VERSION_MINOR])
        + mechanism.ljust(20, b"\x00")
        + (b"\x01" if as_server else b"\x00")
        + b"\x00" * 31
    )


def encode_frame(body: bytes, flags: int = 0) -> bytes:
    if len(body) > 255 or flags & FLAG_LONG:
        return bytes([flags | FLAG_LONG]) + struct.pack(">Q", len(body)) + body
    return bytes([flags, len(body)]) + body


def encode_ready(socket_type: bytes = b"PAIR", **metadata: bytes) -> bytes:
    """READY command body: command-name + metadata properties
    (1-octet name length, name, 4-octet value length, value)."""
    props = {b"Socket-Type": socket_type}
    props.update({k.encode(): v for k, v in metadata.items()})
    body = b"\x05READY"
    for name, value in props.items():
        body += bytes([len(name)]) + name + struct.pack(">I", len(value)) + value
    return body


def parse_command(body: bytes) -> tuple[str, dict[str, bytes]]:
    """Raises ZmtpError (never IndexError/struct.error) on truncated or
    malformed command bodies — callers catch ZmtpError only, and a
    misbehaving peer must not kill the executor task with a raw parse
    traceback."""
    if not body:
        raise ZmtpError("empty command body")
    n = body[0]
    if 1 + n > len(body):
        raise ZmtpError("truncated command name")
    name = body[1:1 + n].decode("ascii", "replace")
    meta: dict[str, bytes] = {}
    i = 1 + n
    while i < len(body):
        k_len = body[i]
        if i + 1 + k_len + 4 > len(body):
            raise ZmtpError(f"truncated metadata in command {name!r}")
        key = body[i + 1:i + 1 + k_len].decode("ascii", "replace")
        i += 1 + k_len
        (v_len,) = struct.unpack(">I", body[i:i + 4])
        if i + 4 + v_len > len(body):
            raise ZmtpError(f"truncated metadata value in command {name!r}")
        meta[key] = body[i + 4:i + 4 + v_len]
        i += 4 + v_len
    return name, meta


class ZmtpPair:
    """One ZMTP 3.0 PAIR peer over an already-connected TCP socket.

    ``as_server`` only flips the greeting's as-server octet (the NULL
    mechanism is symmetric); either side may have connected or accepted.
    """

    def __init__(self, sock: socket.socket, as_server: bool = False,
                 socket_type: bytes = b"PAIR"):
        self.sock = sock
        self.socket_type = socket_type
        self.peer_metadata: dict[str, bytes] = {}
        self._handshake(as_server)

    @classmethod
    def connect(cls, host: str, port: int, timeout: float = 30.0,
                **kw) -> "ZmtpPair":
        sock = socket.create_connection((host, port), timeout)
        sock.settimeout(timeout)
        return cls(sock, **kw)

    # ----------------------------------------------------------- handshake
    def _handshake(self, as_server: bool) -> None:
        self.sock.sendall(_greeting(as_server))
        peer = _recv_exact(self.sock, 64)
        if peer is None:
            raise ZmtpError("peer closed during greeting")
        if peer[0:1] != SIGNATURE_HEAD or peer[9:10] != SIGNATURE_TAIL:
            raise ZmtpError(f"bad ZMTP signature: {peer[:10]!r}")
        if peer[10] < VERSION_MAJOR:
            raise ZmtpError(f"peer ZMTP version {peer[10]} < 3")
        mechanism = peer[12:32].rstrip(b"\x00")
        if mechanism != b"NULL":
            raise ZmtpError(f"unsupported mechanism {mechanism!r}")
        self.sock.sendall(encode_frame(encode_ready(self.socket_type),
                                       FLAG_COMMAND))
        name, body = self._recv_frame()
        if name != "command":
            raise ZmtpError("expected READY command, got a message frame")
        cmd, meta = parse_command(body)
        if cmd == "ERROR":
            raise ZmtpError(f"peer ERROR: {meta!r}")
        if cmd != "READY":
            raise ZmtpError(f"expected READY, got {cmd}")
        peer_type = meta.get("Socket-Type", b"")
        if peer_type != self.socket_type:
            raise ZmtpError(f"socket-type mismatch: {peer_type!r}")
        self.peer_metadata = meta

    # ------------------------------------------------------------- framing
    def _recv_frame(self) -> tuple[str, bytes]:
        head = _recv_exact(self.sock, 1)
        if head is None:
            raise ZmtpError("peer closed")
        flags = head[0]
        if flags & FLAG_LONG:
            raw = _recv_exact(self.sock, 8)
            if raw is None:
                raise ZmtpError("peer closed in frame header")
            (size,) = struct.unpack(">Q", raw)
        else:
            raw = _recv_exact(self.sock, 1)
            if raw is None:
                raise ZmtpError("peer closed in frame header")
            size = raw[0]
        body = _recv_exact(self.sock, size) if size else b""
        if body is None:
            raise ZmtpError("peer closed in frame body")
        if flags & FLAG_COMMAND:
            return "command", body
        return ("more" if flags & FLAG_MORE else "final"), body

    def send(self, payload: bytes) -> None:
        self.sock.sendall(encode_frame(payload))

    def recv(self) -> bytes | None:
        """Next complete message (MORE parts concatenated); None on orderly
        close before a message starts. Non-ERROR commands between messages
        (e.g. a 3.1 peer's PING) are skipped."""
        parts: list[bytes] = []
        while True:
            try:
                kind, body = self._recv_frame()
            except ZmtpError:
                if parts:
                    raise
                return None
            if kind == "command":
                cmd, meta = parse_command(body)
                if cmd == "ERROR":
                    raise ZmtpError(f"peer ERROR: {meta!r}")
                continue
            parts.append(body)
            if kind == "final":
                return b"".join(parts)

    def close(self) -> None:
        try:
            self.sock.close()
        except OSError:
            pass

    def __enter__(self) -> "ZmtpPair":
        return self

    def __exit__(self, *exc) -> None:
        self.close()
