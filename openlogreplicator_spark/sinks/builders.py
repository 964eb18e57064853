"""Change-message builders + sink framing.

The reference frames each committed transaction as a JSON document
{scn, tm, xid, payload:[{op, schema:{owner,table}, rid, after/before}]}
(/root/reference/src/builder/BuilderJson.cpp:837-997; format documented in
documentation/user-manual/user-manual.adoc:266-355) and hands it to a Writer
(file / kafka / zeromq / network, src/OpenLogReplicator.cpp:762-869).

Spark-first mapping: message build is `to_json(struct(...))` — JVM-side,
whole-stage-codegen'd, zero Python (the reference notes its JSON builder is
~2.5x faster than protobuf; to_json is the same in-place spirit). Sinks:

* file   — DataFrameWriter with `maxRecordsPerFile` (the analogue of the
           reference's max-file-size rotation, OpenLogReplicator.cpp:780-794).
* kafka  — Spark's kafka sink takes a (key, value[, topic]) frame;
           `kafka_frame` produces exactly that so
           `.write.format("kafka")` works wherever the kafka connector jar is
           present (not shipped in this sandbox — the frame itself is tested).
* zeromq/network — reference-only transports; a Kafka/file sink covers the
           delivery semantics Spark guarantees (per-epoch atomicity).
* protobuf — the reference's second format (its own tests found JSON ~2.5x
           faster to build, user-manual.adoc:213-217); Spark's `to_protobuf`
           slots into `build_*_messages` wherever the spark-protobuf jar is
           deployed — not shipped in this sandbox, so JSON is the format.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BinaryType


def build_json_messages(
    events: DataFrame,
    owner: str = "CC",
    table: str = "PAGES",
) -> DataFrame:
    """One JSON change message per committed DML event, reference shape:

    {"scn": <warc_ts micros>, "tm": <warc_ts iso>, "seq": <seq>,
     "payload": [{"op": "c|u|d", "schema": {"owner": ..., "table": ...},
                  "rid": <url>, "after": {...}}]}

    op codes match BuilderJson ('c'reate/'u'pdate/'d'elete,
    BuilderJson.cpp:864,904,945); before-images ride under "before" for
    'u'/'d' when present.
    """
    after = F.struct(
        F.col("url"), F.col("text"), F.col("lang"),
        F.element_at(F.col("extras"), "http_status").alias("http_status"),
        F.element_at(F.col("extras"), "fetch_status").alias("fetch_status"),
    )
    payload_entry = F.struct(
        F.col("op").alias("op"),
        F.struct(F.lit(owner).alias("owner"), F.lit(table).alias("table")).alias("schema"),
        F.col("url").alias("rid"),
        F.when(F.col("op") != "d", after).alias("after"),
        F.when(F.col("op").isin("u", "d"), F.transform_values(
            F.col("before"), lambda _k, v: v.cast("string")
        )).alias("before"),
    )
    doc = F.struct(
        F.unix_micros(F.col("warc_ts")).alias("scn"),
        F.date_format(F.col("warc_ts"), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'").alias("tm"),
        F.col("seq").alias("seq"),
        F.array(payload_entry).alias("payload"),
    )
    return events.filter(F.col("op").isin("c", "u", "d")).select(
        F.col("seq"),
        F.col("url"),
        F.to_json(doc, {"ignoreNullFields": "true"}).alias("message"),
    )


# ------------------------------------------------------------- protobuf
# Proto3 wire-format encoder for the reference's RedoResponse message
# (/root/reference/proto/OraProtoBuf.proto:80-161) — no generated classes or
# jars needed. Field numbers/types follow the .proto exactly:
#   RedoResponse{code=1 enum, scn=2 u64, tms=5 str, xidn=7 u64, db=8 str,
#                payload=9 repeated Payload}
#   Payload{op=1 enum, schema=2 Schema, rid=3 str, before=4/after=5
#           repeated Value, seq=7 u32}
#   Schema{owner=1 str, name=2 str}   Value{name=1 str, value_string=5 str}
# Encoding is per record by nature (like the reference's BuilderProtobuf);
# the kernel runs inside an Arrow-batched pandas UDF, and the reference's
# own finding stands: the JSON builder is ~2.5x faster — protobuf exists for
# consumers that require it. Where the spark-protobuf jar is deployed,
# `to_protobuf` against OraProtoBuf.proto is the drop-in JVM-side swap.

_OP_ENUM = {"c": 2, "u": 3, "d": 4, "ddl": 5}  # proto enum Op


def _varint(n: int) -> bytes:
    out = bytearray()
    n &= (1 << 64) - 1
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _tag(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _ld(field: int, payload: bytes) -> bytes:
    """length-delimited field (strings, bytes, submessages)"""
    return _tag(field, 2) + _varint(len(payload)) + payload


def _value_msg(name: str, value) -> bytes:
    m = _ld(1, name.encode())
    if isinstance(value, (bytes, bytearray)):
        m += _ld(6, bytes(value))  # value_bytes
    else:
        m += _ld(5, str(value).encode())  # value_string
    return m


def encode_redo_response(
    op: str, scn_micros: int, tms: str, seq: int, rid: str,
    after: list[tuple[str, object]], before: list[tuple[str, object]],
    owner: str = "CC", table: str = "PAGES", db: str = "CC",
) -> bytes:
    """One RedoResponse message with a single Payload entry (the same
    one-message-per-event framing as build_json_messages)."""
    schema = _ld(1, owner.encode()) + _ld(2, table.encode())
    payload = _tag(1, 0) + _varint(_OP_ENUM[op]) + _ld(2, schema) + _ld(3, rid.encode())
    for name, v in before:
        if v is not None:
            payload += _ld(4, _value_msg(name, v))
    for name, v in after:
        if v is not None:
            payload += _ld(5, _value_msg(name, v))
    payload += _tag(7, 0) + _varint(seq)
    return (
        _tag(1, 0) + _varint(5)            # code = PAYLOAD
        + _tag(2, 0) + _varint(scn_micros)  # scn
        + _ld(5, tms.encode())              # tms
        + _tag(7, 0) + _varint(seq)         # xidn
        + _ld(8, db.encode())               # db
        + _ld(9, payload)
    )


def build_protobuf_messages(
    events: DataFrame, owner: str = "CC", table: str = "PAGES", db: str = "CC"
) -> DataFrame:
    """(seq, url, message binary) — protobuf twin of build_json_messages."""

    def _encode(batch: pd.DataFrame) -> pd.Series:
        out = []
        for r in batch.itertuples(index=False):
            after = [] if r.op == "d" else [
                ("url", r.url), ("text", r.text), ("lang", r.lang),
                ("http_status", r.http_status), ("fetch_status", r.fetch_status),
            ]
            before = list((r.before or {}).items()) if r.op in ("u", "d") else []
            out.append(encode_redo_response(
                r.op, int(r.scn), r.tms, int(r.seq), r.url, after, before,
                owner=owner, table=table, db=db,
            ))
        return pd.Series(out)

    enc = pandas_udf(_encode, BinaryType())
    prepared = events.filter(F.col("op").isin("c", "u", "d")).select(
        "seq", "url", "op", "text", "lang", "before",
        F.element_at(F.col("extras"), "http_status").alias("http_status"),
        F.element_at(F.col("extras"), "fetch_status").alias("fetch_status"),
        F.unix_micros(F.col("warc_ts")).alias("scn"),
        F.date_format(F.col("warc_ts"), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'").alias("tms"),
    )
    return prepared.select(
        "seq", "url",
        enc(F.struct(*prepared.columns)).alias("message"),
    )


def write_file_sink(
    messages: DataFrame, path: str, max_records_per_file: int = 100_000
) -> None:
    """WriterFile analogue: newline-delimited JSON with size-based rotation."""
    (
        messages.select("message")
        .write.mode("append")
        .option("maxRecordsPerFile", max_records_per_file)
        .text(path)
    )


def kafka_frame(messages: DataFrame, topic: str) -> DataFrame:
    """Frame messages for Spark's kafka sink: key = url (per-key ordering in
    a partition — the reference's exactly-once confirm protocol maps to
    Kafka idempotent producer + per-epoch batches), value = JSON bytes."""
    return messages.select(
        F.col("url").cast("binary").alias("key"),
        F.col("message").cast("binary").alias("value"),
        F.lit(topic).alias("topic"),
    )
