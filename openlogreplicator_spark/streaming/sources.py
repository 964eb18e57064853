"""Alternative change-log sources (SURVEY.md §2.1): the engine is
source-agnostic — anything that yields the events schema can feed
``CdcPipeline.apply_epoch``.

* File source (default): ordered parquet tail with checkpoint offsets —
  the archived-redo-log path (S3).
* ``rate_micro_batch_events``: deterministic synthetic stream from Spark's
  rate-micro-batch source — the online-redo-tail stand-in (S4): rows keep
  arriving forever, batch content is a pure function of the batch id, so
  replays are bit-exact (startTimestamp pinned). Useful for soak tests and
  for demonstrating a non-file source without a Kafka broker.
* Kafka: `spark.readStream.format("kafka")` yields (key, value binary);
  `kafka_events` maps the reference's JSON message shape back into the
  events schema — usable wherever the kafka connector jar is present.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def rate_micro_batch_events(
    spark: SparkSession,
    rows_per_batch: int = 1000,
    n_urls: int = 200,
) -> DataFrame:
    """Deterministic infinite event stream in the events-log schema.

    Every column derives from the rate source's monotone ``value`` (no
    rand()), so a replayed batch is byte-identical — the determinism the
    bit-exact resume rule needs (§3.3).
    """
    rate = (
        spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", rows_per_batch)
        .option("startTimestamp", 0)
        .load()
    )  # columns: timestamp, value
    v = F.col("value")
    url = F.concat(
        F.lit("https://site"), (v % 50).cast("string"),
        F.lit(".example/p/"), (v % n_urls).cast("string"),
    )
    op = (
        F.when(F.pmod(F.xxhash64(v), F.lit(100)) < 70, "u")
        .when(F.pmod(F.xxhash64(v), F.lit(100)) < 85, "d")
        .otherwise("c")
    )
    body = F.concat(
        F.lit("<html><body><p>page "), v.cast("string"), F.lit("</p></body></html>")
    )
    text = F.concat(F.lit("page "), v.cast("string"))
    return (
        rate.select(
            v.alias("seq"),
            F.timestamp_micros(
                F.lit(1577836800000000) + v * 1_370_000
            ).alias("warc_ts"),
            op.alias("op"),
            url.alias("url"),
            body.cast("binary").alias("html"),
            text.alias("text"),
            F.lit("en").alias("lang"),
            F.lit(None).cast("map<string,binary>").alias("before"),
            F.lit(None).cast("map<string,string>").alias("extras"),
            F.lit(1).alias("schema_ver"),
            F.lit(False).alias("rolled_back"),
            F.lit(None).cast("string").alias("action"),
            F.lit(None).cast("string").alias("col_name"),
            F.lit(None).cast("string").alias("new_name"),
            F.lit(None).cast("string").alias("new_type"),
        )
        .withColumn("html", F.when(F.col("op") != "d", F.col("html")))
        .withColumn("text", F.when(F.col("op") != "d", F.col("text")))
    )


# JSON-lines change-log interchange: binary columns ride as base64, the
# event time as exact epoch micros (a formatted timestamp string would
# round-trip through parser precision; micros are the log's native unit).
_JSONL_DDL = (
    "seq long, warc_ts_us long, op string, url string, html string,"
    " text string, lang string, before map<string,string>,"
    " extras map<string,string>, schema_ver int, rolled_back boolean,"
    " action string, col_name string, new_name string, new_type string"
)


def _project_jsonl(df: DataFrame) -> DataFrame:
    """Wire layout → events schema (one definition for batch, streaming,
    and the epoch re-read path)."""
    return df.select(
        "seq",
        F.timestamp_micros(F.col("warc_ts_us")).alias("warc_ts"),
        "op", "url",
        F.unbase64(F.col("html")).alias("html"),
        "text", "lang",
        F.transform_values(
            F.col("before"), lambda _k, v: F.unbase64(v)
        ).alias("before"),
        "extras", "schema_ver", "rolled_back",
        "action", "col_name", "new_name", "new_type",
    )


def jsonl_events(
    spark: SparkSession,
    path: str | list[str],
    streaming: bool = False,
    options: dict | None = None,
) -> DataFrame:
    """Read a JSON-lines change log into the events schema — the second
    archived-log format next to parquet (S3; reference analogue: the
    replicator ingests both online and archived redo, Reader format
    dispatch). Schema is pinned (never inferred — inference would scan
    twice and could type-drift per file); html/before values decode from
    base64; warc_ts from exact epoch micros. ``streaming=True`` returns a
    readStream over the same layout, so the checkpointed micro-batch path
    works identically to the parquet tail; ``options`` forwards reader
    options (maxFilesPerTrigger etc.)."""
    reader = (spark.readStream if streaming else spark.read).schema(_JSONL_DDL)
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    return _project_jsonl(reader.json(path))


def write_events_jsonl(
    events_df: DataFrame, out_dir: str, n_files: int | None = None
) -> None:
    """Export an events-schema DataFrame as the JSON-lines interchange
    layout ``jsonl_events`` reads (base64 binaries, epoch-micro times) —
    the round-trip tool for moving a change log between engines.

    The output honors the ORDERED-ARCHIVE contract (S3) the streaming
    reader depends on, in both dimensions FileStreamSource can order by:

    * content: ``repartitionByRange(seq)`` + in-partition sort, so
      part-file NAME order is archive (seq) order — a plain distributed
      write packs input splits largest-first, which lands the earliest
      events in the LAST part file and delivers DDLs out of order once a
      maxFilesPerTrigger stream splits the files across epochs;
    * mtime: part files are touched driver-side to strictly increasing
      timestamps in name order — parallel write tasks otherwise race the
      modification times FileStreamSource sorts on (the same property the
      parquet fixture gets for free from datagen's sequential writer).
    """
    n = n_files or max(events_df.rdd.getNumPartitions(), 1)
    (
        events_df.repartitionByRange(n, "seq")
        .sortWithinPartitions("seq")
        .select(
            "seq",
            F.unix_micros(F.col("warc_ts")).alias("warc_ts_us"),
            "op", "url",
            F.base64(F.col("html")).alias("html"),
            "text", "lang",
            F.transform_values(
                F.col("before"), lambda _k, v: F.base64(v)
            ).alias("before"),
            "extras", "schema_ver", "rolled_back",
            "action", "col_name", "new_name", "new_type",
        )
        .write.mode("overwrite")
        .json(out_dir)
    )
    import glob as _glob
    import os as _os
    import time as _time

    parts = sorted(_glob.glob(_os.path.join(out_dir, "part-*")))
    base = _time.time() - len(parts)
    for i, p in enumerate(parts):
        _os.utime(p, (base + i, base + i))


def kafka_events(kafka_df: DataFrame) -> DataFrame:
    """Map a kafka (key, value) frame carrying sinks.builders JSON messages
    back into the DML subset of the events schema (the reference's round-trip:
    its JSON output is its own reproduction-case input, user-manual 405-412)."""
    doc = F.from_json(
        F.col("value").cast("string"),
        "scn long, tm string, seq long, payload array<struct<"
        "op string, rid string, after struct<url string, text string, lang string>>>",
    )
    p = F.element_at(doc["payload"], 1)
    return (
        kafka_df.select(
            doc["seq"].alias("seq"),
            F.timestamp_micros(doc["scn"]).alias("warc_ts"),
            p["op"].alias("op"),
            p["rid"].alias("url"),
            p["after"]["text"].cast("binary").alias("html"),
            p["after"]["text"].alias("text"),
            p["after"]["lang"].alias("lang"),
        )
    )
