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
