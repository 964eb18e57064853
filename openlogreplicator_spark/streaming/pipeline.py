"""CdcPipeline — the end-to-end engine: log-tail → decode → LWW → MERGE.

Maps the reference's hot path (/root/reference: Reader → Parser →
TransactionBuffer → Builder → Writer, src/OpenLogReplicator.cpp:130-885) onto
one Structured Streaming query:

    spark.readStream(events)                      # S1 ordered log tail
      .writeStream.foreachBatch(apply_epoch)      # LWN/epoch boundary (P1)
      .option("checkpointLocation", ...)          # T3 checkpoints (automatic)

and per epoch (apply_epoch):

    exactly-once gate (T2, reference isNewData Metadata.cpp:592-603)
    → split ddl / dml (P4), drop rolled-back (A2, Transaction.cpp:71-187)
    → per schema_ver ascending:                   # §2.9 ordered evolution
         apply DDL (LakeTable.evolve — metadata only)
         project to current schema (P3-P9 decode)
         salted two-phase LWW compaction (A3)
         merge_into target (J5, idempotent)
    → lineage/metrics side table append (A5, Parser.cpp:1482-1512 counters)

Restart/resume (§3.3): the checkpointLocation replays the last uncommitted
epoch; the epoch gate + idempotent merge make the replay bit-exact — the
analogue of re-reading from the low-watermark while isNewData suppresses
already-confirmed messages.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..lake.table import LakeTable
from ..operators.decode import EVENTS_DDL, ddl_events, dml_events, project_dml
from ..operators.lww import lww_compact, lww_compact_salted
from ..operators.merge import merge_into, read_state

# Target-table base schema (log schema_ver = 1). _seq/_op are engine columns:
# the LWW tie-breaker and the tombstone marker (user reads filter _op='d').
TARGET_BASE_FIELDS = [
    ("url", "string"),
    ("warc_ts", "timestamp"),
    ("_seq", "long"),
    ("_op", "string"),
    ("html", "binary"),
    ("text", "string"),
    ("lang", "string"),
]


class CdcPipeline:
    def __init__(
        self,
        spark: SparkSession,
        events_path: str,
        table_path: str,
        checkpoint_path: str,
        metrics_path: str | None = None,
        n_buckets: int = 16,
        n_salts: int = 8,
        use_salted_lww: bool = True,
        recompute_text: bool = False,
    ):
        self.spark = spark
        self.events_path = events_path
        self.table_path = table_path
        self.checkpoint_path = checkpoint_path
        self.metrics_path = metrics_path
        self.n_buckets = n_buckets
        self.n_salts = n_salts
        self.use_salted_lww = use_salted_lww
        self.recompute_text = recompute_text

    # ------------------------------------------------------------ lifecycle
    def ensure_table(self) -> LakeTable:
        if LakeTable.exists(self.table_path):
            return LakeTable.load(self.spark, self.table_path)
        return LakeTable.create(
            self.spark,
            self.table_path,
            TARGET_BASE_FIELDS,
            key_col="url",
            n_buckets=self.n_buckets,
            schema_ver=1,
        )

    def target_state(self) -> DataFrame:
        """Live rows of the target (tombstones filtered) at the current schema."""
        return read_state(LakeTable.load(self.spark, self.table_path))

    # ------------------------------------------------------------ the epoch
    def apply_epoch(self, batch_df: DataFrame, epoch_id: int) -> None:
        t0 = time.time()
        table = self.ensure_table()
        last_epoch, finalized = table.last_epoch()
        if int(epoch_id) < last_epoch or (int(epoch_id) == last_epoch and finalized):
            return  # T2: already confirmed — exactly-once re-delivery suppression

        ddl_rows = sorted(
            ddl_events(batch_df).collect(), key=lambda r: (r["warc_ts"], r["seq"])
        )
        dml = dml_events(batch_df)
        dml_vers = [r[0] for r in dml.select("schema_ver").distinct().collect()]
        vers = sorted(set(dml_vers) | {r["schema_ver"] for r in ddl_rows})
        if not vers:
            table.commit_summary_only(
                {"op": "merge", "epoch_id": int(epoch_id), "final": True}
            )
            return

        stats = []
        for i, ver in enumerate(vers):
            for d in ddl_rows:
                if d["schema_ver"] == ver and ver > table.current_schema_ver:
                    table.evolve(
                        d["action"], d["col_name"], d["new_name"], d["new_type"],
                        to_ver=ver,
                    )
            if ver not in dml_vers:
                if i == len(vers) - 1:  # still finalize the epoch
                    table.commit_summary_only(
                        {"op": "merge", "epoch_id": int(epoch_id), "final": True}
                    )
                continue
            sub = project_dml(
                dml.filter(F.col("schema_ver") == ver), table, ver,
                recompute_text=self.recompute_text,
            )
            compacted = (
                lww_compact_salted(sub, "url", n_salts=self.n_salts)
                if self.use_salted_lww
                else lww_compact(sub, "url")
            )
            stats.append(
                merge_into(
                    table,
                    compacted,
                    epoch_id=int(epoch_id),
                    final=(i == len(vers) - 1),
                    extra_summary={"schema_ver": ver},
                )
            )
        if self.metrics_path:
            self._write_metrics(batch_df, int(epoch_id), time.time() - t0, stats)

    def _write_metrics(
        self, batch_df: DataFrame, epoch_id: int, secs: float, stats: list[dict]
    ) -> None:
        """A5 lineage side table: per-input-partition counts + epoch throughput."""
        per_part = (
            batch_df.groupBy(F.spark_partition_id().alias("partition_id"))
            .agg(
                F.count("*").alias("events"),
                F.min("warc_ts").alias("min_warc_ts"),
                F.max("warc_ts").alias("max_warc_ts"),
                F.sum(F.when(F.col("op") == "ddl", 1).otherwise(0)).alias("ddl_events"),
                F.sum(F.when(F.col("rolled_back"), 1).otherwise(0)).alias("rolled_back"),
            )
            .withColumn("epoch_id", F.lit(epoch_id))
            .withColumn("epoch_secs", F.lit(round(secs, 3)))
            .withColumn(
                "rows_merged", F.lit(sum(s.get("rows", 0) for s in stats))
            )
        )
        per_part.write.mode("append").parquet(self.metrics_path)

    # -------------------------------------------------------------- runners
    def run_available_now(self, max_files_per_trigger: int = 1) -> None:
        """Streaming replay: one micro-batch per trigger unit, resumable from
        the checkpoint. Processes everything currently in the log, then stops."""
        stream = (
            self.spark.readStream.schema(EVENTS_DDL)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(self.events_path)
        )
        q = (
            stream.writeStream.foreachBatch(self.apply_epoch)
            .option("checkpointLocation", self.checkpoint_path)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    def run_batch_replay(self) -> None:
        """S6 batch mode (reference ReplicatorBatch.cpp): apply the whole log
        as a single epoch — the replay-verification and bench path."""
        df = self.spark.read.schema(EVENTS_DDL).parquet(self.events_path)
        self.apply_epoch(df, epoch_id=0)
