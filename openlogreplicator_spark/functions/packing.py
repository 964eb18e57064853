"""Distributed ordered prefix-sum and sequence packing.

The LLM-pretraining "concatenate-then-chunk" pack: lay every document's
tokens on one global tape (in a deterministic document order) and cut the
tape into fixed-size context windows. The primitive underneath is an
exclusive prefix sum over a global order — which naive Spark expresses as
``sum().over(Window.orderBy(...))``: an empty-partition-key window that
moves the ENTIRE dataset into one task (Spark itself warns "No Partition
Defined for Window"). That is the single-machine plan; at 100 TB it is a
non-starter.

``ordered_prefix_sum`` is the two-phase scalable shape (the classic
distributed scan):

1. range-shuffle rows by the order key (so partition p holds a contiguous
   key range), sort within partitions;
2. one Arrow-batched pass per partition computes the partition-LOCAL
   exclusive running sum (mapInPandas — order-preserving narrow map, no
   second shuffle);
3. per-partition totals (one scalar per partition) are collected —
   P values, the same audited-tiny-collect class as the IVF centroids —
   cumulated on the driver, and broadcast back as each partition's global
   base offset.

The result is deterministic REGARDLESS of how the range sampler splits the
key space: a prefix sum over a total order does not depend on partition
boundaries, only the intermediate locals do. Correctness therefore never
rests on the two jobs (totals, output) seeing identical partitioning —
only recompute cost does, which is why the narrow projection is cached
for the operator's lifetime.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

__all__ = ["ordered_prefix_sum", "pack_chunks"]


def ordered_prefix_sum(
    df: DataFrame,
    id_col: str,
    value_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """(id, value) → (id, offset): exclusive prefix sum of ``value`` over
    the global ``id`` order. ``id`` must be unique; output offset of row i
    is the sum of values of all rows with smaller id."""
    narrow = df.select(
        F.col(id_col).cast("long").alias(id_col),
        F.col(value_col).cast("long").alias(value_col),
    )
    parts = num_partitions or narrow.sparkSession.sparkContext.defaultParallelism
    ranged = (
        narrow.repartitionByRange(parts, id_col)
        .sortWithinPartitions(id_col)
        .withColumn("_pid", F.spark_partition_id())
    )

    out_schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("_pid", LongType()),
            StructField("_local", LongType()),
            StructField(value_col, LongType()),
        ]
    )

    def local_scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        run = 0
        for b in batches:
            vals = b[value_col].to_numpy()
            local = vals.cumsum() - vals + run  # exclusive, batch-carried
            run += int(vals.sum())
            yield pd.DataFrame(
                {
                    id_col: b[id_col],
                    "_pid": b["_pid"].astype("int64"),
                    "_local": local,
                    value_col: b[value_col],
                }
            )

    scanned = ranged.mapInPandas(local_scan, out_schema)
    # cache the narrow scan so the totals job and the output job reuse one
    # range assignment (correctness does not require it — see module doc —
    # but recomputing the range shuffle twice would)
    scanned = scanned.persist()
    totals = {
        r["_pid"]: r["t"]
        for r in scanned.groupBy("_pid").agg(F.sum(value_col).alias("t")).collect()
    }
    base, bases = 0, []
    for pid in sorted(totals):
        bases.append((pid, base))
        base += int(totals[pid])
    offsets = scanned.sparkSession.createDataFrame(bases, "_pid long, _base long")
    return (
        scanned.join(F.broadcast(offsets), "_pid")
        .select(
            id_col,
            (F.col("_base") + F.col("_local")).alias("offset"),
            value_col,
        )
    )


def pack_chunks(
    df: DataFrame,
    id_col: str,
    n_tokens_col: str,
    ctx: int = 2048,
    num_partitions: int | None = None,
) -> DataFrame:
    """Concatenate-then-chunk packing plan: given per-document token counts,
    assign each document its byte-tape placement — global ``offset``, the
    first/last context window it lands in, and how many windows it spans
    (documents may straddle window boundaries, exactly like GPT-style
    pretraining packing). Downstream, ``groupBy(chunk)`` materializes the
    actual windows; this operator is the scalable placement step."""
    placed = ordered_prefix_sum(df, id_col, n_tokens_col, num_partitions)
    first = F.floor(F.col("offset") / ctx)
    last = F.floor(
        (F.col("offset") + F.greatest(F.col(n_tokens_col), F.lit(1)) - 1) / ctx
    )
    return placed.select(
        id_col,
        n_tokens_col,
        "offset",
        first.alias("first_chunk"),
        last.alias("last_chunk"),
        (last - first + 1).alias("n_chunks"),
    )
