"""MERGE-apply (SURVEY.md §2.3 J5): idempotent LWW upsert of a compacted batch
into a LakeTable, bucket-pruned copy-on-write.

The reference never merges into a database ("target is always a message
system", documentation/introduction.adoc:81-86); this operator is the piece
our engine adds, with Iceberg MERGE INTO semantics:

    WHEN MATCHED AND s > t (by warc_ts, _seq) AND s._op = 'd' THEN DELETE
    WHEN MATCHED AND s > t                      THEN UPDATE *
    WHEN NOT MATCHED AND s._op != 'd'           THEN INSERT *

implemented as union + max-by instead of a join — same result, strictly fewer
shuffles, and idempotent under replay (re-merging an already-applied batch is
a no-op because max-by is idempotent).

Scale design:
* target files are hash-bucketed on the key; only buckets the batch touches
  are read and rewritten (partition pruning; untouched files carry over in the
  new snapshot) — at 10^10 rows an epoch rewrites O(touched buckets), never
  the full table.
* deletes are kept as tombstone rows (``_op='d'``) so a LATE event older than
  a delete cannot resurrect the key across epochs (T4: "late events older than
  the current target row are no-ops"). User-facing reads filter tombstones.
"""

from __future__ import annotations

import os
import time
from collections.abc import Iterable

import pyarrow.parquet as pq
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..lake.table import LakeTable
from .lww import lww_compact_auto

DEFAULT_BROADCAST_BUDGET = 20_000_000


def _collect_written_files(absdir: str, table: LakeTable) -> tuple[list[dict], int]:
    """Manifest entries for every parquet file a commit's write produced.

    Footer reads run on a THREAD POOL: this walk executes on the driver
    between the write job and the snapshot commit, so done serially it is a
    pure non-scaling share of every epoch (it showed up as ~0.2-0.5 s of the
    flat cost in the N-vs-4N scaling decomposition, BASELINE.md)."""
    import concurrent.futures

    paths: list[str] = []
    for root, _dirs, files in os.walk(absdir):
        for fn in files:
            if fn.endswith(".parquet"):
                paths.append(os.path.join(root, fn))

    def meta(ap: str) -> tuple[str, int]:
        return ap, pq.ParquetFile(ap).metadata.num_rows

    entries, rows = [], 0
    if not paths:
        return entries, rows
    with concurrent.futures.ThreadPoolExecutor(min(16, len(paths))) as ex:
        for ap, n in ex.map(meta, paths):
            rows += n
            entries.append(
                {
                    "path": os.path.relpath(ap, table.path),
                    "bucket": int(os.path.basename(os.path.dirname(ap)).split("=")[1]),
                    "schema_ver": table.current_schema_ver,
                    "rows": n,
                }
            )
    return entries, rows


def read_state(
    table: LakeTable, broadcast_budget_keys: int = DEFAULT_BROADCAST_BUDGET
) -> DataFrame:
    """User-facing scan: live rows only (tombstones filtered, internal cols
    kept). On a merge-on-read table (uncompacted appended deltas), winners
    are resolved at read time — same LWW total order, so state is identical
    to the copy-on-write path.

    Scale shape (round-2 verdict tasks 4+5): read-time LWW runs ONLY over the
    dirty buckets (buckets partition keys, so per-bucket LWW is exact); clean
    buckets stream through untouched. The LWW strategy is auto-selected with
    the snapshot's exact per-bucket row counts as a free key-count bound —
    above the broadcast budget the salted two-phase form engages instead of
    broadcasting a hash of every distinct key in the table."""
    dirty = table.dirty_buckets()
    if not dirty:
        df = table.read()
    else:
        present = {f["bucket"] for f in table.snap["files"]}
        clean = present - dirty
        resolved = lww_compact_auto(
            table.read(dirty),
            key=table.key_col,
            order=("warc_ts", "_seq"),
            broadcast_budget_keys=broadcast_budget_keys,
            approx_rows=table.rows_in_buckets(dirty),
        )
        df = (
            resolved.unionByName(table.read(clean)) if clean else resolved
        )
    return df.filter(F.col("_op") != "d")


def purge_tombstones(table: LakeTable, older_than) -> dict:
    """Maintenance: drop delete tombstones with warc_ts < older_than.

    Safe once the event-time watermark guarantees no event older than the
    cutoff can still arrive (T4) — after that, a tombstone can no longer be
    needed to block a late resurrect. Only buckets that actually contain
    expired tombstones are rewritten (bucket-pruned, like merge)."""
    full = table.read().withColumn("_bucket", table.bucket_expr())
    expired = (F.col("_op") == "d") & (F.col("warc_ts") < F.lit(older_than))
    dirty = [
        r[0]
        for r in full.filter(expired).select("_bucket").distinct().collect()
    ]
    if not dirty:
        table.commit_summary_only({"op": "purge_tombstones", "buckets": 0})
        return {"buckets_rewritten": 0, "rows": 0}
    kept = table.read(dirty).withColumn("_bucket", table.bucket_expr()).filter(~expired)
    absdir, _rel = table.new_data_dir()
    kept.repartition(max(1, min(len(dirty), 64)), "_bucket").write.partitionBy(
        "_bucket"
    ).parquet(absdir)
    new_files, rows = _collect_written_files(absdir, table)
    table.commit_files(
        new_files, dirty, {"op": "purge_tombstones", "buckets": len(dirty)}
    )
    return {"buckets_rewritten": len(dirty), "rows": rows}


def merge_append(
    table: LakeTable,
    batch: DataFrame,
    epoch_id: int = 0,
    final: bool = True,
    extra_summary: dict | None = None,
) -> dict:
    """Merge-on-read upsert (Iceberg MoR analogue): append the compacted
    batch as per-bucket delta files WITHOUT reading or rewriting the current
    data — epoch cost is O(batch), not O(touched-bucket contents). Readers
    resolve LWW across deltas (read_state); ``compact_table`` collapses
    deltas back to one file per bucket. Use for high-frequency epochs where
    copy-on-write write amplification dominates (each file still carries the
    schema_ver it was written under, so evolution semantics are unchanged)."""
    t0 = time.time()
    b = batch.withColumn("_bucket", table.bucket_expr())
    absdir, _rel = table.new_data_dir()
    (
        b.repartition(max(1, min(table.n_buckets, 64)), "_bucket")
        .write.partitionBy("_bucket")
        .parquet(absdir)
    )
    new_files, rows = _collect_written_files(absdir, table)
    summary = {
        "op": "merge_append",
        "epoch_id": int(epoch_id),
        "final": bool(final),
        "merge_secs": round(time.time() - t0, 3),
        "rows_written": rows,
        **(extra_summary or {}),
    }
    touched = {f["bucket"] for f in new_files}
    dirty = sorted(table.dirty_buckets() | touched)
    table.commit_files(
        new_files, replaced_buckets=[], summary=summary,
        extra={"needs_read_compaction": bool(dirty), "dirty_buckets": dirty},
    )
    return {"touched_buckets": len(touched),
            "files": len(new_files), "rows": rows}


def compact_table(
    table: LakeTable, broadcast_budget_keys: int = DEFAULT_BROADCAST_BUDGET
) -> dict:
    """Collapse merge-on-read deltas: LWW per DIRTY bucket, rewrite only those
    buckets, clear their dirty mark. The maintenance half of merge_append
    (run on a cadence, like the reference's checkpoint GC) — a compaction
    after a 1-bucket epoch rewrites 1 bucket, never the table (round-2
    verdict task 5); at 10^10 rows the previous full-table rewrite was a
    periodic scale wall."""
    dirty = sorted(table.dirty_buckets())
    if not dirty:
        table.commit_summary_only({"op": "compact", "buckets": 0})
        return {"files": 0, "rows": 0, "buckets_rewritten": 0}
    full = table.read(dirty).withColumn("_bucket", table.bucket_expr())
    merged = lww_compact_auto(
        full,
        key=table.key_col,
        order=("warc_ts", "_seq"),
        broadcast_budget_keys=broadcast_budget_keys,
        approx_rows=table.rows_in_buckets(dirty),
    )
    absdir, _rel = table.new_data_dir()
    (
        merged.repartition(max(1, min(len(dirty), 64)), "_bucket")
        .write.partitionBy("_bucket")
        .parquet(absdir)
    )
    new_files, rows = _collect_written_files(absdir, table)
    table.commit_files(
        new_files, dirty, {"op": "compact", "rows": rows, "buckets": len(dirty)},
        extra={"needs_read_compaction": False, "dirty_buckets": []},
    )
    return {"files": len(new_files), "rows": rows, "buckets_rewritten": len(dirty)}


def rewrite_buckets(table: LakeTable, buckets: Iterable[int]) -> dict:
    """Content-preserving bin-pack of CLEAN buckets: coalesce each listed
    bucket's files into one file at the current schema — Iceberg's
    rewrite_data_files for the small-files problem (every MoR epoch appends
    a file per touched bucket; without periodic bin-packing the scan's file
    count grows linearly with epochs even after the dirty deltas are
    compacted away). Dirty buckets are REFUSED (their rewrite must be the
    LWW compact_table — a raw rewrite would bake duplicate key versions
    into a bucket that read_state would then treat as clean). Rewrites only
    the listed buckets; row content is untouched."""
    req = sorted(set(buckets))
    dirty = table.dirty_buckets() & set(req)
    if dirty:
        raise ValueError(
            f"buckets {sorted(dirty)} hold uncompacted deltas — run "
            "compact_table first (plan_compaction splits the two queues)"
        )
    if not req:
        return {"files": 0, "rows": 0, "buckets_rewritten": 0}
    full = table.read(req).withColumn("_bucket", table.bucket_expr())
    absdir, _rel = table.new_data_dir()
    (
        full.repartition(max(1, min(len(req), 64)), "_bucket")
        .write.partitionBy("_bucket")
        .parquet(absdir)
    )
    new_files, rows = _collect_written_files(absdir, table)
    table.commit_files(
        new_files, req,
        {"op": "rewrite", "rows": rows, "buckets": len(req)},
    )
    return {"files": len(new_files), "rows": rows, "buckets_rewritten": len(req)}


def merge_into(
    table: LakeTable,
    batch: DataFrame,
    epoch_id: int = 0,
    final: bool = True,
    extra_summary: dict | None = None,
    broadcast_budget_keys: int = DEFAULT_BROADCAST_BUDGET,
) -> dict:
    """Merge a compacted (one-row-per-key) batch; returns commit stats.

    Exactly-once gate lives in the caller (pipeline) — this function is safe
    to re-run regardless (idempotent by construction).
    """
    t0 = time.time()
    key = table.key_col
    # persist: the compacted batch feeds two actions (bucket discovery +
    # write); without it the whole decode→LWW DAG runs twice per epoch.
    summary = {
        "op": "merge",
        "epoch_id": int(epoch_id),
        "final": bool(final),
        **(extra_summary or {}),
    }
    b = batch.withColumn("_bucket", table.bucket_expr())
    if not table.snap["files"]:
        # Empty target (first epoch / batch replay): no carry-over to prune,
        # so skip the bucket-discovery job entirely — the replaced-bucket set
        # is derivable from the files the write produces.
        merged, touched = b, None
    else:
        b = b.persist()  # feeds two actions: bucket discovery + the write
        # one job yields BOTH the touched-bucket set and the batch row count
        # (the key-count bound the LWW auto-selector needs)
        bucket_counts = b.groupBy("_bucket").count().collect()
        touched = sorted(r["_bucket"] for r in bucket_counts)
        if not touched:
            b.unpersist()
            table.commit_summary_only(summary)
            return {"touched_buckets": 0, "files": 0, "rows": 0}
        batch_rows = sum(r["count"] for r in bucket_counts)
        current = table.read(touched).withColumn("_bucket", table.bucket_expr())
        # reconcile LWW: winners are found on a column-pruned narrow scan of
        # (key, warc_ts, _seq) over both sides, so the wide stored payload is
        # never shuffled. Strategy auto-selected (round-2 verdict task 4):
        # under the budget the winner-hash semijoin broadcasts ~8 B/key;
        # above it (the 10^9-key wall) the salted two-phase form engages —
        # the exact per-file row counts give the bound for free.
        merged = lww_compact_auto(
            current.unionByName(b),
            key=key,
            order=("warc_ts", "_seq"),
            broadcast_budget_keys=broadcast_budget_keys,
            approx_rows=batch_rows + table.rows_in_buckets(touched),
        )

    absdir, rel = table.new_data_dir()
    (
        merged.repartition(max(1, min(table.n_buckets, 64)), "_bucket")
        .write.partitionBy("_bucket")
        .parquet(absdir)
    )
    if touched is not None:
        b.unpersist()

    new_files, total_rows = _collect_written_files(absdir, table)
    if touched is None:
        touched = sorted({f["bucket"] for f in new_files})
    summary["merge_secs"] = round(time.time() - t0, 3)
    summary["rows_written"] = total_rows
    # a CoW merge leaves each touched bucket LWW-compacted — clear its dirty
    # mark (mode-switch safety: a MoR table merged with CoW converges clean)
    dirty = sorted(table.dirty_buckets() - set(touched))
    table.commit_files(
        new_files, touched, summary,
        extra={"needs_read_compaction": bool(dirty), "dirty_buckets": dirty},
    )
    return {"touched_buckets": len(touched), "files": len(new_files), "rows": total_rows}
