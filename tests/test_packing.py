"""Distributed prefix-sum / sequence packing (functions/packing.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from openlogreplicator_spark.functions.packing import (
    ordered_prefix_sum,
    pack_chunks,
)


def _expected(rows):
    run, out = 0, {}
    for i, v in sorted(rows):
        out[i] = run
        run += v
    return out


def test_prefix_sum_matches_serial_and_is_partition_invariant(spark):
    rows = [(i, (i * 37) % 101) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, v long")
    want = _expected(rows)
    for parts in (1, 7, 32):
        got = {
            r["doc_id"]: r["offset"]
            for r in ordered_prefix_sum(df, "doc_id", "v", parts).collect()
        }
        assert got == want, f"num_partitions={parts}"


def test_prefix_sum_no_global_window(spark):
    df = spark.createDataFrame([(i, 1) for i in range(10)], "doc_id long, v long")
    plan = (
        ordered_prefix_sum(df, "doc_id", "v", 4)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the whole point: never an empty-partition-key Window (single task)
    assert "Window" not in plan
    assert "rangepartitioning" in plan and "BroadcastHashJoin" in plan


def test_pack_chunks_boundaries(spark):
    # ctx=10: doc0 tokens 0-6, doc1 tokens 7-18 (straddles chunk 0/1),
    # doc2 empty (occupies zero tape but reports its boundary window),
    # doc3 tokens 19-38 spans chunks 1-3
    df = spark.createDataFrame(
        [(0, 7), (1, 12), (2, 0), (3, 20)], "doc_id long, n long"
    )
    got = {
        r["doc_id"]: (r["offset"], r["first_chunk"], r["last_chunk"], r["n_chunks"])
        for r in pack_chunks(df, "doc_id", "n", ctx=10, num_partitions=3).collect()
    }
    assert got == {
        0: (0, 0, 0, 1),
        1: (7, 0, 1, 2),
        2: (19, 1, 1, 1),
        3: (19, 1, 3, 3),
    }
    # chunk-count conservation: last doc's end defines the tape length
    assert (0 + 7 + 12 + 0 + 20) == 39 and got[3][2] == (39 - 1) // 10
