"""As-of join semantics + plan shape (operators/asof.py).

Differential strategy: the shuffle (union+window) and broadcast (packed
chain) implementations must agree with each other and with hand-computed
expectations on edge cases the catalog data can't hit deterministically —
equal-ts ties, no-match rows, tolerance cutoffs, duplicate left
timestamps.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from openlogreplicator_spark.operators.asof import asof_join, asof_join_broadcast


def _ts(s: int):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, _ts(10), "p10"),
            (1, _ts(20), "p20"),
            (1, _ts(20), "p20b"),  # duplicate left ts: both match
            (2, _ts(5), "p5"),  # before any right row -> null
            (3, _ts(9), "p9"),  # key absent on the right -> null
        ],
        "k int, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts(8), 100),
            (1, _ts(20), 200),  # equal-ts tie: MUST match p20/p20b
            (1, _ts(30), 300),  # future row: never matches
            (2, _ts(7), 400),
        ],
        "k int, ts timestamp, v int",
    )
    return left, right


EXPECT = {"p10": 100, "p20": 200, "p20b": 200, "p5": None, "p9": None}


def test_asof_join_semantics(spark):
    left, right = _frames(spark)
    for impl in (asof_join, asof_join_broadcast):
        got = {
            r["tag"]: r["v_asof"]
            for r in impl(left, right, on="k").collect()
        }
        assert got == EXPECT, impl.__name__
        # matched right ts is exposed
        row = {
            r["tag"]: r["ts_asof"]
            for r in impl(left, right, on="k").collect()
        }
        assert row["p20"] == _ts(20) and row["p5"] is None


def test_asof_join_tolerance(spark):
    left, right = _frames(spark)
    # p10 matched ts(8): lag 2s. Tolerance 1s nulls it; the exact tie (0 lag)
    # survives.
    got = {
        r["tag"]: r["v_asof"]
        for r in asof_join(left, right, on="k", tolerance_us=1_000_000).collect()
    }
    assert got == {"p10": None, "p20": 200, "p20b": 200, "p5": None, "p9": None}


def test_asof_value_cols_subset(spark):
    left, right = _frames(spark)
    out = asof_join(left, right.withColumn("junk", F.lit(1)), on="k",
                    value_cols=["v"])
    assert "junk_asof" not in out.columns and "v_asof" in out.columns


def test_asof_plan_shapes(spark):
    left, right = _frames(spark)
    shuffle_plan = asof_join(left, right, on="k")._jdf.queryExecution().executedPlan().toString()
    # union variant: exactly ONE exchange (the key hash partition for the
    # window) and no broadcast of the fact side
    n_exchange = shuffle_plan.count("Exchange hashpartitioning")
    assert n_exchange == 1, shuffle_plan

    bcast_plan = asof_join_broadcast(left, right, on="k")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in bcast_plan or "BroadcastNestedLoop" in bcast_plan
    # the LEFT side reaches the join without any hash exchange
    assert "SortMergeJoin" not in bcast_plan
