"""Backward as-of join — Spark has no native ASOF JOIN; this is the
union + single-shuffle window-fill composition.

Reference analogue: the replicator resolves every change against the
dictionary version in force AT THAT SCN — Schema.cpp keeps the schema
chain and `Metadata::checkpoint` binds each change batch to the newest
dictionary at-or-before its scn (/root/reference/src/metadata/Metadata.cpp,
SchemaElement versioning). Generalized here to the standard temporal
primitive: for every left row, attach the newest right row with the same
key whose timestamp is <= the left timestamp (DuckDB/pandas
``merge_asof`` backward semantics, ties match).

Why NOT the naive plans:

* range join (``l.ts >= r.ts`` + window min): Catalyst plans a broadcast
  nested-loop or cartesian for the inequality — O(|L|·|R|) per key.
* per-left-row subquery: same.

The scale shape used instead: tag both sides, union, ONE hash shuffle on
the key, and one ordered window per key partition carrying the most
recent right payload forward (``last(ignorenulls)`` is O(1) running
state, not a per-row lookback). Cost at 100 TB: shuffle |L|+|R| rows
once, sort per key partition — the same cost class as the LWW compactor,
and AQE's skew-split handles hot keys because the window key is the
shuffle key. When the right side is a small dimension, prefer
``asof_join_broadcast`` (map-side binary search, zero shuffle).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window
from pyspark.sql import functions as F

__all__ = ["asof_join", "asof_join_broadcast"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: Sequence[str] | None = None,
    suffix: str = "_asof",
    tolerance_us: int | None = None,
) -> DataFrame:
    """Left as-of join: every ``left`` row, plus the newest ``right`` row
    with the same ``on`` key and ``right_ts <= left_ts`` (ties match).
    Unmatched left rows keep nulls (ASOF LEFT JOIN semantics).

    ``value_cols`` limits which right columns ride along (default: all but
    the key/ts). ``tolerance_us``: matches older than this many
    microseconds are nulled out (pandas ``merge_asof(tolerance=...)``).
    The matched right timestamp is always exposed as ``<right_ts><suffix>``.
    """
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in (on, right_ts)]

    r_struct = F.struct(
        F.col(right_ts).alias(right_ts), *[F.col(c).alias(c) for c in value_cols]
    )
    r_side = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        r_struct.alias("_r"),
    )
    # Null left payload on right rows / null right payload on left rows —
    # unionByName(allowMissingColumns) fills the other side's struct with
    # typed nulls, so no hand-built null casts are needed.
    l_side = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.struct(*left.columns).alias("_l"),
    )
    u = l_side.unionByName(r_side, allowMissingColumns=True)

    # Right rows sort BEFORE left rows at equal ts (_side 0 < 1), so an
    # equal-timestamp dimension row is visible to the fact row — the >= tie
    # rule DuckDB's ASOF JOIN and pandas merge_asof both use.
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = (
        u.withColumn("_rr", F.last("_r", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
    )

    match_ok: Column = F.col("_rr").isNotNull()
    if tolerance_us is not None:
        lag = F.unix_micros(F.col("_ts")) - F.unix_micros(F.col("_rr")[right_ts])
        match_ok = match_ok & (lag <= F.lit(int(tolerance_us)))

    rr = F.when(match_ok, F.col("_rr"))
    out_cols = [F.col("_l")[c].alias(c) for c in left.columns]
    out_cols.append(rr[right_ts].alias(right_ts + suffix))
    out_cols += [rr[c].alias(c + suffix) for c in value_cols]
    return filled.select(*out_cols)


def asof_join_broadcast(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: Sequence[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """As-of join for a SMALL right side (a dimension / schema-version
    table): collect the right side per key into a sorted array, broadcast
    it, and binary-search per left row with JVM expressions — zero shuffle
    of the fact side, the shape you want when |R| fits a broadcast (the
    dictionary chain in the reference is exactly this: few thousand
    versions vs 10^10 changes)."""
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in (on, right_ts)]

    packed = (
        right.groupBy(F.col(on).alias("_k"))
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col(right_ts).alias(right_ts),
                        *[F.col(c).alias(c) for c in value_cols],
                    )
                )
            ).alias("_chain")
        )
    )
    joined = left.join(
        F.broadcast(packed), left[on] == packed["_k"], "left"
    ).drop("_k")
    # newest chain entry at-or-before left_ts: filter + element_at(-1) on the
    # sorted array — O(chain) per row but the chain is dimension-sized.
    hits = F.filter(
        F.col("_chain"), lambda e: e[right_ts] <= F.col(left_ts)
    )
    match = F.when(F.size(hits) > 0, F.element_at(hits, -1))
    out_cols = [F.col(c) for c in left.columns]
    out_cols.append(match[right_ts].alias(right_ts + suffix))
    out_cols += [match[c].alias(c + suffix) for c in value_cols]
    return joined.select(*out_cols)
