"""Cross-engine-deterministic sketches (HyperLogLog).

Engine-native sketch aggregates (approx_count_distinct, DuckDB's HLL) are
NOT cross-engine comparable — each engine hashes differently, so earlier
rounds documented the family as "no oracle possible". Building the sketch
from scratch on md5 removes that wall: every arithmetic step below is
integer math or IEEE-exact double math, so Spark and DuckDB compute the
SAME registers and the SAME estimate, and the differential value gate
applies to an approximate algorithm.

HLL spec (Flajolet et al. 2007, the public algorithm):

* h       = first 8 md5 hex chars of the key, read as an unsigned 32-bit int
* bucket  = top ``b`` bits of h (m = 2^b registers)
* w       = low (32-b) bits; rho(w) = leading zeros within that width + 1
  — computed EXACTLY with the bit-smear trick (w |= w>>1 … w>>16 fills every
  position below the MSB, so bit_count(smeared) == floor(log2 w)+1); never
  floating log2, whose boundary ulps differ per engine
* M_j     = max rho per bucket (0 for never-hit buckets)
* S       = sum(2^-M_j) — every term is a power of two in [2^-27, 1] and
  m <= 64, so the double sum is EXACT and summation-order-independent
* E       = alpha_m * m^2 / S, with the standard small-range correction
  E <= 2.5m and V empty registers > 0 -> m * ln(m/V)

The raw-branch estimate involves no transcendental at all; the ln branch
only engages at tiny cardinality (both engines take the same branch since
the registers match bit-for-bit).

Scale shape: one narrow partial-agg groupBy over m buckets — the classic
distributive sketch; registers merge by max, so this composes with any
partitioning and never shuffles payloads. (At 100 TB you read THIS estimate
instead of paying the exact countDistinct shuffle; the catalog entry
carries the exact count next to it only to expose the error.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# alpha_m for the register counts we expose (Flajolet Table 1; m >= 128 uses
# 0.7213/(1+1.079/m) — spell the small-m constants so both engines share
# one literal)
_ALPHA = {16: 0.673, 32: 0.697, 64: 0.709}
_SMEARS = (1, 2, 4, 8, 16)


def hll_distinct(df: DataFrame, col: str, b: int = 6) -> DataFrame:
    """One-row DataFrame: (m, exact_distinct, hll_estimate, rel_err).

    exact_distinct is the full countDistinct — carried ONLY so the catalog
    gate can price the sketch's error; real deployments read hll_estimate.
    """
    m = 1 << b
    wbits = 32 - b
    alpha = _ALPHA[m]
    spark = df.sparkSession

    h = F.conv(F.substring(F.md5(F.col(col).cast("string")), 1, 8), 16, 10).cast(
        "long"
    )
    w = h.bitwiseAND(F.lit((1 << wbits) - 1))
    for s in _SMEARS:
        w = w.bitwiseOR(F.shiftright(w, s))
    rho = F.lit(wbits + 1) - F.bit_count(w)
    hit = (
        df.select(
            F.shiftright(h, wbits).alias("bucket"), rho.alias("rho")
        )
        .groupBy("bucket")
        .agg(F.max("rho").alias("reg"))
    )
    regs = (
        spark.range(m)
        .select(F.col("id").alias("bucket"))
        .join(hit, "bucket", "left")
        .select(F.coalesce("reg", F.lit(0)).alias("reg"))
    )
    agg = regs.agg(
        F.sum(F.pow(F.lit(2.0), -F.col("reg"))).alias("s"),
        F.sum(F.when(F.col("reg") == 0, 1).otherwise(0))
        .cast("long")
        .alias("v"),
    )
    exact = df.agg(F.countDistinct(col).alias("exact_distinct"))
    raw = F.lit(float(alpha * m * m)) / F.col("s")
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (F.col("v") > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / F.col("v")),
    ).otherwise(raw)
    return (
        agg.crossJoin(exact)
        .select(
            F.lit(m).cast("long").alias("m"),
            F.col("exact_distinct"),
            F.round(est, 4).alias("hll_estimate"),
            # derived from the ROUNDED estimate: the gate's determinism
            # never rests on a second independent rounding of raw FP
            F.round(
                F.abs(F.round(est, 4) - F.col("exact_distinct"))
                / F.col("exact_distinct"),
                6,
            ).alias("rel_err"),
        )
    )


def hll_sql(table: str, col_sql: str, b: int = 6) -> str:
    """DuckDB twin GENERATED from the same spec — widening b or changing the
    column changes both engines in lockstep (the _lsh_tables_sql pattern)."""
    m = 1 << b
    wbits = 32 - b
    alpha = _ALPHA[m]
    smear = "w0"
    for s in _SMEARS:
        smear = f"({smear} | ({smear} >> {s}))"
    return f"""
    WITH h AS (
      SELECT CAST('0x' || substring(md5(CAST({col_sql} AS VARCHAR)), 1, 8)
                  AS BIGINT) AS hv
      FROM {table}),
    rho AS (
      SELECT hv >> {wbits} AS bucket,
             {wbits + 1} - CAST(bit_count({smear}) AS INTEGER) AS rho
      FROM (SELECT hv, hv & {(1 << wbits) - 1} AS w0 FROM h)),
    hit AS (SELECT bucket, MAX(rho) AS reg FROM rho GROUP BY bucket),
    regs AS (
      SELECT COALESCE(hit.reg, 0) AS reg
      FROM generate_series(0, {m - 1}) AS g(bucket)
      LEFT JOIN hit ON hit.bucket = g.bucket),
    agg AS (
      SELECT SUM(pow(2.0, -reg)) AS s,
             CAST(SUM(CASE WHEN reg = 0 THEN 1 ELSE 0 END) AS BIGINT) AS v
      FROM regs),
    exact AS (SELECT count(DISTINCT {col_sql}) AS exact_distinct FROM {table}),
    est AS (
      SELECT CASE WHEN {float(alpha * m * m)} / s <= {2.5 * m} AND v > 0
                  THEN {float(m)} * ln({float(m)} / v)
                  ELSE {float(alpha * m * m)} / s END AS e,
             exact_distinct
      FROM agg, exact)
    SELECT CAST({m} AS BIGINT) AS m, exact_distinct,
           ROUND(e, 4) AS hll_estimate,
           ROUND(abs(ROUND(e, 4) - exact_distinct) / exact_distinct, 6)
             AS rel_err
    FROM est
    """
