"""Deterministic sampling / data-mixing operators for training-data
pipelines: stratified hash sampling with per-stratum rates (the "data
mixture" step that up/down-weights languages, domains or quality tiers
before training).

Design for scale:
* Selection is a pure map-side filter — a per-key md5 tag compared against a
  per-stratum threshold. No shuffle, no sort, no sampling state; the plan is
  scan → filter and composes with partition pruning.
* The tag is DETERMINISTIC in (key, seed): re-running the pipeline, resuming
  it mid-corpus, or running it on a different cluster selects the SAME rows
  (`rand()`-based sampling is none of those), and the md5 form has an exact
  DuckDB twin so the selection is value-level oracle-checkable.
* Rates quantize to 1/65536 (the tag is the first 4 md5 hex chars compared
  lexicographically against a 4-hex-digit threshold) — a documented, testable
  resolution rather than float-comparison drift.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def sample_tag(key: Column, seed: str = "s1") -> Column:
    """Deterministic pseudo-uniform tag for a key: the first 4 hex chars of
    md5(key '#' seed) — 16 bits, uniform over '0000'..'ffff', comparable
    lexicographically against a hex threshold (md5 hex is lowercase in both
    Spark and DuckDB, so string order == numeric order)."""
    return F.substring(
        F.md5(F.concat(key.cast("string"), F.lit(f"#{seed}"))), 1, 4
    )


def rate_threshold(rate: float) -> str:
    """4-hex-digit threshold for a sampling rate in [0, 1]: a key is selected
    iff its tag sorts strictly below it. Quantized to 1/65536."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    # rate == 1.0 → 'g': every 4-hex tag sorts below it, so everything keeps
    return format(int(rate * 65536), "04x") if rate < 1.0 else "g"


def stratified_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    seed: str = "s1",
) -> DataFrame:
    """Keep each row with its stratum's probability, deterministically in
    (key, seed): the data-mixing primitive (e.g. keep 50% of English, 25% of
    German, 12.5% of everything else). Selection is per-KEY, so duplicate
    rows of one key are kept or dropped together."""
    tag = sample_tag(F.col(key_col), seed=seed)
    thr: Column | None = None
    for stratum, rate in sorted(rates.items()):
        cond = F.col(strata_col) == stratum
        lit = F.lit(rate_threshold(rate))
        thr = F.when(cond, lit) if thr is None else thr.when(cond, lit)
    thr_col = (
        thr.otherwise(F.lit(rate_threshold(default_rate)))
        if thr is not None
        else F.lit(rate_threshold(default_rate))
    )
    return df.filter(tag < thr_col)


def sample_case_sql(
    strata_col: str, rates: dict[str, float], default_rate: float = 0.0
) -> str:
    """The DuckDB CASE expression mirroring ``stratified_sample``'s
    per-stratum thresholds (for SQL oracles)."""
    whens = " ".join(
        f"WHEN '{s}' THEN '{rate_threshold(r)}'" for s, r in sorted(rates.items())
    )
    return f"CASE {strata_col} {whens} ELSE '{rate_threshold(default_rate)}' END"


def quantile_buckets(
    df: DataFrame,
    part_col: str,
    val_col: str,
    n_buckets: int = 3,
    accuracy: int = 10_000,
) -> DataFrame:
    """Scale path for per-group quantile bucketing (the CCNet head/middle/
    tail cut — see queries.docs_ccnet_bucket for the exact-ntile form the
    oracle validates): ntile needs a SORT of every group inside one window
    exchange, and web-crawl language groups are exactly the skewed case
    where one group swamps a task. This two-pass spelling never sorts:

    pass 1 — per-group `percentile_approx` over the (n_buckets-1) interior
    cut points; the result is groups-sized (one row per group, tiny);
    pass 2 — broadcast the thresholds back and assign the bucket as a
    map-side comparison column (zero shuffle to assign).

    Boundary semantics differ from ntile only within the approximation
    error at the cut points (ntile also balances bucket SIZES exactly,
    while quantile cuts balance them up to value ties); both converge on
    continuous-valued scores. Returns ``df`` plus a ``bucket`` column in
    [1, n_buckets].
    """
    fracs = [i / n_buckets for i in range(1, n_buckets)]
    cuts = df.groupBy(part_col).agg(
        F.percentile_approx(
            val_col, F.array(*[F.lit(x) for x in fracs]), accuracy
        ).alias("_cuts")
    ).withColumnRenamed(part_col, "_part")
    # null-safe join: groupBy keeps the NULL group (undetected-language docs
    # are common in web data), and a plain equi-join would silently DROP
    # those rows instead of bucketing them like the ntile form does
    joined = df.join(
        F.broadcast(cuts), F.col(part_col).eqNullSafe(F.col("_part"))
    ).drop("_part")
    bucket = F.lit(1)
    for i in range(n_buckets - 1):
        bucket = bucket + F.when(
            F.col(val_col) > F.element_at("_cuts", i + 1), 1
        ).otherwise(0)
    return joined.withColumn("bucket", bucket.cast("int")).drop("_cuts")
