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
