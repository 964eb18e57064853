"""Differential-oracle comparison used by scripts/check_oracle.py and the
pytest suite: run a catalog query on Spark and its SQL twin on DuckDB over
the same parquet, compare row count + column names + order-insensitive
values. Mirrors the driver's CORRECTNESS gate and the reference's
dump-diffing strategy (SURVEY.md §5)."""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pd.api.types.is_datetime64_any_dtype(pdf[c]):
            pdf[c] = (
                pd.to_datetime(pdf[c], utc=True)
                .dt.tz_localize(None)
                .astype("datetime64[us]")
            )
        elif pd.api.types.is_integer_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("Int64")
    return pdf.sort_values(list(pdf.columns), kind="stable").reset_index(drop=True)


def frames_equal(a: pd.DataFrame, b: pd.DataFrame) -> tuple[bool, str]:
    if list(a.columns) != list(b.columns):
        return False, f"columns differ: {list(a.columns)} vs {list(b.columns)}"
    if len(a) != len(b):
        return False, f"row count differs: {len(a)} vs {len(b)}"
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            ok = all(
                (pd.isna(x) and pd.isna(y))
                or (
                    not pd.isna(x)
                    and not pd.isna(y)
                    and math.isclose(float(x), float(y), rel_tol=0, abs_tol=1e-9)
                )
                for x, y in zip(av, bv)
            )
        else:
            ok = av.equals(bv)
        if not ok:
            diff = [
                (i, av[i], bv[i]) for i in range(len(av)) if str(av[i]) != str(bv[i])
            ][:5]
            return False, f"values differ in '{c}': {diff}"
    return True, "ok"


def check_query(spark, con, name: str, sf_dir: str) -> tuple[bool, str]:
    """Run one catalog query on both engines; (passed, message)."""
    from .queries import ORACLES, QUERIES

    got = normalize(QUERIES[name](spark, sf_dir).toPandas())
    if name not in ORACLES:
        return True, f"rows-only: {len(got)} rows, cols={list(got.columns)}"
    want = normalize(con.execute(ORACLES[name]).df())
    ok, msg = frames_equal(got, want)
    return ok, f"{len(got)} rows vs {len(want)} — {msg}"
