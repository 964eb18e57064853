"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship query (CDC last-writer-wins snapshot) at sf0.001.
queries()      — one entry per implemented operator (SURVEY.md §2 + the
                 training-data ops), each (spark, sf_dir) -> DataFrame.
oracle_sql()   — DuckDB-runnable ANSI SQL twin per query (same column names);
                 engine-native ops without a SQL form are omitted → the
                 driver records a rows-only check for those.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from openlogreplicator_spark.queries import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: LWW compaction (the engine's core operator) at sf0.001."""
    return QUERIES["cdc_lww_latest"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
