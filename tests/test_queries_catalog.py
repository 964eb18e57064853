"""The driver-contract catalog: every queries() entry runs at sf0.001 and
matches its DuckDB oracle — a fast local replica of the driver's
CORRECTNESS gate (the full sf0.01 run lives in scripts/check_oracle.py)."""

import os

import pytest

from openlogreplicator_spark.oracle_check import check_query, duckdb_connection
from openlogreplicator_spark.queries import ORACLES, QUERIES

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(SF_DIR, "events.parquet")),
    reason="driver testdata not present",
)


@pytest.fixture(scope="module")
def con():
    return duckdb_connection(SF_DIR)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, con, name):
    ok, msg = check_query(spark, con, name, SF_DIR)
    assert ok, f"{name}: {msg}"


def test_every_oracle_has_a_query():
    assert set(ORACLES) <= set(QUERIES)


def test_entry_contract(spark):
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "spark_entry", "/root/repo/__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    df = mod.entry(spark)
    assert df.count() > 0
    assert set(mod.oracle_sql()) <= set(mod.queries())
