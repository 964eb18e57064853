"""Multi-table fan-out (TableRouter): route equivalence vs a pre-filtered
single-table pipeline, per-table exactly-once, and checkpoint restart."""

import pyspark.sql.functions as F
import pytest

from openlogreplicator_spark.streaming.pipeline import CdcPipeline
from openlogreplicator_spark.streaming.router import TableRouter

# immutable routing attribute: md5 of the key splits the keyspace — the
# stand-in for the reference's schema.table name
ROUTES = {
    "low": "substr(md5(url), 1, 1) < '8'",
    "high": "substr(md5(url), 1, 1) >= '8'",
}


@pytest.fixture()
def routed(spark, events_dir, tmp_path):
    r = TableRouter(
        spark, events_dir, str(tmp_path / "tables"), str(tmp_path / "ckpt"),
        routes=ROUTES,
    )
    r.run_available_now(max_files_per_trigger=2)
    return r


def test_routes_equal_prefiltered_pipeline(spark, events_dir, tmp_path, routed):
    """Routing post-LWW winners == filtering the final single-table state
    (predicates are on the immutable key, so every version routes alike)."""
    p = CdcPipeline(spark, events_dir, str(tmp_path / "ref_t"),
                    str(tmp_path / "ref_c"))
    p.run_batch_replay()
    full = p.target_state()
    for name, pred in ROUTES.items():
        want = {r["url"]: (r["warc_ts"], r["_seq"]) for r in
                full.filter(F.expr(pred)).collect()}
        got = {r["url"]: (r["warc_ts"], r["_seq"]) for r in
               routed.target_state(name).collect()}
        assert got == want, name


def test_routes_partition_the_keyspace(routed):
    a = {r["url"] for r in routed.target_state("low").collect()}
    b = {r["url"] for r in routed.target_state("high").collect()}
    assert a and b and not (a & b)


def test_per_table_exactly_once_redelivery(spark, events_dir, tmp_path):
    r = TableRouter(
        spark, events_dir, str(tmp_path / "tables"), str(tmp_path / "ckpt"),
        routes=ROUTES,
    )
    from openlogreplicator_spark.operators.decode import EVENTS_DDL

    df = spark.read.schema(EVENTS_DDL).parquet(events_dir)
    r.apply_epoch(df, epoch_id=0)
    counts = {n: r.target_state(n).count() for n in ROUTES}
    versions = {
        n: r.ensure_tables()[n].snap["version"] for n in ROUTES
    }
    # full re-delivery: both tables suppress
    r.apply_epoch(df, epoch_id=0)
    assert {n: r.target_state(n).count() for n in ROUTES} == counts
    assert {n: r.ensure_tables()[n].snap["version"] for n in ROUTES} == versions


def test_restart_resumes_from_checkpoint(spark, events_dir, tmp_path, routed):
    counts = {n: routed.target_state(n).count() for n in ROUTES}
    r2 = TableRouter(
        spark, events_dir, str(tmp_path / "tables"), str(tmp_path / "ckpt"),
        routes=ROUTES,
    )
    r2.run_available_now(max_files_per_trigger=2)  # nothing new to process
    assert {n: r2.target_state(n).count() for n in ROUTES} == counts
