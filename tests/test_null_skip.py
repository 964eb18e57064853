"""Manifest null-count stats (Iceberg null_value_counts analogue) +
read(not_null=...) file skipping: skip clean-bucket files whose listed
column is entirely null (recorded counts == rows, or the column did not
exist at the file's schema version); never prune dirty merge-on-read
buckets (the same LWW-resurrection hazard eq-pruning gates)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from openlogreplicator_spark.lake.table import LakeTable
from openlogreplicator_spark.operators.merge import (
    cluster_buckets,
    merge_append,
    merge_into,
    read_state,
)

TS = dt.datetime(2020, 1, 1)
TS2 = dt.datetime(2020, 1, 2)
DDL = ("url string, warc_ts timestamp, _seq long, _op string, "
       "text string, lang string")
FIELDS = [("url", "string"), ("warc_ts", "timestamp"), ("_seq", "long"),
          ("_op", "string"), ("text", "string"), ("lang", "string")]


def _mk(spark, path, rows, n_buckets=1):
    t = LakeTable.create(spark, path, FIELDS, key_col="url",
                         n_buckets=n_buckets, schema_ver=1)
    merge_into(t, spark.createDataFrame(rows, DDL), epoch_id=0)
    return LakeTable.load(spark, path)


def test_null_counts_recorded_and_not_null_prunes(spark, tmp_path):
    rows = [(f"u{i}", TS, i, "c", f"t{i}", None if i < 10 else "en")
            for i in range(20)]
    t = _mk(spark, str(tmp_path / "t"), rows)
    assert any("null_counts" in fe for fe in t.snap["files"])
    # lang-sorted rewrite co-locates the NULL rows (Spark sorts nulls
    # first), so leading files are entirely null in lang
    cluster_buckets(t, target_rows_per_file=10, sort_cols=("lang",))
    t = LakeTable.load(spark, t.path)
    full = t.read()
    pruned = t.read(not_null=("lang",))
    assert len(pruned.inputFiles()) < len(full.inputFiles())
    want = sorted(r["url"] for r in
                  full.filter(F.col("lang").isNotNull()).collect())
    got = sorted(r["url"] for r in
                 pruned.filter(F.col("lang").isNotNull()).collect())
    assert got == want and len(got) == 10
    st = t.plan_scan(not_null=("lang",))
    assert st["skipped_null"] > 0
    assert st["files_selected"] == len(pruned.inputFiles())


def test_not_null_prune_never_touches_dirty_buckets(spark, tmp_path):
    """Resurrection hazard: u1's WINNER has lang NULL, its superseded
    version has lang='de'. Pruning the winner's file on the dirty bucket
    would let the stale 'de' row win read-time LWW. read() must refuse."""
    t = LakeTable.create(spark, str(tmp_path / "t"), FIELDS, key_col="url",
                         n_buckets=1, schema_ver=1)
    b1 = spark.createDataFrame([("u1", TS, 1, "c", "old", "de")], DDL)
    b2 = spark.createDataFrame([("u1", TS2, 2, "u", "new", None)], DDL)
    merge_append(t, b1, epoch_id=0)
    t = LakeTable.load(spark, t.path)
    merge_append(t, b2, epoch_id=1)
    t = LakeTable.load(spark, t.path)
    assert t.dirty_buckets()
    pruned = t.read(not_null=("lang",))
    assert sorted(pruned.inputFiles()) == sorted(t.read().inputFiles())
    state = read_state(t)
    assert state.filter(
        (F.col("url") == "u1") & F.col("lang").isNotNull()
    ).count() == 0


def test_not_null_prunes_files_predating_the_column(spark, tmp_path):
    """A file written before add_column carries no bytes for the column —
    every row projects NULL, so the version check alone may prune it (no
    stats needed). Copy-on-write only rewrites TOUCHED buckets, so the
    untouched buckets keep their pre-column files and get skipped."""
    t = LakeTable.create(spark, str(tmp_path / "t"), FIELDS, key_col="url",
                         n_buckets=8, schema_ver=1)
    merge_into(t, spark.createDataFrame(
        [(f"u{i}", TS, i, "c", f"t{i}", "en") for i in range(16)], DDL
    ), epoch_id=0)
    t = LakeTable.load(spark, t.path)
    assert not t.dirty_buckets()
    t.evolve("add_column", "score", new_type="long")
    t = LakeTable.load(spark, t.path)
    ddl2 = DDL + ", score long"
    newer = spark.createDataFrame(
        [("v0", TS2, 100, "c", "x", "de", 7)], ddl2
    )
    merge_into(t, newer, epoch_id=1)
    t = LakeTable.load(spark, t.path)
    pruned = t.read(not_null=("score",))
    full = t.read()
    assert len(pruned.inputFiles()) < len(full.inputFiles())
    got = sorted(r["url"] for r in
                 pruned.filter(F.col("score").isNotNull()).collect())
    assert got == ["v0"]
    # renamed column still prunes by field id
    t.evolve("rename_column", "score", new_name="rank_score")
    t = LakeTable.load(spark, t.path)
    pr2 = t.read(not_null=("rank_score",))
    assert len(pr2.inputFiles()) == len(pruned.inputFiles())


def test_read_state_not_null_composition(spark, tmp_path):
    """read_state(not_null=...) prunes clean buckets, resolves dirty ones
    over the FULL version set, and filters post-LWW — a dirty key whose
    superseded version had a value but whose winner is NULL is absent."""
    t = LakeTable.create(spark, str(tmp_path / "t"), FIELDS, key_col="url",
                         n_buckets=2, schema_ver=1)
    rows = [(f"u{i}", TS, i, "c", f"t{i}", None if i < 6 else "en")
            for i in range(12)]
    merge_into(t, spark.createDataFrame(rows, DDL), epoch_id=0)
    t = LakeTable.load(spark, t.path)
    cluster_buckets(t, target_rows_per_file=3, sort_cols=("lang",))
    t = LakeTable.load(spark, t.path)
    # now make ONE key dirty with a NULL-lang winner over a non-null old
    merge_append(t, spark.createDataFrame(
        [("u7", TS2, 100, "u", "newer", None)], DDL), epoch_id=1)
    t = LakeTable.load(spark, t.path)
    st = read_state(t, not_null=("lang",))
    got = sorted(r["url"] for r in st.collect())
    assert "u7" not in got, "NULL-lang winner must not resurface its old row"
    assert got == sorted(f"u{i}" for i in range(6, 12) if i != 7)
    assert st.count() == 5
