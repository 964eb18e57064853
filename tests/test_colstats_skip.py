"""Manifest string-column bounds (col_bounds) + read(eq=...) file skipping:
selective after a lang-leading cluster rewrite, provably safe on dirty
merge-on-read buckets (the resurrection hazard is gated in read(), not
documented away)."""

from __future__ import annotations

import datetime as dt
import glob
import os

import pytest
from pyspark.sql import functions as F

from openlogreplicator_spark.lake.table import LakeTable
from openlogreplicator_spark.operators.decode import EVENTS_DDL
from openlogreplicator_spark.operators.merge import (
    cluster_buckets,
    merge_append,
    merge_into,
    read_state,
)
from openlogreplicator_spark.streaming.pipeline import CdcPipeline

TS = dt.datetime(2020, 1, 1)
TS2 = dt.datetime(2020, 1, 2)
DDL = ("url string, warc_ts timestamp, _seq long, _op string, "
       "text string, lang string")
FIELDS = [("url", "string"), ("warc_ts", "timestamp"), ("_seq", "long"),
          ("_op", "string"), ("text", "string"), ("lang", "string")]


def test_col_bounds_recorded_and_eq_prunes_after_cluster(
    spark, events_dir, tmp_path
):
    files = sorted(glob.glob(os.path.join(events_dir, "*.parquet")))
    p = CdcPipeline(spark, events_dir, str(tmp_path / "t"),
                    str(tmp_path / "c"))
    for i, f in enumerate(files):
        p.apply_epoch(spark.read.schema(EVENTS_DDL).parquet(f), epoch_id=i)
    t = LakeTable.load(spark, p.table_path)
    # short string columns carry bounds; long text never does (soundness:
    # a truncated max would under-report the file's upper bound)
    assert any("col_bounds" in fe for fe in t.snap["files"])
    assert all(
        "text" not in fe.get("col_bounds", {}) for fe in t.snap["files"]
    )

    # cluster with lang leading: files get narrow lang ranges
    cluster_buckets(t, target_rows_per_file=40,
                    sort_cols=("lang", "warc_ts"))
    t = LakeTable.load(spark, p.table_path)
    langs = {
        r["lang"]
        for r in t.read().select("lang").dropna().distinct().collect()
    }
    target = sorted(langs)[0]
    pruned = t.read(eq={"lang": target})
    full = t.read()
    assert len(pruned.inputFiles()) < len(full.inputFiles())
    want = sorted(
        (r["url"], r["_seq"])
        for r in full.filter(F.col("lang") == target).collect()
    )
    got = sorted(
        (r["url"], r["_seq"])
        for r in pruned.filter(F.col("lang") == target).collect()
    )
    assert got == want and len(got) > 0


def test_eq_prune_never_touches_dirty_buckets(spark, tmp_path):
    """The resurrection hazard: u1's winner is lang='en', its superseded
    version lang='de'. On a DIRTY (merge-on-read) bucket, eq-pruning the
    'en' file would let the stale 'de' row win read-time LWW. read() must
    refuse to prune dirty buckets — state stays correct."""
    t = LakeTable.create(spark, str(tmp_path / "t"), FIELDS, key_col="url",
                         n_buckets=1, schema_ver=1)
    b1 = spark.createDataFrame([("u1", TS, 1, "c", "old", "de")], DDL)
    b2 = spark.createDataFrame([("u1", TS2, 2, "u", "new", "en")], DDL)
    merge_append(t, b1, epoch_id=0)
    t = LakeTable.load(spark, t.path)
    merge_append(t, b2, epoch_id=1)
    t = LakeTable.load(spark, t.path)
    assert t.dirty_buckets(), "merge_append must leave the bucket dirty"

    # both delta files are read despite eq — no pruning on dirty buckets
    pruned = t.read(eq={"lang": "de"})
    assert sorted(pruned.inputFiles()) == sorted(t.read().inputFiles())
    # and resolved state filtered to lang='de' is EMPTY (the winner is en)
    state = read_state(t)
    assert state.filter(F.col("lang") == "de").count() == 0
    assert state.filter(F.col("url") == "u1").collect()[0]["lang"] == "en"

    # after compaction (clean bucket, one row per key) the prune is exact
    from openlogreplicator_spark.operators.merge import compact_table

    compact_table(t)
    t = LakeTable.load(spark, t.path)
    assert not t.dirty_buckets()
    pr = t.read(eq={"lang": "de"})
    assert pr.filter(F.col("lang") == "de").count() == 0


def test_eq_prune_follows_renames_by_field_id(spark, tmp_path):
    """Files written before a rename carry bounds under the OLD physical
    name; eq on the NEW name must still prune them (field-id matching)."""
    t = LakeTable.create(spark, str(tmp_path / "t"), FIELDS, key_col="url",
                         n_buckets=1, schema_ver=1)
    rows = [(f"u{i}", TS, i, "c", f"t{i}", "aa" if i < 10 else "zz")
            for i in range(20)]
    merge_into(t, spark.createDataFrame(rows, DDL), epoch_id=0)
    t = LakeTable.load(spark, t.path)
    cluster_buckets(t, target_rows_per_file=10, sort_cols=("lang",))
    t = LakeTable.load(spark, t.path)
    t.evolve("rename_column", "lang", new_name="language")
    t = LakeTable.load(spark, t.path)
    pruned = t.read(eq={"language": "aa"})
    full = t.read()
    assert len(pruned.inputFiles()) < len(full.inputFiles())
    got = {r["url"] for r in
           pruned.filter(F.col("language") == "aa").collect()}
    assert got == {f"u{i}" for i in range(10)}


def test_plan_scan_matches_actual_read(spark, events_dir, tmp_path):
    """plan_scan is the metadata EXPLAIN for file skipping: its
    files_selected must equal what read() actually opens, for every
    combination of prunes."""
    files = sorted(glob.glob(os.path.join(events_dir, "*.parquet")))
    p = CdcPipeline(spark, events_dir, str(tmp_path / "t"),
                    str(tmp_path / "c"))
    for i, f in enumerate(files):
        p.apply_epoch(spark.read.schema(EVENTS_DDL).parquet(f), epoch_id=i)
    t = LakeTable.load(spark, p.table_path)
    cluster_buckets(t, target_rows_per_file=40,
                    sort_cols=("lang", "warc_ts"))
    t = LakeTable.load(spark, p.table_path)
    lang = sorted(
        r["lang"] for r in
        t.read().select("lang").dropna().distinct().collect()
    )[0]
    some_bucket = t.snap["files"][0]["bucket"]
    cases = [
        dict(),
        dict(eq={"lang": lang}),
        dict(buckets=[some_bucket]),
        dict(buckets=[some_bucket], eq={"lang": lang}),
    ]
    for kw in cases:
        plan = t.plan_scan(**kw)
        opened = len(t.read(**kw).inputFiles())
        assert plan["files_selected"] == opened, (kw, plan)
        assert (
            plan["files_total"]
            == plan["files_selected"] + plan["skipped_bucket"]
            + plan["skipped_ts"] + plan["skipped_eq"]
        )
    # the eq case must actually skip something on this clustered layout
    assert t.plan_scan(eq={"lang": lang})["skipped_eq"] > 0
