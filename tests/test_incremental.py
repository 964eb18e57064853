"""Snapshot-diff changelog, manifest ts-bounds file skipping, and bucket-count
evolution (rebucket) — the three round-3 lake-maintenance surfaces that keep a
10^10-row table serviceable: a consumer reads O(changed buckets) between
checkpoints, time-windowed scans open O(matching files), and an outgrown
bucket layout is replaced in one maintenance commit."""

import glob
import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from openlogreplicator_spark.lake.table import LakeTable
from openlogreplicator_spark.operators.decode import EVENTS_DDL
from openlogreplicator_spark.operators.merge import (
    compact_table,
    read_state,
    rebucket,
    rewrite_buckets,
    snapshot_diff,
    ts_micros,
)
from openlogreplicator_spark.replayer import replay
from openlogreplicator_spark.streaming.pipeline import CdcPipeline


@pytest.fixture()
def epoch_replayed(spark, events_dir, tmp_path):
    """Replay the fixture file-by-file as separate epochs; return the
    pipeline plus the snapshot version confirmed after each epoch."""
    files = sorted(glob.glob(os.path.join(events_dir, "*.parquet")))
    # merge-on-read: epochs append per-bucket delta files, so manifest ts
    # bounds stay per-epoch (the shape file skipping exists for) and the
    # diff/read paths exercise dirty-bucket LWW
    p = CdcPipeline(spark, events_dir, str(tmp_path / "t"), str(tmp_path / "c"),
                    merge_mode="mor")
    versions = []
    for i, f in enumerate(files):
        p.apply_epoch(spark.read.schema(EVENTS_DDL).parquet(f), epoch_id=i)
        versions.append(LakeTable.current_version(p.table_path))
    return p, files, versions


def _golden_keymap(events_pdf_subset):
    """url → (warc_ts, seq) of the LWW winner — replay() semantics, but
    keeping the version-identity pair the changelog classifies updates by."""
    ev = events_pdf_subset[~events_pdf_subset["rolled_back"].astype(bool)]
    dml = ev[ev["op"] != "ddl"].sort_values(["warc_ts", "seq"], kind="stable")
    winners = dml.groupby("url", as_index=False).tail(1)
    alive = winners[winners["op"] != "d"]
    return {
        r["url"]: (r["warc_ts"], r["seq"]) for r in alive.to_dict("records")
    }


def test_snapshot_diff_matches_golden_replay(spark, epoch_replayed, events_pdf):
    p, files, versions = epoch_replayed
    n_files = len(files)
    cut = n_files // 2
    # golden states: replay of the first half vs replay of everything
    import pyarrow.dataset as ds

    old_pdf = ds.dataset(files[:cut], format="parquet").to_table().to_pandas()
    old_map = _golden_keymap(old_pdf)
    new_map = _golden_keymap(events_pdf)

    d = snapshot_diff(spark, p.table_path, versions[cut - 1]).toPandas()
    recs = d.to_dict("records")
    got = {r["url"]: r["_change"] for r in recs}
    exp = {}
    for k in set(old_map) | set(new_map):
        if k not in old_map:
            exp[k] = "insert"
        elif k not in new_map:
            exp[k] = "delete"
        elif old_map[k] != new_map[k]:
            exp[k] = "update"
    assert got == exp and len(d) == len(exp) and len(exp) > 0
    # after-image values for updates/inserts match the new golden state
    for r in recs:
        side = new_map if r["_change"] in ("insert", "update") else old_map
        assert (r["warc_ts"], r["_seq"]) == side[r["url"]]


def test_snapshot_diff_cdf_preimage(spark, epoch_replayed):
    """emit_preimage=True is Delta-CDF row semantics: every plain `update`
    fans out into exactly one preimage + one postimage row, postimages carry
    the new version identity and preimages the OLD one, and a sign-uniform
    fold (+1 insert/postimage, −1 delete/preimage) maintains an aggregate to
    exactly the final state — incremental view maintenance without a rescan."""
    p, files, versions = epoch_replayed
    t = LakeTable.load(spark, p.table_path)
    start = min(t.versions())
    # diff from a mid-chain snapshot so the span contains genuine updates
    mid = versions[len(files) // 2 - 1]
    plain = snapshot_diff(spark, p.table_path, mid).toPandas()
    cdf = snapshot_diff(
        spark, p.table_path, mid, emit_preimage=True
    ).toPandas()
    n = cdf.groupby("_change").size().to_dict()
    e = plain.groupby("_change").size().to_dict()
    assert n.get("insert", 0) == e.get("insert", 0)
    assert n.get("delete", 0) == e.get("delete", 0)
    assert n.get("update_preimage", 0) == e.get("update", 0) > 0
    assert n.get("update_postimage", 0) == e.get("update", 0)

    # postimage version identity == the plain after-image; preimage == the
    # from-snapshot's state for the same urls
    def keymap(df, kinds):
        sub = df[df["_change"].isin(kinds)]
        return {r["url"]: (r["warc_ts"], r["_seq"])
                for r in sub.to_dict("records")}

    assert keymap(cdf, ["update_postimage"]) == keymap(plain, ["update"])
    old_state = read_state(
        LakeTable.load(spark, p.table_path, version=mid)
    ).toPandas()
    old_map = {r["url"]: (r["warc_ts"], r["_seq"])
               for r in old_state.to_dict("records")}
    pre = keymap(cdf, ["update_preimage"])
    assert pre == {u: old_map[u] for u in pre}

    # the incremental fold over per-epoch batches nets to the final state
    sign = F.when(
        F.col("_change").isin("insert", "update_postimage"), F.lit(1)
    ).otherwise(F.lit(-1))
    bounds = [start] + versions
    batches = [
        snapshot_diff(spark, p.table_path, a, b, emit_preimage=True)
        .select("_change", "lang", "_seq")
        for a, b in zip(bounds, bounds[1:])
        if a != b
    ]
    from functools import reduce

    folded = (
        reduce(lambda x, y: x.unionByName(y), batches)
        .groupBy("lang")
        .agg(F.sum(sign).alias("n"), F.sum(sign * F.col("_seq")).alias("s"))
        .filter(F.col("n") != 0)
    )
    direct = (
        read_state(LakeTable.load(spark, p.table_path))
        .groupBy("lang")
        .agg(F.count("*").alias("n"), F.sum("_seq").alias("s"))
    )
    assert sorted(map(tuple, folded.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_snapshot_diff_is_empty_across_maintenance(spark, epoch_replayed):
    p, _files, _versions = epoch_replayed
    t = LakeTable.load(spark, p.table_path)
    v_before = t.snap["version"]
    compact_table(t)
    plan = t.plan_compaction(max_files_per_bucket=1, small_file_bytes=0)
    if plan["rewrite"]:
        rewrite_buckets(t, plan["rewrite"])
    assert snapshot_diff(spark, p.table_path, v_before).count() == 0
    assert snapshot_diff(spark, p.table_path, v_before, v_before).count() == 0


def test_snapshot_diff_projects_old_rows_to_new_schema(spark, epoch_replayed):
    """A column added between the snapshots appears (as null where the old
    state had no value) — the changelog always speaks the current schema."""
    p, files, versions = epoch_replayed
    d = snapshot_diff(spark, p.table_path, versions[0])
    t = LakeTable.load(spark, p.table_path)
    assert [c for c in d.columns if c != "_change"] == [
        f["name"] for f in t.current_schema()
    ]
    with pytest.raises(ValueError):
        snapshot_diff(spark, p.table_path, t.snap["version"] + 1, versions[0])


def test_ts_bounds_skip_files(spark, epoch_replayed, events_pdf):
    """Manifest ts bounds prune files a time window cannot touch: a window
    covering only the last epoch's warc_ts range opens strictly fewer files,
    with results identical to scan+filter."""
    p, files, versions = epoch_replayed
    t = LakeTable.load(spark, p.table_path)
    assert all(
        "ts_min_us" in fe and fe["ts_min_us"] <= fe["ts_max_us"]
        for fe in t.snap["files"]
    ), "Spark-written files must carry usable timestamp statistics"

    import pyarrow.dataset as ds

    last = ds.dataset(files[-1], format="parquet").to_table().to_pandas()
    lo = ts_micros(last["warc_ts"].dropna().min().to_pydatetime())
    pruned = t.read(ts_between=(lo, None))
    full = t.read()
    assert len(pruned.inputFiles()) < len(full.inputFiles())
    want = (
        full.filter(F.col("warc_ts") >= F.lit(last["warc_ts"].dropna().min()))
        .orderBy("url", "_seq").collect()
    )
    got = (
        pruned.filter(F.col("warc_ts") >= F.lit(last["warc_ts"].dropna().min()))
        .orderBy("url", "_seq").collect()
    )
    assert got == want


def test_rebucket_preserves_state_and_future_merges(
    spark, events_dir, events_pdf, tmp_path
):
    """Rebucket 16 → 5: user state identical, layout under the new bucket
    count, tombstones preserved, and a subsequent merge epoch lands correctly
    in the new layout (golden equality end-to-end)."""
    files = sorted(glob.glob(os.path.join(events_dir, "*.parquet")))
    p = CdcPipeline(spark, events_dir, str(tmp_path / "t"), str(tmp_path / "c"))
    for i, f in enumerate(files[:-1]):
        p.apply_epoch(spark.read.schema(EVENTS_DDL).parquet(f), epoch_id=i)
    t = LakeTable.load(spark, p.table_path)
    before = read_state(t).toPandas().sort_values("url").reset_index(drop=True)
    n_tombs = t.read().filter(F.col("_op") == "d").count()
    assert n_tombs > 0

    stats = rebucket(t, 5)
    assert stats["n_buckets"] == 5
    t2 = LakeTable.load(spark, p.table_path)
    assert t2.n_buckets == 5
    assert {f["bucket"] for f in t2.snap["files"]} <= set(range(5))
    after = read_state(t2).toPandas().sort_values("url").reset_index(drop=True)
    pd.testing.assert_frame_equal(before, after)
    assert t2.read().filter(F.col("_op") == "d").count() == n_tombs

    # bucket column on disk must agree with the new bucket function
    chk = t2.read().withColumn("_b", t2.bucket_expr())
    per_file = {fe["path"]: fe["bucket"] for fe in t2.snap["files"]}
    for path, b in per_file.items():
        got = spark.read.parquet(os.path.join(t2.path, path)).withColumn(
            "_b", t2.bucket_expr()
        ).select("_b").distinct().collect()
        assert [r["_b"] for r in got] in ([b], [])
    assert chk.filter(F.col("_b") >= 5).count() == 0

    # the NEXT epoch merges into the evolved layout; final state == golden
    p.apply_epoch(
        spark.read.schema(EVENTS_DDL).parquet(files[-1]),
        epoch_id=len(files) - 1,
    )
    golden = replay(events_pdf)
    got = p.target_state().toPandas().sort_values("url").reset_index(drop=True)
    assert list(got["url"]) == list(golden["url"])
    assert all(a == b for a, b in zip(got["text"], golden["text"]))


def test_follow_changes_tails_the_snapshot_chain(spark, epoch_replayed):
    """The pull consumer: a follower starting at the post-epoch-0 version
    receives one changelog per subsequent poll-visible advance, its batches
    compose to the full 0→latest diff, and an idle table ends the loop."""
    from openlogreplicator_spark.operators.merge import follow_changes

    p, files, versions = epoch_replayed
    batches = []
    gen = follow_changes(
        spark, p.table_path, from_version=versions[0],
        poll_secs=0.01, max_polls=3,
    )
    for from_v, to_v, df in gen:
        batches.append((from_v, to_v, df))
    # everything after epoch 0 was already committed -> one catch-up batch,
    # then the idle budget ends the generator
    assert [(b[0], b[1]) for b in batches] == [(versions[0], versions[-1])]
    direct = snapshot_diff(spark, p.table_path, versions[0], versions[-1])
    got = {tuple(r) for r in batches[0][2].collect()}
    assert got == {tuple(r) for r in direct.collect()} and got

    # a live follower sees a NEW commit appear mid-tail (drained on a
    # thread: the generator idles at the pre-commit version, the commit
    # lands, the next poll yields it)
    import datetime as dt
    import threading

    from openlogreplicator_spark.operators.merge import merge_into

    v_before = LakeTable.current_version(p.table_path)
    follower = follow_changes(
        spark, p.table_path, from_version=v_before,
        poll_secs=0.05, max_polls=200,
    )
    results = []

    def drain():
        for item in follower:
            results.append(item)
            break

    th = threading.Thread(target=drain)
    th.start()
    t = LakeTable.load(spark, p.table_path)
    merge_into(
        t,
        spark.createDataFrame(
            [("https://late.example/x", dt.datetime(2030, 1, 1), 10**6, "c",
              b"<html>late</html>", "late", "en", 200)],
            "url string, warc_ts timestamp, _seq long, _op string, "
            "html binary, text string, lang string, http_status long",
        ),
        epoch_id=99,
    )
    th.join(timeout=60)
    assert not th.is_alive() and len(results) == 1
    from_v, to_v, df = results[0]
    assert from_v == v_before and to_v > v_before
    assert [(r["_change"], r["url"]) for r in df.collect()] == [
        ("insert", "https://late.example/x")
    ]
    follower.close()
