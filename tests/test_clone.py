"""Shallow clone (LakeTable.clone_to): zero-copy metadata clone, full
independence from the first commit, copy-on-write migration under
maintenance, and GC isolation in the clone -> source direction."""

from __future__ import annotations

import glob
import os

from openlogreplicator_spark.lake.table import LakeTable
from openlogreplicator_spark.operators.decode import EVENTS_DDL
from openlogreplicator_spark.operators.merge import (
    maintain,
    merge_append,
    read_state,
)
from openlogreplicator_spark.streaming.pipeline import CdcPipeline

COLS = ["url", "warc_ts", "_seq", "text", "lang"]


def _replayed(spark, events_dir, tmp_path):
    files = sorted(glob.glob(os.path.join(events_dir, "*.parquet")))
    p = CdcPipeline(spark, events_dir, str(tmp_path / "src"),
                    str(tmp_path / "ckpt"), merge_mode="mor", compact_every=0,
                    bloom_cols=("url",))
    for i, f in enumerate(files):
        p.apply_epoch(spark.read.schema(EVENTS_DDL).parquet(f), epoch_id=i)
    return LakeTable.load(spark, p.table_path)


def _state(t):
    return sorted(map(tuple, read_state(t).select(*COLS).collect()))


def _parquet_under(root):
    return [
        os.path.join(r, f)
        for r, _d, fs in os.walk(root)
        for f in fs
        if f.endswith(".parquet")
    ]


def test_clone_is_zero_copy_and_reads_identically(spark, events_dir, tmp_path):
    src = _replayed(spark, events_dir, tmp_path)
    dst = src.clone_to(str(tmp_path / "clone"))
    assert _state(dst) == _state(src)
    # zero data copied; config/flags/watermark carried
    assert _parquet_under(os.path.join(dst.path, "data")) == []
    assert dst.bloom_cols == ("url",)
    assert dst.key_col == src.key_col and dst.n_buckets == src.n_buckets
    assert dst.current_schema_ver == src.current_schema_ver
    assert dst.last_epoch() == src.last_epoch()
    assert dst.dirty_buckets() == src.dirty_buckets()


def test_clone_diverges_independently(spark, events_dir, tmp_path):
    import datetime as dt

    src = _replayed(spark, events_dir, tmp_path)
    before_src = _state(src)
    dst = LakeTable.load(spark, src.clone_to(str(tmp_path / "clone")).path)
    extra = spark.createDataFrame(
        [("https://clone.only/row", dt.datetime(2030, 1, 1), 10**9, "c",
          bytearray(b"<html>x</html>"), "clone-only", "en", 200)],
        "url string, warc_ts timestamp, _seq long, _op string, "
        "html binary, text string, lang string, http_status long",
    )
    merge_append(dst, extra, epoch_id=99)
    dst = LakeTable.load(spark, dst.path)
    assert ("https://clone.only/row",) in {
        (r[0],) for r in read_state(dst).select("url").collect()
    }
    assert _state(LakeTable.load(spark, src.path)) == before_src


def test_maintain_on_clone_migrates_cow_and_spares_source(
    spark, events_dir, tmp_path
):
    src = _replayed(spark, events_dir, tmp_path)
    src_files = set(_parquet_under(os.path.join(src.path, "data")))
    dst = src.clone_to(str(tmp_path / "clone"))
    want = _state(dst)
    rep = maintain(dst, max_files_per_bucket=1, keep_last_snapshots=1)
    assert rep["compact"]["buckets_rewritten"] > 0
    dst = LakeTable.load(spark, dst.path)
    assert _state(dst) == want
    # rewritten buckets now live under the clone's own data root
    own = [fe for fe in dst.snap["files"] if not os.path.isabs(fe["path"])]
    assert own, dst.snap["files"][:2]
    # clone-side GC (ran inside maintain) deleted nothing from the source
    assert set(_parquet_under(os.path.join(src.path, "data"))) == src_files
    assert _state(LakeTable.load(spark, src.path)) == want


def test_clone_refuses_existing_target(spark, events_dir, tmp_path):
    import pytest

    src = _replayed(spark, events_dir, tmp_path)
    src.clone_to(str(tmp_path / "clone"))
    with pytest.raises(ValueError, match="already exists"):
        src.clone_to(str(tmp_path / "clone"))
