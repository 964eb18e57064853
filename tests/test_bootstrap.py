"""Snapshot-bootstrap → tail handoff (CdcPipeline.bootstrap_changelog).

The catalog gate (engine_bootstrap_tail) proves handoff exactness on the
replay fixture; these tests pin the DESIGN REQUIREMENT the gate's fixture
can't isolate: the bootstrap changelog must carry delete TOMBSTONES
(Kafka log-compaction's delete.retention.ms rationale) — an out-of-order
tail event that predates a boundary delete must lose LWW to it, and a
live-rows-only bootstrap resurrects the dead key.
"""

from __future__ import annotations

import datetime
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from openlogreplicator_spark.datagen import EVENTS_SCHEMA
from openlogreplicator_spark.lake.table import LakeTable
from openlogreplicator_spark.operators.decode import EVENTS_DDL
from openlogreplicator_spark.operators.lww import lww_compact_auto
from openlogreplicator_spark.streaming.pipeline import CdcPipeline

_T0 = datetime.datetime(2024, 1, 1)


def _row(seq, ts_secs, op, url, text=None, lang="en"):
    return {
        "seq": seq,
        "warc_ts": _T0 + datetime.timedelta(seconds=ts_secs),
        "op": op,
        "url": url,
        "html": (text or "").encode(),
        "text": text,
        "lang": lang,
        "before": None,
        "extras": None,
        "schema_ver": 1,
        "rolled_back": False,
        "action": None,
        "col_name": None,
        "new_name": None,
        "new_type": None,
    }


@pytest.fixture()
def hazard_log(tmp_path):
    """file 0: K inserted (t=1) then deleted (t=5); L inserted (t=2).
    file 1 (the tail): an OUT-OF-ORDER update of K with event time t=3 —
    it predates the delete, so by LWW the delete must win."""
    ev = tmp_path / "ev"
    os.makedirs(ev)
    f0 = [
        _row(1, 1, "c", "http://k/", "k v1"),
        _row(2, 5, "d", "http://k/"),
        _row(3, 2, "c", "http://l/", "l v1"),
    ]
    f1 = [_row(4, 3, "u", "http://k/", "late ooo update")]
    pq.write_table(
        pa.Table.from_pylist(f0, EVENTS_SCHEMA),
        str(ev / "events-00000.parquet"),
    )
    pq.write_table(
        pa.Table.from_pylist(f1, EVENTS_SCHEMA),
        str(ev / "events-00001.parquet"),
    )
    return str(ev)


def _live_urls(p: CdcPipeline) -> set[str]:
    return {r.url for r in p.target_state().select("url").collect()}


def _files(ev: str) -> list[str]:
    import glob

    return sorted(glob.glob(os.path.join(ev, "*.parquet")))


def _read(spark, f):
    return spark.read.schema(EVENTS_DDL).parquet(f)


def _bootstrap_then_tail(spark, ev, base, snapshot):
    p = CdcPipeline(spark, ev, os.path.join(base, "t"), os.path.join(base, "c"))
    # boundary epoch 0 confirmed via its (empty) dictionary traffic
    p.apply_epoch(
        _read(spark, _files(ev)[0]).filter(F.col("op") == "ddl"), epoch_id=0
    )
    p.bootstrap_changelog(snapshot)
    p.apply_epoch(_read(spark, _files(ev)[1]), epoch_id=1)
    return p


def test_tombstone_carry_blocks_resurrection(spark, hazard_log, tmp_path):
    ev = hazard_log
    # ground truth: the full replay — delete wins, K is dead
    full = CdcPipeline(
        spark, ev, str(tmp_path / "full_t"), str(tmp_path / "full_c")
    )
    for i, f in enumerate(_files(ev)):
        full.apply_epoch(_read(spark, f), epoch_id=i)
    assert _live_urls(full) == {"http://l/"}

    # source state at the boundary (file 0 only)
    src = CdcPipeline(
        spark, ev, str(tmp_path / "src_t"), str(tmp_path / "src_c")
    )
    src.apply_epoch(_read(spark, _files(ev)[0]), epoch_id=0)
    snap = lww_compact_auto(
        LakeTable.load(spark, src.table_path).read(),
        key="url",
        order=("warc_ts", "_seq"),
    )

    # correct bootstrap: tombstones ride along -> no resurrection
    good = _bootstrap_then_tail(spark, ev, str(tmp_path / "good"), snap)
    assert _live_urls(good) == {"http://l/"}

    # broken bootstrap: live rows only -> the dead key resurrects
    bad = _bootstrap_then_tail(
        spark, ev, str(tmp_path / "bad"), snap.filter(F.col("_op") != "d")
    )
    assert "http://k/" in _live_urls(bad)


def test_bootstrap_refuses_partial_tables(spark, hazard_log, tmp_path):
    p = CdcPipeline(
        spark,
        hazard_log,
        str(tmp_path / "pt"),
        str(tmp_path / "pc"),
        merge_mode="mor",
        compact_every=0,
        partial_updates=True,
    )
    src = _read(spark, _files(hazard_log)[0]).select(
        "url", "warc_ts", F.col("seq").alias("_seq"),
        F.col("op").alias("_op"), "html", "text", "lang",
    )
    with pytest.raises(ValueError, match="whole-row"):
        p.bootstrap_changelog(src)


def test_bootstrap_is_watermark_neutral(spark, hazard_log, tmp_path):
    ev = hazard_log
    src = CdcPipeline(
        spark, ev, str(tmp_path / "s_t"), str(tmp_path / "s_c")
    )
    src.apply_epoch(_read(spark, _files(ev)[0]), epoch_id=0)
    snap = lww_compact_auto(
        LakeTable.load(spark, src.table_path).read(),
        key="url",
        order=("warc_ts", "_seq"),
    )
    p = CdcPipeline(spark, ev, str(tmp_path / "b_t"), str(tmp_path / "b_c"))
    p.apply_epoch(
        _read(spark, _files(ev)[0]).filter(F.col("op") == "ddl"), epoch_id=0
    )
    before = LakeTable.load(spark, p.table_path).last_epoch()
    p.bootstrap_changelog(snap)
    after = LakeTable.load(spark, p.table_path).last_epoch()
    assert before == after  # the bulk load never advances the watermark
