"""delete_where: predicate tombstones ride the normal LWW order — late
events stay dead, newer events resurrect, the exactly-once watermark never
moves, and purge performs the physical erasure."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from openlogreplicator_spark.lake.table import LakeTable
from openlogreplicator_spark.operators.merge import (
    delete_where,
    merge_into,
    purge_tombstones,
    read_state,
)

FIELDS = [("url", "string"), ("warc_ts", "timestamp"), ("_seq", "long"),
          ("_op", "string"), ("text", "string"), ("lang", "string")]
TS = dt.datetime(2020, 1, 1)
TS2 = dt.datetime(2020, 1, 2)
DDL = ("url string, warc_ts timestamp, _seq long, _op string, "
       "text string, lang string")


def _batch(spark, rows):
    return spark.createDataFrame(rows, DDL)


@pytest.fixture()
def seeded(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), FIELDS, key_col="url",
                         n_buckets=4, schema_ver=1)
    merge_into(
        t,
        _batch(spark, [
            (f"u{i}", TS, 10 + i, "c", f"t{i}", "de" if i % 3 == 0 else "en")
            for i in range(12)
        ]),
        epoch_id=0,
    )
    return t


def _live_urls(spark, path):
    t = LakeTable.load(spark, path)
    return {r["url"] for r in read_state(t).select("url").collect()}


def test_delete_where_removes_exactly_matching_winners(spark, seeded):
    t = seeded
    wm_before = t.last_epoch()
    stats = delete_where(t, "lang = 'de'")
    assert stats["rows"] > 0
    live = _live_urls(spark, t.path)
    assert live == {f"u{i}" for i in range(12) if i % 3 != 0}
    # the confirmed-epoch watermark must NOT advance
    assert LakeTable.load(spark, t.path).last_epoch() == wm_before


def test_late_event_stays_dead_newer_event_resurrects(spark, seeded):
    t = seeded
    delete_where(t, "lang = 'de'")
    t = LakeTable.load(spark, t.path)
    # u0 was deleted (winner was (TS, 10), tombstone is (TS, 11)).
    # A LATE source event at (TS, seq 9) — older than the deleted winner —
    # must lose to the tombstone.
    merge_into(t, _batch(spark, [("u0", TS, 9, "u", "late", "de")]),
               epoch_id=1)
    assert "u0" not in _live_urls(spark, t.path)
    # A strictly NEWER source version resurrects the key (the log outranks
    # the operator: a re-crawled url legitimately reappears).
    t = LakeTable.load(spark, t.path)
    merge_into(t, _batch(spark, [("u0", TS2, 1, "u", "fresh", "de")]),
               epoch_id=2)
    live = LakeTable.load(spark, t.path)
    rows = {r["url"]: r["text"] for r in read_state(live).collect()}
    assert rows["u0"] == "fresh"


def test_delete_where_then_purge_erases_physically(spark, seeded):
    t = seeded
    delete_where(t, "lang = 'de'")
    t = LakeTable.load(spark, t.path)
    before = _live_urls(spark, t.path)
    purge_tombstones(t, older_than=dt.datetime(2021, 1, 1))
    t = LakeTable.load(spark, t.path)
    # user state identical, but no tombstone rows remain on disk
    assert _live_urls(spark, t.path) == before
    raw = t.read()
    assert raw.filter(F.col("_op") == "d").count() == 0


def test_delete_where_no_match_is_noop_commit(spark, seeded):
    t = seeded
    v0 = LakeTable.current_version(t.path)
    stats = delete_where(t, "lang = 'fr'")
    assert stats["rows"] == 0
    assert _live_urls(spark, t.path) == {f"u{i}" for i in range(12)}
    # still a (summary-only or empty) commit at most one version ahead
    assert LakeTable.current_version(t.path) <= v0 + 1
