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


def test_partial_update_fold_semantics(spark, tmp_path):
    """read_state_partial: NULL payload columns carry forward within a
    key's life; a delete tombstone resets the carry (re-create must not
    inherit the dead row's columns); newest version wins row identity."""
    import datetime as dt

    from openlogreplicator_spark.streaming.pipeline import CdcPipeline

    def ev(seq, op, url, text, lang):
        return (seq, dt.datetime(2020, 1, 1, 0, 0, seq), op, url,
                None, text, lang, None, None, 1, False,
                None, None, None, None)

    rows = [
        ev(0, "c", "u1", "t0", "en"),
        ev(1, "u", "u1", None, "de"),      # text carries t0
        ev(2, "u", "u1", "t2", None),      # lang carries de
        ev(3, "c", "u2", "x0", "fr"),
        ev(4, "d", "u2", None, None),
        ev(5, "c", "u2", None, "pl"),      # after delete: text must be NULL
        ev(6, "c", "u3", "z0", "es"),
        ev(7, "d", "u3", None, None),      # u3 ends deleted -> absent
    ]
    from openlogreplicator_spark.operators.decode import EVENTS_DDL

    df = spark.createDataFrame(rows, EVENTS_DDL)
    p = CdcPipeline(
        spark, "unused", str(tmp_path / "t"), str(tmp_path / "c"),
        merge_mode="mor", compact_every=0, partial_updates=True,
    )
    # two epochs: the fold must also coalesce ACROSS epochs
    p.apply_epoch(df.filter(F.col("seq") < 4), epoch_id=0)
    p.apply_epoch(df.filter(F.col("seq") >= 4), epoch_id=1)
    got = {
        r.url: (r.text, r.lang, r._seq)
        for r in p.target_state().select("url", "text", "lang", "_seq").collect()
    }
    assert got == {"u1": ("t2", "de", 2), "u2": (None, "pl", 5)}

    # guards: partial mode refuses CoW and LWW compaction
    import pytest as _pytest

    with _pytest.raises(ValueError):
        CdcPipeline(spark, "x", str(tmp_path / "t2"), str(tmp_path / "c2"),
                    merge_mode="cow", partial_updates=True)
    with _pytest.raises(ValueError):
        CdcPipeline(spark, "x", str(tmp_path / "t3"), str(tmp_path / "c3"),
                    merge_mode="mor", compact_every=4, partial_updates=True)


def test_partial_updates_streaming_resume(spark, tmp_path, events_dir):
    """Partial-image mode through run_available_now: checkpointed
    micro-batches append raw versions; a second availableNow run resumes
    from the checkpoint as a no-op; final fold state equals the one-epoch
    batch-partial replay of the same masked log."""
    import glob

    from openlogreplicator_spark.operators.decode import EVENTS_DDL
    from openlogreplicator_spark.streaming.pipeline import CdcPipeline

    # masked copy of the log: updates drop text every third seq — masked
    # FILE BY FILE so the ordered-archive layout (one epoch per file, DDLs
    # in log order across files) survives; a df.write.parquet rewrite would
    # scramble events across part files and deliver DDLs out of order
    import os as _os

    import pyarrow as pa
    import pyarrow.parquet as pq

    masked_dir = str(tmp_path / "masked")
    _os.makedirs(masked_dir)
    for f in sorted(glob.glob(_os.path.join(events_dir, "*.parquet"))):
        t = pq.read_table(f)
        ops, seqs = t["op"].to_pylist(), t["seq"].to_pylist()
        texts = [
            None if (o == "u" and s % 3 == 1) else x
            for o, s, x in zip(ops, seqs, t["text"].to_pylist())
        ]
        t = t.set_column(
            t.schema.get_field_index("text"), "text",
            pa.array(texts, pa.string()),
        )
        pq.write_table(t, _os.path.join(masked_dir, _os.path.basename(f)))

    ps = CdcPipeline(spark, masked_dir, str(tmp_path / "ts"),
                     str(tmp_path / "cs"), merge_mode="mor",
                     compact_every=0, partial_updates=True)
    ps.run_available_now(max_files_per_trigger=2)
    v1 = LakeTable.current_version(ps.table_path)
    ps.run_available_now(max_files_per_trigger=2)  # resume: nothing new
    assert LakeTable.current_version(ps.table_path) == v1

    pb = CdcPipeline(spark, masked_dir, str(tmp_path / "tb"),
                     str(tmp_path / "cb"), merge_mode="mor",
                     compact_every=0, partial_updates=True)
    pb.run_batch_replay()

    cols = ["url", "warc_ts", "_seq", "text", "lang"]
    a = sorted(map(tuple, ps.target_state().select(*cols).collect()))
    b = sorted(map(tuple, pb.target_state().select(*cols).collect()))
    assert a == b and len(a) > 0


def test_compact_partial_bounds_history(spark, tmp_path):
    """compact_partial: pre-watermark history collapses into one full row
    per key (tombstone winners kept), user state is identical before and
    after, physical rows shrink, and a LATER partial update still carries
    forward from the folded row. Whole-row maintenance refuses partial
    tables; compact_partial refuses normal ones."""
    import datetime as dt

    from openlogreplicator_spark.operators.decode import EVENTS_DDL
    from openlogreplicator_spark.operators.merge import (
        compact_partial,
        compact_table,
        purge_tombstones,
        read_state_partial,
    )
    from openlogreplicator_spark.streaming.pipeline import CdcPipeline

    def ev(seq, op, url, text, lang):
        return (seq, dt.datetime(2020, 1, 1, 0, 0, seq), op, url,
                None, text, lang, None, None, 1, False,
                None, None, None, None)

    early = [
        ev(0, "c", "u1", "t0", "en"),
        ev(1, "u", "u1", None, "de"),     # carries t0
        ev(2, "c", "u2", "x0", "fr"),
        ev(3, "d", "u2", None, None),     # u2 dead at watermark
        ev(4, "c", "u3", "z0", "es"),
    ]
    late = [ev(10, "u", "u1", None, "pl"),   # post-watermark partial
            ev(11, "c", "u2", None, "it")]   # re-create after folded tombstone
    p = CdcPipeline(
        spark, "unused", str(tmp_path / "t"), str(tmp_path / "c"),
        merge_mode="mor", compact_every=0, partial_updates=True,
    )
    p.apply_epoch(spark.createDataFrame(early, EVENTS_DDL), epoch_id=0)
    p.apply_epoch(spark.createDataFrame(late, EVENTS_DDL), epoch_id=1)

    t = LakeTable.load(spark, p.table_path)
    before = sorted(map(tuple, read_state_partial(t)
                        .select("url", "text", "lang", "_seq").collect()))
    w_us = 5_000_000 + 1_577_836_800_000_000  # 2020-01-01 00:00:05 UTC
    stats = compact_partial(t, w_us)
    assert stats["rows_after"] < stats["rows_before"], stats

    t2 = LakeTable.load(spark, p.table_path)
    after = sorted(map(tuple, read_state_partial(t2)
                       .select("url", "text", "lang", "_seq").collect()))
    assert after == before
    # u1: folded full row (t0, de) + late partial -> (t0, pl);
    # u2: re-create after tombstone inherits nothing -> (None, it)
    assert ("u1", "t0", "pl", 10) in after
    assert ("u2", None, "it", 11) in after
    # idempotent: a second pass with the same watermark changes nothing
    compact_partial(t2, w_us)
    t3 = LakeTable.load(spark, p.table_path)
    again = sorted(map(tuple, read_state_partial(t3)
                       .select("url", "text", "lang", "_seq").collect()))
    assert again == before

    with pytest.raises(ValueError, match="unsound on a partial-image"):
        compact_table(t3)
    with pytest.raises(ValueError, match="unsound on a partial-image"):
        purge_tombstones(t3, dt.datetime(2100, 1, 1))

    # normal table refuses compact_partial
    pn = CdcPipeline(spark, "unused", str(tmp_path / "tn"), str(tmp_path / "cn"))
    pn.apply_epoch(spark.createDataFrame(early, EVENTS_DDL), epoch_id=0)
    with pytest.raises(ValueError, match="requires a partial-image table"):
        compact_partial(LakeTable.load(spark, pn.table_path), w_us)


def test_delete_where_on_partial_table(spark, tmp_path):
    """Fold-aware predicate delete: victims resolve against the FOLDED
    state (a key whose lang arrived in an earlier partial image still
    matches), tombstones APPEND (no CoW), the watermark stays put, and a
    strictly newer source event resurrects with a fresh life."""
    import datetime as dt

    from openlogreplicator_spark.operators.decode import EVENTS_DDL
    from openlogreplicator_spark.operators.merge import delete_where
    from openlogreplicator_spark.streaming.pipeline import CdcPipeline

    def ev(seq, op, url, text, lang):
        return (seq, dt.datetime(2020, 1, 1, 0, 0, seq), op, url,
                None, text, lang, None, None, 1, False,
                None, None, None, None)

    rows = [
        ev(0, "c", "u1", "t0", "de"),
        ev(1, "u", "u1", "t1", None),   # lang=de only via carry-forward
        ev(2, "c", "u2", "x0", "en"),
    ]
    p = CdcPipeline(
        spark, "unused", str(tmp_path / "t"), str(tmp_path / "c"),
        merge_mode="mor", compact_every=0, partial_updates=True,
    )
    p.apply_epoch(spark.createDataFrame(rows, EVENTS_DDL), epoch_id=0)

    t = LakeTable.load(spark, p.table_path)
    wm = t.last_epoch()
    stats = delete_where(t, "lang = 'de'")
    assert stats["rows"] > 0
    t = LakeTable.load(spark, p.table_path)
    assert t.last_epoch() == wm  # watermark untouched
    live = {r.url for r in p.target_state().select("url").collect()}
    assert live == {"u2"}

    # strictly newer source event resurrects u1 with a FRESH life: the
    # pre-delete text must NOT carry through the tombstone
    p.apply_epoch(
        spark.createDataFrame([ev(9, "u", "u1", None, "fr")], EVENTS_DDL),
        epoch_id=1,
    )
    got = {r.url: (r.text, r.lang)
           for r in p.target_state().select("url", "text", "lang").collect()}
    assert got["u1"] == (None, "fr")
