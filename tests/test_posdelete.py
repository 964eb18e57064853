"""Iceberg-v2-style position deletes: (file, pos) delete files applied at
read()'s single scan choke point, folded away by the first bucket rewrite,
GC-tracked like data files, physical (version-level) semantics on
merge-on-read buckets."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from openlogreplicator_spark.lake.table import LakeTable
from openlogreplicator_spark.operators.merge import (
    delete_positions,
    merge_append,
    merge_into,
    read_state,
    rewrite_buckets,
)

TS = dt.datetime(2020, 1, 1)
TS2 = dt.datetime(2020, 1, 2)
DDL = ("url string, warc_ts timestamp, _seq long, _op string, "
       "text string, lang string")
FIELDS = [("url", "string"), ("warc_ts", "timestamp"), ("_seq", "long"),
          ("_op", "string"), ("text", "string"), ("lang", "string")]


def _mk(spark, path, n=12, n_buckets=2):
    t = LakeTable.create(spark, path, FIELDS, key_col="url",
                         n_buckets=n_buckets, schema_ver=1)
    rows = [(f"u{i}", TS, i, "c", f"t{i}", "de" if i % 3 == 0 else "en")
            for i in range(n)]
    merge_into(t, spark.createDataFrame(rows, DDL), epoch_id=0)
    return LakeTable.load(spark, path)


def test_posdelete_erases_without_rewriting(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    files_before = sorted(
        fe["path"] for fe in t.snap["files"]
    )
    victims = t.read(with_file=True, with_pos=True).filter(
        F.col("lang") == "de"
    )
    out = delete_positions(t, victims)
    assert out["rows"] == 4 and out["delete_files"] >= 1
    t = LakeTable.load(spark, t.path)
    # zero data files rewritten — the commit is delete-file + metadata only
    assert sorted(fe["path"] for fe in t.snap["files"]) == files_before
    got = {r["url"] for r in t.read().collect()}
    assert got == {f"u{i}" for i in range(12) if i % 3 != 0}
    # idempotent address space: a second read carries _file/_pos again
    assert t.read(with_file=True, with_pos=True).count() == 8


def test_rewrite_folds_and_drops_delete_files(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    victims = t.read(with_file=True, with_pos=True).filter(
        F.col("lang") == "de"
    )
    delete_positions(t, victims)
    t = LakeTable.load(spark, t.path)
    buckets = {d["bucket"] for d in t.snap["delete_files"]}
    want = sorted(r["url"] for r in t.read().collect())
    rewrite_buckets(t, sorted(buckets))
    t = LakeTable.load(spark, t.path)
    assert not t.snap.get("delete_files"), \
        "a rewrite of the bucket must drop its now-applied delete entries"
    assert sorted(r["url"] for r in t.read().collect()) == want


def test_posdelete_physical_semantics_on_mor_bucket(spark, tmp_path):
    """Deleting a key's WINNER version resurrects its older version —
    position deletes are version-level physical erasure, not key-level
    logical deletion (that is delete_where's contract)."""
    t = LakeTable.create(spark, str(tmp_path / "t"), FIELDS, key_col="url",
                         n_buckets=1, schema_ver=1)
    merge_append(t, spark.createDataFrame(
        [("u1", TS, 1, "c", "old", "de")], DDL), epoch_id=0)
    t = LakeTable.load(spark, t.path)
    merge_append(t, spark.createDataFrame(
        [("u1", TS2, 2, "u", "new", "en")], DDL), epoch_id=1)
    t = LakeTable.load(spark, t.path)
    victims = t.read(with_file=True, with_pos=True).filter(
        F.col("_seq") == 2
    )
    delete_positions(t, victims)
    t = LakeTable.load(spark, t.path)
    st = read_state(t).filter(F.col("url") == "u1").collect()
    assert len(st) == 1 and st[0]["text"] == "old"


def test_stale_victims_refused_and_gc_keeps_delete_files(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    victims = t.read(with_file=True, with_pos=True).filter(
        F.col("lang") == "de"
    ).collect()
    stale = spark.createDataFrame(
        [("no-such-file.parquet", 0)], "`_file` string, `_pos` long"
    )
    import pytest

    with pytest.raises(ValueError, match="not in the current snapshot"):
        delete_positions(t, stale)
    df = spark.createDataFrame(victims)
    delete_positions(t, df.select("_file", "_pos"))
    t = LakeTable.load(spark, t.path)
    import os

    dpaths = [os.path.join(t.path, d["path"])
              for d in t.snap["delete_files"]]
    t.expire_snapshots(keep_last=1, orphan_grace_secs=0)
    assert all(os.path.exists(p) for p in dpaths), \
        "GC must treat referenced delete files as live"
    want = sorted(r["url"] for r in t.read().collect())
    rewrite_buckets(t, sorted({d["bucket"] for d in t.snap["delete_files"]}))
    t = LakeTable.load(spark, t.path)
    t.expire_snapshots(keep_last=1, orphan_grace_secs=0)
    assert not any(os.path.exists(p) for p in dpaths), \
        "applied+expired delete files are debris for GC"
    assert sorted(r["url"] for r in t.read().collect()) == want


def test_posdelete_refuses_partial_tables(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), FIELDS, key_col="url",
                         n_buckets=1, schema_ver=1,
                         flags={"partial_images": True})
    import pytest

    with pytest.raises(ValueError, match="partial-image"):
        delete_positions(
            t, spark.createDataFrame([], "`_file` string, `_pos` long")
        )


def test_clone_carries_delete_files_absolutized(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    delete_positions(t, t.read(with_file=True, with_pos=True).filter(
        F.col("lang") == "de"))
    t = LakeTable.load(spark, t.path)
    want = sorted(r["url"] for r in t.read().collect())
    c = t.clone_to(str(tmp_path / "c"))
    import os

    assert all(os.path.isabs(d["path"]) for d in c.snap["delete_files"])
    assert sorted(r["url"] for r in c.read().collect()) == want
    # clone GC never touches source-side delete files
    c.expire_snapshots(keep_last=1, orphan_grace_secs=0)
    t = LakeTable.load(spark, t.path)
    assert sorted(r["url"] for r in t.read().collect()) == want


def test_maintain_folds_position_deletes(spark, tmp_path):
    """maintain() rewrites clean buckets that carry delete files (the
    rewrite_position_deletes analogue), so reads stop paying the
    anti-join; state unchanged."""
    t = _mk(spark, str(tmp_path / "t"))
    delete_positions(t, t.read(with_file=True, with_pos=True).filter(
        F.col("lang") == "de"))
    t = LakeTable.load(spark, t.path)
    assert t.snap.get("delete_files")
    want = sorted(r["url"] for r in t.read().collect())
    from openlogreplicator_spark.operators.merge import maintain

    rep = maintain(t, max_files_per_bucket=1000)
    assert "rewrite" in rep
    t = LakeTable.load(spark, t.path)
    assert not t.snap.get("delete_files")
    assert sorted(r["url"] for r in t.read().collect()) == want


def test_snapshot_diff_sees_position_deletes(spark, tmp_path):
    """A posdelete commit changes user-visible state without touching any
    data file — the CDF/changelog path must still report it (bucket
    identity includes delete files, not just data files)."""
    from openlogreplicator_spark.operators.merge import snapshot_diff

    t = _mk(spark, str(tmp_path / "t"))
    v0 = t.snap["version"]
    delete_positions(t, t.read(with_file=True, with_pos=True).filter(
        F.col("lang") == "de"))
    t = LakeTable.load(spark, t.path)
    diff = snapshot_diff(spark, t.path, from_version=v0)
    rows = diff.collect()
    assert len(rows) == 4
    assert {r["_change"] for r in rows} == {"delete"}
    assert {r["url"] for r in rows} == {f"u{i}" for i in range(12)
                                        if i % 3 == 0}


def test_posdelete_and_provenance_on_imported_external_files(spark, tmp_path):
    """Round-3 ADVICE: files registered by import_files from a path with NO
    'data/' segment must key identically on the read side (_file derived
    from the file:// URI in _metadata.file_path) and the manifest side
    (data_suffix of the stored absolute path) — otherwise file_commits()
    pairing silently misses and delete_positions raises a false
    'stale victims' error for rows read from imported files."""
    import glob

    from openlogreplicator_spark.operators.merge import import_files

    # external dump in a directory whose path contains no 'data/' segment
    ext = str(tmp_path / "ext")
    assert "data/" not in ext + "/"
    src = _mk(spark, str(tmp_path / "src"))
    src.read().write.parquet(ext)
    ext_files = sorted(glob.glob(ext + "/*.parquet"))

    t = LakeTable.create(spark, str(tmp_path / "t"), FIELDS, key_col="url",
                         n_buckets=2, schema_ver=1)
    import_files(t, ext_files)
    t = LakeTable.load(spark, t.path)

    # read-side keys and manifest-side keys must be the same key space
    read_keys = {
        r["_file"] for r in t.read(with_file=True).select("_file").collect()
    }
    commit_keys = set(t.file_commits())
    assert read_keys <= commit_keys, (read_keys, commit_keys)
    for k in read_keys:
        assert not k.startswith("file:"), k  # scheme must be stripped

    # position delete on rows living in imported files must not be
    # refused as stale
    victims = t.read(with_file=True, with_pos=True).filter(
        F.col("lang") == "de"
    )
    out = delete_positions(t, victims)
    assert out["rows"] == 4
    t = LakeTable.load(spark, t.path)
    got = {r["url"] for r in read_state(t).collect()}
    assert got == {f"u{i}" for i in range(12) if i % 3 != 0}
