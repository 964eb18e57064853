"""Per-file Bloom point-lookup index (lake/bloom.py + manifest `bloom`
entries): no false negatives by construction (build and probe share ONE
Python hash), prunes files a time-clustered layout's col_bounds cannot
(url values are range-free across time), and obeys the same dirty-bucket
soundness gate as the bounds prune."""

from __future__ import annotations

import datetime as dt
import glob
import os

from openlogreplicator_spark.lake.bloom import (
    bloom_build,
    bloom_might_contain,
    bloom_n_bits,
)
from openlogreplicator_spark.lake.table import LakeTable
from openlogreplicator_spark.operators.decode import EVENTS_DDL
from openlogreplicator_spark.operators.merge import (
    cluster_buckets,
    lookup_keys,
    merge_append,
    read_state,
)
from openlogreplicator_spark.streaming.pipeline import CdcPipeline

TS = dt.datetime(2020, 1, 1)
FIELDS = [("url", "string"), ("warc_ts", "timestamp"), ("_seq", "long"),
          ("_op", "string"), ("text", "string"), ("lang", "string")]


# ------------------------------------------------------------- pure python
def test_bloom_no_false_negatives_and_mostly_negative_absent():
    vals = [f"https://host{i}.example/p/{i * 7919}" for i in range(500)]
    entry = bloom_build(vals, len(vals))
    assert all(bloom_might_contain(entry, v) for v in vals)  # NEVER miss
    absent = [f"https://other{i}.example/q/{i}" for i in range(2000)]
    fp = sum(bloom_might_contain(entry, v) for v in absent)
    # ~10 bits/row @ k=4 => <2% fpp; allow generous slack
    assert fp / len(absent) < 0.05


def test_bloom_nulls_and_malformed_entries():
    entry = bloom_build(["a", None, "b"], 3)
    assert bloom_might_contain(entry, "a") and bloom_might_contain(entry, "b")
    # malformed entries must degrade to never-prune, not crash or skip
    assert bloom_might_contain({}, "x")
    assert bloom_might_contain({"m": 64, "k": 4, "b64": "!!"}, "x")
    assert bloom_might_contain({"m": 1024, "k": 4, "b64": "AA=="}, "x")


def test_bloom_sizing_is_capped_power_of_two():
    assert bloom_n_bits(1) == 64
    m = bloom_n_bits(1000)
    assert m & (m - 1) == 0 and m >= 10_000
    assert bloom_n_bits(10**9) == 1 << 17


# ------------------------------------------------------------- end to end
def _replayed_table(spark, events_dir, tmp_path) -> tuple[CdcPipeline, LakeTable]:
    files = sorted(glob.glob(os.path.join(events_dir, "*.parquet")))
    p = CdcPipeline(
        spark, events_dir, str(tmp_path / "t"), str(tmp_path / "c"),
        bloom_cols=("url",),
    )
    for i, f in enumerate(files):
        p.apply_epoch(spark.read.schema(EVENTS_DDL).parquet(f), epoch_id=i)
    return p, LakeTable.load(spark, p.table_path)


def test_bloom_prunes_time_clustered_files_exactly(spark, events_dir, tmp_path):
    p, t = _replayed_table(spark, events_dir, tmp_path)
    assert any("bloom" in fe for fe in t.snap["files"])
    baseline = read_state(t).select(
        "url", "warc_ts", "_seq", "text", "lang"
    ).toPandas().sort_values("url").reset_index(drop=True)

    # time-clustered layout: several files per bucket, url spans every file's
    # whole range -> col_bounds can never prune a url lookup, bloom can
    # (cluster folds MoR deltas to winners first, so size for winner counts)
    cluster_buckets(t, target_rows_per_file=4)
    t = LakeTable.load(spark, p.table_path)
    per_bucket: dict[int, int] = {}
    for fe in t.snap["files"]:
        per_bucket[fe["bucket"]] = per_bucket.get(fe["bucket"], 0) + 1
    assert max(per_bucket.values()) >= 3  # layout really is multi-file

    urls = sorted(baseline["url"])
    probe = [urls[0], urls[len(urls) // 2], urls[-1]]
    stats = t.plan_scan(eq={"url": probe})
    assert stats["skipped_bloom"] > 0
    assert stats["files_selected"] < stats["files_total"]

    # end-to-end no-false-negative: every live key is served exactly
    got = (
        lookup_keys(t, probe)
        .select("url", "warc_ts", "_seq", "text", "lang")
        .toPandas().sort_values("url").reset_index(drop=True)
    )
    want = baseline[baseline["url"].isin(probe)].reset_index(drop=True)
    assert got.equals(want)

    absent = "https://definitely.not/in/table"
    assert t.plan_scan(eq={"url": absent})["files_selected"] < stats[
        "files_total"
    ]
    assert lookup_keys(t, [absent]).count() == 0


def test_bloom_never_prunes_dirty_buckets(spark, tmp_path):
    """Resurrection hazard, constructed: a superseded version of key K sits
    in a delta file whose bloom would reject a DIFFERENT probed key — the
    dirty-bucket gate must keep every file of a dirty bucket regardless."""
    t = LakeTable.create(
        spark, str(tmp_path / "t2"), FIELDS, key_col="url", n_buckets=2,
        flags={"bloom_cols": ["url"]},
    )

    def df(rows):
        return spark.createDataFrame(
            rows, "url string, warc_ts timestamp, _seq long, _op string, "
                  "text string, lang string")

    merge_append(t, df([("k1", TS, 1, "c", "old", "en")]), epoch_id=0)
    t = LakeTable.load(spark, t.path)
    merge_append(
        t, df([("k1", TS, 2, "u", "new", "en"),
               ("k2", TS, 1, "c", "other", "de")]), epoch_id=1)
    t = LakeTable.load(spark, t.path)
    assert t.dirty_buckets()  # MoR appends left deltas unresolved
    stats = t.plan_scan(eq={"url": "k2"})
    assert stats["skipped_bloom"] == 0  # dirty: nothing may be pruned
    got = read_state(t, eq={"url": "k2"}).select("url", "text").collect()
    assert [(r["url"], r["text"]) for r in got] == [("k2", "other")]
    # and k1 resolves to its LWW winner, not the superseded version
    got1 = read_state(t, eq={"url": "k1"}).select("text").collect()
    assert [r["text"] for r in got1] == ["new"]


def test_tables_without_flag_record_no_blooms(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "t3"), FIELDS, key_col="url", n_buckets=2)
    merge_append(
        t,
        spark.createDataFrame(
            [("k1", TS, 1, "c", "x", "en")],
            "url string, warc_ts timestamp, _seq long, _op string, "
            "text string, lang string"),
        epoch_id=0,
    )
    t = LakeTable.load(spark, t.path)
    assert all("bloom" not in fe for fe in t.snap["files"])
    # absent bloom = never prune; lookups still correct
    assert t.plan_scan(eq={"url": "zzz"})["skipped_bloom"] == 0


def test_bloom_survives_column_rename_via_field_id(spark, tmp_path):
    """Files written BEFORE a rename carry blooms under the old physical
    name; the probe matches by FIELD ID, so eq lookups under the NEW name
    still prune them (same rule as col_bounds)."""
    t = LakeTable.create(
        spark, str(tmp_path / "t4"), FIELDS, key_col="url", n_buckets=1,
        flags={"bloom_cols": ["lang"]},
    )
    ddl = ("url string, warc_ts timestamp, _seq long, _op string, "
           "text string, lang string")
    merge_append(
        t, spark.createDataFrame(
            [(f"k{i}", TS, i, "c", "x", "en" if i % 2 else "de")
             for i in range(40)], ddl), epoch_id=0)
    t = LakeTable.load(spark, t.path)
    cluster_buckets(t, target_rows_per_file=10)  # several clean files
    t = LakeTable.load(spark, t.path)
    assert all("bloom" in fe for fe in t.snap["files"])

    t.evolve("rename_column", "lang", new_name="language")
    t = LakeTable.load(spark, t.path)
    stats = t.plan_scan(eq={"language": "zz"})  # value present in no file
    assert stats["skipped_bloom"] + stats["skipped_eq"] == stats["files_total"]
    got = read_state(t, eq={"language": "en"}).count()
    assert got == 20  # field-id matching never loses rows under the rename
