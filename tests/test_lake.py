import os

import pytest
from pyspark.sql import functions as F

from openlogreplicator_spark.lake.table import LakeTable

FIELDS = [("url", "string"), ("warc_ts", "timestamp"), ("_seq", "long"),
          ("_op", "string"), ("text", "string")]


@pytest.fixture()
def table(spark, tmp_path):
    return LakeTable.create(spark, str(tmp_path / "t"), FIELDS, key_col="url",
                            n_buckets=4, schema_ver=1)


def _write_rows(spark, table, rows, schema_ver=None):
    df = spark.createDataFrame(rows, "url string, warc_ts timestamp, _seq long, _op string, text string")
    df = df.withColumn("_bucket", table.bucket_expr())
    absdir, _rel = table.new_data_dir()
    df.write.partitionBy("_bucket").parquet(absdir)
    files = []
    for root, _d, fs in os.walk(absdir):
        for fn in fs:
            if fn.endswith(".parquet"):
                files.append({
                    "path": os.path.relpath(os.path.join(root, fn), table.path),
                    "bucket": int(os.path.basename(root).split("=")[1]),
                    "schema_ver": schema_ver or table.current_schema_ver,
                    "rows": 1,
                })
    table.commit_files(files, {f["bucket"] for f in files}, {"op": "append"})


def test_create_load_roundtrip(spark, table):
    t2 = LakeTable.load(spark, table.path)
    assert t2.snap == table.snap
    assert t2.read().count() == 0
    assert [f["name"] for f in t2.current_schema()] == [n for n, _ in FIELDS]


def test_write_read_and_bucket_pruning(spark, table):
    import datetime as dt
    ts = dt.datetime(2020, 1, 1)
    rows = [(f"u{i}", ts, i, "c", f"t{i}") for i in range(20)]
    _write_rows(spark, table, rows)
    assert table.read().count() == 20
    # pruned read only returns rows of those buckets, consistent with bucket_expr
    got = table.read(buckets=[0, 1]).withColumn("_b", table.bucket_expr())
    bvals = {r["_b"] for r in got.select("_b").distinct().collect()}
    assert bvals <= {0, 1}
    full = table.read().withColumn("_b", table.bucket_expr())
    expect = full.filter(F.col("_b").isin([0, 1])).count()
    assert got.count() == expect


def test_schema_evolution_remaps_old_files(spark, table):
    import datetime as dt
    ts = dt.datetime(2020, 1, 1)
    _write_rows(spark, table, [("a", ts, 1, "c", "old-file-row")])
    table.evolve("add_column", "fetch_status", new_type="int", to_ver=2)
    table.evolve("widen_type", "fetch_status", new_type="long", to_ver=3)
    table.evolve("rename_column", "fetch_status", new_name="http_status", to_ver=4)
    t2 = LakeTable.load(spark, table.path)
    assert t2.current_schema_ver == 4
    df = t2.read()
    assert dict(df.dtypes)["http_status"] == "bigint"
    row = df.collect()[0]
    assert row["text"] == "old-file-row" and row["http_status"] is None


def test_widen_rejects_narrowing(table):
    table.evolve("add_column", "n", new_type="long", to_ver=2)
    with pytest.raises(ValueError):
        table.evolve("widen_type", "n", new_type="int")


def test_epoch_summary_gate(table):
    assert table.last_epoch() == (-1, True)
    table.commit_summary_only({"op": "merge", "epoch_id": 3, "final": False})
    assert table.last_epoch() == (3, False)
    table.commit_summary_only({"op": "merge", "epoch_id": 3, "final": True})
    assert table.last_epoch() == (3, True)


def test_epoch_gate_survives_maintenance_commits(table):
    """A maintenance commit (evolve/compact/purge) between an epoch and its
    re-delivery must not reset the exactly-once gate (ADVICE r01): the
    confirmed-epoch watermark is a dedicated snapshot field, not derived from
    the last commit summary."""
    table.commit_summary_only({"op": "merge", "epoch_id": 7, "final": True})
    table.evolve("add_column", "extra", new_type="int", to_ver=2)
    table.commit_summary_only({"op": "purge_tombstones", "buckets": 0})
    assert table.last_epoch() == (7, True)


def test_rename_of_reserved_columns_rejected(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "r"), FIELDS, key_col="url", n_buckets=4,
        reserved_cols=["warc_ts", "_seq", "_op"],
    )
    for col in ("url", "warc_ts", "_seq", "_op"):
        with pytest.raises(ValueError):
            t.evolve("rename_column", col, new_name="renamed")
    # payload columns stay renamable (resolved by field id downstream)
    t.evolve("rename_column", "text", new_name="body")
    assert any(f["name"] == "body" for f in t.current_schema())


def test_commit_is_atomic_pointer_swap(spark, table):
    v0 = table.snap["version"]
    table.commit_summary_only({"op": "noop"})
    cur = os.path.join(table.path, "_snapshots", "_current")
    with open(cur) as f:
        assert int(f.read()) == v0 + 1
    # old snapshot still readable (time travel by version file)
    assert os.path.exists(os.path.join(table.path, "_snapshots", f"v{v0:08d}.json"))
