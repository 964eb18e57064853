"""Source-side incarnation / resetlogs guard (reference
OracleIncarnation.cpp, Replicator::updateResetlogs, Parser.cpp:1239-1244):
a rewound source log must refuse-or-branch, never silently LWW-merge two
histories."""

from __future__ import annotations

import glob
import os
import shutil

import pytest

from openlogreplicator_spark.datagen import stamp_incarnation
from openlogreplicator_spark.operators.decode import EVENTS_DDL
from openlogreplicator_spark.streaming.pipeline import (
    CdcPipeline,
    IncarnationError,
)


def _pipeline(spark, events_dir, tmp_path, name="t", **kw):
    base = tmp_path / name
    return CdcPipeline(
        spark, str(events_dir), str(base / "table"), str(base / "ckpt"),
        n_buckets=4, **kw,
    )


def _files(events_dir) -> list[str]:
    return sorted(glob.glob(os.path.join(str(events_dir), "*.parquet")))


def _apply(spark, p, path, epoch_id):
    p.apply_epoch(
        spark.read.schema(EVENTS_DDL).parquet(path), epoch_id=epoch_id
    )


def test_rewind_same_incarnation_refused(spark, events_dir, tmp_path):
    """Re-delivering an already-consumed seq range as a NEW epoch under the
    same incarnation is an uncontrolled source rewind — the engine must
    raise, and the target state must be untouched."""
    files = _files(events_dir)
    p = _pipeline(spark, events_dir, tmp_path)
    _apply(spark, p, files[0], 0)
    _apply(spark, p, files[1], 1)
    state_before = sorted(
        map(tuple, p.target_state().select("url", "warc_ts", "_seq").collect())
    )
    # "restore the source": epoch 2 re-presents file 0's seq range
    rewound = str(tmp_path / "rewound.parquet")
    shutil.copy(files[0], rewound)
    with pytest.raises(IncarnationError, match="rewind"):
        _apply(spark, p, rewound, 2)
    state_after = sorted(
        map(tuple, p.target_state().select("url", "warc_ts", "_seq").collect())
    )
    assert state_after == state_before


def test_rewind_with_new_incarnation_branches(spark, events_dir, tmp_path):
    """The controlled resetlogs switch: the same rewound range stamped with
    a HIGHER incarnation id is accepted (sequence restarts on the new
    branch) and the adopting commit records the incarnation."""
    files = _files(events_dir)
    p = _pipeline(spark, events_dir, tmp_path)
    _apply(spark, p, files[0], 0)
    _apply(spark, p, files[1], 1)
    rewound = str(tmp_path / "rewound.parquet")
    shutil.copy(files[0], rewound)
    stamp_incarnation(rewound, 1)
    _apply(spark, p, rewound, 2)  # must NOT raise
    st = p._read_incarnation_state()
    assert st["incarnation"] == 1 and st["epoch_id"] == 2
    from openlogreplicator_spark.lake.table import LakeTable

    t = LakeTable.load(spark, p.table_path)
    assert t.snap["summary"].get("incarnation") == 1

    # a stale pre-restore log (incarnation 0, fresh seqs) must now refuse
    with pytest.raises(IncarnationError, match="stale"):
        _apply(spark, p, files[2], 3)


def test_disjoint_epochs_coalesce_without_refusal(spark, events_dir, tmp_path):
    """Disjoint seq slices under one incarnation never trip the guard —
    even OUT OF ORDER (Spark's file stream does not promise seq-ordered
    file delivery) — and touching slices coalesce into one interval."""
    files = _files(events_dir)
    p = _pipeline(spark, events_dir, tmp_path)
    # deliberately unordered: file 1, then 0, then 2
    for i, f in enumerate([files[1], files[0], files[2]]):
        _apply(spark, p, f, i)
        st = p._read_incarnation_state()
        assert st["incarnation"] == 0 and st["epoch_id"] == i
    # the three touching slices merged into one confirmed interval
    assert len(p._read_incarnation_state()["intervals"]) == 1


def test_guard_can_be_disabled(spark, events_dir, tmp_path):
    files = _files(events_dir)
    p = _pipeline(spark, events_dir, tmp_path, incarnation_guard=False)
    _apply(spark, p, files[0], 0)
    rewound = str(tmp_path / "rewound.parquet")
    shutil.copy(files[0], rewound)
    _apply(spark, p, rewound, 1)  # no guard, no raise


def test_streaming_replay_with_guard_stays_green(spark, events_dir, tmp_path):
    """The guard must be invisible on a healthy ordered log: a streaming
    replay (with checkpoint re-delivery suppression) runs clean and the
    state equals a guardless batch replay."""
    ps = _pipeline(spark, events_dir, tmp_path, "s")
    ps.run_available_now(max_files_per_trigger=2)
    pb = _pipeline(spark, events_dir, tmp_path, "b", incarnation_guard=False)
    pb.run_batch_replay()
    s = sorted(map(tuple, ps.target_state().orderBy("url").collect()))
    b = sorted(map(tuple, pb.target_state().orderBy("url").collect()))
    assert s == b


def test_guard_accounting_and_jsonl_rewind_detected_posthoc(
    spark, events_dir, tmp_path
):
    """Round-5 verdict task 6: the guard records HOW each epoch was met
    (guarded / unguarded / disabled — the _schema_gate_stats twin), tags
    every metrics epoch with ``inc_guard``, and a JSONL-sourced rewind —
    invisible to the header-based guard by design — is still detected
    post-hoc by the seq-conflict monitor shape (cdc_incarnation_conflicts)."""
    from pyspark.sql import functions as F

    from openlogreplicator_spark.streaming.sources import (
        jsonl_events,
        write_events_jsonl,
    )

    files = _files(events_dir)
    p = _pipeline(spark, events_dir, tmp_path, "acct")
    _apply(spark, p, files[0], 0)
    _apply(spark, p, files[1], 1)
    assert p._incarnation_gate_stats == {
        "guarded": 2, "unguarded": 0, "disabled": 0,
    }

    # opt-out is counted, not silent
    pd_ = _pipeline(spark, events_dir, tmp_path, "dis", incarnation_guard=False)
    _apply(spark, pd_, files[0], 0)
    assert pd_._incarnation_gate_stats["disabled"] == 1

    # jsonl source: no parquet log headers → the guard skips, loudly
    # accounted, and the metrics epoch carries the tag
    ev = spark.read.schema(EVENTS_DDL).parquet(str(events_dir))
    jl = str(tmp_path / "jl")
    write_events_jsonl(ev, jl)
    pj = CdcPipeline(
        spark, jl, str(tmp_path / "jt"), str(tmp_path / "jc"),
        n_buckets=4, source_format="jsonl",
        metrics_path=str(tmp_path / "jm"),
    )
    pj.run_batch_replay()
    st = pj._incarnation_gate_stats
    assert st["unguarded"] >= 1 and st["guarded"] == 0
    tags = {
        r["inc_guard"]
        for r in spark.read.parquet(str(tmp_path / "jm"))
        .select("inc_guard").distinct().collect()
    }
    assert tags == {"unguarded"}

    # a rewound delivery through jsonl must NOT raise (header-based guard
    # cannot see it) — but the post-hoc monitor provably fires on the data
    lo_seq = ev.agg(F.min("seq")).collect()[0][0]
    conflicted = (
        ev.filter(F.col("seq") <= lo_seq + 50)
        .withColumn("url", F.concat(F.col("url"), F.lit("?branch=2")))
        .withColumn(
            "warc_ts",
            F.col("warc_ts") + F.expr("INTERVAL 1 HOUR"),
        )
    )
    jl2 = str(tmp_path / "jl2")
    write_events_jsonl(ev.unionByName(conflicted), jl2)
    p2 = CdcPipeline(
        spark, jl2, str(tmp_path / "jt2"), str(tmp_path / "jc2"),
        n_buckets=4, source_format="jsonl",
    )
    p2.run_batch_replay()  # no IncarnationError: jsonl epochs are unguarded
    assert p2._incarnation_gate_stats["unguarded"] >= 1

    # monitor shape over the SAME jsonl data: seqs carrying >1 distinct
    # (url, warc_ts) binding — must fire on the branch rows
    back = jsonl_events(spark, jl2).filter(
        F.col("op").isNotNull() & (F.col("op") != "ddl")
        & ~F.col("rolled_back") & F.col("url").isNotNull()
        & F.col("warc_ts").isNotNull()
    )
    n_conf = (
        back.groupBy("seq")
        .agg(
            F.countDistinct(
                F.concat_ws(
                    "|", F.col("url"),
                    F.unix_micros(F.col("warc_ts")).cast("string"),
                )
            ).alias("nb")
        )
        .filter(F.col("nb") > 1)
        .count()
    )
    assert n_conf > 0
