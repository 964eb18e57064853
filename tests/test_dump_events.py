"""dump-events debug surface (reference dump-redo-log, Parser.cpp:129-186):
a canonical text rendering of the change log, stable across file layouts —
two replay inputs are equal iff their dumps diff clean."""

from __future__ import annotations

import os
import sys

from openlogreplicator_spark.datagen import GenSpec, write_events

sys.path.insert(
    0, os.path.join(os.path.dirname(__file__), "..", "scripts")
)
from dump_events import dump_lines  # noqa: E402


def test_dump_is_layout_invariant_and_content_sensitive(tmp_path):
    write_events(str(tmp_path / "a"), GenSpec(n_events=300, n_files=2, seed=9))
    write_events(str(tmp_path / "b"), GenSpec(n_events=300, n_files=5, seed=9))
    write_events(str(tmp_path / "c"), GenSpec(n_events=300, n_files=2, seed=10))
    a = list(dump_lines(str(tmp_path / "a")))
    b = list(dump_lines(str(tmp_path / "b")))
    c = list(dump_lines(str(tmp_path / "c")))
    assert a == b  # same log, different file split → identical dump
    assert a != c  # different log → different dump
    assert len(a) >= 300


def test_dump_line_shape_covers_ddl_and_payload_digests(tmp_path):
    write_events(str(tmp_path / "e"), GenSpec(n_events=500, n_files=2, seed=4))
    lines = list(dump_lines(str(tmp_path / "e")))
    assert all(line.startswith("seq=") for line in lines)
    assert any(" op=ddl " in line and " ddl=" in line for line in lines)
    # payload digests, never payload bytes: lines stay short and diffable
    assert all(len(line) < 400 for line in lines)
    # seq is the primary order
    seqs = [int(line[4:14]) for line in lines]
    assert seqs == sorted(seqs)


def test_dump_renders_null_seq_without_error(tmp_path):
    # a row with seq=NULL must format (as -1, matching the sort key's null
    # placement) instead of raising TypeError in the :010d format
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pa.table(
        {
            "seq": pa.array([None, 7], pa.int64()),
            "url": ["https://a/", "https://b/"],
            "op": ["i", "i"],
        }
    )
    pq.write_table(t, str(tmp_path / "ev.parquet"))
    lines = list(dump_lines(str(tmp_path / "ev.parquet")))
    assert len(lines) == 2
    assert lines[0].startswith("seq=-000000001 ")  # null sorts first, renders -1
    assert lines[1].startswith("seq=0000000007 ")
