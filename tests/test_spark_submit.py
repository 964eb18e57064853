"""Deployment-shape evidence for the north rule's literal run mode:
`spark-submit --py-files olr_spark.zip scripts/run_pipeline.py ...`.

The script and zip are copied to a temp directory OUTSIDE the repo before
launching, so `import openlogreplicator_spark` can only resolve from the
--py-files zip — exactly what a real cluster submit exercises (executors
and driver unpack the zip; nothing on PYTHONPATH). Both replay modes run:
plain batch and the streaming available-now drain with checkpoint commit.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit")

pytestmark = pytest.mark.skipif(
    SPARK_SUBMIT is None, reason="spark-submit not on PATH"
)


def _submit(work: str, events: str, target: str, *extra: str) -> str:
    cmd = [
        SPARK_SUBMIT, "--master", "local[4]",
        "--py-files", os.path.join(work, "olr_spark.zip"),
        os.path.join(work, "run_pipeline.py"),
        "--events", events,
        "--table", target,
        "--checkpoint", target + "_ckpt",
        *extra,
    ]
    r = subprocess.run(
        cmd, capture_output=True, text=True, cwd=work, timeout=300,
        env={**os.environ, "PYTHONPATH": ""},
    )
    assert r.returncode == 0, r.stderr[-3000:]
    return r.stdout


@pytest.fixture(scope="module")
def submit_work(tmp_path_factory, events_dir):
    work = str(tmp_path_factory.mktemp("submit"))
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "run_pipeline.py"),
         "--make-pyfiles", os.path.join(work, "olr_spark.zip")],
        capture_output=True, text=True, cwd=REPO,
    )
    assert r.returncode == 0, r.stderr
    shutil.copy(os.path.join(REPO, "scripts", "run_pipeline.py"), work)
    return work


def _golden_rows(events_pdf) -> int:
    from openlogreplicator_spark.replayer import replay

    return len(replay(events_pdf))


def test_spark_submit_batch_replay(submit_work, events_dir, events_pdf):
    out = _submit(
        submit_work, events_dir, os.path.join(submit_work, "t_batch")
    )
    assert f"final state rows: {_golden_rows(events_pdf)}" in out, out[-500:]


def test_spark_submit_streaming_replay(submit_work, events_dir, events_pdf):
    out = _submit(
        submit_work, events_dir, os.path.join(submit_work, "t_stream"),
        "--streaming", "--max-files-per-trigger", "2",
    )
    assert f"final state rows: {_golden_rows(events_pdf)}" in out, out[-500:]


def test_spark_submit_wap_stage_then_publish(submit_work, events_dir, events_pdf):
    """The WAP ops flow through the literal deployment shape: one submit
    stages the whole replay on a branch and publishes after the audit;
    main carries the golden state afterwards (verified by a second,
    no-op submit whose exactly-once gate suppresses every epoch)."""
    target = os.path.join(submit_work, "t_wap")
    out = _submit(
        submit_work, events_dir, target,
        "--streaming", "--max-files-per-trigger", "2",
        "--branch", "audit", "--publish",
    )
    assert "published branch 'audit'" in out, out[-500:]
    assert f"final state rows: {_golden_rows(events_pdf)}" in out, out[-500:]
    # re-submit on main: everything already confirmed -> same state, no-op
    out2 = _submit(submit_work, events_dir, target, "--streaming")
    assert f"final state rows: {_golden_rows(events_pdf)}" in out2, out2[-500:]
