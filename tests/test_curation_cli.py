"""run_curation.py: the end-to-end curation composition over the driver
testdata — stage counts, dedup invariants, split partitions."""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "scripts"),
)
from run_curation import curate  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(SF_DIR, "documents.parquet")),
    reason="driver testdata not present",
)


def test_curate_end_to_end(spark, tmp_path):
    docs = os.path.join(SF_DIR, "documents.parquet")
    ev = str(tmp_path / "eval.parquet")
    # eval stand-in: every 13th doc (the docs_training_set convention)
    spark.read.parquet(docs).filter(F.col("doc_id") % 13 == 0).write.parquet(ev)
    out = str(tmp_path / "curated")
    report = curate(spark, docs, out, eval_path=ev, near_dup="simhash")

    # stage counts shrink monotonically
    assert (
        report["input"]
        >= report["after_quality"]
        >= report["after_exact_dedup"]
        >= report["after_near_dedup"]
        >= report["after_decontamination"]
        > 0
    )
    # exact dedup kept exactly one row per distinct text of the gated set
    from openlogreplicator_spark.functions import text as TXT

    r = TXT.gopher_rules(F.col("text"))
    gate = (
        r["ok_n_words"] & r["ok_mean_len"] & r["ok_symbols"] & r["ok_alpha"]
    )
    n_distinct = (
        spark.read.parquet(docs).filter(gate).select("text").distinct().count()
    )
    assert report["after_exact_dedup"] == n_distinct

    # written output partitions exist and re-read to the reported counts
    out_df = spark.read.parquet(out)
    assert set(report["splits"]) <= {"train", "valid", "test"}
    assert sum(report["splits"].values()) == report["after_decontamination"]
    assert out_df.count() == report["after_decontamination"]

    # no near-dup pair survives inside the curated set
    from openlogreplicator_spark.functions import similarity as S

    residual = S.simhash_near_dup_pairs(
        out_df, "doc_id", "text", max_hamming=3
    ).count()
    assert residual == 0


def test_curate_without_optional_stages(spark, tmp_path):
    docs = os.path.join(SF_DIR, "documents.parquet")
    out = str(tmp_path / "curated2")
    report = curate(spark, docs, out, eval_path=None, near_dup="none")
    assert "after_near_dedup" not in report
    assert "after_decontamination" not in report
    assert sum(report["splits"].values()) == report["after_exact_dedup"]
