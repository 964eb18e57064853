"""Multi-regime golden sweep (SURVEY.md §5 generalized): the fixed seed-42
fixture exercises one generator regime; the reference's differential-oracle
strategy (dump-diff against the known-good replay, Parser.cpp) only has
teeth if it holds across regimes. Each case varies the knobs that stress a
DIFFERENT code path — out-of-order density (LWW total order), rollback
share (A2 exclusion), hot-key skew (salting/partial-agg), file granularity
(epoch boundaries + DDL placement), no-DDL logs (evolution pre-gate's
nothing-to-do path) — and both merge modes must land bit-identical to the
pure-pandas replayer."""

from __future__ import annotations

import glob
import os

import pandas as pd
import pytest

from openlogreplicator_spark.datagen import GenSpec, write_events
from openlogreplicator_spark.operators.decode import EVENTS_DDL
from openlogreplicator_spark.replayer import replay
from openlogreplicator_spark.streaming.pipeline import CdcPipeline

SPECS = {
    "ooo_heavy": GenSpec(seed=7, n_events=2500, n_urls=200, n_files=5,
                         ooo_share=0.45, ooo_window=1200),
    "rollback_heavy": GenSpec(seed=11, n_events=2500, n_urls=200, n_files=5,
                              rollback_share=0.25),
    "hot_skew": GenSpec(seed=13, n_events=2500, n_urls=400, n_files=4,
                        hot_share=0.60),
    "many_tiny_files": GenSpec(seed=17, n_events=1800, n_urls=150, n_files=18),
    "no_ddl": GenSpec(seed=19, n_events=2000, n_urls=250, n_files=4,
                      with_ddl=False),
}


@pytest.mark.parametrize("name", sorted(SPECS))
@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_golden_across_generator_regimes(spark, tmp_path, name, mode):
    spec = SPECS[name]
    d = str(tmp_path / "events")
    write_events(d, spec)
    import pyarrow.dataset as ds

    pdf = ds.dataset(d, format="parquet").to_table().to_pandas()
    golden = replay(pdf)

    p = CdcPipeline(
        spark, d, str(tmp_path / "t"), str(tmp_path / "c"),
        merge_mode=mode, compact_every=0,
    )
    for i, f in enumerate(sorted(glob.glob(os.path.join(d, "*.parquet")))):
        p.apply_epoch(spark.read.schema(EVENTS_DDL).parquet(f), epoch_id=i)
    got = (
        p.target_state().toPandas()
        .sort_values("url", kind="stable").reset_index(drop=True)
    )
    assert list(got["url"]) == list(golden["url"]), name
    assert list(got["text"]) == list(golden["text"]), name
    assert [bytes(h) for h in got["html"]] == [bytes(h) for h in golden["html"]]
    got_ts = pd.to_datetime(got["warc_ts"], utc=True)
    want_ts = pd.to_datetime(golden["warc_ts"], utc=True)
    assert (got_ts.values == want_ts.values).all(), name
    if spec.with_ddl:
        assert got["http_status"].astype("Int64").equals(
            golden["http_status"].astype("Int64")
        ), name
