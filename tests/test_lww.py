"""LWW compaction: the three implementations agree, and the result is
invariant to salt count and partition count — the precondition for the
scaling-efficiency criterion (same answer at local[8] and local[32])."""

import pandas as pd
import pytest

from openlogreplicator_spark.operators.lww import (
    lww_compact,
    lww_compact_salted,
    lww_compact_semijoin,
    lww_compact_window,
)


@pytest.fixture(scope="module")
def dml_df(spark, events_pdf):
    pdf = events_pdf[(events_pdf["op"] != "ddl") & (~events_pdf["rolled_back"])]
    pdf = pdf[["url", "warc_ts", "seq", "op", "text"]].rename(columns={"seq": "_seq"})
    return spark.createDataFrame(pdf).cache()


def _key(df):
    pdf = df.toPandas().sort_values("url").reset_index(drop=True)
    return pdf[["url", "warc_ts", "_seq", "op", "text"]]


def test_five_impls_agree(dml_df):
    from openlogreplicator_spark.operators.lww import lww_compact_grouped_pandas

    a = _key(lww_compact(dml_df, "url", ("warc_ts", "_seq")))
    b = _key(lww_compact_salted(dml_df, "url", ("warc_ts", "_seq"), n_salts=8))
    c = _key(lww_compact_window(dml_df, "url", ("warc_ts", "_seq")))
    d = _key(lww_compact_semijoin(dml_df, "url", ("warc_ts", "_seq")))
    e = _key(lww_compact_grouped_pandas(dml_df, "url", ("warc_ts", "_seq")))
    pd.testing.assert_frame_equal(a, b)
    pd.testing.assert_frame_equal(a, c)
    pd.testing.assert_frame_equal(a, d)
    pd.testing.assert_frame_equal(a, e)


@pytest.mark.parametrize("n_salts", [1, 3, 32])
def test_salt_count_invariance(dml_df, n_salts):
    base = _key(lww_compact(dml_df, "url", ("warc_ts", "_seq")))
    salted = _key(lww_compact_salted(dml_df, "url", ("warc_ts", "_seq"), n_salts=n_salts))
    pd.testing.assert_frame_equal(base, salted)


@pytest.mark.parametrize("nparts", [1, 7, 32])
def test_partition_count_invariance(dml_df, nparts):
    base = _key(lww_compact(dml_df, "url", ("warc_ts", "_seq")))
    rep = _key(lww_compact(dml_df.repartition(nparts), "url", ("warc_ts", "_seq")))
    pd.testing.assert_frame_equal(base, rep)


def test_one_row_per_key_and_winner_semantics(dml_df):
    out = lww_compact(dml_df, "url", ("warc_ts", "_seq")).toPandas()
    assert out["url"].is_unique
    src = dml_df.toPandas().sort_values(["warc_ts", "_seq"], kind="stable")
    winners = src.groupby("url").tail(1).set_index("url")
    for _, r in out.iterrows():
        w = winners.loc[r["url"]]
        assert (r["warc_ts"], r["_seq"]) == (w["warc_ts"], w["_seq"])


def test_plan_is_two_phase_partial_agg(dml_df):
    """The built-in path must plan partial+final hash aggregation (map-side
    combine before the shuffle) — the property that makes hot keys cheap."""
    plan = lww_compact(dml_df, "url", ("warc_ts", "_seq"))._jdf.queryExecution().executedPlan().toString()
    assert "max_by" in plan
    n_aggs = plan.count("HashAggregate") + plan.count("ObjectHashAggregate") + plan.count("SortAggregate")
    assert n_aggs >= 2, plan


def test_auto_strategy_selects_by_winner_budget(dml_df):
    """lww_compact_auto (round-1 verdict task 6): one entry point exercising
    both plans — semijoin under the broadcast budget, salted above it — with
    identical results either way."""
    from openlogreplicator_spark.operators.lww import (
        choose_lww_strategy,
        lww_compact_auto,
    )

    n_keys = dml_df.select("url").distinct().count()
    # generous budget -> semijoin; tiny budget -> salted
    assert choose_lww_strategy(dml_df, "url", broadcast_budget_keys=10 * n_keys) == "semijoin"
    assert choose_lww_strategy(dml_df, "url", broadcast_budget_keys=max(1, n_keys // 10)) == "salted"
    # approx_rows short-circuit: total rows under budget needs no estimate job
    assert choose_lww_strategy(
        dml_df, "url", broadcast_budget_keys=10**9, approx_rows=1000
    ) == "semijoin"
    base = _key(lww_compact(dml_df, "url", ("warc_ts", "_seq")))
    via_semi = _key(lww_compact_auto(dml_df, "url", ("warc_ts", "_seq"),
                                     broadcast_budget_keys=10 * n_keys))
    via_salted = _key(lww_compact_auto(dml_df, "url", ("warc_ts", "_seq"),
                                       broadcast_budget_keys=max(1, n_keys // 10)))
    pd.testing.assert_frame_equal(base, via_semi)
    pd.testing.assert_frame_equal(base, via_salted)


def test_pipeline_auto_strategy_matches_golden(spark, events_dir, tmp_path):
    """CdcPipeline(lww_strategy='auto') reaches the same final state."""
    from openlogreplicator_spark.streaming.pipeline import CdcPipeline

    p_auto = CdcPipeline(spark, events_dir, str(tmp_path / "ta"), str(tmp_path / "ca"),
                         lww_strategy="auto")
    p_auto.run_batch_replay()
    p_ref = CdcPipeline(spark, events_dir, str(tmp_path / "tr"), str(tmp_path / "cr"))
    p_ref.run_batch_replay()
    a = p_auto.target_state().toPandas().sort_values("url").reset_index(drop=True)
    r = p_ref.target_state().toPandas().sort_values("url").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, r)
