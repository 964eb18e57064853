"""Stratified deterministic sampling + benchmark decontamination operators."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from openlogreplicator_spark.functions.sampling import (
    rate_threshold,
    sample_case_sql,
    stratified_sample,
)
from openlogreplicator_spark.functions.similarity import contamination_overlap


def test_rate_threshold_quantization():
    assert rate_threshold(0.0) == "0000"
    assert rate_threshold(0.5) == "8000"
    assert rate_threshold(0.25) == "4000"
    assert rate_threshold(1.0) == "g"  # sorts above every 4-hex tag
    with pytest.raises(ValueError):
        rate_threshold(1.5)


def test_stratified_sample_deterministic_and_rated(spark):
    rows = [(i, "en" if i % 2 == 0 else "de") for i in range(4000)]
    df = spark.createDataFrame(rows, ["doc_id", "lang"])
    rates = {"en": 0.5, "de": 0.1}
    s1 = stratified_sample(df, "doc_id", "lang", rates, seed="t")
    s2 = stratified_sample(df, "doc_id", "lang", rates, seed="t")
    a = sorted(r["doc_id"] for r in s1.collect())
    assert a == sorted(r["doc_id"] for r in s2.collect())  # deterministic
    by_lang = {r["lang"]: r["n"] for r in s1.groupBy("lang").agg(
        F.count("*").alias("n")).collect()}
    # 2000 per stratum; md5 tags are uniform, so observed rates land near
    # the target (loose 3-sigma-ish bounds)
    assert 870 <= by_lang["en"] <= 1130
    assert 140 <= by_lang["de"] <= 270
    # a different seed selects a different set
    s3 = stratified_sample(df, "doc_id", "lang", rates, seed="u")
    assert sorted(r["doc_id"] for r in s3.collect()) != a


def test_stratified_sample_edge_rates(spark):
    df = spark.createDataFrame(
        [(i, "keep" if i % 2 == 0 else "drop") for i in range(200)],
        ["doc_id", "lang"],
    )
    out = stratified_sample(
        df, "doc_id", "lang", {"keep": 1.0, "drop": 0.0}, default_rate=0.0
    )
    got = sorted(r["doc_id"] for r in out.collect())
    assert got == [i for i in range(200) if i % 2 == 0]


def test_sample_case_sql_mirrors_thresholds():
    sql = sample_case_sql("lang", {"en": 0.5, "de": 0.25}, 0.125)
    assert "WHEN 'en' THEN '8000'" in sql
    assert "WHEN 'de' THEN '4000'" in sql
    assert "ELSE '2000'" in sql


def test_contamination_overlap_counts(spark):
    # doc 1 shares the 5-gram "a b c d e" with bench 100; doc 2 shares two
    # distinct 5-grams with both bench docs; doc 3 shares nothing; doc 4 is
    # too short to form a 5-gram at all.
    corpus = spark.createDataFrame(
        [
            (1, "x a b c d e y"),
            (2, "a b c d e f g"),
            (3, "totally different words here now"),
            (4, "too short"),
        ],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame(
        [(100, "a b c d e"), (101, "b c d e f g")], ["doc_id", "text"]
    )
    out = {
        r["doc_id"]: (r["n_shared_ngrams"], r["n_benchmark_docs_hit"])
        for r in contamination_overlap(corpus, bench, "doc_id", "text", n=5).collect()
    }
    assert out[1] == (1, 1)  # "a b c d e"
    # doc 2 shingles: {a b c d e, b c d e f, c d e f g}; bench 100 has
    # {a b c d e}, bench 101 has {b c d e f, c d e f g}
    assert out[2] == (3, 2)
    assert 3 not in out and 4 not in out


def test_stratified_sample_is_map_side_only(spark):
    df = spark.createDataFrame([(1, "en")], ["doc_id", "lang"])
    plan = (
        stratified_sample(df, "doc_id", "lang", {"en": 0.5}, 0.1)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan  # pure scan -> filter, no shuffle


def test_quantize_int8_roundtrip_bounds(spark):
    from openlogreplicator_spark.functions.similarity import (
        dequantize_int8,
        quantize_int8,
    )

    df = spark.createDataFrame(
        [(1, [1.0, -0.5, 0.25, 127.0]), (2, [0.0, 0.0, 0.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    q = quantize_int8(F.col("embedding"))
    out = df.select(
        "vec_id",
        q["scale"].alias("scale"),
        q["q"].alias("q"),
        dequantize_int8(q).alias("deq"),
        F.col("embedding").cast("array<double>").alias("v"),
    ).collect()
    r1 = {r["vec_id"]: r for r in out}
    assert r1[1]["scale"] == pytest.approx(1.0)  # max|v| = 127 → scale 1
    assert r1[1]["q"] == [1, -1, 0, 127]  # floor quantizer
    # reconstruction error bounded by scale per component
    for v, d in zip(r1[1]["v"], r1[1]["deq"]):
        assert abs(v - d) <= r1[1]["scale"] + 1e-12
    # all-zero vector: guarded scale, exact zero reconstruction
    assert r1[2]["scale"] == pytest.approx(1.0)
    assert r1[2]["deq"] == [0.0, 0.0, 0.0, 0.0]


def test_contamination_uses_broadcast_join(spark):
    corpus = spark.createDataFrame([(1, "a b c d e f")], ["doc_id", "text"])
    bench = spark.createDataFrame([(2, "a b c d e")], ["doc_id", "text"])
    plan = contamination_overlap(corpus, bench)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_quantile_buckets_matches_ntile_and_never_sorts(spark):
    """The two-pass quantile cut (scale path for CCNet bucketing) must agree
    with exact ntile on continuous distinct values, assign buckets
    monotonically in the score, and plan WITHOUT any window/sort — the
    whole point is removing the per-group sort exchange."""
    from pyspark.sql import Window

    from openlogreplicator_spark.functions.sampling import quantile_buckets

    rows = [(g, float(v)) for g in ("en", "de") for v in range(1, 91)]
    df = spark.createDataFrame(rows, "lang string, ce double")
    got = quantile_buckets(df, "lang", "ce", n_buckets=3)

    exact = df.withColumn(
        "bucket",
        F.ntile(3).over(Window.partitionBy("lang").orderBy("ce")),
    )
    got_counts = (
        got.groupBy("lang", "bucket").count().orderBy("lang", "bucket").collect()
    )
    exact_counts = (
        exact.groupBy("lang", "bucket").count().orderBy("lang", "bucket").collect()
    )
    assert [tuple(r) for r in got_counts] == [tuple(r) for r in exact_counts]

    pdf = got.toPandas().sort_values(["lang", "ce"])
    for _, grp in pdf.groupby("lang"):
        assert grp["bucket"].is_monotonic_increasing

    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan and "ntile(" not in plan and "Sort" not in plan, plan


def test_quantile_buckets_keeps_null_groups(spark):
    """NULL part_col rows (undetected-language docs) must be bucketed, not
    silently dropped — the join to the cuts table is null-safe."""
    from openlogreplicator_spark.functions.sampling import quantile_buckets

    rows = [("en", 1.0), ("en", 2.0), ("en", 3.0),
            (None, 1.0), (None, 2.0), (None, 3.0)]
    df = spark.createDataFrame(rows, "lang string, ce double")
    got = quantile_buckets(df, "lang", "ce", n_buckets=3)
    assert got.count() == 6
    nulls = got.filter(F.col("lang").isNull()).orderBy("ce").collect()
    assert [r["bucket"] for r in nulls] == [1, 2, 3]
