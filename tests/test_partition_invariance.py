"""Partition-invariance differential tests: the dedup / ANN candidate
generators must produce the IDENTICAL result set no matter how the input
is partitioned — on a 1000-executor cluster the planner, AQE, and file
splits all change task boundaries freely, so any partition-order
sensitivity (a non-deterministic tiebreak, a per-partition RNG, an
accumulator folded in task order) is silent corruption at scale. These
tests re-run the same operator under coprime repartitionings and require
set equality, the local stand-in for shuffle-topology independence."""

import os

import pytest
from pyspark.sql import functions as F

from openlogreplicator_spark.functions import similarity as S

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(SF_DIR, "documents.parquet")),
    reason="driver testdata not present",
)


def _docs(spark, n_parts):
    return (
        spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
        .limit(400)
        .repartition(n_parts)
    )


def _emb(spark, n_parts):
    return (
        spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
        .filter(F.col("vec_id") < 400)
        .repartition(n_parts)
    )


def _pairs(df):
    return set(map(tuple, df.select("a", "b").collect()))


def test_minhash_pairs_partition_invariant(spark):
    a = _pairs(S.minhash_candidate_pairs(_docs(spark, 3), "doc_id", "text"))
    b = _pairs(S.minhash_candidate_pairs(_docs(spark, 11), "doc_id", "text"))
    assert a == b and a


def test_simhash_pairs_partition_invariant(spark):
    a = _pairs(S.simhash_near_dup_pairs(_docs(spark, 3), "doc_id", "text"))
    b = _pairs(S.simhash_near_dup_pairs(_docs(spark, 11), "doc_id", "text"))
    assert a == b and a


def test_lsh_pairs_partition_invariant(spark):
    a = _pairs(S.lsh_candidate_pairs(_emb(spark, 3)))
    b = _pairs(S.lsh_candidate_pairs(_emb(spark, 11)))
    assert a == b and a


def test_ivf_assignment_partition_invariant(spark):
    """IVF cell assignment is a map-side argmin against a broadcast
    centroid matrix — identical per row regardless of task boundaries."""
    emb3, emb11 = _emb(spark, 3), _emb(spark, 11)
    cents = [
        r.embedding
        for r in emb3.select("vec_id", "embedding")
        .orderBy(F.md5(F.col("vec_id").cast("string")))
        .limit(4)
        .collect()
    ]
    from openlogreplicator_spark.functions.similarity import centroid_topn_udf

    def assign(e):
        udf = centroid_topn_udf([list(map(float, c)) for c in cents])
        return {
            (r.vec_id, tuple(r.cell))
            for r in e.select(
                "vec_id", udf(F.col("embedding")).alias("cell")
            ).collect()
        }

    assert assign(emb3) == assign(emb11)
