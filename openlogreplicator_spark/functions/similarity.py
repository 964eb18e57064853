"""Similarity / near-duplicate primitives over documents and embeddings:
MinHash+LSH, SimHash, n-gram Jaccard, cosine similarity — the dedup and
ANN toolkit a training-data pipeline needs at 100 TB (task brief; these are
first-class operators alongside the CDC core).

Design for scale:
* MinHash/LSH and the banded candidate join are pure DataFrame ops — explode →
  partial-aggregated groupBy (map-side combine) → equi-join on band hash. No
  O(n²) pair enumeration: candidates only form inside a band bucket.
* Hashing is md5-based so the DuckDB oracle reproduces signatures exactly
  (xxhash64 has no DuckDB twin).
* SimHash uses a vectorized pandas UDF (bit-twiddling has no clean SQL form)
  — Arrow-batched, never per-row Python (input_hint).
* Cosine = JVM-side higher-order functions (zip_with/aggregate); the
  brute-force top-k is the correctness baseline, the sign-projection bucketed
  variant is the scale path (bucket first, search within bucket).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType

# ------------------------------------------------------------------ tokens


def tokens(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Distinct (id, token) pairs, whitespace tokenization on lower(text)."""
    return (
        df.select(
            F.col(id_col),
            F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias("token"),
        )
        .filter(F.length("token") > 0)
        .distinct()
    )


# ------------------------------------------------------------------ minhash


def minhash_signature(
    tok: DataFrame, id_col: str, n_hashes: int = 4
) -> DataFrame:
    """k-MinHash signature per id: h_k = min over tokens of md5(token||'#'||k).

    Partial aggregation makes this one shuffle regardless of document length.
    """
    aggs = [
        F.min(F.md5(F.concat(F.col("token"), F.lit(f"#{k}")))).alias(f"h{k}")
        for k in range(n_hashes)
    ]
    return tok.groupBy(id_col).agg(*aggs)


def minhash_bands(sig: DataFrame, id_col: str, n_hashes: int = 4, band_size: int = 2) -> DataFrame:
    """Explode a signature into LSH band hashes: band_b = md5(h_i||h_j...)."""
    bands = [
        F.md5(F.concat(*[F.col(f"h{k}") for k in range(b, b + band_size)])).alias("band_hash")
        for b in range(0, n_hashes, band_size)
    ]
    pairs = F.array(*[
        F.struct(F.lit(i).alias("band_id"), bands[i].alias("band_hash"))
        for i in range(len(bands))
    ])
    return sig.select(
        F.col(id_col), F.explode(pairs).alias("b")
    ).select(id_col, F.col("b.band_id"), F.col("b.band_hash"))


def minhash_candidate_pairs(
    df: DataFrame, id_col: str, text_col: str, n_hashes: int = 4, band_size: int = 2
) -> DataFrame:
    """Near-dup candidate pairs (a < b) sharing at least one LSH band."""
    b = minhash_bands(minhash_signature(tokens(df, id_col, text_col), id_col),
                      id_col, n_hashes, band_size)
    left = b.select(F.col(id_col).alias("a"), "band_id", "band_hash")
    right = b.select(F.col(id_col).alias("b"), "band_id", "band_hash")
    return (
        left.join(right, ["band_id", "band_hash"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


# ------------------------------------------------------------------ jaccard


def jaccard_pairs(
    df: DataFrame, candidates: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Exact token-set Jaccard for candidate pairs only (never all-pairs)."""
    tok = tokens(df, id_col, text_col)
    ta = tok.select(F.col(id_col).alias("a"), F.col("token"))
    tb = tok.select(F.col(id_col).alias("b"), F.col("token"))
    sizes = tok.groupBy(id_col).agg(F.count("*").alias("n"))
    inter = (
        candidates.join(ta, "a").join(tb, ["b", "token"])
        .groupBy("a", "b")
        .agg(F.count("*").alias("n_inter"))
    )
    return (
        inter.join(sizes.select(F.col(id_col).alias("a"), F.col("n").alias("na")), "a")
        .join(sizes.select(F.col(id_col).alias("b"), F.col("n").alias("nb")), "b")
        .select(
            "a", "b",
            (F.col("n_inter") / (F.col("na") + F.col("nb") - F.col("n_inter"))).alias("jaccard"),
        )
    )


# ------------------------------------------------------------------ simhash


def _simhash_batch(texts: pd.Series) -> pd.Series:
    """64-bit SimHash per text: sign-sum of md5-derived token hashes.
    Vectorized per Arrow batch; md5 keeps it deterministic everywhere."""
    shifts = np.arange(64, dtype=np.uint64)
    out = np.zeros(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        if t is None:
            continue
        toks = set(str(t).lower().split())
        if not toks:
            continue
        votes = np.zeros(64, dtype=np.int64)
        for tk in toks:
            h = np.uint64(int.from_bytes(hashlib.md5(tk.encode()).digest()[:8], "big"))
            votes += 2 * ((h >> shifts) & np.uint64(1)).astype(np.int64) - 1
        sig = int(np.packbits((votes > 0).astype(np.uint8), bitorder="little").view(np.uint64)[0])
        out[i] = sig - (1 << 64) if sig >= (1 << 63) else sig
    return pd.Series(out)


simhash_udf = pandas_udf(_simhash_batch, LongType())


def with_simhash(df: DataFrame, text_col: str, out_col: str = "simhash") -> DataFrame:
    return df.withColumn(out_col, simhash_udf(F.col(text_col)))


def simhash_near_dup_pairs(df: DataFrame, id_col: str, text_col: str,
                           max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by SimHash: block on 16-bit chunks (a pair within
    hamming distance 3 must agree on at least one of 4 chunks — pigeonhole),
    then verify the exact distance inside each block. No all-pairs join."""
    s = with_simhash(df.select(id_col, text_col), text_col)
    chunks = F.array(*[
        F.struct(
            F.lit(c).alias("chunk_id"),
            F.shiftrightunsigned(F.col("simhash"), c * 16).bitwiseAND(F.lit(0xFFFF)).alias("chunk"),
        )
        for c in range(4)
    ])
    blocked = s.select(id_col, "simhash", F.explode(chunks).alias("c")).select(
        id_col, "simhash", F.col("c.chunk_id"), F.col("c.chunk")
    )
    left = blocked.select(F.col(id_col).alias("a"), F.col("simhash").alias("sh_a"),
                          "chunk_id", "chunk")
    right = blocked.select(F.col(id_col).alias("b"), F.col("simhash").alias("sh_b"),
                           "chunk_id", "chunk")
    return (
        left.join(right, ["chunk_id", "chunk"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


# ------------------------------------------------------------------- cosine


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<float/double> columns — JVM higher-order
    functions, no UDF."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    norm = lambda v: F.sqrt(  # noqa: E731
        F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )
    return dot / (norm(a) * norm(b))


def brute_force_topk(
    emb: DataFrame, queries: DataFrame, id_col: str = "vec_id",
    vec_col: str = "embedding", k: int = 5,
) -> DataFrame:
    """Baseline ANN: broadcast the (small) query set against all vectors,
    exact cosine, top-k per query. The scale path is lsh_bucketed_topk."""
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"))
    scored = (
        emb.join(F.broadcast(q), F.col(id_col) != F.col("query_id"))
        .select("query_id", id_col, cosine(F.col("qvec"), F.col(vec_col)).alias("cosine"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.col(id_col))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


# ---------------------------------------------------------------- IVF ANN


def _centroid_literal(c: list[float]) -> Column:
    return F.array(*[F.lit(float(x)) for x in c])


def _scored_cells(vec: Column, centroids: list[list[float]]) -> Column:
    """array<struct<d,cid>> of (negated cosine, cell id) — cast to a named
    struct type (F.array normalizes away field aliases otherwise)."""
    return F.array(*[
        F.struct((-cosine(vec, _centroid_literal(c))).alias("d"),
                 F.lit(i).alias("cid")).cast("struct<d:double,cid:int>")
        for i, c in enumerate(centroids)
    ])


def _nearest_centroid(vec: Column, centroids: list[list[float]]) -> Column:
    """argmin over centroid cosine distances, as one expression (centroids
    are driver-side constants — k×dim literals, no join)."""
    return F.array_min(_scored_cells(vec, centroids))["cid"]


def kmeans_fit(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding",
    k: int = 8, iters: int = 4,
) -> list[list[float]]:
    """Deterministic mini k-means (IVF coarse quantizer): init = the k
    vectors with smallest md5(id) (seedless, replay-stable), then Lloyd
    iterations as DataFrame jobs — only the k×dim centroid matrix ever
    reaches the driver, the corpus never moves."""
    init = (
        emb.select(id_col, vec_col)
        .orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
        .limit(k)
        .collect()
    )
    centroids = [[float(x) for x in r[vec_col]] for r in init]
    for _ in range(iters):
        assigned = emb.select(
            _nearest_centroid(F.col(vec_col), centroids).alias("cid"),
            F.posexplode(vec_col).alias("pos", "val"),
        )
        rows = (
            assigned.groupBy("cid", "pos")
            .agg(F.avg("val").alias("v"))
            .groupBy("cid")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "v"))).alias("vs"))
            .collect()
        )
        new = {r["cid"]: [float(p["v"]) for p in r["vs"]] for r in rows}
        centroids = [new.get(i, centroids[i]) for i in range(k)]
    return centroids


def ivf_topk(
    emb: DataFrame, queries: DataFrame, centroids: list[list[float]],
    id_col: str = "vec_id", vec_col: str = "embedding",
    k: int = 5, nprobe: int = 2,
) -> DataFrame:
    """IVF search: score only vectors whose cell is among the query's nprobe
    nearest cells — an equi-join on cell id, no corpus broadcast, no n²."""
    probe_cells = F.slice(
        F.array_sort(_scored_cells(F.col(vec_col), centroids)), 1, nprobe
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        F.explode(F.transform(probe_cells, lambda s: s["cid"])).alias("cid"),
    )
    indexed = emb.select(
        id_col, vec_col, _nearest_centroid(F.col(vec_col), centroids).alias("cid")
    )
    scored = (
        indexed.join(q, "cid")
        .filter(F.col(id_col) != F.col("query_id"))
        .select("query_id", id_col, cosine(F.col("qvec"), F.col(vec_col)).alias("cosine"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.col(id_col))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def sign_projection_bucket(vec: Column, dim_pairs: list[tuple[int, int]]) -> Column:
    """Deterministic LSH bucket id: sign bits of coordinate-difference
    projections (element_at is 1-indexed, matching DuckDB list indexing)."""
    bucket = F.lit(0)
    for bit, (i, j) in enumerate(dim_pairs):
        sign = (F.element_at(vec, i) > F.element_at(vec, j)).cast("int")
        bucket = bucket + sign * F.lit(2**bit)
    return bucket.alias("bucket")


def lsh_bucketed_topk(
    emb: DataFrame, queries: DataFrame, id_col: str = "vec_id",
    vec_col: str = "embedding", k: int = 5,
    dim_pairs: list[tuple[int, int]] | None = None,
) -> DataFrame:
    """Scale-path ANN: bucket vectors by sign projections, search only the
    query's bucket. Approximate (recall < 1) but the join is equi on bucket —
    shuffle-partitionable, no broadcast of the corpus."""
    dim_pairs = dim_pairs or [(1, 2), (3, 4), (5, 6), (7, 8)]
    bucketed = emb.withColumn("bucket", sign_projection_bucket(F.col(vec_col), dim_pairs))
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        sign_projection_bucket(F.col(vec_col), dim_pairs).alias("bucket"),
    )
    scored = (
        bucketed.join(q, "bucket")
        .filter(F.col(id_col) != F.col("query_id"))
        .select("query_id", id_col, cosine(F.col("qvec"), F.col(vec_col)).alias("cosine"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.col(id_col))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )
