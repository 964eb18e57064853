"""Unit tests for the text-analysis and similarity function layers."""

import hashlib

import pandas as pd
import pytest
from pyspark.sql import functions as F

from openlogreplicator_spark.functions import similarity as S
from openlogreplicator_spark.functions import text as TXT

DOCS = [
    (1, "The cat and the dog walked over the bridge."),
    (2, "The cat and the dog walked over the bridge."),  # exact dup of 1
    (3, "The cat and the dog walked over the old bridge."),  # near dup of 1
    (4, "Der Hund und die Katze liefen über der Brücke und der Straße."),
    (5, "completely different text about spark engines and shuffles, ok?"),
    (6, ""),
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id int, text string").cache()


def test_token_count(spark, docs_df):
    out = {r["doc_id"]: r["n"] for r in
           docs_df.select("doc_id", TXT.token_count(F.col("text")).alias("n")).collect()}
    assert out[1] == 9
    assert out[6] == 0
    assert out[5] == 9


def test_occurrence_count_matches_python(spark, docs_df):
    out = {r["doc_id"]: r["n"] for r in docs_df.select(
        "doc_id", TXT.occurrence_count(TXT.padded(F.col("text")), " the ").alias("n")
    ).collect()}
    for doc_id, text in DOCS:
        padded = f" {text.lower()} "
        assert out[doc_id] == padded.count(" the "), (doc_id, text)


def test_predicted_lang(spark, docs_df):
    out = {r["doc_id"]: r["p"] for r in
           docs_df.select("doc_id", TXT.predicted_lang(F.col("text")).alias("p")).collect()}
    assert out[1] == "en"
    assert out[4] == "de"
    assert out[6] == "und"


def test_quality_score_range(spark, docs_df):
    vals = [r["q"] for r in
            docs_df.select(TXT.quality_score(F.col("text")).alias("q")).collect()]
    assert all(v in (0.0, 0.5, 1.0) for v in vals)


def test_fingerprint_normalizes_case_and_ws(spark):
    df = spark.createDataFrame(
        [(1, "Hello   World"), (2, "hello world"), (3, "hello  world  ")],
        "doc_id int, text string",
    )
    fps = [r["f"] for r in
           df.select(TXT.normalized_fingerprint(F.col("text")).alias("f")).collect()]
    assert fps[0] == fps[1] == fps[2]


def test_minhash_exact_dups_always_pair(spark, docs_df):
    pairs = {(r["a"], r["b"]) for r in
             S.minhash_candidate_pairs(docs_df, "doc_id", "text").collect()}
    assert (1, 2) in pairs  # identical token sets share every band
    assert (1, 3) in pairs or (2, 3) in pairs  # near-dup likely shares a band


def test_jaccard_values(spark, docs_df):
    cand = spark.createDataFrame([(1, 2), (1, 3), (1, 5)], "a int, b int")
    out = {(r["a"], r["b"]): r["jaccard"] for r in
           S.jaccard_pairs(docs_df, cand, "doc_id", "text").collect()}
    assert out[(1, 2)] == 1.0
    assert 0.5 < out[(1, 3)] < 1.0
    assert out.get((1, 5), 0.0) < 0.2


def test_simhash_matches_reference_impl(spark, docs_df):
    rows = S.with_simhash(docs_df, "text").collect()
    got = {r["doc_id"]: r["simhash"] for r in rows}
    # identical texts -> identical signatures
    assert got[1] == got[2]
    # python reference for doc 5 (independent re-implementation)
    toks = set(DOCS[4][1].lower().split())
    votes = [0] * 64
    for tk in toks:
        h = int.from_bytes(hashlib.md5(tk.encode()).digest()[:8], "big")
        for b in range(64):
            votes[b] += 1 if (h >> b) & 1 else -1
    sig = sum(1 << b for b in range(64) if votes[b] > 0)
    sig = sig - (1 << 64) if sig >= (1 << 63) else sig
    assert got[5] == sig


def test_simhash_near_dup_blocking(spark, docs_df):
    pairs = {(r["a"], r["b"]): r["hamming"] for r in
             S.simhash_near_dup_pairs(docs_df, "doc_id", "text", max_hamming=10).collect()}
    assert pairs.get((1, 2)) == 0
    assert (1, 5) not in pairs


def test_cosine_known_vectors(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 0.0], [0.0, 1.0]), (2, [1.0, 1.0], [1.0, 1.0]), (3, [1.0, 0.0], [1.0, 1.0])],
        "id int, a array<double>, b array<double>",
    )
    out = {r["id"]: r["c"] for r in
           df.select("id", S.cosine(F.col("a"), F.col("b")).alias("c")).collect()}
    assert abs(out[1]) < 1e-12
    assert abs(out[2] - 1.0) < 1e-12
    assert abs(out[3] - 0.7071067811865475) < 1e-12


def test_lsh_topk_subset_of_bucket(spark):
    import numpy as np

    rng = np.random.default_rng(0)
    vecs = [(i, [float(x) for x in rng.standard_normal(16)]) for i in range(200)]
    emb = spark.createDataFrame(vecs, "vec_id int, embedding array<double>")
    out = S.lsh_bucketed_topk(emb, emb.filter(F.col("vec_id") < 2), k=3).toPandas()
    assert (out.groupby("query_id").size() <= 3).all()
    # every result shares the query's bucket
    b = emb.withColumn("bucket", S.sign_projection_bucket(F.col("embedding"),
                                                          [(1, 2), (3, 4), (5, 6), (7, 8)])).toPandas()
    buckets = dict(zip(b["vec_id"], b["bucket"]))
    for _, r in out.iterrows():
        assert buckets[r["vec_id"]] == buckets[r["query_id"]]


def test_ivf_ann_recall_and_determinism(spark):
    import numpy as np

    rng = np.random.default_rng(7)
    # clustered data so IVF cells are meaningful
    centers = rng.standard_normal((4, 12)) * 3
    vecs = []
    for i in range(400):
        c = centers[i % 4]
        v = c + rng.standard_normal(12) * 0.3
        vecs.append((i, [float(x) for x in v]))
    emb = spark.createDataFrame(vecs, "vec_id int, embedding array<double>").cache()
    cents = S.kmeans_fit(emb, k=4, iters=3)
    assert len(cents) == 4 and all(len(c) == 12 for c in cents)
    # determinism: same input -> same centroids, regardless of partitioning
    cents2 = S.kmeans_fit(emb.repartition(9), k=4, iters=3)
    for a, b in zip(cents, cents2):
        assert all(abs(x - y) < 1e-9 for x, y in zip(a, b))

    # round_dp mode (the SQL-oracled trajectory): EXACT replay-stability —
    # rounded means are bit-identical across partitionings, and on clustered
    # data the rounded fit lands on the same clustering as the unrounded one
    r1 = S.kmeans_fit(emb, k=4, iters=2, round_dp=6)
    r2 = S.kmeans_fit(emb.repartition(9), k=4, iters=2, round_dp=6)
    assert r1 == r2
    a_r = S.centroid_topn_udf(r1, 1, round_dp=6)
    a_u = S.centroid_topn_udf(S.kmeans_fit(emb, k=4, iters=2), 1)
    both = emb.select(
        F.element_at(a_r(F.col("embedding")), 1).alias("cr"),
        F.element_at(a_u(F.col("embedding")), 1).alias("cu"),
    )
    assert both.filter(F.col("cr") != F.col("cu")).count() == 0
    assert both.count() == 400

    queries = emb.filter(F.col("vec_id") < 5)
    ivf = S.ivf_topk(emb, queries, cents, k=5, nprobe=2).toPandas()
    brute = S.brute_force_topk(emb, queries, k=5).toPandas()
    # recall@5 against brute force should be high on clustered data
    hits = 0
    for qid in range(5):
        got = set(ivf[ivf["query_id"] == qid]["vec_id"])
        want = set(brute[brute["query_id"] == qid]["vec_id"])
        hits += len(got & want)
    assert hits / 25 >= 0.8, hits


def test_ngram_jaccard_near_dup(spark):
    from openlogreplicator_spark.functions.similarity import (
        ngram_jaccard_near_dup,
        token_ngrams,
    )

    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),   # near-dup of 1
        (3, "completely different text about spark engines here"),
        (4, "xy"),                                            # < 3 tokens
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    sh = token_ngrams(df, "doc_id", "text", n=3).toPandas()
    assert len(sh[sh.doc_id == 1]) == 7   # 9 tokens -> 7 windows
    assert len(sh[sh.doc_id == 4]) == 0   # strict: short docs yield none
    got = ngram_jaccard_near_dup(
        df, "doc_id", "text", n=3, max_doc_freq=64, min_jaccard=0.3
    ).toPandas()
    assert set(zip(got["a"], got["b"])) == {(1, 2)}
    # |A∩B| = 6 shared windows, union = 8 -> 0.75... wait: docs differ in last
    # token, so windows touching it differ: shared = 6 of 7 -> j = 6/8
    assert abs(float(got["jaccard"].iloc[0]) - 6 / 8) < 1e-9
    # DF cap: with max_doc_freq=1 every shared shingle is "hot" -> no pairs
    none = ngram_jaccard_near_dup(
        df, "doc_id", "text", n=3, max_doc_freq=1, min_jaccard=0.3
    ).count()
    assert none == 0


# ------------------------------------------------- connected components


def _uf_components(pairs):
    """Union-find ground truth: node -> min id in its component."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


@pytest.mark.parametrize("pairs", [
    [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (6, 7)],       # long chain
    [(1, 2), (2, 3), (3, 1), (10, 11), (12, 13), (11, 12)],  # cycle + chain
    [(5, 1), (2, 6), (7, 3)],                                # disjoint pairs
    [(1, 2), (1, 3), (1, 4), (9, 4)],                        # star + bridge
    [],
])
def test_connected_components_matches_union_find(spark, pairs):
    df = spark.createDataFrame(pairs or [(0, 0)], "a int, b int")
    if not pairs:
        df = df.filter("a != a")
    got = {r["id"]: r["component"]
           for r in S.connected_components(df).collect()}
    assert got == _uf_components(pairs)


def test_connected_components_adversarial_chain(spark):
    # 40-node descending chain: min-label propagation would need 40 rounds;
    # large-star/small-star must finish inside the iteration budget
    pairs = [(i + 1, i) for i in range(1, 40)]
    df = spark.createDataFrame(pairs, "a int, b int")
    got = {r["id"]: r["component"]
           for r in S.connected_components(df, max_iters=12).collect()}
    assert got == {i: 1 for i in range(1, 41)}


def test_dup_cluster_survivors(spark):
    docs = spark.createDataFrame(
        [(1, 0.5), (2, 1.0), (3, 1.0), (7, 0.0), (8, 0.5)],
        "doc_id int, q double",
    )
    comps = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (7, 7), (8, 7)], "id int, component int"
    )
    out = {r["component"]: r for r in S.dup_cluster_survivors(
        docs, comps, "doc_id", F.col("q")).collect()}
    # cluster 1: quality tie 2 vs 3 at 1.0 -> smaller id wins
    assert out[1]["survivor_doc_id"] == 2 and out[1]["n_members"] == 3
    assert out[1]["survivor_quality"] == 1.0
    assert out[7]["survivor_doc_id"] == 8 and out[7]["n_members"] == 2


def test_repetition_stats_known_values(spark):
    from openlogreplicator_spark.functions import text as TXT

    docs = spark.createDataFrame(
        [
            (1, "spam spam spam spam"),          # one token repeated 4x
            (2, "a b c d"),                      # all distinct
            (3, "x y x y x y"),                  # dominant bigram "x y" (3x)
            (4, ""),                             # empty text
            (5, "solo"),                         # single token, no bigrams
        ],
        "doc_id int, text string",
    )
    out = {r["doc_id"]: r for r in TXT.repetition_stats(docs).collect()}
    assert out[1]["n_tokens"] == 4
    assert out[1]["dup_token_frac"] == 0.75       # 1 - 1/4
    assert out[1]["top_token_frac"] == 1.0
    assert out[1]["top_bigram_frac"] == 0.75      # "spam spam" x3 / 4 tokens
    assert out[2]["dup_token_frac"] == 0.0
    assert out[2]["top_token_frac"] == 0.25
    assert out[3]["top_bigram_frac"] == 0.5       # "x y" x3 / 6 tokens
    assert out[4]["n_tokens"] == 0
    assert out[4]["dup_token_frac"] == 0.0
    assert out[4]["top_token_frac"] == 0.0
    assert out[5]["n_tokens"] == 1
    assert out[5]["top_bigram_frac"] == 0.0


def test_bloom_dedup_equals_plain_anti_join(spark):
    rows = [(i, f"doc body {i % 40}") for i in range(200)]  # heavy dup rate
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    incoming = df.filter(F.col("doc_id") % 2 == 1)
    corpus = df.filter(F.col("doc_id") % 2 == 0)

    out = S.bloom_incremental_dedup(incoming, corpus, text_col="text")
    fp = TXT.normalized_fingerprint(F.col("text"))
    plain = incoming.withColumn("_fp", fp).join(
        corpus.select(fp.alias("_fp")).distinct(), "_fp", "left_anti"
    ).drop("_fp")
    got = sorted(r.doc_id for r in out.collect())
    want = sorted(r.doc_id for r in plain.collect())
    assert got == want


def test_bloom_prefilter_routes_definite_news_around_join(spark):
    # 50 corpus bodies, incoming = 10 dups + 90 unseen: the bloom-positive
    # set (what pays the confirm join) must be far below incoming size —
    # >= the 10 true dups, and with ~0.9% FP at 10 bits/key nowhere near 100.
    corpus = spark.createDataFrame(
        [(i, f"kept body {i}") for i in range(50)], ["doc_id", "text"])
    incoming = spark.createDataFrame(
        [(1000 + i, f"kept body {i}") for i in range(10)]
        + [(2000 + i, f"fresh body {i}") for i in range(90)],
        ["doc_id", "text"])

    fp = TXT.normalized_fingerprint(F.col("text"))
    corpus_fp = corpus.select(fp.alias("_fp")).distinct()
    n_keys = corpus_fp.count()
    m_bits = max(1024, ((n_keys * 10 + 63) // 64) * 64)
    bitmap = S.bloom_build(
        corpus_fp.select(S._bloom_positions(F.col("_fp"), m_bits, 5)
                         .alias("_pos")), "_pos", m_bits)
    probe = S.bloom_probe_udf(bitmap, 5)
    n_positive = incoming.withColumn("_fp", fp).filter(
        probe(S._bloom_positions(F.col("_fp"), m_bits, 5))
    ).count()
    assert 10 <= n_positive <= 25


def test_dup_cluster_survivors_string_ids(spark):
    """The tie-break must work for NON-numeric ids too (url-keyed dedup):
    negating a string id yields NULL (ANSI off) or errors (ANSI on), so the
    pick is spelled min_by over (-quality, id)."""
    docs = spark.createDataFrame(
        [("b.com", 1.0), ("a.com", 1.0), ("z.com", 0.5)], "url string, q double"
    )
    comps = spark.createDataFrame(
        [("b.com", 1), ("a.com", 1), ("z.com", 1)], "id string, component int"
    )
    out = S.dup_cluster_survivors(docs, comps, "url", F.col("q")).collect()
    assert len(out) == 1
    # quality tie at 1.0 -> lexicographically smallest id, deterministically
    assert out[0]["survivor_doc_id"] == "a.com"
    assert out[0]["n_members"] == 3


def test_exact_substr_removal_semantics(spark):
    """ExactSubstr span removal (Lee et al. 2022): a k-token window occurring
    more than once — across docs or repeated within one — survives only at
    its globally first (doc_id, pos) occurrence; covered tokens of every
    other occurrence are cut and the doc is rebuilt from the survivors."""
    docs = spark.createDataFrame(
        [
            (0, "x1 x2 x3 y1"),        # owns gram (x1 x2 x3)
            (1, "x1 x2 x3 z1"),        # cross-doc dup -> only z1 survives
            (2, "w1 w2 w3 w1 w2 w3"),  # self-repeat -> second run cut
            (3, "aa bb"),              # shorter than k: no windows, kept
            (4, "x1 x2 x3"),           # exactly one dup window -> emptied
        ],
        "doc_id int, text string",
    )
    out = {
        r["doc_id"]: r
        for r in TXT.exact_substr_removal(docs, "doc_id", "text", k=3).collect()
    }
    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()
    assert (out[0]["n_tokens"], out[0]["kept_tokens"]) == (4, 4)
    assert out[0]["clean_md5"] == md5("x1 x2 x3 y1")
    assert (out[1]["n_tokens"], out[1]["kept_tokens"]) == (4, 1)
    assert out[1]["clean_md5"] == md5("z1")
    assert (out[2]["n_tokens"], out[2]["kept_tokens"]) == (6, 3)
    assert out[2]["clean_md5"] == md5("w1 w2 w3")
    assert float(out[2]["removed_frac"]) == 0.5
    assert (out[3]["n_tokens"], out[3]["kept_tokens"]) == (2, 2)
    assert out[3]["clean_md5"] == md5("aa bb")
    assert (out[4]["n_tokens"], out[4]["kept_tokens"]) == (3, 0)
    assert out[4]["clean_md5"] == md5("")


def test_paragraph_dedup_first_occurrence_and_rebuild(spark):
    """CCNet paragraph dedup: a segment survives only at its globally first
    (doc_id, pos) occurrence — across docs AND within one doc — and each doc
    is rebuilt from its surviving segments in order (clean_md5 checks the
    reconstruction, not just counts)."""
    a = "a1 a2 a3 a4 a5 a6 a7 a8"      # segment A
    b = "b1 b2 b3 b4 b5 b6 b7 b8"      # segment B
    c = "c1 c2 c3 c4 c5 c6 c7 c8"      # segment C
    docs = spark.createDataFrame(
        [
            (0, f"{a} {b}"),        # owns A and B
            (1, f"{a} {c}"),        # A is a cross-doc dup -> rebuilt as C
            (2, f"{c} {c}"),        # first C is doc 1's; both drop here...
            (3, "tail only"),       # short (<8 tokens) unique segment
        ],
        "doc_id int, text string",
    )
    out = {
        r["doc_id"]: r
        for r in TXT.paragraph_dedup(docs, "doc_id", "text", seg=8).collect()
    }
    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()
    assert (out[0]["n_segs"], out[0]["kept_segs"]) == (2, 2)
    assert out[0]["clean_md5"] == md5(f"{a} {b}")
    assert (out[1]["n_segs"], out[1]["kept_segs"]) == (2, 1)
    assert out[1]["clean_md5"] == md5(c)          # A deduped away
    # doc 2: C already owned by doc 1 -> BOTH occurrences drop, doc empties
    assert (out[2]["n_segs"], out[2]["kept_segs"]) == (2, 0)
    assert out[2]["clean_md5"] == md5("")
    assert (out[3]["n_segs"], out[3]["kept_segs"]) == (1, 1)
    assert out[3]["clean_md5"] == md5("tail only")
    assert out[1]["dup_frac"] == 0.5 and out[2]["dup_frac"] == 1.0


def test_pca_power_matches_numpy_eig(spark):
    import numpy as np

    rng = np.random.default_rng(7)
    # anisotropic cloud: one dominant direction
    base = rng.normal(size=(200, 8)) * np.array([5, 2, 1, 1, 1, 1, 1, 1])
    rot, _ = np.linalg.qr(rng.normal(size=(8, 8)))
    X = base @ rot
    df = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(X)],
        "vec_id long, embedding array<float>",
    )
    cov = S.covariance_upper(df, "embedding", dim=8)
    out = S.pca_power_top(cov, dim=8, iters=8, round_dp=6)
    rows = sorted(out.collect(), key=lambda r: r.pos)
    v = np.array([r.loading for r in rows])
    lam = rows[0].eigval
    C = np.cov(np.asarray(X, dtype=np.float64).T, bias=True)
    evals, evecs = np.linalg.eigh(C)
    top = evecs[:, -1]
    # direction matches up to sign; eigenvalue matches the largest
    assert abs(abs(float(v @ top)) - 1.0) < 1e-3
    assert abs(lam - evals[-1]) / evals[-1] < 1e-3


def test_pca_components_match_numpy_and_are_orthogonal(spark):
    import numpy as np

    rng = np.random.default_rng(11)
    base = rng.normal(size=(300, 8)) * np.array([6, 3, 1, 1, 1, 1, 1, 1])
    rot, _ = np.linalg.qr(rng.normal(size=(8, 8)))
    X = base @ rot
    df = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(X)],
        "vec_id long, embedding array<float>",
    )
    cov = S.covariance_upper(df, "embedding", dim=8)
    out = S.pca_power_components(cov, dim=8, n_components=2, iters=10,
                                 round_dp=6)
    rows = out.collect()
    v1 = np.array([r.loading for r in sorted(
        (r for r in rows if r.component == 1), key=lambda r: r.pos)])
    v2 = np.array([r.loading for r in sorted(
        (r for r in rows if r.component == 2), key=lambda r: r.pos)])
    lam1 = next(r.eigval for r in rows if r.component == 1)
    lam2 = next(r.eigval for r in rows if r.component == 2)
    C = np.cov(np.asarray(X, dtype=np.float64).T, bias=True)
    evals, evecs = np.linalg.eigh(C)
    assert abs(abs(float(v1 @ evecs[:, -1])) - 1.0) < 1e-3
    assert abs(abs(float(v2 @ evecs[:, -2])) - 1.0) < 1e-3
    assert abs(float(v1 @ v2)) < 1e-3  # deflation keeps components orthogonal
    assert abs(lam1 - evals[-1]) / evals[-1] < 1e-3
    assert abs(lam2 - evals[-2]) / evals[-2] < 1e-3
    assert lam1 > lam2


def test_canonicalize_url_semantics(spark):
    cases = [
        # (raw, expected canonical)
        ("HTTPS://WWW.Site1.Example:443/Article/4?page=2&utm_source=x#top",
         "https://site1.example/Article/4?page=2"),
        ("http://site2.example:80/p/9/", "http://site2.example/p/9"),
        # cross-scheme default port must NOT strip (distinct origin)
        ("http://site3.example:443/p/1", "http://site3.example:443/p/1"),
        # path case preserved; all-tracking query drops the '?' entirely
        ("https://site4.example/CaseSensitive?utm_a=1&gclid=g&fbclid=f",
         "https://site4.example/CaseSensitive"),
        # real params survive in order, tracking removed mid-list
        ("https://site5.example/p?b=2&utm_x=1&a=1",
         "https://site5.example/p?b=2&a=1"),
        ("https://site6.example", "https://site6.example"),
    ]
    df = spark.createDataFrame([(r,) for r, _ in cases], "url string")
    got = [
        r.c for r in df.select(
            TXT.canonicalize_url(F.col("url")).alias("c")).collect()
    ]
    assert got == [e for _, e in cases]


def test_messy_urls_collapse_to_pages(spark, tmp_path):
    from openlogreplicator_spark.datagen import write_messy_urls

    d = write_messy_urls(str(tmp_path / "urls"), n_pages=60, seed=11)
    df = spark.read.parquet(d).withColumn(
        "canonical_url", TXT.canonicalize_url(F.col("url"))
    )
    # every variant of a page canonicalizes to ONE url, and distinct
    # canonical forms == page identities (no over- or under-merge)
    per_page = df.groupBy("page_id").agg(
        F.countDistinct("canonical_url").alias("n")
    )
    assert per_page.filter(F.col("n") != 1).count() == 0
    assert df.select("canonical_url").distinct().count() == 60
