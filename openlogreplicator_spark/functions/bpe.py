"""Distributed BPE tokenizer induction (word-level, Sennrich et al. 2016).

The trainer every LLM data pipeline eventually runs over its cleaned corpus.
Scale shape: the only corpus-sized step is ONE tokenize + word-count
``groupBy`` (map-side combine absorbs the Zipf head); every merge iteration
then runs over the vocab-bounded distinct-word relation — the classic
fast-BPE trainer optimization (pair counts are weighted by word frequency,
never recomputed over raw text) — and only a single best ``(pair, count)``
row reaches the driver per iteration.

Cross-engine determinism (the DuckDB oracle replays the identical merge
trajectory as unrolled CTEs): ties on the pair count fall to the
lexicographically smallest pair on both engines, and a merge application is
the *doubled-space trick* — ``' a  b '`` patterns in a double-spaced symbol
string cannot overlap, so one engine-native non-overlapping ``replace()``
merges every occurrence greedy-left identically in Spark and DuckDB (a
single-spaced join would leave the second of two adjacent occurrences
unmerged because the shared separator space is consumed by the first match).

Reference analogue: none — training-data pipeline extension (the reference
is a CDC engine; tokenizer induction is part of this repo's LLM-pipeline
surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_PAIRS_EXPR = (
    "transform(slice(syms, 1, size(syms) - 1), (x, i) -> "
    "concat(x, ' ', syms[i + 1]))"
)


def word_seqs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """``(token, seq, n)``: each distinct word as a space-joined character
    sequence with the classic ``</w>`` end-of-word symbol, weighted by
    corpus frequency. Injective on the word (removing spaces reconstructs
    it), so no merge can collide two vocab rows."""
    from .similarity import tokens

    return (
        tokens(docs, None, text_col, distinct=False)
        .groupBy("token")
        .agg(F.count("*").alias("n"))
        .select(
            "token",
            F.concat(
                F.trim(F.regexp_replace("token", "(.)", "$1 ")),
                F.lit(" </w>"),
            ).alias("seq"),
            "n",
        )
    )


def merge_apply(seq_col, pair: str):
    """Apply one learned merge to a space-joined symbol sequence.

    Doubled-space trick: double every separator, wrap in spaces, then one
    literal non-overlapping ``replace`` of ``' a  b '`` with ``' ab '``
    merges ALL occurrences greedy-left (adjacent occurrences no longer share
    a separator), then separators collapse back to single spaces."""
    pat = F.lit(" " + pair.replace(" ", "  ") + " ")
    rep = F.lit(" " + pair.replace(" ", "") + " ")
    doubled = F.concat(
        F.lit(" "), F.regexp_replace(seq_col, " ", "  "), F.lit(" ")
    )
    return F.trim(
        F.regexp_replace(F.replace(doubled, pat, rep), " +", " ")
    )


def bpe_learn(
    docs: DataFrame, text_col: str = "text", n_merges: int = 8
) -> list[tuple[int, str, int]]:
    """Learn ``n_merges`` BPE merges; returns ``[(rank, pair, count), ...]``.

    Per iteration: explode adjacent symbol pairs of the (cached,
    vocab-sized) word relation weighted by word frequency, partial-agg the
    pair counts, collect ONE winner (max count, then smallest pair), apply
    it map-side. The corpus is scanned exactly once (by :func:`word_seqs`)."""
    merges: list[tuple[int, str, int]] = []
    cur = word_seqs(docs, text_col).select("seq", "n").persist()
    cached = [cur]
    try:
        for rank in range(1, n_merges + 1):
            # this job materializes `cur` into its cache as a side effect —
            # ONE job per iteration; earlier generations stay cached until
            # the end (vocab-sized, trivial memory) so no lineage replays
            best = (
                cur.withColumn("syms", F.split("seq", " "))
                .select(F.explode(F.expr(_PAIRS_EXPR)).alias("pair"), "n")
                .groupBy("pair")
                .agg(F.sum("n").alias("cnt"))
                .orderBy(F.desc("cnt"), "pair")
                .limit(1)
                .collect()
            )
            if not best:
                break
            pair, cnt = best[0]["pair"], int(best[0]["cnt"])
            merges.append((rank, pair, cnt))
            if rank < n_merges:  # the post-final vocab is never consumed
                cur = cur.select(
                    merge_apply(F.col("seq"), pair).alias("seq"), "n"
                ).persist()
                cached.append(cur)
    finally:
        for df in cached:
            df.unpersist()
    return merges


def bpe_sql(n_merges: int, final_select: str | None = None) -> str:
    """DuckDB twin: the identical merge trajectory as unrolled CTEs.

    The chain ends at ``w{n_merges}`` (``token, seq, n`` — the vocab under
    all learned merges) and ``b1..b{n_merges}`` (the merges themselves);
    ``final_select`` overrides the default merges-table projection so other
    catalog entries (fertility) can reuse the trained state."""
    parts = [
        r"""
    WITH w0 AS (
      SELECT token,
             concat(trim(regexp_replace(token, '(.)', '\1 ', 'g')), ' </w>')
               AS seq,
             CAST(count(*) AS BIGINT) AS n
      FROM (SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+'))
                     AS token
            FROM documents)
      WHERE length(token) > 0
      GROUP BY token)"""
    ]
    for i in range(1, n_merges + 1):
        parts.append(
            f""",
    p{i} AS (
      SELECT s[x] || ' ' || s[x + 1] AS pair,
             CAST(sum(n) AS BIGINT) AS cnt
      FROM (SELECT string_split(seq, ' ') AS s, n,
                   unnest(generate_series(
                     1, len(string_split(seq, ' ')) - 1)) AS x
            FROM w{i - 1})
      GROUP BY pair),
    b{i} AS (SELECT pair, cnt FROM p{i} ORDER BY cnt DESC, pair LIMIT 1),
    w{i} AS (
      SELECT token,
             trim(regexp_replace(
               replace(' ' || replace(seq, ' ', '  ') || ' ',
                       ' ' || replace(b.pair, ' ', '  ') || ' ',
                       ' ' || replace(b.pair, ' ', '') || ' '),
               ' +', ' ', 'g')) AS seq, n
      FROM w{i - 1} CROSS JOIN b{i} b)"""
        )
    if final_select is None:
        unions = "\n      UNION ALL ".join(
            f"SELECT {i} AS rank, pair, cnt FROM b{i}"
            for i in range(1, n_merges + 1)
        )
        final_select = f"\n    SELECT rank, pair, cnt FROM ({unions})"
    parts.append(final_select)
    return "".join(parts)


def segment_counts(
    docs: DataFrame, merges: list[tuple[int, str, int]],
    text_col: str = "text",
) -> DataFrame:
    """``(token, k)``: BPE symbol count per distinct word under the learned
    merges — the per-word encode cost. Applying k merges is k map-side
    column rewrites of the vocab-bounded relation; no document is ever
    re-tokenized against the merge list row-by-row."""
    vocab = word_seqs(docs, text_col)
    seq = F.col("seq")
    for _, pair, _ in merges:
        seq = merge_apply(seq, pair)
    return vocab.select(
        "token", F.size(F.split(seq, " ")).alias("k")
    )
