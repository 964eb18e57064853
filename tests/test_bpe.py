"""BPE trainer: merge semantics vs a pure-Python reference, and the
greedy-left / doubled-space guarantees the DuckDB oracle relies on."""

from __future__ import annotations

import collections

from pyspark.sql import functions as F

from openlogreplicator_spark.functions import bpe


def _py_word_seqs(texts: list[str]) -> dict[str, int]:
    counts: collections.Counter[str] = collections.Counter()
    for t in texts:
        for w in t.lower().split():
            counts[" ".join(w) + " </w>"] += 1
    return dict(counts)


def _py_merge(seq: str, pair: str) -> str:
    """Greedy-left non-overlapping merge — the doubled-space trick's
    semantics, restated imperatively."""
    syms = seq.split(" ")
    a, b = pair.split(" ")
    out: list[str] = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return " ".join(out)


def _py_bpe(texts: list[str], n_merges: int) -> list[tuple[int, str, int]]:
    vocab = _py_word_seqs(texts)
    merges = []
    for rank in range(1, n_merges + 1):
        pairs: collections.Counter[str] = collections.Counter()
        for seq, n in vocab.items():
            syms = seq.split(" ")
            for i in range(len(syms) - 1):
                pairs[syms[i] + " " + syms[i + 1]] += n
        if not pairs:
            break
        # max count, then lexicographically smallest pair
        pair, cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, pair, cnt))
        vocab = {
            _py_merge(seq, pair): n for seq, n in vocab.items()
        }
    return merges


TEXTS = [
    "low low lower lowest",
    "new newer newest low",
    "wide wider widest new new",
    "aaa aa aaaa",  # overlapping-run stress for greedy-left
]


def test_bpe_learn_matches_python_reference(spark):
    df = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    got = bpe.bpe_learn(df, "text", n_merges=6)
    assert got == _py_bpe(TEXTS, 6)


def test_merge_apply_greedy_left(spark):
    df = spark.createDataFrame(
        [("a a a </w>",), ("x a b a b x </w>",), ("a b </w>",)],
        "seq string",
    )
    merged_aa = df.select(bpe.merge_apply(F.col("seq"), "a a").alias("s"))
    assert [r.s for r in merged_aa.collect()] == [
        "aa a </w>",  # greedy-left: first two merge, third survives
        "x a b a b x </w>",
        "a b </w>",
    ]
    merged_ab = df.select(bpe.merge_apply(F.col("seq"), "a b").alias("s"))
    assert [r.s for r in merged_ab.collect()] == [
        "a a a </w>",
        "x ab ab x </w>",  # BOTH adjacent occurrences merge in one pass
        "ab </w>",
    ]


def test_merge_apply_multichar_symbol_boundary(spark):
    # 'a bc' must NOT match pair (a, b): symbols are space-delimited tokens,
    # not substrings.
    df = spark.createDataFrame([("a bc </w>",)], "seq string")
    out = df.select(bpe.merge_apply(F.col("seq"), "a b").alias("s"))
    assert out.collect()[0].s == "a bc </w>"


def test_word_seqs_weighted(spark):
    df = spark.createDataFrame([("low low new",), ("low",)], "text string")
    rows = {
        r.seq: r.n for r in bpe.word_seqs(df, "text").collect()
    }
    assert rows == {"l o w </w>": 3, "n e w </w>": 1}


def test_doubled_space_trick_is_greedy_left_fuzz():
    """The algebra behind merge_apply, fuzzed: doubling separators, ONE
    non-overlapping replace of ' a  b ' -> ' ab ', and collapsing must
    equal the imperative greedy-left merge for ANY symbol sequence and any
    adjacent pair — including runs (a a a), pair symbols that are prefixes
    of other symbols (a vs ab), and already-merged multi-char symbols.
    Python str.replace shares the non-overlapping left-to-right semantics
    of Spark's and DuckDB's replace(), so this pins the cross-engine
    behavior without a Spark session in the loop."""
    import re

    from hypothesis import given, settings
    from hypothesis import strategies as st

    symbols = st.sampled_from(["a", "b", "ab", "ba", "aa", "</w>", "c"])

    def trick(seq: str, a: str, b: str) -> str:
        doubled = " " + seq.replace(" ", "  ") + " "
        out = doubled.replace(f" {a}  {b} ", f" {a}{b} ")
        return re.sub(" +", " ", out).strip()

    @settings(max_examples=500, deadline=None)
    @given(st.lists(symbols, min_size=1, max_size=12), st.data())
    def run(syms, data):
        pairs = [
            (syms[i], syms[i + 1]) for i in range(len(syms) - 1)
        ] or [("a", "b")]
        a, b = data.draw(st.sampled_from(pairs))
        seq = " ".join(syms)
        assert trick(seq, a, b) == _py_merge(seq, f"{a} {b}")

    run()
