"""Text-analysis column builders for web-text pipelines (SURVEY.md §2.7 +
the training-data ops the engine adds beyond the reference: language-ID,
quality scoring, token counting, fingerprinting).

Everything here is a pure pyspark.sql.functions composition — JVM-side,
whole-stage-codegen'd, no Python in the hot path. Each builder has an exact
ANSI-SQL twin used by the DuckDB oracle (queries.py), so the operators are
cross-checked value-for-value, mirroring the reference's differential-oracle
test strategy (Oracle LOGFILE dump diffing, SURVEY.md §5).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Marker words per language for the n-gram-heuristic language identifier.
# Counting uses the replace-trick ((len(s) - len(replace(s, m, ''))) / len(m))
# — pure string ops with identical semantics in Spark SQL and DuckDB, so the
# oracle can reproduce it exactly (no regex-flavor drift).
LANG_MARKERS: dict[str, list[str]] = {
    "en": [" the ", " and ", " of "],
    "de": [" der ", " und ", " die "],
    "fr": [" le ", " et ", " les "],
    "es": [" el ", " y ", " los "],
    "pl": [" i ", " nie ", " się "],
}


def occurrence_count(col: Column, marker: str) -> Column:
    """# occurrences of a literal substring, via the replace trick."""
    return (
        (F.length(col) - F.length(F.replace(col, F.lit(marker), F.lit(""))))
        / F.lit(len(marker))
    ).cast("long")


def token_count(col: Column) -> Column:
    """Whitespace token count (the reference counts fields the same way a
    whitespace tokenizer does — bounded walk, Parser.cpp:101-287)."""
    t = F.trim(col)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    ).cast("long")


def padded(col: Column) -> Column:
    """' ' || lower(text) || ' ' — so markers match at string edges."""
    return F.concat(F.lit(" "), F.lower(col), F.lit(" "))


def lang_scores(col: Column) -> dict[str, Column]:
    p = padded(col)
    return {
        lang: sum(occurrence_count(p, m) for m in markers).alias(f"score_{lang}")
        for lang, markers in LANG_MARKERS.items()
    }


def predicted_lang(col: Column) -> Column:
    """argmax over marker scores; deterministic tie-break by lang code order
    (earliest code wins a tie); 'und' (undetermined) when every score is 0."""
    scores = lang_scores(col)
    candidates = [
        F.struct(
            scores[lang].alias("s"),
            F.lit(-idx).alias("tie"),  # ties -> earliest lang code
            F.lit(lang).alias("lang"),
        )
        for idx, lang in enumerate(sorted(LANG_MARKERS))
    ]
    best = F.greatest(*candidates)
    return F.when(best["s"] <= 0, F.lit("und")).otherwise(best["lang"])


def punct_count(col: Column) -> Column:
    return sum(occurrence_count(col, ch) for ch in [".", ",", "!", "?"]).cast("long")


def quality_score(col: Column) -> Column:
    """Deterministic 0..1 quality heuristic: token-length band + punct ratio.
    Mirrors common web-text quality filters (length / punctuation ratios)."""
    toks = token_count(col)
    punct = punct_count(col)
    len_ok = F.when((toks >= 10) & (toks <= 5000), F.lit(0.5)).otherwise(F.lit(0.0))
    punct_ratio = punct / F.greatest(toks, F.lit(1))
    punct_ok = F.when((punct_ratio > 0.001) & (punct_ratio < 0.5), F.lit(0.5)).otherwise(
        F.lit(0.0)
    )
    return (len_ok + punct_ok).cast("double")


# BPE-ish subword-boundary regex: letter runs, digit runs, and single
# non-alphanumeric marks — the pre-tokenization split GPT-style BPE vocabs
# use before merges. Space-only whitespace (dialect-proof: identical in Java
# regex and RE2/DuckDB).
BPE_TOKEN_RE = "[a-z]+|[0-9]+|[^a-z0-9 ]"


def bpe_token_count(col: Column) -> Column:
    """Count of BPE-style pre-tokens over lower(text) — the token-budget
    estimate a training-data pipeline runs before real BPE encoding."""
    return F.size(
        F.regexp_extract_all(F.lower(col), F.lit(BPE_TOKEN_RE), F.lit(0))
    ).cast("long")


def normalized_fingerprint(col: Column) -> Column:
    """Document fingerprint: md5 over lowercased, whitespace-collapsed text.
    md5 (not xxhash64) so the DuckDB oracle reproduces it bit-for-bit."""
    return F.md5(F.trim(F.regexp_replace(F.lower(col), r"\s+", " ")))


def tokens_array(col: Column) -> Column:
    """Whitespace tokens of trim(text); empty text → empty array (the same
    denominator semantics as token_count — split('') would yield [''])."""
    t = F.trim(col)
    return F.when(F.length(t) == 0, F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


def chunk_windows(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    size: int = 32,
    stride: int = 24,
) -> DataFrame:
    """Sliding fixed-size token windows per document — the context-window
    chunking step of a training pipeline (long documents become overlapping
    ``size``-token training rows with ``size - stride`` tokens of overlap;
    the complement of pack_chunks' concatenate-then-chunk strategy).
    Reference analogue: none; training-data pipeline extension.

    Emits (id, chunk_id, start_tok, chunk_tokens, chunk_text); generation
    stops once a window reaches the document end (no redundant pure-suffix
    tails: a start is kept iff it is 0 or the previous window ended short of
    the last token).

    Scale shape: pure per-row expressions (split → sequence → filter →
    posexplode → slice) — no shuffle at all, whole-stage codegen end to end;
    output size is corpus_tokens/stride rows. Gotcha pinned elsewhere in the
    repo: ``sequence(1, n)`` with n ≤ 0 generates a DESCENDING sequence, so
    empty docs are filtered before the sequence is built."""
    toks = tokens_array(F.col(text_col))
    base = (
        docs.select(F.col(id_col), toks.alias("toks"))
        .withColumn("n", F.size("toks"))
        .filter(F.col("n") >= 1)
    )
    starts = F.filter(
        F.transform(
            F.sequence(
                F.lit(0),
                F.floor((F.col("n") - 1) / stride).cast("int"),
            ),
            lambda i: i * stride,
        ),
        lambda st: (st == 0) | (st - stride + size < F.col("n")),
    )
    exploded = base.select(
        F.col(id_col), F.col("toks"), F.col("n"),
        F.explode(starts).alias("start"),
    )
    return exploded.select(
        F.col(id_col),
        (F.col("start") / stride).cast("int").alias("chunk_id"),
        F.col("start").cast("int").alias("start_tok"),
        F.least(F.lit(size), F.col("n") - F.col("start"))
        .cast("int")
        .alias("chunk_tokens"),
        F.array_join(F.slice(F.col("toks"), F.col("start") + 1, size), " ")
        .alias("chunk_text"),
    )


def paragraph_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    seg: int = 8,
) -> DataFrame:
    """CCNet-style paragraph-level exact dedup (Wenzek et al. 2019 dedupe
    paragraphs by hash across the whole Common-Crawl snapshot; the corpus
    here is flat token text, so a "paragraph" is a fixed ``seg``-token
    segment — the same segmentation stand-in docs_dup_ngram_share uses).
    A segment occurrence survives iff it is the globally FIRST occurrence of
    its hash in (doc_id, pos) order; each document is then REBUILT from its
    surviving segments in original order. Per doc: segment counts, removed
    fraction, and md5 of the rebuilt text (compact value-hashable stand-in
    for shipping the cleaned text).

    Scale shape: segmentation is the zero-shuffle chunk_windows expression
    chain; first-occurrence is ONE partial-aggregated groupBy on the segment
    hash (min over a (doc, pos) struct — map-side combine shrinks the
    shuffle to distinct segments) + an equi-join back on the hash; the
    rebuild is one groupBy per doc (collect_list of kept segments,
    array_sort by pos). Linear in corpus segments, never all-pairs — the
    exact plan a 100 TB CCNet dedup runs. Reference analogue: none;
    training-data pipeline extension."""
    segs = chunk_windows(docs, id_col, text_col, size=seg, stride=seg).select(
        F.col(id_col),
        F.col("chunk_id").alias("pos"),
        F.col("chunk_text").alias("seg"),
        F.md5("chunk_text").alias("h"),
    )
    first = segs.groupBy("h").agg(
        F.min(F.struct(F.col(id_col), F.col("pos"))).alias("_first")
    )
    flagged = segs.join(first, "h").withColumn(
        "keep", F.struct(F.col(id_col), F.col("pos")) == F.col("_first")
    )
    kept_n = F.count(F.when(F.col("keep"), 1))
    return flagged.groupBy(id_col).agg(
        F.count("*").alias("n_segs"),
        kept_n.alias("kept_segs"),
        F.round(F.lit(1.0) - kept_n / F.count("*"), 4).alias("dup_frac"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(F.col("keep"), F.struct("pos", "seg"))
                        )
                    ),
                    lambda x: x["seg"],
                ),
                " ",
            )
        ).alias("clean_md5"),
    )


def exact_substr_removal(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
) -> DataFrame:
    """ExactSubstr dedup with span REMOVAL (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better"): every ``k``-token window
    that occurs more than once in the corpus — across documents OR repeated
    inside one — survives only at its globally FIRST occurrence in
    (doc_id, pos) order; every token covered by a non-first duplicate window
    is removed, and each document is rebuilt from its surviving tokens.
    The set-level near-dup family (MinHash/SimHash) drops whole documents;
    docs_shared_span_dups DETECTS shared spans per pair; this op performs
    the paper's actual corpus REWRITE. Per doc: token counts, removed
    fraction, md5 of the rebuilt text (the value-hashable stand-in for
    shipping the cleaned corpus). All matching is over lowercased
    whitespace tokens (the shared_span convention).

    Scale shape — linear in corpus tokens, never pairwise: windows are a
    zero-shuffle expression chain keyed by xxhash64 over the k tokens (an
    8-byte shuffle key; the gram VALUE never reaches the output, so only
    hash equality matters — a 64-bit collision would flip the value hash
    and fail the oracle gate); first-occurrence is ONE partial-aggregated
    groupBy on the gram hash (min over a (doc, pos) struct, map-side
    combine shrinks the shuffle to distinct grams — hot boilerplate grams
    are exactly the skew AQE agg-splitting handles, and unlike the pair
    joins no DF cap is needed because each occurrence is classified once,
    never joined to its peers); coverage explodes O(k) positions per
    duplicate window only; the rebuild is a left-anti equi-join plus one
    per-doc groupBy. Reference analogue: none; training-data extension."""
    toks = tokens_array(F.lower(F.col(text_col)))
    base = (
        docs.select(F.col(id_col), toks.alias("toks"))
        .withColumn("n", F.size("toks"))
        .filter(F.col("n") >= 1)
    )
    gram_of = lambda i: F.xxhash64(
        *[F.element_at(F.col("toks"), i + j) for j in range(k)]
    )
    grams = (
        base.filter(F.col("n") >= k)
        .select(
            F.col(id_col),
            F.posexplode(
                F.transform(F.sequence(F.lit(1), F.col("n") - (k - 1)), gram_of)
            ).alias("p0", "gram"),
        )
        .select(F.col(id_col), (F.col("p0") + 1).alias("pos"), "gram")
    )
    first = grams.groupBy("gram").agg(
        F.min(F.struct(F.col(id_col), F.col("pos"))).alias("_first")
    )
    dup = grams.join(first, "gram").filter(
        ~(F.struct(F.col(id_col), F.col("pos")) == F.col("_first"))
    )
    covered = dup.select(
        F.col(id_col),
        F.explode(F.sequence(F.col("pos"), F.col("pos") + (k - 1))).alias("tpos"),
    ).distinct()
    toksx = base.select(
        F.col(id_col), F.posexplode("toks").alias("i0", "tok")
    ).select(F.col(id_col), (F.col("i0") + 1).alias("tpos"), "tok")
    kept = toksx.join(covered, [id_col, "tpos"], "left_anti")
    reb = kept.groupBy(id_col).agg(
        F.count("*").alias("kept_tokens"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("tpos", "tok"))),
                    lambda x: x["tok"],
                ),
                " ",
            )
        ).alias("clean_md5"),
    )
    return (
        base.select(F.col(id_col), F.col("n").cast("long").alias("n_tokens"))
        .join(reb, id_col, "left")
        .select(
            F.col(id_col),
            "n_tokens",
            F.coalesce(F.col("kept_tokens"), F.lit(0).cast("long")).alias(
                "kept_tokens"
            ),
            F.round(
                F.lit(1.0)
                - F.coalesce(F.col("kept_tokens"), F.lit(0)).cast("double")
                / F.col("n_tokens"),
                4,
            ).alias("removed_frac"),
            F.coalesce(F.col("clean_md5"), F.md5(F.lit(""))).alias("clean_md5"),
        )
    )


def repetition_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetition metrics per document — the filter channel
    that catches boilerplate/spam web pages exact- and near-dedup both miss
    (a page repeating one phrase 500 times is unique, yet worthless):

    * ``dup_token_frac``  — 1 − distinct_tokens / tokens (pure array expr)
    * ``top_token_frac``  — occurrences of the most frequent token / tokens
    * ``top_bigram_frac`` — occurrences of the most frequent 2-gram / tokens

    Scale shape: the mode of a token multiset is NOT expressible as a pure
    per-row expression without O(len²) work, so the top-fraction channels
    explode to (doc, gram) and take two partial-aggregated groupBys —
    shuffle keyed on doc_id, linear in corpus token count, the standard
    plan for per-doc n-gram stats at 100 TB. Everything else stays in
    whole-stage codegen."""
    toks = tokens_array(F.col(text_col))
    base = docs.select(F.col(id_col), toks.alias("toks"))
    n = F.size("toks")
    stats = base.select(
        id_col,
        n.cast("long").alias("n_tokens"),
        F.size(F.array_distinct("toks")).cast("long").alias("_nd"),
    )
    top_tok = (
        base.select(id_col, F.explode("toks").alias("tok"))
        .groupBy(id_col, "tok")
        .count()
        .groupBy(id_col)
        .agg(F.max("count").alias("_top_tok"))
    )
    bigrams = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(0), n - 2),
            lambda i: F.concat_ws(
                " ", F.get(F.col("toks"), i), F.get(F.col("toks"), i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    top_big = (
        base.select(id_col, F.explode(bigrams).alias("bi"))
        .groupBy(id_col, "bi")
        .count()
        .groupBy(id_col)
        .agg(F.max("count").alias("_top_big"))
    )
    nt = F.col("n_tokens")
    return (
        stats.join(top_tok, id_col, "left")
        .join(top_big, id_col, "left")
        .select(
            id_col,
            "n_tokens",
            F.round(
                F.when(nt > 0, 1.0 - F.col("_nd") / nt).otherwise(F.lit(0.0)), 4
            ).alias("dup_token_frac"),
            F.round(
                F.coalesce(F.col("_top_tok"), F.lit(0)) / F.greatest(nt, F.lit(1)), 4
            ).alias("top_token_frac"),
            F.round(
                F.coalesce(F.col("_top_big"), F.lit(0)) / F.greatest(nt, F.lit(1)), 4
            ).alias("top_bigram_frac"),
        )
    )


def kgram_winnow_fingerprint(col: Column, k: int = 3) -> Column:
    """Rolling-shingle fingerprint (winnowing-style): min over the hashes of
    every k-token window of the normalized text. Insensitive to edits
    outside the minimizing window — the content-defined sampling trick
    winnowing/Rabin-Karp dedup uses; one pure-JVM expression (split →
    sequence → transform → array_min), no UDF, exact SQL twin. Token (not
    character) windows keep the hash count O(tokens), ~30× cheaper at equal
    dedup power on web text."""
    arr = F.split(F.trim(F.lower(col)), r"\s+")
    n_windows = F.greatest(F.size(arr) - F.lit(k - 1), F.lit(1))
    grams = F.transform(
        F.sequence(F.lit(1), n_windows),
        lambda i: F.md5(F.concat_ws(" ", F.slice(arr, i, k))),
    )
    return F.array_min(grams)


# ----------------------------------------------------------- PII redaction

# One regex per PII class, kept to the Java∩RE2 common dialect so Spark
# (java.util.regex) and DuckDB (RE2) match the exact same spans. Replacement
# order matters and is fixed: emails first (their domains contain dots that
# the IPv4 regex must not see), then IPv4, then phones.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("emails", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ipv4s", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
    ("phones", r"\b\d{3}-\d{3}-\d{4}\b", "[PHONE]"),
]


def pii_count(col: Column, pattern: str) -> Column:
    """# matches of one PII pattern (JVM regexp_count, int like DuckDB's
    CAST(len(regexp_extract_all(..)) AS INT))."""
    return F.regexp_count(col, F.lit(pattern))


def redact_pii(col: Column) -> Column:
    """Replace every PII span with its class token, in PII_PATTERNS order —
    the standard C4/Dolma-style scrub pass. Pure JVM regexp_replace chain
    (global by default, matching DuckDB's 'g' flag); no Python in the path."""
    out = col
    for _, pat, token in PII_PATTERNS:
        out = F.regexp_replace(out, pat, token)
    return out


# ------------------------------------------------- URL canonicalization

# Split an absolute URL into (scheme, authority, rest). Java∩RE2 common
# dialect (same rule as PII_PATTERNS): the PATTERN must behave identically
# on both engines; replacement spellings may differ per dialect.
URL_PARTS_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)(.*)$"

# Query parameters that never change page identity (analytics trackers) —
# the standard Common-Crawl / SURT-style canonicalization drop list.
URL_TRACKING_RE = r"^(utm_[A-Za-z0-9_]*|fbclid|gclid|msclkid)="


def canonicalize_url(url: Column) -> Column:
    """Canonical form of an absolute http(s) URL — the key under which a
    crawl dedups page identities (SURT / Common-Crawl canonicalization):
    scheme+host lowercased (path case PRESERVED — it is significant),
    leading ``www.`` dropped, scheme-default port dropped (``:443`` only
    for https, ``:80`` only for http — stripping cross-scheme would merge
    distinct origins), fragment dropped, tracking query params dropped
    (split → filter → rejoin, so surviving params keep their order and a
    dangling ``?``/``&`` never appears), trailing path slash dropped.
    Pure JVM expression chain — no UDF, exact DuckDB twin."""
    scheme = F.lower(F.regexp_extract(url, URL_PARTS_RE, 1))
    host = F.lower(F.regexp_extract(url, URL_PARTS_RE, 2))
    host = F.regexp_replace(host, r"^www\.", "")
    host = (
        F.when(scheme == "https", F.regexp_replace(host, ":443$", ""))
        .when(scheme == "http", F.regexp_replace(host, ":80$", ""))
        .otherwise(host)
    )
    rest = F.regexp_replace(F.regexp_extract(url, URL_PARTS_RE, 3), "#.*$", "")
    path = F.regexp_replace(F.regexp_extract(rest, r"^([^?]*)", 1), "/$", "")
    query = F.when(
        rest.contains("?"), F.regexp_replace(rest, r"^[^?]*\?", "")
    ).otherwise(F.lit(""))
    kept = F.filter(
        F.split(query, "&"),
        lambda x: (~x.rlike(URL_TRACKING_RE)) & (F.length(x) > 0),
    )
    q2 = F.array_join(kept, "&")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(F.length(q2) > 0, F.concat(F.lit("?"), q2)).otherwise(F.lit("")),
    )


# ----------------------------------------------- Gopher-style rule filter

# The 8 most frequent English words — the Gopher (Rae et al. 2021, §A1.1)
# "minimum stop words" rule uses a fixed tiny list exactly like this.
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_rules(
    col: Column,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_len: float = 3.0,
    max_mean_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_alpha_ratio: float = 0.8,
    min_stopwords: int = 2,
) -> dict[str, Column]:
    """Gopher-style rule-based quality columns (all pure JVM expressions —
    one codegen'd scan at any scale; the thresholds are the published
    defaults). Returns the measured stats AND the per-rule booleans plus
    the ANDed ``gopher_pass`` so a pipeline can log rejection reasons, the
    same reporting split C4/Gopher/Dolma pipelines use."""
    words = F.split(F.trim(F.lower(col)), r"\s+")
    n = F.size(words).cast("long")
    nf = n.cast("double")
    mean_len = F.aggregate(
        words, F.lit(0.0), lambda acc, w: acc + F.length(w).cast("double")
    ) / F.greatest(nf, F.lit(1.0))
    symbols = (occurrence_count(col, "#") + occurrence_count(col, "...")).cast(
        "double"
    )
    symbol_ratio = symbols / F.greatest(nf, F.lit(1.0))
    alpha_ratio = (
        F.size(F.filter(words, lambda w: w.rlike("[a-z]"))).cast("double")
        / F.greatest(nf, F.lit(1.0))
    )
    p = padded(col)
    n_stop = sum(
        F.when(p.contains(f" {sw} "), 1).otherwise(0) for sw in GOPHER_STOPWORDS
    ).cast("int")
    checks = {
        "ok_n_words": (n >= min_words) & (n <= max_words),
        "ok_mean_len": (mean_len >= min_mean_len) & (mean_len <= max_mean_len),
        "ok_symbols": symbol_ratio <= max_symbol_ratio,
        "ok_alpha": alpha_ratio >= min_alpha_ratio,
        "ok_stopwords": n_stop >= min_stopwords,
    }
    gopher_pass = None
    for c in checks.values():
        gopher_pass = c if gopher_pass is None else (gopher_pass & c)
    return {
        "n_words": n,
        "mean_word_len": mean_len,
        "symbol_ratio": symbol_ratio,
        "alpha_ratio": alpha_ratio,
        "n_stopwords": n_stop,
        **checks,
        "gopher_pass": gopher_pass,
    }


def nfc_normalize_udf():
    """Unicode NFC normalization kernel — the one Arrow-batched member of
    this module (Spark has no normalization builtin through 4.x; the JVM's
    java.text.Normalizer is not exposed as a SQL function). Batched
    ``unicodedata.normalize("NFC", ...)`` over Arrow string arrays; Python's
    normalizer and DuckDB's utf8proc-backed ``nfc_normalize`` implement the
    same Unicode 15 canonical composition, verified equal on singletons
    (U+212B), canonical reordering, and compatibility forms (which both
    leave alone — NFC, not NFKC). Used by the ``docs_unicode_normalize``
    gate; at 100 TB this is a map-side pass, embarrassingly parallel.
    Reference analogue: none — charset DECODE is decoders.py's job
    (CharacterSet*, src/locales/); normalization is a training-data
    pipeline extension."""
    import unicodedata

    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import StringType

    def _batch(s: pd.Series) -> pd.Series:  # noqa: F821 — hints resolved here
        return s.map(
            lambda t: unicodedata.normalize("NFC", t) if t is not None else None
        )

    # `from __future__ import annotations` stringifies the hints above, and
    # pyspark 4 resolves them against the function's globals — give it real
    # objects instead of relying on module-level names.
    _batch.__annotations__ = {"s": pd.Series, "return": pd.Series}

    return pandas_udf(_batch, StringType())
