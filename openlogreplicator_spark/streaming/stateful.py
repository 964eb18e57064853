"""Custom stateful streaming operator (SURVEY.md §2.8 T5):
cross-epoch per-key change suppression with applyInPandasWithState.

The reference keeps open transactions in an in-memory arena keyed by XID
(TransactionBuffer, /root/reference/src/parser/TransactionBuffer.cpp) and
drops events that can no longer win. The Spark-native analogue keeps, per
url, the max (warc_ts, seq) seen so far in the state store and emits only
events NEWER than that — a streaming pre-filter that shrinks every
downstream epoch's LWW+merge input. Safe because an event older than the
stored maximum can never be the LWW winner (total order, §2.4 A3); equal
events are duplicates (seq is unique) and are suppressed too — which also
makes re-delivered rows idempotent at this stage.

Wiring (round-1 verdict task 9): CdcPipeline.run_available_now(
suppress_stale=True) routes committed DML through this operator while DDL
control rows and malformed/rolled-back rows bypass it via a union
(`CdcPipeline._with_stale_suppression`), so dead-letter routing and schema
evolution see the original rows.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_DDL = "max_ts long, max_seq long"
# extras AND the before-image ride as JSON text through the state operator
# (binary map values become base64 inside to_json and round-trip through
# from_json; map columns are re-materialized JVM-side after the union,
# pipeline._with_stale_suppression) — so before-image sinks fed from a
# suppress_stale stream keep their update/delete before rows (ADVICE r02).
OUT_COLS = [
    "url", "warc_ts", "seq", "op", "html", "text", "lang", "extras_json",
    "before_json", "schema_ver",
]
OUT_DDL = (
    "url string, warc_ts timestamp, seq long, op string, html binary, "
    "text string, lang string, extras_json string, before_json string, "
    "schema_ver int"
)


def _suppress(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
    if state.exists:
        max_ts, max_seq = state.get
    else:
        max_ts, max_seq = -1, -1
    out = []
    for pdf in pdfs:
        ts_us = pdf["warc_ts"].astype("int64")  # monotone (ns since epoch)
        newer = (ts_us > max_ts) | ((ts_us == max_ts) & (pdf["seq"] > max_seq))
        kept = pdf[newer]
        if len(kept):
            k_ts = kept["warc_ts"].astype("int64")
            i = int(k_ts.idxmax())
            cand_ts = int(k_ts.loc[i])
            cand_seq = int(kept.loc[kept.index[k_ts.values == cand_ts], "seq"].max())
            if (cand_ts, cand_seq) > (max_ts, max_seq):
                max_ts, max_seq = cand_ts, cand_seq
            out.append(kept)
    state.update((max_ts, max_seq))
    yield pd.concat(out) if out else pd.DataFrame(columns=OUT_COLS)


def suppress_stale_events(stream: DataFrame) -> DataFrame:
    """Keyed stateful filter over a streaming DataFrame of DML events.

    Input columns: OUT_COLS (url, warc_ts, seq, op, html, text, lang,
    extras_json, schema_ver). Output: the same rows minus those at-or-below
    the key's stored high-watermark. State: one (max_ts, max_seq) pair per
    url — bytes, not rows, so the state store stays tiny even at 10^9 keys
    per epoch window.
    """
    return stream.groupBy("url").applyInPandasWithState(
        _suppress,
        outputStructType=OUT_DDL,
        stateStructType=STATE_DDL,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
