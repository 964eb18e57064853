"""Randomized differential test of the partial-image fold
(operators.merge.read_state_partial): 60 keys x up to 10 random versions
(creates, NULL-means-unchanged partial updates, tombstones, re-creates,
out-of-order event times) folded by an INDEPENDENT pure-Python reference —
last non-NULL per column within a tombstone-segmented life, newest version
wins, re-creates inherit nothing. Seeded, so failures reproduce; the shape
goes far beyond the handcrafted delete_where cases."""

from __future__ import annotations

import datetime as dt
import random

from openlogreplicator_spark.lake.table import LakeTable
from openlogreplicator_spark.operators.merge import (
    merge_append,
    read_state_partial,
)

FIELDS = [("url", "string"), ("warc_ts", "timestamp"), ("_seq", "long"),
          ("_op", "string"), ("text", "string"), ("lang", "string")]
DDL = ("url string, warc_ts timestamp, _seq long, _op string, "
       "text string, lang string")
BASE = dt.datetime(2021, 1, 1)


def _reference_fold(versions):
    """versions: [(warc_ts, seq, op, text, lang)] any order -> final
    (text, lang) or None if the key ends dead."""
    vs = sorted(versions, key=lambda v: (v[0], v[1]))
    carry = {"text": None, "lang": None}
    alive = False
    for _ts, _seq, op, text, lang in vs:
        if op == "d":
            carry = {"text": None, "lang": None}  # re-creates inherit nothing
            alive = False
            continue
        if not alive:
            carry = {"text": None, "lang": None}
            alive = True
        if text is not None:
            carry["text"] = text
        if lang is not None:
            carry["lang"] = lang
    return dict(carry) if alive else None


def test_partial_fold_matches_reference_on_random_histories(spark, tmp_path):
    rng = random.Random(20260819)
    per_key: dict[str, list] = {}
    seq = 0
    for k in range(60):
        url = f"https://fuzz.example/k{k}"
        n = rng.randint(1, 10)
        vs = []
        for j in range(n):
            seq += 1
            # out-of-order event times: ts independent of seq
            ts = BASE + dt.timedelta(seconds=rng.randint(0, 500))
            if j == 0:
                op = "c"
            else:
                op = rng.choice(["u", "u", "u", "d", "c"])
            if op == "d":
                text = lang = None
            else:
                text = rng.choice([None, f"t{seq}", f"t{seq}"])
                lang = rng.choice([None, None, "en", "de"])
                if op == "c" and text is None:
                    text = f"t{seq}"  # creates carry at least one column
            vs.append((ts, seq, op, text, lang))
        per_key[url] = vs

    t = LakeTable.create(
        spark, str(tmp_path / "pt"), FIELDS, key_col="url", n_buckets=4,
        flags={"partial_images": True},
    )
    rows = [
        (url, *v) for url, vs in per_key.items() for v in vs
    ]
    rng.shuffle(rows)  # arrival order independent of event order
    # split into 3 epochs to exercise multi-file histories
    third = len(rows) // 3
    for i, chunk in enumerate(
        (rows[:third], rows[third:2 * third], rows[2 * third:])
    ):
        merge_append(t, spark.createDataFrame(chunk, DDL), epoch_id=i)
        t = LakeTable.load(spark, t.path)

    got = {
        r["url"]: (r["text"], r["lang"])
        for r in read_state_partial(t).select("url", "text", "lang").collect()
    }
    want = {}
    for url, vs in per_key.items():
        folded = _reference_fold(vs)
        if folded is not None:
            want[url] = (folded["text"], folded["lang"])
    assert got == want
