"""Deterministic synthetic CDC change-log generator (FIXTURES.md §1–3).

Pure function of (seed, n_events, n_urls): identical bytes across runs and across
parallelism levels — the bit-exact resume and scaling tests rely on this
(BASELINE.md measurement protocol; reference analogue: the redo log itself is the
deterministic input, /root/reference/src/reader/Reader.cpp:123-182).

Produces the `events` table (the redo-log analogue, SURVEY.md §1.3):

    seq          long                  emitted position (≈ redo sequence+offset)
    warc_ts      timestamp             SCN equivalent (logical clock)
    op           string                'c' | 'u' | 'd' | 'ddl'
    url          string                primary key
    html         binary                after-image (null for 'd'/'ddl')
    text         string                after-image = extract_text(html)
    lang         string                after-image
    before       map<string,binary>    before-image for 'u'/'d'
    extras       map<string,string>    post-evolution columns before projection
    schema_ver   int                   dictionary version
    rolled_back  boolean               ~2% true → must be excluded (partial rollback,
                                       reference src/parser/Transaction.cpp:71-187)
    action / col_name / new_name / new_type   ddl payload (null on dml rows)

Skew: url #0 receives ~5% of all events (hot-key path for salted two-phase LWW).
Order: ~10% of events are emitted out of warc_ts order within a ±500-row window.
Schema evolution: v2 adds `fetch_status int` @60%, v3 widens to long @75%,
v4 renames to `http_status` @90% (FIXTURES.md §3 standard scenario).
"""

from __future__ import annotations

import os
import zlib
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .functions.extract import extract_text

BASE_TS_US = np.int64(1577836800000000)  # 2020-01-01T00:00:00Z in microseconds
LANGS = ["en", "de", "fr", "es", "pl", "ja"]
_VOCAB = (
    "the quick brown fox jumps over lazy dog web page crawl index rank link "
    "anchor title body data stream merge batch epoch commit snapshot schema "
    "update delete insert row key value shuffle partition skew salt window "
    "apache spark catalyst tungsten arrow vector column lake iceberg &amp; "
    "café über straße 東京 naïve &#x2603; <b>bold</b>"
).split(" ")

DDL_SCENARIO = [
    # (fraction of stream, action, col_name, new_name, new_type, new schema_ver)
    (0.60, "add_column", "fetch_status", None, "int", 2),
    (0.75, "widen_type", "fetch_status", None, "long", 3),
    (0.90, "rename_column", "fetch_status", "http_status", None, 4),
]

EVENTS_SCHEMA = pa.schema(
    [
        pa.field("seq", pa.int64()),
        pa.field("warc_ts", pa.timestamp("us", tz="UTC")),
        pa.field("op", pa.string()),
        pa.field("url", pa.string()),
        pa.field("html", pa.binary()),
        pa.field("text", pa.string()),
        pa.field("lang", pa.string()),
        pa.field("before", pa.map_(pa.string(), pa.binary())),
        pa.field("extras", pa.map_(pa.string(), pa.string())),
        pa.field("schema_ver", pa.int32()),
        pa.field("rolled_back", pa.bool_()),
        pa.field("action", pa.string()),
        pa.field("col_name", pa.string()),
        pa.field("new_name", pa.string()),
        pa.field("new_type", pa.string()),
    ]
)


@dataclass(frozen=True)
class GenSpec:
    seed: int = 42
    n_events: int = 6000
    n_urls: int = 500
    n_files: int = 8
    hot_share: float = 0.05
    ooo_share: float = 0.10
    ooo_window: int = 500
    rollback_share: float = 0.02
    with_ddl: bool = True
    min_words: int = 8
    max_words: int = 120


def _make_html(rng: np.random.Generator, n_words: int) -> bytes:
    words = rng.choice(len(_VOCAB), size=n_words)
    body = " ".join(_VOCAB[w] for w in words)
    title = " ".join(_VOCAB[w] for w in words[:3])
    return (
        f"<html><head><title>{title}</title>"
        f"<script>var t={int(words[0])};</script></head>"
        f"<body><h1>{title}</h1><p>{body}</p></body></html>"
    ).encode("utf-8")


def generate_events(spec: GenSpec = GenSpec()) -> pa.Table:
    """Build the full event stream as one Arrow table, ordered by seq."""
    rng = np.random.default_rng(spec.seed)
    n = spec.n_events

    # --- url assignment: power law + explicit hot key (FIXTURES.md skew fixture)
    ranks = np.arange(1, spec.n_urls + 1, dtype=np.float64)
    p = 1.0 / ranks**0.8
    p /= p.sum()
    url_idx = rng.choice(spec.n_urls, size=n, p=p)
    hot_mask = rng.random(n) < spec.hot_share
    url_idx[hot_mask] = 0

    # --- logical clock (warc_ts) strictly tied to logical index, with jitter
    jitter = rng.integers(-60_000_000, 60_000_000, size=n, dtype=np.int64)
    warc_us = BASE_TS_US + np.arange(n, dtype=np.int64) * 137_000_000 + jitter

    # --- ops: first touch per url is 'c'; later 70% 'u' / 15% 'd' / 15% 'c'
    r = rng.random(n)
    ops = np.where(r < 0.70, "u", np.where(r < 0.85, "d", "c")).astype(object)
    seen: set[int] = set()
    for i in range(n):
        u = int(url_idx[i])
        if u not in seen:
            ops[i] = "c"
            seen.add(u)

    rolled = rng.random(n) < spec.rollback_share
    status_vals = rng.choice([200, 200, 200, 301, 404, 500], size=n)
    n_words = rng.integers(spec.min_words, spec.max_words + 1, size=n)

    # --- per-event payloads in logical order; track before-images per url
    html_col: list[bytes | None] = [None] * n
    text_col: list[str | None] = [None] * n
    before_col: list[list[tuple[str, bytes]] | None] = [None] * n
    last_text: dict[int, bytes] = {}
    for i in range(n):
        u = int(url_idx[i])
        prev = last_text.get(u)
        if ops[i] in ("u", "d") and prev is not None:
            before_col[i] = [("text", prev)]
        if ops[i] == "d":
            if not rolled[i]:
                last_text.pop(u, None)
            continue
        h = _make_html(rng, int(n_words[i]))
        t = extract_text(h)
        html_col[i] = h
        text_col[i] = t
        if not rolled[i]:
            last_text[u] = t.encode("utf-8")

    # crc32, not hash(): Python str hash is per-process randomized (PYTHONHASHSEED)
    lang_col = [LANGS[zlib.crc32(b"url%d" % u) % len(LANGS)] for u in url_idx]
    urls = np.array(
        [f"https://site{u % 50}.example/p/{u}" for u in url_idx], dtype=object
    )

    # --- schema evolution plan: DDL is pinned to an EMISSION slot; version
    # stamps + extras follow emission (physical log) order, mirroring a real
    # redo log where the dictionary DDL always physically precedes dependent
    # DML (reference: system transactions commit the dictionary change at
    # their commit SCN before later records reference it, Transaction.cpp:201-208).
    ddl_rows: list[dict] = []
    if spec.with_ddl:
        for frac, action, col_name, new_name, new_type, ver in DDL_SCENARIO:
            ddl_rows.append(
                dict(
                    slot=int(n * frac),
                    action=action,
                    col_name=col_name,
                    new_name=new_name,
                    new_type=new_type,
                    schema_ver=ver,
                )
            )

    # --- emission order: permute ~10% of rows within ±window (late-data fixture)
    order = np.arange(n)
    n_swaps = int(n * spec.ooo_share / 2)
    a_pos = rng.integers(0, n, size=n_swaps)
    off = rng.integers(1, spec.ooo_window + 1, size=n_swaps)
    b_pos = np.minimum(a_pos + off, n - 1)
    for a, b in zip(a_pos, b_pos):
        order[a], order[b] = order[b], order[a]
    # order[s] = logical index emitted at slot s; seq is the emission slot.

    cols: dict[str, list] = {k: [] for k in EVENTS_SCHEMA.names}

    def emit_dml(logical: int, seq: int, cur_ver: int) -> None:
        cols["seq"].append(seq)
        cols["warc_ts"].append(int(warc_us[logical]))
        cols["op"].append(ops[logical])
        cols["url"].append(urls[logical])
        cols["html"].append(html_col[logical])
        cols["text"].append(text_col[logical])
        cols["lang"].append(lang_col[logical])
        cols["before"].append(before_col[logical])
        extras = None
        if cur_ver >= 2 and ops[logical] != "d":
            key = "http_status" if cur_ver >= 4 else "fetch_status"
            extras = [(key, str(int(status_vals[logical])))]
        cols["extras"].append(extras)
        cols["schema_ver"].append(cur_ver)
        cols["rolled_back"].append(bool(rolled[logical]))
        for k in ("action", "col_name", "new_name", "new_type"):
            cols[k].append(None)

    def emit_ddl(d: dict, seq: int, ts_us: int) -> None:
        cols["seq"].append(seq)
        cols["warc_ts"].append(ts_us)
        cols["op"].append("ddl")
        cols["url"].append(None)
        cols["html"].append(None)
        cols["text"].append(None)
        cols["lang"].append(None)
        cols["before"].append(None)
        cols["extras"].append(None)
        cols["schema_ver"].append(d["schema_ver"])
        cols["rolled_back"].append(False)
        cols["action"].append(d["action"])
        cols["col_name"].append(d["col_name"])
        cols["new_name"].append(d["new_name"])
        cols["new_type"].append(d["new_type"])

    ddl_by_slot: dict[int, list[dict]] = {}
    for d in ddl_rows:
        ddl_by_slot.setdefault(d["slot"], []).append(d)
    seq = 0
    cur_ver = 1
    for s in range(n):
        logical = int(order[s])
        for d in ddl_by_slot.get(s, ()):
            emit_ddl(d, seq, int(BASE_TS_US + s * 137_000_000))
            cur_ver = d["schema_ver"]
            seq += 1
        emit_dml(logical, seq, cur_ver)
        seq += 1

    arrays = []
    for field in EVENTS_SCHEMA:
        if field.name == "warc_ts":
            arrays.append(pa.array(cols["warc_ts"], type=pa.timestamp("us", tz="UTC")))
        else:
            arrays.append(pa.array(cols[field.name], type=field.type))
    return pa.Table.from_arrays(arrays, schema=EVENTS_SCHEMA)


def generate_events_fast(
    seed: int = 42,
    n_events: int = 4_000_000,
    n_urls: int = 300_000,
    n_pool: int = 30_000,
    hot_share: float = 0.05,
    rollback_share: float = 0.02,
    with_ddl: bool = True,
) -> pa.Table:
    """Bench-scale generator: vectorized (numpy/Arrow) end to end, ~100×
    faster than generate_events. HTML payloads are drawn from a deterministic
    pool of n_pool distinct pages (content uniqueness doesn't affect CDC
    semantics — LWW keys on url). Same schema as generate_events; `before`
    is null (the engine never reads it). Deterministic in (seed, sizes).
    """
    rng = np.random.default_rng(seed)

    # --- content pool (python loop bounded by n_pool, not n_events)
    pool_html: list[bytes] = []
    pool_text: list[str] = []
    n_words = rng.integers(8, 80, size=n_pool)
    for i in range(n_pool):
        h = _make_html(rng, int(n_words[i]))
        pool_html.append(h)
        pool_text.append(extract_text(h))
    pool_html_arr = pa.array(pool_html, type=pa.binary())
    pool_text_arr = pa.array(pool_text, type=pa.string())

    # --- vectorized event columns
    n = n_events
    ranks = np.arange(1, n_urls + 1, dtype=np.float64)
    p = 1.0 / ranks**0.8
    p /= p.sum()
    url_idx = rng.choice(n_urls, size=n, p=p)
    url_idx[rng.random(n) < hot_share] = 0

    jitter = rng.integers(-60_000_000, 60_000_000, size=n, dtype=np.int64)
    warc_us = BASE_TS_US + np.arange(n, dtype=np.int64) * 1_370_000 + jitter

    r = rng.random(n)
    op_codes = np.where(r < 0.70, 1, np.where(r < 0.85, 2, 0))  # 1=u 2=d 0=c
    first_slot = np.full(n_urls, -1, dtype=np.int64)
    uniq, first_idx = np.unique(url_idx, return_index=True)
    first_slot[uniq] = first_idx
    op_codes[first_idx] = 0  # first touch per url is a create
    ops = np.array(["c", "u", "d"], dtype=object)[op_codes]

    rolled = rng.random(n) < rollback_share
    pool_idx = rng.integers(0, n_pool, size=n)
    delete_mask = op_codes == 2
    # chunked take: a single binary array is limited to 2 GB of offsets
    html_chunks, text_chunks = [], []
    step = 1_000_000
    for lo in range(0, n, step):
        ti = pa.array(pool_idx[lo:lo + step], mask=delete_mask[lo:lo + step])
        html_chunks.append(pool_html_arr.take(ti))  # null index -> null value
        text_chunks.append(pool_text_arr.take(ti))
    html_arr = pa.chunked_array(html_chunks)
    text_arr = pa.chunked_array(text_chunks)

    # per-url deterministic metadata (python loops bounded by n_urls)
    url_strs = np.array(
        [f"https://site{u % 50}.example/p/{u}" for u in range(n_urls)], dtype=object
    )
    lang_strs = np.array(
        [LANGS[zlib.crc32(b"url%d" % u) % len(LANGS)] for u in range(n_urls)],
        dtype=object,
    )
    urls = pa.array(url_strs[url_idx], type=pa.string())
    langs = pa.array(lang_strs[url_idx], type=pa.string())

    # --- schema versions by emission slot (ddl physically precedes its DML)
    schema_ver = np.ones(n, dtype=np.int32)
    ddl_slots: list[tuple[int, dict]] = []
    if with_ddl:
        for frac, action, col_name, new_name, new_type, ver in DDL_SCENARIO:
            pos = int(n * frac)
            schema_ver[pos:] = ver
            ddl_slots.append(
                (pos, dict(action=action, col_name=col_name, new_name=new_name,
                           new_type=new_type, schema_ver=ver))
            )

    # extras map: one entry for ver>=2 non-delete rows
    has_extra = (schema_ver >= 2) & (~delete_mask)
    status = np.array(["200", "200", "200", "301", "404", "500"], dtype=object)[
        rng.integers(0, 6, size=n)
    ]
    keys_np = np.where(schema_ver >= 4, "http_status", "fetch_status").astype(object)
    offsets = np.zeros(n + 1, dtype=np.int32)
    np.cumsum(has_extra.astype(np.int32), out=offsets[1:])
    extras_arr = pa.MapArray.from_arrays(
        pa.array(offsets),
        pa.array(keys_np[has_extra], type=pa.string()),
        pa.array(status[has_extra], type=pa.string()),
    ).cast(pa.map_(pa.string(), pa.string()))

    dml = pa.table(
        {
            "warc_ts": pa.array(warc_us, type=pa.timestamp("us", tz="UTC")),
            "op": pa.array(ops, type=pa.string()),
            "url": urls,
            "html": html_arr,
            "text": text_arr,
            "lang": langs,
            "extras": extras_arr,
            "schema_ver": pa.array(schema_ver),
            "rolled_back": pa.array(rolled),
        }
    )

    # --- splice ddl rows at their slots, then stamp seq = final position
    pieces = []
    prev = 0
    for pos, d in ddl_slots:
        pieces.append(dml.slice(prev, pos - prev))
        pieces.append(
            pa.table(
                {
                    "warc_ts": pa.array(
                        [int(BASE_TS_US + pos * 1_370_000)],
                        type=pa.timestamp("us", tz="UTC"),
                    ),
                    "op": pa.array(["ddl"]),
                    "url": pa.array([None], type=pa.string()),
                    "html": pa.array([None], type=pa.binary()),
                    "text": pa.array([None], type=pa.string()),
                    "lang": pa.array([None], type=pa.string()),
                    "extras": pa.nulls(1, pa.map_(pa.string(), pa.string())),
                    "schema_ver": pa.array([d["schema_ver"]], type=pa.int32()),
                    "rolled_back": pa.array([False]),
                    "action": pa.array([d["action"]]),
                    "col_name": pa.array([d["col_name"]]),
                    "new_name": pa.array([d["new_name"]], type=pa.string()),
                    "new_type": pa.array([d["new_type"]], type=pa.string()),
                }
            )
        )
        prev = pos
    pieces.append(dml.slice(prev))

    null_str = lambda t: pa.nulls(t.num_rows, pa.string())  # noqa: E731
    full_pieces = []
    for t in pieces:
        if "action" not in t.column_names:
            t = (
                t.append_column("action", null_str(t))
                .append_column("col_name", null_str(t))
                .append_column("new_name", null_str(t))
                .append_column("new_type", null_str(t))
            )
        full_pieces.append(t)
    out = pa.concat_tables(full_pieces)
    total = out.num_rows
    out = out.add_column(0, "seq", pa.array(np.arange(total, dtype=np.int64)))
    out = out.add_column(
        7, "before", pa.nulls(total, pa.map_(pa.string(), pa.binary()))
    )
    return out.select(EVENTS_SCHEMA.names).cast(EVENTS_SCHEMA)


def write_events_fast(out_dir: str, n_files: int = 128, **kw) -> list[str]:
    """write_events for bench scale: vectorized generator, n_files parquet."""
    os.makedirs(out_dir, exist_ok=True)
    table = generate_events_fast(**kw)
    n = table.num_rows
    paths = []
    per = (n + n_files - 1) // n_files
    for f in range(n_files):
        lo, hi = f * per, min((f + 1) * per, n)
        if lo >= hi:
            break
        path = os.path.join(out_dir, f"events-{f:05d}.parquet")
        pq.write_table(table.slice(lo, hi - lo), path, compression="snappy")
        paths.append(path)
    return paths


def write_events(out_dir: str, spec: GenSpec = GenSpec()) -> list[str]:
    """Write the stream as n_files parquet files split by seq range.

    Multiple files = multiple Structured Streaming micro-batches (with
    maxFilesPerTrigger=1) — the LWN/epoch analogue (SURVEY.md §2.2 P1).
    """
    os.makedirs(out_dir, exist_ok=True)
    table = generate_events(spec)
    n = table.num_rows
    paths = []
    per = (n + spec.n_files - 1) // spec.n_files
    for f in range(spec.n_files):
        lo, hi = f * per, min((f + 1) * per, n)
        if lo >= hi:
            break
        path = os.path.join(out_dir, f"events-{f:05d}.parquet")
        pq.write_table(table.slice(lo, hi - lo), path, compression="snappy")
        paths.append(path)
    return paths
