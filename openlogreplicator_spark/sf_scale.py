"""Deterministic scale-up of a testdata sf directory (the sf1 evidence rung).

The driver ships sf{0.001,0.01,0.1}; the 100 TB design claims need at
least one measured point past the bench scale. ``ensure_scaled_dir``
replicates the FACT tables of an sf dir ``factor``× with shifted entity
ids — more orders/events/documents/users, same dimensions — which is how
these workloads actually grow (TPC-H scales facts with SF; a crawl grows
pages, not languages):

* ``orders``/``lineitem``: o_orderkey/l_orderkey shift per copy by a shared
  ceiling (referential integrity preserved); customer/part/supplier keys
  untouched (dims are not scaled).
* ``events``: event_id AND user_id shift — copies are NEW users, so
  per-user session/funnel/retention entries grow in users, not in rows
  per user.
* ``documents``: doc_id shift AND a per-copy token transform (every token
  of copy k gets a ``_r<k>`` suffix) — copy k shares NO tokens/shingles
  with copy j, so the scaled corpus is ``factor`` independent shards each
  carrying the original's internal duplicate structure. Near-dup output
  then scales LINEARLY (how a real corpus grows: new content, same
  duplication rate); plain replication would give every doc ``factor``−1
  exact clones and blow pair-emitting entries up quadratically — a
  duplicate-saturation artifact, not 10× load.
* ``embeddings``: vec_id shift and a per-copy cyclic PERMUTATION of the
  vector dimensions — a permutation is orthogonal, so every cosine
  WITHIN a copy is exactly preserved (intra-shard ANN structure intact)
  while cross-copy similarities scramble to background level.

Pure pyarrow (no Spark, no RNG — replica k is a pure function of the
source), published content-addressed + atomic via datagen.ensure_fixture,
so the DuckDB oracle and the Spark engine read the very same files.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from .datagen import ensure_fixture, fixture_path

#: table → id columns shifted per replica (ceil shared per KEY GROUP so
#: cross-table references stay aligned: lineitem.l_orderkey must shift by
#: orders.o_orderkey's ceiling)
_FACT_SHIFTS: dict[str, dict[str, str]] = {
    "orders": {"o_orderkey": "orderkey"},
    "lineitem": {"l_orderkey": "orderkey"},
    "events": {"event_id": "event", "user_id": "user"},
    "documents": {"doc_id": "doc"},
    "embeddings": {"vec_id": "vec"},
}
_DIMS = ("region", "nation", "customer", "supplier", "part")


def _ceilings(src_dir: str) -> dict[str, int]:
    """One shared ceiling per key group: max over every column in the
    group, +1 — so shifted copies never collide and references align."""
    out: dict[str, int] = {}
    for table, shifts in _FACT_SHIFTS.items():
        path = os.path.join(src_dir, f"{table}.parquet")
        t = pq.read_table(path, columns=list(shifts))
        for col, group in shifts.items():
            hi = pc.max(t[col]).as_py() or 0
            out[group] = max(out.get(group, 0), int(hi) + 1)
    return out


def _write_scaled(src_dir: str, out_dir: str, factor: int) -> None:
    import shutil

    ceil = _ceilings(src_dir)
    for d in _DIMS:
        shutil.copy(
            os.path.join(src_dir, f"{d}.parquet"),
            os.path.join(out_dir, f"{d}.parquet"),
        )
    for table, shifts in _FACT_SHIFTS.items():
        src = pq.read_table(os.path.join(src_dir, f"{table}.parquet"))
        copies = [src]
        for k in range(1, factor):
            t = src
            for col, group in shifts.items():
                idx = t.schema.get_field_index(col)
                shifted = pc.add(t[col], pa.scalar(k * ceil[group], t[col].type))
                t = t.set_column(idx, t.schema.field(idx), shifted)
            if table == "documents":
                t = _shard_documents(t, k)
            elif table == "embeddings":
                t = _rotate_embeddings(t, k)
            copies.append(t)
        pq.write_table(
            pa.concat_tables(copies),
            os.path.join(out_dir, f"{table}.parquet"),
            compression="snappy",
        )


def _shard_documents(t: pa.Table, k: int) -> pa.Table:
    """Suffix every whitespace token of copy k with ``_r<k>``: zero shared
    tokens/shingles across copies, identical duplicate structure within."""
    idx = t.schema.get_field_index("text")
    text = pc.replace_substring_regex(
        t["text"], pattern=r"(\S+)", replacement=rf"\1_r{k}"
    )
    return t.set_column(idx, t.schema.field(idx), text)


def _rotate_embeddings(t: pa.Table, k: int) -> pa.Table:
    """Cyclically permute vector dims by a per-copy offset (orthogonal ⇒
    intra-copy cosines exact; cross-copy similarities scramble)."""
    import numpy as np

    idx = t.schema.get_field_index("embedding")
    col = t["embedding"].combine_chunks()
    mat = np.asarray(col.values.to_numpy(zero_copy_only=False)).reshape(
        len(t), -1
    )
    dim = mat.shape[1]
    rot = np.roll(mat, shift=(k * 7) % dim, axis=1)
    arr = pa.FixedSizeListArray.from_arrays(
        pa.array(rot.reshape(-1), type=pa.float32()), dim
    ).cast(t.schema.field(idx).type)
    return t.set_column(idx, t.schema.field(idx), arr)


def ensure_scaled_dir(
    src_dir: str, factor: int, base: str | None = None
) -> str:
    """Content-addressed scaled copy of ``src_dir`` (atomic publish)."""
    if base is None:
        base = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"
    spec = {"src": os.path.abspath(src_dir), "factor": int(factor),
            "scale_version": 2}
    return ensure_fixture(
        fixture_path(base, f"sf_scaled_x{factor}", spec),
        lambda d: _write_scaled(src_dir, d, int(factor)),
    )
