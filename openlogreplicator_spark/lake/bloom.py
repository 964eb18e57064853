"""Per-file Bloom membership index for manifest-level point-lookup skipping.

Manifest ``col_bounds`` ([min,max] string bounds) only prune an equality
lookup when files carry NARROW value ranges — i.e. after a
``cluster_buckets(sort_cols=(col, ...))`` layout rewrite. On the natural
append layout (every epoch's file spans the whole key space) bounds never
exclude anything, which is exactly the case a Bloom filter solves: a small
per-file bitmap answers "value definitely absent" regardless of value
ordering. This is the Iceberg/Delta file-level bloom-filter index
re-expressed for this table format: the bitmap rides IN the manifest file
entry (bounded, see cap below), is built once at commit time from the
file's actual column values, and is probed driver-side during file
selection — no Spark job, no data I/O. Reference analogue: none (the
reference's checkpoint headers carry scn ranges only — the same role
``ts_min_us``/``ts_max_us`` bounds play here); Iceberg parity feature.

Soundness (no false negatives — a pruned file must truly lack the value):

* Build and probe run the SAME Python hash function below over the same
  UTF-8 bytes — never two implementations of "the same" hash (the rule the
  Bloom-prefiltered dedup operator and ``lookup_keys`` already follow).
* Every row group's values are fed to the bitmap (the whole column is read
  at build time); files written before the index was enabled, or whose
  build was skipped, simply carry no bitmap — absent bloom = never prune.
* NULLs are not inserted: SQL equality never matches NULL, so a probe for
  any value may safely skip an all-NULL file.
* False POSITIVES only cost a wasted file read; the capped bitmap degrades
  toward read-everything, never toward wrong results.

Sizing: ~10 bits/row (<2% fpp at k=4), rounded up to a power of two and
capped at 2^17 bits = 16 KiB of bitmap per column per file — manifest
entries stay small even for multi-million-row files (a capped bitmap's fpp
rises, which only weakens pruning). Hashing is Kirsch–Mitzenmacher double
hashing from one md5: positions h1 + i*h2 (mod m), the standard trick that
gives k independent-enough probes from two 64-bit halves.
"""

from __future__ import annotations

import base64
import hashlib
from typing import Iterable

BLOOM_BITS_PER_ROW = 10
BLOOM_MAX_BITS = 1 << 17  # 16 KiB bitmap cap per column per file
BLOOM_K = 4


def bloom_n_bits(n_rows: int) -> int:
    """Power-of-two bitmap width for a file of ``n_rows`` values."""
    target = max(n_rows, 1) * BLOOM_BITS_PER_ROW
    return min(1 << max(6, (target - 1).bit_length()), BLOOM_MAX_BITS)


def _positions(value: str, m: int, k: int = BLOOM_K) -> list[int]:
    d = hashlib.md5(value.encode("utf-8")).digest()
    h1 = int.from_bytes(d[:8], "big")
    h2 = int.from_bytes(d[8:], "big") | 1  # odd => full-period stepping
    return [(h1 + i * h2) % m for i in range(k)]


def bloom_build(values: Iterable[str | None], n_rows: int) -> dict:
    """Manifest-embeddable bloom entry from a file's column values.

    ``n_rows`` sizes the bitmap (pass the file's row count — distinct count
    is unknown and overestimating only lowers fpp). None values are skipped
    (see module docstring). Returns {"m": bits, "k": hashes, "b64": bitmap}.
    """
    m = bloom_n_bits(n_rows)
    bits = bytearray(m // 8)
    for v in values:
        if v is None:
            continue
        for p in _positions(str(v), m):
            bits[p >> 3] |= 1 << (p & 7)
    return {"m": m, "k": BLOOM_K, "b64": base64.b64encode(bytes(bits)).decode()}


def bloom_might_contain(entry: dict, value: str) -> bool:
    """Probe: False = value DEFINITELY absent from the file (safe to skip);
    True = possibly present (must read). Malformed entries answer True —
    degrade to never-prune, same as an absent bloom."""
    try:
        m, k = int(entry["m"]), int(entry["k"])
        bits = base64.b64decode(entry["b64"])
        if m <= 0 or len(bits) * 8 < m:
            return True
    except (KeyError, TypeError, ValueError):
        return True
    for p in _positions(str(value), m, k):
        if not bits[p >> 3] & (1 << (p & 7)):
            return False
    return True
