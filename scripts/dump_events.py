"""dump-events — the human-diffable change-log dump (reference
`dump-redo-log` analogue, Parser.cpp:129-186: a byte-stable text rendering
of every record so two replays can be compared with plain `diff`).

The reference mimics `ALTER SYSTEM DUMP LOGFILE` over binary redo; our log
is typed parquet, so the dump renders every event — committed or not — in
a canonical fixed-width line keyed by (seq, file), with payload columns
digested (md5 of html/text) so the output is small, deterministic, and
diffable across engines and machines:

    seq=0000000042 ts=2020-01-03T07:15:21.000000 op=u ver=2 rb=0 \
        url=https://... html=9f86d08… text=6h…  extras=k1=v1,k2=v2

Pure pyarrow (no Spark session): the dump must work on a box where only
the log files exist, exactly like the reference's offline dump mode.

Usage:
    python scripts/dump_events.py <events_dir_or_file> [out_file]
    # no out_file → stdout
"""

from __future__ import annotations

import glob
import hashlib
import os
import sys

import pyarrow.dataset as ds


def _md5(v) -> str:
    if v is None:
        return "-"
    if isinstance(v, str):
        v = v.encode()
    return hashlib.md5(bytes(v)).hexdigest()[:12]


def dump_lines(path: str):
    """Yield one canonical line per event, ordered by (seq, url) — a total
    order over the log regardless of file layout or scan order."""
    files = (
        sorted(glob.glob(os.path.join(path, "*.parquet")))
        if os.path.isdir(path) else [path]
    )
    if not files:
        raise FileNotFoundError(f"no parquet files under {path}")
    rows = []
    for f in files:
        t = ds.dataset(f, format="parquet").to_table()
        d = t.to_pylist()
        for r in d:
            rows.append(r)
    rows.sort(key=lambda r: (
        r.get("seq") if r.get("seq") is not None else -1,
        r.get("url") or "",
    ))
    for r in rows:
        ts = r.get("warc_ts")
        extras = r.get("extras") or {}
        if isinstance(extras, dict):
            ex = ",".join(f"{k}={extras[k]}" for k in sorted(extras))
        else:
            ex = ",".join(f"{k}={v}" for k, v in sorted(extras))
        ddl = ""
        if r.get("op") == "ddl":
            ddl = (
                f" ddl={r.get('action') or 'sql'}:{r.get('col_name') or '-'}"
                f"->{r.get('new_name') or '-'}:{r.get('new_type') or '-'}"
            )
        # null seq renders as -1, matching the sort key's null placement
        s = r.get("seq")
        yield (
            f"seq={(s if s is not None else -1):010d}"
            f" ts={ts.isoformat() if ts is not None else '-'}"
            f" op={r.get('op') or '-'}"
            f" ver={r.get('schema_ver') or 0}"
            f" rb={1 if r.get('rolled_back') else 0}"
            f" url={r.get('url') or '-'}"
            f" html={_md5(r.get('html'))}"
            f" text={_md5(r.get('text'))}"
            f" lang={r.get('lang') or '-'}"
            f"{ddl}"
            f" extras={ex or '-'}"
        )


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    out = open(sys.argv[2], "w") if len(sys.argv) > 2 else sys.stdout
    n = 0
    for line in dump_lines(sys.argv[1]):
        print(line, file=out)
        n += 1
    if out is not sys.stdout:
        out.close()
        print(f"dumped {n} events to {sys.argv[2]}")
    return 0


if __name__ == "__main__":
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    raise SystemExit(main())
