"""Pure-pandas reference replayer — the golden oracle for final-state equivalence.

Plays the role of the reference's materialized target: "replaying the full event log
yields a final table state identical to the reference's" (BASELINE.json north_star;
reference emission semantics: committed transactions in commit order, exactly once —
/root/reference/documentation/user-manual/user-manual.adoc:116-131).

Semantics (must match the Spark engine bit-for-bit):
  * rolled_back events are excluded (partial rollback, Transaction.cpp:71-187),
  * total order = (warc_ts, seq) — seq breaks warc_ts ties (scn/subScn sort,
    Parser.cpp:1352-1358),
  * last writer wins per url; a winning 'd' removes the url,
  * ddl events evolve the schema: add_column / widen_type / rename_column; the
    evolved column value rides in `extras` under its then-current name and surfaces
    under the FINAL name (dictionary replay, SystemTransaction.cpp — SURVEY.md §2.9).

Output columns: url, warc_ts, html, text, lang, http_status (nullable Int64).
"""

from __future__ import annotations

import pandas as pd


def evolved_column_names(events: pd.DataFrame) -> dict[str, str]:
    """Replay ddl rows in (warc_ts, seq) order → {original_name: final_name}."""
    ddl = events[events["op"] == "ddl"].sort_values(["warc_ts", "seq"], kind="stable")
    names: dict[str, str] = {}  # original -> current
    for _, row in ddl.iterrows():
        if row["action"] == "add_column":
            names[row["col_name"]] = row["col_name"]
        elif row["action"] == "rename_column":
            for orig, cur in list(names.items()):
                if cur == row["col_name"]:
                    names[orig] = row["new_name"]
        # widen_type: value domain unchanged (int ⊂ long); nothing to rename
    return names


def replay(events: pd.DataFrame) -> pd.DataFrame:
    """Apply the full change log; return the final state sorted by url."""
    ev = events[~events["rolled_back"].astype(bool)].copy()
    names = evolved_column_names(ev)
    dml = ev[ev["op"] != "ddl"]
    dml = dml.sort_values(["warc_ts", "seq"], kind="stable")
    winners = dml.groupby("url", as_index=False).tail(1)
    alive = winners[winners["op"] != "d"].copy()

    # Aliases the evolved column was ever known by (fetch_status, http_status, ...)
    aliases: dict[str, list[str]] = {}
    for orig, final in names.items():
        aliases.setdefault(final, []).append(orig)
        if final != orig:
            aliases[final].append(final)

    def _extras_get(extras, keys: list[str]):
        if extras is None:
            return None
        kv = dict(extras) if not isinstance(extras, dict) else extras
        for k in keys:
            if k in kv and kv[k] is not None:
                return kv[k]
        return None

    out = alive[["url", "warc_ts", "html", "text", "lang"]].reset_index(drop=True)
    for final, keys in sorted(aliases.items()):
        vals = alive["extras"].map(lambda e: _extras_get(e, keys)).reset_index(drop=True)
        out[final] = pd.array(
            [int(v) if v is not None else None for v in vals], dtype="Int64"
        )
    if not aliases:
        out["http_status"] = pd.array([None] * len(out), dtype="Int64")
    return out.sort_values("url", kind="stable").reset_index(drop=True)
