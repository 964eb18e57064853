"""LakeTable — minimal ACID table format for the CDC target (Iceberg stand-in).

Semantics modeled on what the reference needs from its checkpoint/state layer
(/root/reference/src/writer/Writer.cpp:346-422 confirmed-(scn,idx) checkpoints;
src/metadata/Metadata.cpp:352-503 schema snapshots with ref-indirection), and on
Iceberg's public design (snapshots + manifests + field-id schema evolution):

* Immutable parquet data files, hash-bucketed by the merge key
  (``bucket = pmod(xxhash64(key), n_buckets)``) so MERGE only rewrites touched
  buckets — copy-on-write with partition pruning, the scale path for upserts.
* JSON snapshot per commit: full file list, schema history, summary. The
  ``_current`` pointer is swapped with an atomic ``os.replace`` — readers see
  either the old or the new snapshot, never a torn state.
* Snapshot summaries carry ``epoch_id`` + ``final`` — the commit-snapshot dedup
  gate for exactly-once (reference ``isNewData``, Metadata.cpp:592-603).
* Schema evolution by field id: ``add_column`` / ``rename_column`` /
  ``widen_type`` change only metadata. Data files record the schema version
  they were written under; reads remap old names → current names by field id
  and cast to the current (possibly widened) type. No data rewrite — same
  contract as Iceberg ALTER TABLE (SURVEY.md §2.9).

Single-writer per table (the streaming apply loop), many readers — matching
Structured Streaming's one-query-owns-the-sink model.
"""

from __future__ import annotations

import json
import os
import uuid
from typing import Any, Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_WIDENINGS = {
    ("int", "long"),
    ("int", "bigint"),
    ("float", "double"),
    ("int", "double"),
    ("long", "double"),
}


def _norm_type(t: str) -> str:
    t = t.lower().strip()
    return {"bigint": "long", "integer": "int"}.get(t, t)


class LakeTable:
    """A bucketed, snapshot-versioned parquet table with schema evolution."""

    def __init__(self, spark: SparkSession, path: str, snap: dict):
        self.spark = spark
        self.path = path
        self.snap = snap

    # ---------------------------------------------------------------- setup
    @staticmethod
    def create(
        spark: SparkSession,
        path: str,
        fields: list[tuple[str, str]],
        key_col: str,
        n_buckets: int = 16,
        schema_ver: int = 1,
        reserved_cols: list[str] | None = None,
    ) -> "LakeTable":
        """Create an empty table. ``fields`` = [(name, spark_ddl_type), ...].

        ``reserved_cols``: columns (beyond the key) the engine addresses by
        name — e.g. LWW order columns — protected from rename_column."""
        os.makedirs(os.path.join(path, "_snapshots"), exist_ok=True)
        os.makedirs(os.path.join(path, "data"), exist_ok=True)
        schema = [
            {"id": i + 1, "name": n, "type": _norm_type(t)}
            for i, (n, t) in enumerate(fields)
        ]
        snap = {
            "version": 1,
            "parent": None,
            "key_col": key_col,
            "reserved_cols": list(reserved_cols or []),
            "n_buckets": n_buckets,
            "current_schema_ver": schema_ver,
            "next_field_id": len(schema) + 1,
            "schemas": {str(schema_ver): schema},
            "files": [],
            "summary": {"op": "create"},
        }
        t = LakeTable(spark, path, snap)
        t._write_snapshot(snap)
        return t

    @staticmethod
    def load(spark: SparkSession, path: str, version: int | None = None) -> "LakeTable":
        """Load the current snapshot, or a historical one (time travel — the
        Iceberg `VERSION AS OF` analogue; the reference's as-of-SCN dictionary
        read, ReplicatorOnline.cpp:184, is the same idea)."""
        if version is None:
            cur = os.path.join(path, "_snapshots", "_current")
            with open(cur) as f:
                version = int(f.read().strip())
        with open(os.path.join(path, "_snapshots", f"v{version:08d}.json")) as f:
            return LakeTable(spark, path, json.load(f))

    def versions(self) -> list[int]:
        sdir = os.path.join(self.path, "_snapshots")
        return sorted(
            int(f[1:9]) for f in os.listdir(sdir)
            if f.startswith("v") and f.endswith(".json")
        )

    @staticmethod
    def exists(path: str) -> bool:
        return os.path.exists(os.path.join(path, "_snapshots", "_current"))

    # ------------------------------------------------------------- metadata
    @property
    def key_col(self) -> str:
        return self.snap["key_col"]

    @property
    def n_buckets(self) -> int:
        return self.snap["n_buckets"]

    @property
    def current_schema_ver(self) -> int:
        return self.snap["current_schema_ver"]

    def schema_at(self, ver: int) -> list[dict]:
        return self.snap["schemas"][str(ver)]

    def current_schema(self) -> list[dict]:
        return self.schema_at(self.current_schema_ver)

    def last_epoch(self) -> tuple[int, bool]:
        """(last confirmed epoch_id, whether it was finalized); (-1, True) if none.

        Reads the dedicated ``confirmed_epoch`` snapshot field, which only
        epoch-bearing commits advance and every other commit carries forward —
        so a maintenance commit (evolve / compact / purge) between an epoch and
        its re-delivery cannot reset the exactly-once gate. Falls back to the
        commit summary for pre-upgrade snapshots."""
        ce = self.snap.get("confirmed_epoch")
        if ce is not None:
            return int(ce["epoch_id"]), bool(ce["final"])
        s = self.snap.get("summary", {})
        return int(s.get("epoch_id", -1)), bool(s.get("final", True))

    def bucket_expr(self, key=None):
        key = key if key is not None else F.col(self.key_col)
        return F.pmod(F.xxhash64(key), F.lit(self.n_buckets)).cast("int")

    # ----------------------------------------------------------------- read
    def read(self, buckets: Iterable[int] | None = None) -> DataFrame:
        """Scan the table at the current schema, optionally bucket-pruned.

        Files are grouped by the schema version they were written under and
        remapped (rename by field id, cast for widenings) — the Iceberg
        read-path equivalent of metadata-only evolution.
        """
        bucket_set = set(buckets) if buckets is not None else None
        by_ver: dict[int, list[str]] = {}
        for fe in self.snap["files"]:
            if bucket_set is not None and fe["bucket"] not in bucket_set:
                continue
            by_ver.setdefault(fe["schema_ver"], []).append(
                os.path.join(self.path, fe["path"])
            )
        cur = self.current_schema()
        if not by_ver:
            ddl = ", ".join(f"`{f['name']}` {f['type']}" for f in cur)
            return self.spark.createDataFrame([], ddl)
        parts: list[DataFrame] = []
        for ver, paths in sorted(by_ver.items()):
            old = {f["id"]: f for f in self.schema_at(ver)}
            df = self.spark.read.parquet(*paths)
            cols = []
            for f in cur:
                o = old.get(f["id"])
                if o is None:
                    cols.append(F.lit(None).cast(f["type"]).alias(f["name"]))
                else:
                    cols.append(F.col(o["name"]).cast(f["type"]).alias(f["name"]))
            parts.append(df.select(*cols))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    # ------------------------------------------------------------ evolution
    def evolve(self, action: str, col_name: str, new_name: str | None = None,
               new_type: str | None = None, to_ver: int | None = None) -> None:
        """Apply one DDL event as a metadata-only schema change (SURVEY.md §2.9).

        Mirrors the reference's dictionary replay (SystemTransaction.cpp): the
        change log's ``ddl`` rows drive add_column / rename_column / widen_type.
        """
        cur = [dict(f) for f in self.current_schema()]
        nfid = self.snap["next_field_id"]
        if action == "add_column":
            if any(f["name"] == col_name for f in cur):
                raise ValueError(f"column exists: {col_name}")
            cur.append({"id": nfid, "name": col_name, "type": _norm_type(new_type)})
            nfid += 1
        elif action == "rename_column":
            # Engine-reserved columns (the merge key, LWW order columns and
            # the tombstone marker) are addressed by name throughout the merge
            # path — renaming them would orphan the key; payload columns are
            # safe (project_dml resolves them by field id).
            reserved = {self.key_col} | set(self.snap.get("reserved_cols", ()))
            if col_name in reserved or new_name in reserved:
                raise ValueError(f"cannot rename engine-reserved column: {col_name}")
            tgt = next(f for f in cur if f["name"] == col_name)
            tgt["name"] = new_name
        elif action == "widen_type":
            tgt = next(f for f in cur if f["name"] == col_name)
            old_t, new_t = _norm_type(tgt["type"]), _norm_type(new_type)
            if old_t != new_t and (old_t, new_t) not in _WIDENINGS:
                raise ValueError(f"not a safe widening: {old_t} -> {new_t}")
            tgt["type"] = new_t
        else:
            raise ValueError(f"unknown ddl action: {action}")
        ver = to_ver if to_ver is not None else self.current_schema_ver + 1
        snap = self._next_snap(summary={"op": "evolve", "action": action})
        snap["schemas"][str(ver)] = cur
        snap["current_schema_ver"] = ver
        snap["next_field_id"] = nfid
        self._write_snapshot(snap)
        self.snap = snap

    # ---------------------------------------------------------------- write
    def new_data_dir(self) -> tuple[str, str]:
        """(abs_path, rel_path) of a fresh unique directory for a commit's files."""
        rel = os.path.join("data", f"commit-{self.snap['version'] + 1:08d}-{uuid.uuid4().hex[:8]}")
        absd = os.path.join(self.path, rel)
        return absd, rel

    def commit_files(
        self,
        new_files: list[dict],
        replaced_buckets: Iterable[int],
        summary: dict[str, Any],
        schema_ver: int | None = None,
        extra: dict[str, Any] | None = None,
    ) -> None:
        """Commit: carry over untouched buckets' files, swap in new ones
        (empty ``replaced_buckets`` = pure append, the merge-on-read path).

        ``new_files`` entries: {"path": rel, "bucket": int, "schema_ver": v, "rows": n}.
        ``extra`` merges top-level keys into the snapshot (e.g. the
        needs_read_compaction flag).
        """
        replaced = set(replaced_buckets)
        snap = self._next_snap(summary=summary)
        snap["files"] = [
            f for f in self.snap["files"] if f["bucket"] not in replaced
        ] + list(new_files)
        if schema_ver is not None:
            assert str(schema_ver) in snap["schemas"]
        for k, v in (extra or {}).items():
            snap[k] = v
        self._write_snapshot(snap)
        self.snap = snap

    def commit_summary_only(self, summary: dict[str, Any]) -> None:
        snap = self._next_snap(summary=summary)
        self._write_snapshot(snap)
        self.snap = snap

    # ----------------------------------------------------------- maintenance
    def expire_snapshots(self, keep_last: int = 5) -> dict:
        """GC old snapshots + data files referenced by no retained snapshot.

        Mirrors the reference's checkpoint GC: keep the last N checkpoint
        files, never delete the newest schema-bearing one
        (Metadata.cpp:505-554). The current snapshot and every schema version
        it references are always retained (schemas travel inside snapshots
        here, so retaining the snapshot retains its schema history).
        """
        vers = self.versions()
        keep = set(vers[-keep_last:]) | {self.snap["version"]}
        retained_paths: set[str] = set()
        sdir = os.path.join(self.path, "_snapshots")
        removed_snaps, removed_files = 0, 0
        for v in vers:
            if v in keep:
                with open(os.path.join(sdir, f"v{v:08d}.json")) as f:
                    retained_paths.update(e["path"] for e in json.load(f)["files"])
        for v in vers:
            if v not in keep:
                os.remove(os.path.join(sdir, f"v{v:08d}.json"))
                removed_snaps += 1
        data_root = os.path.join(self.path, "data")
        for root, _dirs, files in os.walk(data_root):
            for fn in files:
                rel = os.path.relpath(os.path.join(root, fn), self.path)
                if fn.endswith(".parquet") and rel not in retained_paths:
                    os.remove(os.path.join(root, fn))
                    removed_files += 1
        for root, dirs, files in os.walk(data_root, topdown=False):
            if root != data_root and not dirs and not files:
                os.rmdir(root)
        return {"snapshots_removed": removed_snaps, "data_files_removed": removed_files}

    # ------------------------------------------------------------- internal
    def _next_snap(self, summary: dict[str, Any]) -> dict:
        snap = json.loads(json.dumps(self.snap))  # deep copy
        snap["parent"] = self.snap["version"]
        snap["version"] = self.snap["version"] + 1
        snap["summary"] = summary
        # confirmed-epoch high watermark: advanced only by epoch-bearing
        # commits, carried forward (via the deep copy) by everything else.
        if "epoch_id" in summary:
            snap["confirmed_epoch"] = {
                "epoch_id": int(summary["epoch_id"]),
                "final": bool(summary.get("final", True)),
            }
        return snap

    def _write_snapshot(self, snap: dict) -> None:
        sdir = os.path.join(self.path, "_snapshots")
        vpath = os.path.join(sdir, f"v{snap['version']:08d}.json")
        tmp = vpath + ".tmp"
        with open(tmp, "w") as f:
            json.dump(snap, f, indent=1)
        os.replace(tmp, vpath)
        ptmp = os.path.join(sdir, "_current.tmp")
        with open(ptmp, "w") as f:
            f.write(str(snap["version"]))
        os.replace(ptmp, os.path.join(sdir, "_current"))
