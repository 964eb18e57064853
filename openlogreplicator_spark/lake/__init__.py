"""Minimal Iceberg-style lakehouse table layer (snapshots, schema evolution,
bucketed copy-on-write, epoch-dedup commit summaries) over parquet.

No Iceberg/Delta jars ship in this sandbox, so the engine provides its own
table format with the subset of semantics the CDC apply loop needs. The design
mirrors Iceberg's: immutable data files + JSON snapshot manifests + atomic
pointer swap + field-id-based schema evolution (rename/widen never rewrite
data files). See lake/table.py.
"""

from .table import LakeTable  # noqa: F401
