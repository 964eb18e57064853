"""openlogreplicator_spark — a brand-new PySpark-native CDC / incremental-ingest engine.

Semantics modeled on openlg/OpenLogReplicator (reference at /root/reference, a C++
Oracle redo-log CDC reader): tail an ordered change-event log, decode events into
typed change DataFrames with vectorized Arrow/pandas UDFs, last-writer-wins per key,
apply to a lake table with idempotent MERGE, exactly-once via checkpoint epochs +
commit-snapshot dedup, online schema evolution, per-partition lineage metrics.

Architecture is Spark-first (DataFrame / Structured Streaming / Catalyst), NOT a
translation of the reference's threaded C++ pipeline. See SURVEY.md for the
operator-by-operator mapping (reference file:line citations live in each module).
"""

__version__ = "0.1.0"
