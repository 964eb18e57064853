"""Structured Streaming apply loop (SURVEY.md §2.8, §3.2): readStream over the
change log, foreachBatch epochs (the LWN analogue), exactly-once via epoch-id
commit-snapshot dedup, ordered mid-stream schema evolution, lineage metrics.
"""

from .pipeline import CdcPipeline, TARGET_BASE_FIELDS  # noqa: F401
from .dedup import first_seen_only  # noqa: F401
