"""Pipeline operators (SURVEY.md §2): decode/filter (P3-P12), last-writer-wins
compaction (A3/W2), and merge-apply (J5). All DataFrame-native — Catalyst does
predicate pushdown, partial aggregation, and AQE skew handling for free.
"""

from .decode import dml_events, ddl_events, project_dml  # noqa: F401
from .lww import (lww_compact, lww_compact_salted,  # noqa: F401
    lww_compact_semijoin, lww_compact_window)  # noqa: F401
from .merge import merge_into  # noqa: F401
