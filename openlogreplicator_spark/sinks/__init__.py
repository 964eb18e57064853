"""Output side (reference Builder/Writer stages): JSON change-message
construction and sink framing (SURVEY.md §2.7 F12, §3.2 Writer)."""

from .builders import build_json_messages, kafka_frame, write_file_sink  # noqa: F401
from .network import NetworkConfirmSink  # noqa: F401
