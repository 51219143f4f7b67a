"""Structured Streaming surface.

The reference pipeline is strictly batch (SURVEY.md §2.8) — no streams,
watermarks, or stateful operators exist there. This package holds the
streaming *variants* of the batch operators for deployments that feed the
Bronze layer continuously; see ``jobs.py``.
"""

from .jobs import (  # noqa: F401
    replay_to_memory,
    stream_bookings_ingest,
    streaming_bookings_per_window,
    streaming_click_attribution,
    streaming_dedup,
    streaming_enrich,
    streaming_event_type_counts,
    streaming_session_windows,
    streaming_user_totals,
)
