from .incremental import available_now_upsert, windowed_event_counts

__all__ = ["available_now_upsert", "windowed_event_counts"]
