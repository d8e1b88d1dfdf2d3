from .tables import TABLES, load_events_ts_range, load_table, register_views

__all__ = ["TABLES", "load_events_ts_range", "load_table", "register_views"]
