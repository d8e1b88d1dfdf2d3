from .tables import load_table, register_views, TABLES

__all__ = ["load_table", "register_views", "TABLES"]
