from .loaders import TABLES, load_table, load_tables, ns, register_views

__all__ = ["TABLES", "load_table", "load_tables", "ns", "register_views"]
