from .loaders import TABLES, load_table, load_tables, ntz_lit, epoch_us, register_views

__all__ = ["TABLES", "load_table", "load_tables", "ntz_lit", "epoch_us", "register_views"]
