from .readers import TABLES, load_tables, read_table, register_views
from .writers import write_partitioned

__all__ = ["TABLES", "load_tables", "read_table", "register_views", "write_partitioned"]
