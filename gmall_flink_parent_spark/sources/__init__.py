"""Source connectors (SURVEY §2.1)."""

from gmall_flink_parent_spark.sources.tables import TABLES, load_table, load_tables, register_views

__all__ = ["TABLES", "load_table", "load_tables", "register_views"]
