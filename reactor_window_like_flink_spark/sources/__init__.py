from reactor_window_like_flink_spark.sources.tables import TABLES, load, register_views

__all__ = ["TABLES", "load", "register_views"]
