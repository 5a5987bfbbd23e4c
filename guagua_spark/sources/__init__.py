"""Input sources: parquet star-schema loader, text/CSV record readers
(the reference's record-reader surface re-expressed as spark.read)."""

from guagua_spark.sources.tables import TABLE_NAMES, load_table, load_tables

__all__ = ["TABLE_NAMES", "load_table", "load_tables"]
