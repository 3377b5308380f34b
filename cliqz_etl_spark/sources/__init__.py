"""Custom Spark data sources (the Spark 4 Python DataSource API)."""

from cliqz_etl_spark.sources.jsonl_sink import JsonlShardDataSource
from cliqz_etl_spark.sources.synthetic import SyntheticEventsDataSource

__all__ = ["JsonlShardDataSource", "SyntheticEventsDataSource"]
