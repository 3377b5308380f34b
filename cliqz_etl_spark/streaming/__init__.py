from cliqz_etl_spark.streaming import jobs

__all__ = ["jobs"]
