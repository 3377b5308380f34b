from cliqz_etl_spark.functions import hashing, scalars, text

__all__ = ["hashing", "scalars", "text"]
