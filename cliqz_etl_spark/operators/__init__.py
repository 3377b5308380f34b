from cliqz_etl_spark.operators import dedup, relational, similarity

__all__ = ["dedup", "relational", "similarity"]
