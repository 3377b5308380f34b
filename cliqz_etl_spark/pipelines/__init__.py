from cliqz_etl_spark.pipelines import profile_daily, testpilot

__all__ = ["profile_daily", "testpilot"]
