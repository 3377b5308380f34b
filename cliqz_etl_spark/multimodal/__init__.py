from cliqz_etl_spark.multimodal import binary_ops

__all__ = ["binary_ops"]
