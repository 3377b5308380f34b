"""cliqz_etl_spark — a PySpark-native analytics engine.

Brand-new, idiomatic PySpark rebuild of the query and data-processing
capabilities of the reference ETL pipeline (harterrt/cliqz_etl), extended
with the operators a large-scale (100 TB) training-data pipeline needs:
deduplication, similarity search, multimodal column plumbing, and text
analysis.

Design principles (see ARCHITECTURE.md):

- Declare logical plans with the DataFrame/SQL API; let Catalyst + AQE pick
  physical strategy (join selection, partition coalescing, skew handling).
- Keep the hot path JVM-side: built-in ``pyspark.sql.functions`` everywhere;
  Arrow-batched Pandas UDFs only where built-ins genuinely cannot express
  the semantics (multimodal decode); never row-at-a-time Python UDFs.
- No driver-side collect loops: key sets travel as broadcast semi-joins,
  per-key limits are windows, aggregation is partial (map-side) by default.
"""

from cliqz_etl_spark.session import get_spark
from cliqz_etl_spark.tables import TABLES, load_table, register_tables

__all__ = ["get_spark", "TABLES", "load_table", "register_tables"]

__version__ = "0.1.0"
