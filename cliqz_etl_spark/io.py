"""Sources and sinks.

Re-expresses the reference's IO surface (SURVEY.md §2.1/§2.2) Spark-first:

- S1 ping scan with pushed-down metadata predicates -> partitioned parquet
  scan + ``.where`` on partition columns (Catalyst partition pruning).
- S2 CSV-with-header scan  (testpilot_data.py:172-173, minus the .rdd hop).
- S3 text scalar read      (testpilot_data.py:97).
- S4 parquet scan -> view  (profile_daily.py:11-14).
- K1/K2 partitioned idempotent parquet overwrite (testpilot_data.py:72-82):
  the hand-built ``.../cliqz_{name}/v1/submission={day}`` path becomes
  ``partitionBy`` + dynamic partition overwrite, which keeps the
  daily-re-run idempotency without string-built paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def read_parquet(spark: SparkSession, path: str, *,
                 schema: StructType | None = None,
                 view: str | None = None, **predicates) -> DataFrame:
    """Parquet scan; keyword predicates become equality filters that Catalyst
    pushes into the scan (partition pruning when the column is a partition
    key — the rebuild of S1's `.where(submissionDate=day)` pushdown,
    testpilot_data.py:90-94)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.parquet(path)
    for col, value in predicates.items():
        df = df.where(F.col(col) == F.lit(value))
    if view:
        df.createOrReplaceTempView(view)
    return df


def read_csv(spark: SparkSession, path: str, *,
             schema: StructType | None = None, header: bool = True) -> DataFrame:
    """CSV scan with header (S2). Stays a DataFrame end-to-end — the
    reference dropped to ``.rdd`` (testpilot_data.py:173), which defeats
    column pruning; here typed columns come from an explicit schema or
    post-hoc try-casts (functions.scalars.clean_cast)."""
    reader = spark.read.options(header=str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    return reader.csv(path)


def read_json(spark: SparkSession, path: str, *,
              schema: StructType | None = None) -> DataFrame:
    """Nested JSON scan (the ping-shaped ingest boundary). An explicit
    schema skips the inference pass — mandatory at 100 TB."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_text_scalar(spark: SparkSession, path: str) -> str:
    """First line of a text file as a driver-side scalar (S3,
    testpilot_data.py:97). Broadcast it (or embed as a literal) if used in
    executor-side expressions."""
    return spark.read.text(path).first()[0]


def upsert_parquet(spark: SparkSession, base_path: str, updates: DataFrame,
                   key: str | list[str]) -> None:
    """SCD-1 upsert into a parquet table: rows in ``updates`` replace
    same-key rows in the base, new keys append. Implemented as
    anti-join(base, updates) ∪ updates -> overwrite — the merge pattern
    for plain parquet (a table format like Iceberg/Delta would do this
    transactionally; the logic is identical).

    The rewrite cost is the whole table; partition the base and upsert
    per-partition (write_parquet's dynamic overwrite) when keys are
    partition-aligned — this helper is for the unpartitioned case."""
    keys = [key] if isinstance(key, str) else list(key)
    base = spark.read.parquet(base_path)
    merged = base.join(updates.select(*keys).distinct(), keys, "left_anti") \
        .unionByName(updates)
    # parquet overwrite reads lazily from the same path it writes: stage
    # through a sibling path, then swap via a second (scan-only) job
    tmp = base_path.rstrip("/") + ".__staging__"
    merged.write.mode("overwrite").parquet(tmp)
    spark.read.parquet(tmp).write.mode("overwrite").parquet(base_path)


def write_parquet(df: DataFrame, path: str, *,
                  partition_by: str | list[str] | None = None,
                  mode: str = "overwrite",
                  sort_within_partitions: str | list[str] | None = None,
                  target_files: int | None = None) -> None:
    """Partitioned idempotent parquet write (K1/K2).

    ``target_files`` replaces the reference's ``repartition(1)`` /
    ``repartition(16*5)`` file sizing (testpilot_data.py:82,197-200); when
    unset, AQE's coalesced shuffle partitions decide — the right default at
    scale. With ``partitionOverwriteMode=dynamic`` (session.py) an
    overwrite replaces only the partitions present in ``df``: re-running a
    day rewrites that day only, the reference's core operational semantic.
    """
    if target_files is not None:
        df = df.repartition(target_files)
    if sort_within_partitions:
        # clustering rows by a scan predicate's column tightens parquet
        # row-group min/max stats -> data skipping at read time
        cols = ([sort_within_partitions] if isinstance(sort_within_partitions, str)
                else list(sort_within_partitions))
        df = df.sortWithinPartitions(*cols)
    writer = df.write.mode(mode)
    if partition_by:
        cols = [partition_by] if isinstance(partition_by, str) else list(partition_by)
        writer = writer.partitionBy(*cols)
    writer.parquet(path)
