"""Extraction compiler unit tests: nested-path addressing, error->NULL
cells, guarded UDF escape hatch (reference semantics of
testpilot_data.py:41-66)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    MapType,
    StringType,
    StructField,
    StructType,
)

from cliqz_etl_spark.extract import ColumnSpec, ExtractConfig, guarded_udf, path_col

PING_SCHEMA = StructType([
    StructField("clientId", StringType()),
    StructField("meta", StructType([StructField("geoCountry", StringType())])),
    StructField("environment", StructType([
        StructField("addons", StructType([
            StructField("activeAddons",
                        MapType(StringType(),
                                StructType([StructField("version", StringType())]))),
        ])),
    ])),
    StructField("payload", StructType([
        StructField("test", StringType()),
        StructField("events", ArrayType(StructType([
            StructField("event", StringType()),
            StructField("object", StringType()),
        ]))),
    ])),
    StructField("num_str", StringType()),
])

ROWS = [
    {
        "clientId": "c1",
        "meta": {"geoCountry": "DE"},
        "environment": {"addons": {"activeAddons": {
            "testpilot@cliqz.com": {"version": "1.0"}}}},
        "payload": {"test": "@testpilot-addon",
                    "events": [{"event": "enabled", "object": "testpilot@cliqz.com"}]},
        "num_str": "42",
    },
    {
        "clientId": "c2",
        "meta": None,
        "environment": {"addons": {"activeAddons": {}}},
        "payload": {"test": "@testpilot-addon", "events": []},   # empty events
        "num_str": "not-a-number",
    },
    {
        "clientId": "c3",
        "meta": {"geoCountry": "FR"},
        "environment": None,
        "payload": {"test": "other", "events": None},
        "num_str": None,
    },
]


def _pings(spark):
    return spark.createDataFrame(ROWS, PING_SCHEMA)


def test_path_col_struct_map_array(spark):
    df = _pings(spark)
    got = df.select(
        path_col("meta/geoCountry").alias("geo"),
        path_col("environment/addons/activeAddons").getItem("testpilot@cliqz.com")
        .getItem("version").alias("ver"),
        F.element_at(path_col("payload/events"), 1).getItem("event").alias("ev"),
    ).collect()
    assert [r["geo"] for r in got] == ["DE", None, "FR"]
    assert [r["ver"] for r in got] == ["1.0", None, None]
    # empty array and NULL array both -> NULL, the reference's
    # IndexError->NULL cell (testpilot_data.py:53-63)
    assert [r["ev"] for r in got] == ["enabled", None, None]


def test_try_cast_error_to_null(spark):
    df = _pings(spark)
    spec = ColumnSpec("n", F.col("num_str"), dtype="long")
    got = [r["n"] for r in df.select(spec.compile()).collect()]
    assert got == [42, None, None]


def test_row_and_post_filter(spark):
    cfg = ExtractConfig(
        columns=[
            ColumnSpec("client_id", "clientId"),
            ColumnSpec("event_object", F.lit(None),
                       transform=lambda _: F.element_at(path_col("payload/events"), 1)
                       .getItem("object"), dtype="string"),
        ],
        row_filter=path_col("payload/test") == "@testpilot-addon",
        post_filter=F.col("event_object") == "testpilot@cliqz.com",
    )
    out = cfg.apply(_pings(spark))
    assert out.columns == ["client_id", "event_object"]
    assert [r["client_id"] for r in out.collect()] == ["c1"]


def test_guarded_udf_exception_to_null(spark):
    df = _pings(spark)
    risky = guarded_udf(lambda s: str(1 / int(s)), "string")  # raises on c2/c3
    got = [r["x"] for r in df.select(risky(F.col("num_str")).alias("x")).collect()]
    assert got == ["0.023809523809523808", None, None]
