from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from cliqz_etl_spark.session import get_spark

    import tempfile

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "8")
    s = get_spark("cliqz-etl-spark-tests", master=f"local[{cpus}]",
                  extra_conf={"spark.sql.shuffle.partitions": "8",
                              "spark.ui.enabled": "false",
                              # saveAsTable targets (bucketed-join tests)
                              "spark.sql.warehouse.dir": tempfile.mkdtemp()})
    yield s
    s.stop()
