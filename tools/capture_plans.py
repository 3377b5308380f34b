"""Capture .explain("formatted") for named queries into plans/<tag>/.

    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 \
        python tools/capture_plans.py <tag> <suffix> q1 q2 ...

writes plans/<tag>/<query>_<suffix>.txt for each query (suffix is
"before" / "after" per the optimization-round deliverable). Queries are
built with the same session conf as bench.py; eager model fits inside a
query's build run at the chosen SF, so prefer a small one — the plan
skeleton is size-independent and AQE re-plans from real sizes at run
time either way."""
from __future__ import annotations

import os
from pathlib import Path
import sys

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))


def main() -> None:
    tag, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    out_dir = Path(__file__).resolve().parents[1] / "plans" / tag
    out_dir.mkdir(parents=True, exist_ok=True)

    from cliqz_etl_spark.operators.cache import release_all
    from cliqz_etl_spark.queries import load_all
    from cliqz_etl_spark.session import get_spark

    registry = load_all()
    unknown = [n for n in names if n not in registry]
    if unknown:
        raise SystemExit(f"not in the registry: {unknown}")
    spark = get_spark("capture-plans", master=f"local[{CPUS}]",
                      extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = registry[name].fn(spark, SF_DIR)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode
            .fromString("formatted"))
        (out_dir / f"{name}_{suffix}.txt").write_text(plan)
        release_all()
        print(f"wrote {name}_{suffix}.txt ({len(plan)} chars)",
              file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
