"""Per-query cost attribution for the headline bench.

For every BENCH_HEADLINE query, measures separately:
  * build_s  — time for ``q.fn(spark, sf_dir)`` to RETURN the DataFrame
               (pure driver-side work: py4j round trips, any model fits /
               bounded collects the operator does eagerly);
  * exec_s   — time for ``.collect()`` on the already-built frame.

Two samples per query (same best-of-2 discipline as bench.py), min kept.
Writes JSON to the path given as argv[1] (default /tmp/profile_bench.json).

Usage:
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tools/profile_bench.py out.json
"""

from __future__ import annotations

import json
import os
from pathlib import Path
import sys
import time

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
ONLY = [a for a in sys.argv[2:]]


def main() -> None:
    from cliqz_etl_spark.operators.cache import release_all
    from cliqz_etl_spark.queries import BENCH_HEADLINE, load_all
    from cliqz_etl_spark.session import get_spark

    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/profile_bench.json"
    registry = load_all()
    spark = get_spark("cliqz-etl-spark-profile", master=f"local[{CPUS}]",
                      extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    # mirror bench.py's Python-worker warm-up: the first Arrow query must
    # measure its plan, not the daemon fork + per-worker import storm
    from cliqz_etl_spark.session import warm_python_workers

    warm_python_workers(spark, int(CPUS))

    rows: dict[str, dict[str, float]] = {}
    names = [n for n in BENCH_HEADLINE if not ONLY or n in ONLY]
    for name in names:
        q = registry.get(name)
        if q is None:
            continue
        spark.sparkContext.setJobDescription(f"profile:{name}")
        builds, execs = [], []
        for _ in range(2):
            t0 = time.perf_counter()
            df = q.fn(spark, SF_DIR)
            t1 = time.perf_counter()
            df.collect()
            t2 = time.perf_counter()
            builds.append(t1 - t0)
            execs.append(t2 - t1)
        release_all()
        rows[name] = {"build_s": round(min(builds), 3),
                      "exec_s": round(min(execs), 3),
                      "total_s": round(min(b + e for b, e in
                                           zip(builds, execs)), 3)}
        print(f"{name:40s} build {rows[name]['build_s']:7.3f} "
              f"exec {rows[name]['exec_s']:7.3f}", file=sys.stderr)

    Path(out_path).write_text(json.dumps(
        {"sf_dir": SF_DIR, "cpus": CPUS, "queries": rows}, indent=1) + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
