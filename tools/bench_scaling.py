"""Scale-evidence bench: time a named query set on an arbitrary table
directory at an arbitrary core count, bench.py methodology (best-of-2
collect wall-clock, release_all between queries, calibration probes).

    python tools/bench_scaling.py --sf /tmp/sf1 --cpus 32 q1 q2 ... > a.json
    python tools/bench_scaling.py --sf /tmp/sf1 --cpus 8  q1 q2 ... > b.json

Exists for the round-13 verdict's scale-evidence gap: at sf0.1 every
8-vs-32-core ratio reads ~1 because no headline query is data-bound at
that size, so the bench cannot falsify 100 TB scale claims. Run the
expensive queries on the tools/make_sfx.py 10x corpus at two core
counts; data-bound queries should speed up with cores, overhead-bound
ones stay flat (each flat query needs a pinned explanation in the
round's OPTIMIZATION file)."""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default="/tmp/sf1")
    ap.add_argument("--cpus", default=str(os.cpu_count() or 8))
    args = ap.parse_args()

    from cliqz_etl_spark.operators.cache import release_all
    from cliqz_etl_spark.queries import load_all
    from cliqz_etl_spark.session import get_spark, warm_python_workers

    registry = load_all()
    unknown = [n for n in args.queries if n not in registry]
    if unknown:
        raise SystemExit(f"not in the registry: {unknown}")
    spark = get_spark("bench-scaling", master=f"local[{args.cpus}]",
                      extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    warm_python_workers(spark, int(args.cpus))

    def calibrate() -> dict[str, float]:
        t0 = time.perf_counter()
        acc = 0
        for i in range(10_000_000):
            acc += i
        py = time.perf_counter() - t0
        t0 = time.perf_counter()
        spark.range(0, 200_000_000, 1, 32).selectExpr(
            "sum(id * 3 + 1)").collect()
        return {"python_loop_sec": round(py, 3),
                "spark_job_sec": round(time.perf_counter() - t0, 3)}

    out: dict = {"sf": args.sf, "cpus": int(args.cpus),
                 "calibration_pre": calibrate(), "queries": {}}
    for name in args.queries:
        q = registry[name]
        spark.sparkContext.setJobDescription(f"scaling:{name}")
        samples = []
        for _ in range(2):
            t0 = time.perf_counter()
            q.fn(spark, args.sf).collect()
            samples.append(round(time.perf_counter() - t0, 3))
        release_all()
        out["queries"][name] = min(samples)
    out["calibration_post"] = calibrate()
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
