"""Isolated best-of-3 timing adjudication for bench-drift readings.

The recurring verdict workflow (rounds 11-13): when a BENCH_r*.json row
reads >1.5x its BASELINE.md pin, re-measure it ISOLATED — fresh session,
nothing else on the host — with the same-run calibration probes, before
deciding fix vs re-pin vs noise. This encodes that procedure:

    python tools/adjudicate.py knn_graph incremental_join_maintenance
    python tools/adjudicate.py --sf /root/testdata/sf0.01 some_query

Prints ONE JSON line: per query the warm-up time, the three measured
samples, and the best; plus calibration probes before and after (the
python_loop probe is the single-core speed the distributed spark probe
cannot see — the round-13 lesson: plan-build-heavy queries track it).
Mirrors bench.py's run conditions (local[32] default, UI off, warm-up
job, release_all between samples). All timing runs in function scope —
module-scope timing on this box reads ~2.3x slow (PROGRESS round 9).
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+", help="registry query names")
    ap.add_argument("--sf", default="/root/testdata/sf0.1",
                    help="table directory (default: bench scale sf0.1)")
    ap.add_argument("--cpus", default=str(os.cpu_count() or 8))
    args = ap.parse_args()

    from cliqz_etl_spark.operators.cache import release_all
    from cliqz_etl_spark.queries import load_all
    from cliqz_etl_spark.session import get_spark

    registry = load_all()
    unknown = [n for n in args.queries if n not in registry]
    if unknown:
        raise SystemExit(f"not in the registry: {unknown}")
    spark = get_spark("adjudicate", master=f"local[{args.cpus}]",
                      extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    # mirror bench.py's Python-worker warm-up: an adjudicated Arrow query
    # must measure its plan, not the daemon fork + per-worker imports
    from cliqz_etl_spark.session import warm_python_workers

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
        jvm = time.perf_counter() - t0
        return {"python_loop_sec": round(py, 3),
                "spark_job_sec": round(jvm, 3)}

    out: dict = {"sf": args.sf, "calibration_pre": calibrate()}
    for name in args.queries:
        q = registry[name]
        samples = []
        for _ in range(4):  # first sample is the warm-up
            t0 = time.perf_counter()
            q.fn(spark, args.sf).collect()
            samples.append(round(time.perf_counter() - t0, 3))
            release_all()
        out[name] = {"warmup": samples[0], "best3": samples[1:],
                     "best": min(samples[1:])}
    out["calibration_post"] = calibrate()
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
