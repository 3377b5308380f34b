"""Calibration-normalized bench-vs-baseline comparison.

BASELINE.md's numbers were pinned across rounds on a shared box whose
speed swings 1.5-3x between windows (measured: spark_job calibration
0.368 s round 6 -> 0.744 s round 8 -> 1.10 s observed round 9). Raw
ratios therefore conflate plan regressions with host drift — the round-8
verdict's two ">1.5x" rows (incremental_join_maintenance 1.69x,
fuzzy_match_parts 1.52x) were both pure calibration skew. This tool
makes the comparison honest:

    norm_ratio = (bench_sec / cal_now) / (base_sec / cal_base)

where cal_* is the same-run ``spark_job_sec`` probe (bench.py runs an
identical deterministic Spark job every round). Every BASELINE.md row
since round 4 carries its calibration stamp in the notes column; rows
from the round-1 table predate the probe and use the round-4 stamp
(0.472 s, the nearest recorded window) marked approximate.

Usage:
    python tools/bench_compare.py                 # latest BENCH_r*.json
    python tools/bench_compare.py BENCH_r08.json  # specific round
    python tools/bench_compare.py --threshold 1.5 # exit 1 on violations

Exit status 1 iff any query's NORMALIZED ratio exceeds the threshold —
the per-round regression gate the raw numbers can't be.
"""

from __future__ import annotations

import argparse
import glob
import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
ROUND1_SPARK_CAL = 0.472  # round-4 stamp; rounds 1-3 predate the probe
ROUND1_PY_CAL = 0.303


def parse_baselines() -> dict[str, dict]:
    """{query: {sec, cal, cal_py, stamped, round}} from BASELINE.md.

    ``round`` is the pin round from the source column ("bench.py,
    round N"; None for rows that predate the convention) — historical
    gates need it, because a baseline re-pinned after a plan change (e.g.
    the round-10 _codec_ids spread) no longer describes the plan an OLD
    bench artifact measured."""
    out: dict[str, dict] = {}
    for line in (REPO / "BASELINE.md").read_text().splitlines():
        m = re.match(r"\|\s*([a-z0-9_]+)\s*\|\s*([0-9.]+)\s*s\s*\|(.*)", line)
        if not m:
            continue
        name, sec, rest = m.group(1), float(m.group(2)), m.group(3)
        calm = re.search(r"spark(?:\s+job)?\s+([0-9.]+)\s*s", rest)
        pym = re.search(r"python(?:\s+loop)?\s+([0-9.]+)\s*s", rest)
        rndm = re.search(r"bench\.py,\s*round\s+(\d+)", rest)
        out[name] = {
            "sec": sec,
            "cal": float(calm.group(1)) if calm else ROUND1_SPARK_CAL,
            "cal_py": float(pym.group(1)) if pym else ROUND1_PY_CAL,
            "stamped": bool(calm),
            "round": int(rndm.group(1)) if rndm else None,
        }
    return out


def load_bench(path: str | None) -> dict:
    if path is None:
        paths = sorted(glob.glob(str(REPO / "BENCH_r*.json")))
        if not paths:
            raise SystemExit("no BENCH_r*.json found")
        path = paths[-1]
    raw = json.loads(Path(path).read_text())
    # driver-recorded files wrap the JSON line in a {"tail": "..."} capture
    if "queries" not in raw and "tail" in raw:
        raw = _recover_from_tail(raw["tail"], path)
        raw = _prefer_self_recorded(raw)
    return raw


def _prefer_self_recorded(recovered: dict) -> dict:
    """Swap a tail-recovered (possibly front-clipped) object for bench.py's
    own complete BENCH_LAST.json, when the two demonstrably describe the
    same run (every recovered query time appears verbatim in the artifact).
    The tail capture then serves as the fallback it was meant to be."""
    p = REPO / "BENCH_LAST.json"
    if not p.exists():
        return recovered
    try:
        full = json.loads(p.read_text())
    except ValueError:
        return recovered
    fq, rq = full.get("queries"), recovered.get("queries", {})
    if isinstance(fq, dict) and rq and all(
            fq.get(k) == v for k, v in rq.items()):
        return full
    return recovered


def _recover_from_tail(tail: str, path: str) -> dict:
    """Parse the bench JSON line out of a driver tail capture.

    The driver stores only the LAST N chars of bench.py's stdout, so the
    line's prefix can be clipped mid-token (BENCH_r09.json starts at
    `unit": "sec"`). Anchor on the intact END of the line: find the final
    `}` and re-grow a valid object by scanning forward to the first key
    quote that yields parseable JSON containing "queries". Clipping only
    ever costs leading scalar fields ("metric"/"value"); the queries map
    and calibration probe live at the line's tail and survive.
    """
    m = re.search(r'\{"metric".*\}', tail)
    if m:
        return json.loads(m.group(0))
    end = tail.rfind("}") + 1
    if '"queries"' in tail:
        for i, ch in enumerate(tail[:end]):
            if ch != '"':
                continue
            try:
                obj = json.loads("{" + tail[i:end])
            except ValueError:
                continue
            if isinstance(obj, dict) and "queries" in obj:
                return obj
    # Deeper clip: the tail starts INSIDE the queries map itself (a
    # `"name": sec` run — BENCH_r10.json opens at `"map_valued_agg":`).
    # The map closes with `}, "sf": ..., "calibration": {...}}`, so
    # re-opening it with a synthetic `{"queries": {` prefix at each
    # candidate key-quote rebuilds the object; only the keys clipped off
    # the front are lost, never the calibration probe.
    for i, ch in enumerate(tail[:end]):
        if ch != '"':
            continue
        try:
            obj = json.loads('{"queries": {' + tail[i:end])
        except ValueError:
            continue
        if isinstance(obj, dict) and isinstance(obj.get("queries"), dict):
            return obj
    raise SystemExit(f"{path}: bench JSON line in tail is unrecoverable")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("bench", nargs="?", default=None,
                    help="BENCH_r*.json (default: latest)")
    ap.add_argument("--threshold", type=float, default=1.5,
                    help="fail when a normalized ratio exceeds this")
    args = ap.parse_args()

    bench = load_bench(args.bench)
    calib = bench.get("calibration") or {}
    cal_now = calib.get("spark_job_sec")
    cal_py_now = calib.get("python_loop_sec")
    if not cal_now or not cal_py_now:
        raise SystemExit("bench file carries no calibration probe")
    baselines = parse_baselines()

    # Two probes, because the host's JVM and Python sides degrade
    # INDEPENDENTLY (observed: spark probe recovered to 0.46-0.53 while
    # python_loop sat 1.3x over its baseline windows — and exactly the
    # Arrow/mapInPandas-heavy rows ran 1.3-1.6x while pure scan+agg rows
    # warm-matched their baselines to the hundredth). A row is a REAL
    # regression only when it exceeds the threshold under BOTH
    # normalizations; disagreement is a host-profile shift, reported but
    # not failed on.
    rows = []
    for name, sec in bench["queries"].items():
        base = baselines.get(name)
        if base is None:
            rows.append((name, sec, None, None, None, None, ""))
            continue
        raw = sec / base["sec"]
        norm = (sec / cal_now) / (base["sec"] / base["cal"])
        norm_py = (sec / cal_py_now) / (base["sec"] / base["cal_py"])
        rows.append((name, sec, base["sec"], raw, norm, norm_py,
                     "" if base["stamped"] else "~"))

    rows.sort(key=lambda r: -(min(r[4], r[5]) if r[4] is not None else 0))
    print(f"bench calibration: spark_job_sec = {cal_now}, "
          f"python_loop_sec = {cal_py_now}")
    print(f"{'query':34} {'sec':>7} {'base':>7} {'raw':>6} "
          f"{'normJ':>6} {'normP':>6}")
    bad = []
    for name, sec, base, raw, norm, norm_py, approx in rows:
        if base is None:
            print(f"{name:34} {sec:7.3f} {'--':>7}   (no baseline row)")
            continue
        over = min(norm, norm_py) > args.threshold
        flag = " <-- OVER" if over else ""
        print(f"{name:34} {sec:7.3f} {base:7.3f} {raw:6.2f} "
              f"{norm:6.2f} {norm_py:6.2f}{approx}{flag}")
        if over:
            bad.append(name)
    norms = sorted(r[4] for r in rows if r[4] is not None)
    if norms:
        import math
        geo = math.exp(sum(math.log(x) for x in norms) / len(norms))
        print(f"\n{len(norms)} compared: median normJ "
              f"{norms[len(norms) // 2]:.2f}, geomean {geo:.2f}, "
              f"{len(bad)} over {args.threshold}x under BOTH probes: "
              f"{bad or '-'}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
