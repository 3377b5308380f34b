"""Keep the repo tooling honest: the calibration-normalized bench gate
must keep parsing BASELINE.md and the recorded bench artifacts."""

from __future__ import annotations

import importlib.util


def _load_bench_compare():
    spec = importlib.util.spec_from_file_location(
        "bench_compare", "/root/repo/tools/bench_compare.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_baseline_table_parses_and_is_stamped():
    bc = _load_bench_compare()
    baselines = bc.parse_baselines()
    # every headline query with a recorded baseline must parse out
    assert len(baselines) >= 60
    # all rows added since the calibration probe exists carry a stamp
    unstamped = [n for n, b in baselines.items() if not b["stamped"]]
    # the round-1 block predates the probe; nothing else may be unstamped
    assert len(unstamped) <= 28, unstamped
    assert all(b["sec"] > 0 and b["cal"] > 0 for b in baselines.values())


def test_round8_bench_normalizes_clean():
    """The round-8 verdict's two >1.5x raw rows were host drift; pinned
    here: at matching calibration NO round-8 row exceeds 1.5x, and the
    two named rows normalize under 1.0."""
    bc = _load_bench_compare()
    bench = bc.load_bench("/root/repo/BENCH_r08.json")
    cal_now = bench["calibration"]["spark_job_sec"]
    baselines = bc.parse_baselines()
    over = []
    for name, sec in bench["queries"].items():
        base = baselines.get(name)
        if base is None:
            continue
        norm = (sec / cal_now) / (base["sec"] / base["cal"])
        if norm > 1.5:
            over.append((name, round(norm, 2)))
        if name in ("incremental_join_maintenance", "fuzzy_match_parts"):
            assert norm < 1.0, (name, norm)
    assert not over, over
