"""Unit guards for bench_scaling's summary statistics — pure Python, no
Spark: the scaling gate's evidence (pair efficiencies, trimmed mean,
pair median, and the work-based eff_engine decomposition) must compute
exactly, and the summarizer must stay backward-compatible with logs
recorded before the REST task-metric instrumentation."""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")

import bench_scaling as B


def _run(cores, walls, task=None, cpu=None, packing=None):
    r = {
        "cores": cores,
        "n_turns": 1_000_000,
        "n_flagged_turns": 10,
        "runs_sec": walls,
        "plan_secs": [1.0] * len(walls),
        "wall_sec": min(walls),
        "turns_per_sec": round(1_000_000 / min(walls), 1),
    }
    if task is not None:
        r["task_secs"] = task
        r["cpu_secs"] = cpu
        r["gc_secs"] = [0.1] * len(task)
        r["packing"] = packing
    return r


def test_decomposition_algebra(tmp_path, monkeypatch):
    """eff_engine = (C_N/C_4N) * (P_4N/P_N) from each JVM's BEST run, and
    the wall-pair stats (median, trimmed mean) come out exactly."""
    monkeypatch.setattr(B, "REPO", str(tmp_path))
    (tmp_path / "data").mkdir()
    # pair 1: wall 100 vs 30 -> eff 100/(4*30)=0.833
    # pair 2: wall 120 vs 40 -> eff 0.75 ; pair 3: 100 vs 25 -> 1.0
    res = {
        2: [
            _run(2, [110.0, 100.0], task=[200.0, 190.0], cpu=[196.0, 186.0], packing=[0.91, 0.95]),
            _run(2, [120.0, 130.0], task=[230.0, 240.0], cpu=[200.0, 205.0], packing=[0.96, 0.92]),
            _run(2, [100.0, 105.0], task=[192.0, 195.0], cpu=[190.0, 191.0], packing=[0.96, 0.93]),
        ],
        8: [
            _run(8, [30.0, 35.0], task=[204.0, 230.0], cpu=[188.0, 200.0], packing=[0.85, 0.82]),
            _run(8, [45.0, 40.0], task=[280.0, 272.0], cpu=[208.0, 204.0], packing=[0.78, 0.85]),
            _run(8, [25.0, 26.0], task=[184.0, 186.0], cpu=[182.0, 183.0], packing=[0.92, 0.89]),
        ],
    }
    B.summarize(res, hw_eff=0.95, repeats=3, bw_eff=0.9)
    s = json.load(open(tmp_path / "data" / "scaling_summary.json"))
    assert s["eff_pairs_interleaved"] == [0.833, 0.75, 1.0]
    assert s["eff_pair_median"] == 0.833
    assert s["eff_trimmed_mean"] == 0.833  # drop best+worst of 3
    d = s["decomposition"]
    assert [p["pair"] for p in d] == [1, 2, 3]
    # pair 1 best runs: N -> wall 100 (cpu 186, pack 0.95); 4N -> wall 30
    # (cpu 188, pack 0.85): eff_engine = (186/188)*(0.85/0.95) = 0.885
    assert d[0]["cpu_ratio"] == round(186.0 / 188.0, 3)
    assert d[0]["eff_engine"] == round((186.0 / 188.0) * (0.85 / 0.95), 3)
    # identity check: work_ratio * packing ratio == the wall pair eff
    for p, eff in zip(d, s["eff_pairs_interleaved"]):
        assert abs(p["work_ratio"] * (p["packing_4N"] / p["packing_N"]) - eff) < 0.01
    assert s["eff_engine_median"] == sorted(p["eff_engine"] for p in d)[1]
    # least-contended estimate: min cpu over ALL samples per width with
    # that run's packing — N: 186 (pack 0.95), 4N: 182 (pack 0.92)
    assert s["work_best"]["cpu_ratio"] == round(186.0 / 182.0, 3)
    assert s["work_best"]["cpu_max_4N"] == 208.0
    assert s["eff_engine_best"] == round((186.0 / 182.0) * (0.92 / 0.95), 3)
    assert s["bw_ceiling"] == 0.9
    md = (tmp_path / "BENCH" / "BASELINE.md").read_text()
    assert "eff_engine" in md and "bandwidth-bound sweep" in md


def test_summarize_from_log_pre_instrumentation(tmp_path, monkeypatch, capsys):
    """Logs recorded before the REST capture (no task_secs, no bandwidth
    line) still summarize; decomposition degrades to null, not a crash."""
    monkeypatch.setattr(B, "REPO", str(tmp_path))
    (tmp_path / "data").mkdir()
    log = tmp_path / "old.log"
    log.write_text(
        "hardware calibration: {2: 1.0, 8: 4.0} -> ceiling 1.000\n"
        + f"round 1 local[2]: {_run(2, [100.0])}\n"
        + f"round 1 local[8]: {_run(8, [30.0])}\n"
        + f"round 2 local[2]: {_run(2, [120.0])}\n"
        + f"round 2 local[8]: {_run(8, [40.0])}\n"
    )
    B.summarize_from_log(str(log))
    s = json.load(open(tmp_path / "data" / "scaling_summary.json"))
    assert s["eff_pairs_interleaved"] == [0.833, 0.75]
    assert s["eff_engine_median"] is None
    assert s["bw_ceiling"] is None
    md = (tmp_path / "BENCH" / "BASELINE.md").read_text()
    assert "predate the REST instrumentation" in md


def test_summarize_from_log_trailing_orphan_leg(tmp_path, monkeypatch):
    """A log from a killed run whose final round recorded only one leg
    still summarizes over the complete pairs (the orphan is dropped)."""
    monkeypatch.setattr(B, "REPO", str(tmp_path))
    (tmp_path / "data").mkdir()
    log = tmp_path / "partial.log"
    log.write_text(
        "hardware calibration: {2: 1.0, 8: 4.0} -> ceiling 1.000\n"
        + f"round 1 local[2]: {_run(2, [100.0])}\n"
        + f"round 1 local[8]: {_run(8, [30.0])}\n"
        # round 2 alternated leg order and was killed after its first leg
        + f"round 2 local[8]: {_run(8, [40.0])}\n"
    )
    B.summarize_from_log(str(log))
    s = json.load(open(tmp_path / "data" / "scaling_summary.json"))
    assert s["eff_pairs_interleaved"] == [0.833]


def test_verdict_lines_three_outcomes():
    """The report's conclusion must follow the stats: wall pass, engine
    pass (wall fail), and honest fail are mutually exclusive branches."""
    wall_pass = "\n".join(B._verdict_lines(0.85, 0.84, 0.9, 0.96, 0.91))
    assert "PASS on wall-clock" in wall_pass

    engine_pass = "\n".join(B._verdict_lines(0.74, 0.75, 0.86, 0.96, 0.91))
    assert "the ENGINE clears it" in engine_pass
    assert "0.95x" in engine_pass  # 0.86 / 0.91 vs the bandwidth ceiling

    fail = "\n".join(B._verdict_lines(0.6, 0.62, 0.7, 0.96, 0.91))
    assert "**FAIL**" in fail and "cannot be attributed to host noise" in fail

    # no decomposition available -> still an honest fail, no crash
    fail2 = "\n".join(B._verdict_lines(0.6, 0.62, None, 0.96, None))
    assert "no task-metric decomposition" in fail2


def test_verdict_least_contended_branch():
    """Wall median AND engine median below the gate, but the min-CPU
    estimate clears it: the verdict must make the engine case with the
    CPU-spread evidence; the same stats with a failing min-CPU estimate
    must stay an honest FAIL."""
    wb = {
        "cpu_ratio": 0.915,
        "cpu_min_N": 264.8,
        "cpu_max_N": 824.5,
        "cpu_min_4N": 289.3,
        "cpu_max_4N": 3281.8,
        "packing_N": 0.988,
        "packing_4N": 0.942,
        "n_N": 27,
        "n_4N": 27,
    }
    txt = "\n".join(B._verdict_lines(0.725, 0.749, 0.73, 0.963, 0.913, 0.873, wb))
    assert "least-contended decomposition clears it" in txt
    assert "0.873" in txt and "11.3x" in txt
    assert "indistinguishable" in txt  # |0.915 - 0.913| < 0.03

    fail = "\n".join(B._verdict_lines(0.6, 0.62, 0.7, 0.96, 0.91, 0.75, wb))
    assert "**FAIL**" in fail

    # engine-median pass takes priority over the min-CPU branch
    med = "\n".join(B._verdict_lines(0.74, 0.75, 0.86, 0.96, 0.91, 0.9, wb))
    assert "the ENGINE clears it" in med


def test_summarize_tolerates_failed_poll_placeholders(tmp_path, monkeypatch):
    """A failed/desynced REST poll records None placeholders (index-
    aligned with runs_sec — validate_bench.py). The summarizer must skip
    those samples without crashing or misattributing: a pair whose best
    run lost its metrics drops out of the decomposition, and the min-CPU
    estimate ignores None samples."""
    monkeypatch.setattr(B, "REPO", str(tmp_path))
    (tmp_path / "data").mkdir()
    res = {
        2: [
            # best wall is run 2 whose poll failed -> pair 1 undecomposable
            _run(2, [110.0, 100.0], task=[200.0, None], cpu=[196.0, None], packing=[0.91, None]),
            _run(2, [100.0, 105.0], task=[192.0, 195.0], cpu=[190.0, 191.0], packing=[0.96, 0.93]),
        ],
        8: [
            _run(8, [30.0, 35.0], task=[204.0, 230.0], cpu=[188.0, 200.0], packing=[0.85, 0.82]),
            _run(8, [25.0, 26.0], task=[184.0, 186.0], cpu=[182.0, 183.0], packing=[0.92, 0.89]),
        ],
    }
    B.summarize(res, hw_eff=0.95, repeats=2, bw_eff=0.9)
    s = json.load(open(tmp_path / "data" / "scaling_summary.json"))
    assert [p["pair"] for p in s["decomposition"]] == [2]
    # min-CPU estimate skips the None sample: N-side min cpu is 190 (not
    # the lost run), 4N-side 182
    assert s["work_best"]["cpu_ratio"] == round(190.0 / 182.0, 3)
    assert s["work_best"]["n_N"] == 3  # 4 samples minus the failed poll
