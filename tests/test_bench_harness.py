"""Unit tests for bench.py's host-phase gating helpers — pure logic,
no Spark session. The bench is a graded deliverable: its candidate-range
parsing, descendant-tree walk and work-clean arithmetic must not regress
silently (a wrong gate either poisons the efficiency record with
degraded rounds or starves it of clean ones)."""

import importlib.util
import os
import subprocess
import time

import pytest


@pytest.fixture(scope="module")
def bench():
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(__file__), "..", "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_candidates_default_spans_machine(bench, monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_BENCH_CPUSET_LOW", raising=False)
    cands = bench._candidates(2, "low")
    # preferred first range is 0-based; with no env override the list
    # spans the machine in up to 4 aligned strides so an invocation
    # with default env can still hop off a sick range
    assert cands[0] == "0-1"
    assert 1 <= len(cands) <= 4
    ncpu = os.cpu_count() or 2
    if ncpu >= 8:
        assert len(cands) == 4
    assert bench._cpuset(2, "low") == "0-1"


def test_candidates_default_wide_level(bench, monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_BENCH_CPUSET_HIGH", raising=False)
    cands = bench._candidates(8, "high")
    assert cands[0] == "0-7"
    for rng in cands:
        lo, hi = map(int, rng.split("-"))
        assert hi - lo == 7


def test_candidates_parse_comma_list(bench, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_BENCH_CPUSET_LOW",
                       "26-27, 28-29,30-31 ,")
    assert bench._candidates(2, "low") == ["26-27", "28-29", "30-31"]
    # _cpuset (used for server start + gen-log pins) takes the preferred
    # first candidate, never the raw comma string (taskset would reject
    # "a-b,c-d" only as a *range* pair; the first candidate is always a
    # valid single range)
    assert bench._cpuset(2, "low") == "26-27"


def test_descendant_pids_and_repin(bench):
    p = subprocess.Popen(["bash", "-c", "sleep 3 & sleep 3"],
                         start_new_session=True)
    try:
        time.sleep(0.3)
        pids = bench._descendant_pids(p.pid)
        assert p.pid in pids and len(pids) >= 2
        bench._repin_tree(p.pid, "0-1")
        for pid in bench._descendant_pids(p.pid):
            assert os.sched_getaffinity(pid) == {0, 1}
    finally:
        p.terminate()
        p.wait()


def test_descendant_pids_excludes_strangers(bench):
    # PID 1's tree is not ours
    assert os.getpid() in bench._descendant_pids(os.getpid())
    assert 1 not in bench._descendant_pids(os.getpid())


def test_work_clean_arithmetic():
    """The gate the scheduler applies: cpu_seconds <= factor * floor AND
    utilization >= util_floor. Mirrors the inline logic in main() — the
    observed degraded round (663 cpu-s vs 193 floor, util 0.772) must be
    dirty, the historical clean rounds (193-225 cpu-s, util ~0.97) clean."""
    factor, util_floor, floor = 1.35, 0.85, 193.3

    def work_clean(cs, util):
        return bool(cs and cs <= factor * floor and util >= util_floor)

    assert work_clean(193.3, 0.974)
    assert work_clean(225.0, 0.95)
    assert not work_clean(663.1, 0.772)      # observed degraded round
    assert not work_clean(636.4, 0.789)      # observed degraded round
    assert not work_clean(300.0, 0.97)       # cpu inflated, util fine
    assert not work_clean(200.0, 0.70)       # steal: util collapsed
    assert not work_clean(0.0, 1.0)          # no cpu sample -> dirty


def test_tree_cpu_delta_monotone_and_reap_adjusted(bench):
    """Window work from per-pid monotone deltas: a process leaving the
    tree must not zero the window (the old absolute-total difference
    did — an honest 302k ev/s round measured 0.0 core-seconds), and a
    reaped child's PRE-window lifetime must not inflate it."""
    tck = os.sysconf("SC_CLK_TCK")
    # pid 5 = parent; 10 survives (+50); 11 dies mid-window after +30
    # more (pre-window own 200 rolls into 5's cutime on reap); 12 is
    # spawned mid-window (+40); parent itself +2
    s0 = {5: (1, 10, 0), 10: (5, 100, 0), 11: (5, 200, 0)}
    s1 = {5: (1, 12, 230), 10: (5, 150, 0), 12: (5, 40, 0)}
    assert bench._tree_cpu_delta(s0, s1) * tck == pytest.approx(122)
    # orphaned unreaped worker: its post-window work is lost (undercount
    # only), never negative / never zeroing the survivors' work
    s1b = {5: (1, 12, 0), 10: (5, 150, 0)}
    assert bench._tree_cpu_delta(s0, s1b) * tck == pytest.approx(52)
    # pid reuse: smaller own counter clamps to 0, no fabrication
    s1c = {5: (1, 12, 0), 10: (5, 7, 0)}
    assert bench._tree_cpu_delta(s0, s1c) * tck == pytest.approx(2)


def test_tree_cpu_sample_self(bench):
    """The /proc sampler sees this process and a live child, and the
    delta over a busy loop is positive."""
    a = bench._tree_cpu_sample()
    assert os.getpid() in a
    sum(i * i for i in range(3_000_000))
    b = bench._tree_cpu_sample()
    assert bench._tree_cpu_delta(a, b) >= 0.0


def test_compose_cpuset_from_cleanest_pairs(bench):
    """8-core cpuset composed from the 4 cleanest pairs, ordered by cpu
    id; None when the machine lacks 4 clean pairs."""
    calib = {"2": 0.4}
    scout = [("0-1", 9.9), ("2-3", 0.41), ("4-5", 0.48), ("6-7", 9.9),
             ("8-9", 0.42), ("10-11", 9.9), ("12-13", 0.45),
             ("14-15", 0.49)]
    # factor 1.25 -> gate 0.5: clean pairs are 2-3,8-9,12-13,4-5,14-15
    got = bench._compose_cpuset(scout, 8, calib, 1.25)
    assert got == "2-3,4-5,8-9,12-13"
    assert bench._compose_cpuset(scout, 2, calib, 1.25) == "2-3"
    # only 2 clean pairs -> cannot compose 8 cores
    scout_sick = [(r, 9.9) for r, _ in scout[:6]] + scout[6:]
    assert bench._compose_cpuset(scout_sick, 8, calib, 1.25) is None
    # odd core count unsupported
    assert bench._compose_cpuset(scout, 7, calib, 1.25) is None
