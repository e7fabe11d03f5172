"""bench.py measurement-contract guards (round-4 verdict demand #1).

BENCH_r04 recorded 757 w/s against the chip's real 18.3k because the warmup
ended in block_until_ready(params) — which does not flush the ~1000 s
first-execution cost of a freshly compiled step executable — and the single
timed window absorbed it. bench.robust_window_time is the guard: window 0
is dropped and flagged when it exceeds the anomaly ratio vs the rest.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def _runner(times):
    it = iter(times)
    return lambda: next(it)


def test_guard_triggers_on_artificial_slow_first_window():
    # window 0 absorbs a fake residual first-execution cost
    dt, times, anomaly = bench.robust_window_time(_runner([10.0, 1.0]))
    assert anomaly
    assert times == [10.0, 1.0]
    assert dt == 1.0  # the poisoned window is excluded from the measurement


def test_guard_passes_steady_windows():
    dt, times, anomaly = bench.robust_window_time(_runner([1.0, 1.02]))
    assert not anomaly
    assert abs(dt - 1.01) < 1e-12  # both windows counted


def test_guard_ratio_boundary():
    # exactly at the ratio is NOT an anomaly (strict >)
    dt, _, anomaly = bench.robust_window_time(
        _runner([1.25, 1.0]), anomaly_ratio=1.25)
    assert not anomaly
    # just over the ratio is
    _, _, anomaly = bench.robust_window_time(
        _runner([1.26, 1.0]), anomaly_ratio=1.25)
    assert anomaly


def test_guard_many_windows():
    # with >2 windows the comparison is against the best of the rest,
    # and on anomaly only window 0 is dropped
    dt, _, anomaly = bench.robust_window_time(
        _runner([5.0, 1.2, 1.0, 1.1]), n_windows=4)
    assert anomaly
    assert abs(dt - (1.2 + 1.0 + 1.1) / 3) < 1e-12


def test_guard_single_window_no_crash():
    dt, times, anomaly = bench.robust_window_time(_runner([2.0]), n_windows=1)
    assert (dt, times, anomaly) == (2.0, [2.0], False)
