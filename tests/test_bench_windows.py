"""Unit coverage for bench.py's window summary — the driver-facing
steps/s definition (median of un-stalled windows, regrow exclusion;
VERDICT r2 item 4). Pure host logic, no device work: run_once is stubbed
with canned (rebuild counter, cap) sequences and wall times are made
deterministic by monkeypatching time.perf_counter.
"""
import sys
import pathlib

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import bench  # noqa: E402


def _run(monkeypatch, durations, counters, caps, steps=100, counter0=0):
    # timed_windows calls perf_counter twice per window (start, end).
    ticks, t = [], 0.0
    for d in durations:
        ticks.extend([t, t + d])
        t += d
    it = iter(ticks)
    monkeypatch.setattr(bench.time, "perf_counter", lambda: next(it))
    monkeypatch.setattr(bench, "N_WINDOWS", len(durations))
    seq = iter(zip(counters, caps))
    return bench.timed_windows(lambda: next(seq), steps, counter0)


def test_median_of_clean_windows(monkeypatch):
    sps, extra = _run(
        monkeypatch,
        durations=[4.0, 5.0, 4.5, 4.2, 4.8],
        counters=[9, 18, 28, 37, 47],
        caps=[40] * 5,
    )
    assert sps == 100 / 4.5
    assert extra["windows_unstalled"] == 5
    assert extra["rebuilds_per_window"] == [9, 9, 10, 9, 10]
    assert extra["regrow_windows"] == 0


def test_stalled_window_excluded(monkeypatch):
    # One tunnel stall at 3x the fastest: excluded from the median but
    # still present in windows_s for the record.
    sps, extra = _run(
        monkeypatch,
        durations=[4.0, 12.0, 4.0, 4.0, 4.0],
        counters=[9, 18, 28, 37, 47],
        caps=[40] * 5,
    )
    assert sps == 100 / 4.0
    assert extra["windows_unstalled"] == 4
    assert len(extra["windows_s"]) == 5
    assert extra["windows_s"][1] == 12.0


def test_regrow_window_excluded(monkeypatch):
    # A capacity overflow rolls back and RESETS the rebuild counter, so
    # the counter goes backwards: that window must be excluded from the
    # median and counted as a regrow, never reported as negative rebuilds.
    sps, extra = _run(
        monkeypatch,
        durations=[4.0, 9.0, 4.0, 4.0, 4.0],
        counters=[9, 2, 12, 22, 32],
        caps=[32, 40, 40, 40, 40],
    )
    assert extra["regrow_windows"] == 1
    assert extra["rebuilds_per_window"][1] is None
    assert extra["cap_per_window"] == [32, 40, 40, 40, 40]
    assert sps == 100 / 4.0


def test_all_windows_stalled_falls_back_to_all(monkeypatch):
    # Degenerate case: if rejection empties the set (every window regrew),
    # the median falls back to all windows rather than dividing by zero.
    sps, extra = _run(
        monkeypatch,
        durations=[4.0, 4.0, 4.0],
        counters=[5, 2, 1],
        caps=[32, 40, 48],
        counter0=9,
    )
    assert extra["windows_unstalled"] == 0
    assert sps == 100 / 4.0
    assert np.isfinite(sps)


def test_majority_stalls_rejected(monkeypatch):
    # Round-5 review finding: with a plain all-window median anchor, 3/5
    # two-minute relay stalls would BE the median, pass the 1.5x gate, and
    # poison the steps/s median ~30x. The lower-half-median anchor keeps
    # the two clean windows as the anchor and rejects all three stalls.
    sps, extra = _run(
        monkeypatch,
        durations=[4.0, 120.0, 4.2, 130.0, 125.0],
        counters=[9, 18, 28, 37, 47],
        caps=[40] * 5,
    )
    assert abs(sps - 100 / 4.1) < 1e-9
    assert extra["windows_unstalled"] == 2


def test_lucky_fast_outlier_kept(monkeypatch):
    # The inverse failure the round-3 fastest-window anchor had: one lucky
    # 2 s window must not reclassify the four normal ~4 s windows as
    # stalled.
    sps, extra = _run(
        monkeypatch,
        durations=[2.0, 4.0, 4.1, 4.0, 4.2],
        counters=[9, 18, 28, 37, 47],
        caps=[40] * 5,
    )
    assert extra["windows_unstalled"] == 5
