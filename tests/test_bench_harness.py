"""The steal-certified trial harness itself: retry/stop logic must be
exactly what BENCH/BASELINE.md §5 documents — these behaviors guard
every recorded number, so they get deterministic tests."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from bench import timed_trials, wait_for_healthy_window  # noqa: E402


def _seq(values):
    it = iter(values)
    return lambda: next(it)


def _probe(par, steal=0.0, load=0.5):
    return {"scalar_sec": 0.9, "parallel8_sec": par, "steal_pct": steal,
            "load1": load}


class _Clock:
    """Deterministic monotonic clock advanced by the injected sleep."""

    def __init__(self):
        self.t = 0.0

    def __call__(self):
        return self.t

    def sleep(self, s):
        self.t += s


def test_stops_at_min_trials_when_best_is_clean():
    times = _seq([5.0, 4.0, 3.0])
    steals = _seq([0.1, 0.2, 0.0])
    best, st, n = timed_trials(times, min_trials=2, max_trials=5, steal_probe=steals)
    assert (best, st, n) == (4.0, 0.2, 2)


def test_retries_until_a_clean_best_appears():
    # dirty, dirty, then a clean trial that is also the fastest
    times = _seq([5.0, 4.5, 4.0])
    steals = _seq([8.0, 6.0, 0.3])
    best, st, n = timed_trials(times, min_trials=2, max_trials=5, steal_probe=steals)
    assert (best, st, n) == (4.0, 0.3, 3)


def test_dirty_fast_trial_keeps_retrying_then_reports_best_anyway():
    # the BEST trial stays dirty through the whole budget: report it,
    # with its steal annotation, after exhausting max_trials
    times = _seq([5.0, 3.0, 6.0, 7.0])
    steals = _seq([0.1, 9.0, 0.1, 0.1])
    best, st, n = timed_trials(times, min_trials=2, max_trials=4, steal_probe=steals)
    assert (best, st, n) == (3.0, 9.0, 4)


def test_clean_slower_trial_does_not_displace_dirty_best():
    # best-by-time wins; cleanliness of a SLOWER trial doesn't certify
    times = _seq([3.0, 4.0, 5.0, 5.0, 5.0])
    steals = _seq([9.0, 0.1, 0.1, 0.1, 0.1])
    best, st, n = timed_trials(times, min_trials=2, max_trials=5, steal_probe=steals)
    assert best == 3.0 and st == 9.0 and n == 5


def test_unmeasurable_steal_counts_as_clean():
    times = _seq([2.0, 1.5])
    best, st, n = timed_trials(
        times, min_trials=2, max_trials=5, steal_probe=lambda: None
    )
    assert (best, st, n) == (1.5, None, 2)


def test_window_gate_passes_immediately_when_healthy():
    clk = _Clock()
    healthy, hist = wait_for_healthy_window(
        max_wait_s=600, probe=_seq([_probe(0.4)]), sleep=clk.sleep, clock=clk
    )
    assert healthy and len(hist) == 1 and clk.t == 0.0


def test_window_gate_waits_out_a_degraded_parallel_leg():
    # clean steal + healthy scalar but parallel leg out of envelope —
    # exactly the 2026-08-17 state timed_trials' steal retry cannot see
    clk = _Clock()
    probes = _seq([_probe(2.2), _probe(0.9), _probe(0.45)])
    healthy, hist = wait_for_healthy_window(
        max_wait_s=600, interval_s=60, probe=probes, sleep=clk.sleep, clock=clk
    )
    assert healthy and len(hist) == 3 and clk.t == 120.0


def test_window_gate_gives_up_at_the_deadline_and_says_so():
    clk = _Clock()
    probes = _seq([_probe(2.2)] * 20)
    healthy, hist = wait_for_healthy_window(
        max_wait_s=150, interval_s=60, probe=probes, sleep=clk.sleep, clock=clk
    )
    # 0s, 60s, 120s probes are degraded; 150s deadline reached mid-wait
    assert not healthy and len(hist) == 4 and clk.t == 150.0


def test_window_gate_flags_steal_and_load_too():
    clk = _Clock()
    probes = _seq([_probe(0.4, steal=5.0), _probe(0.4, load=7.0), _probe(0.4)])
    healthy, hist = wait_for_healthy_window(
        max_wait_s=600, interval_s=60, probe=probes, sleep=clk.sleep, clock=clk
    )
    assert healthy and len(hist) == 3


def test_window_gate_flags_a_slow_scalar_leg():
    # observed live: scalar 6.5s (co-running process) with a clean
    # parallel leg — the gate must not call that window healthy
    clk = _Clock()
    slow = {"scalar_sec": 6.5, "parallel8_sec": 0.45, "steal_pct": 0.0,
            "load1": 1.0}
    healthy, hist = wait_for_healthy_window(
        max_wait_s=600, interval_s=60,
        probe=_seq([slow, _probe(0.4)]), sleep=clk.sleep, clock=clk
    )
    assert healthy and len(hist) == 2


def test_window_gate_zero_budget_probes_once_and_returns():
    clk = _Clock()
    healthy, hist = wait_for_healthy_window(
        max_wait_s=0.0, probe=_seq([_probe(2.2)]), sleep=clk.sleep, clock=clk
    )
    assert not healthy and len(hist) == 1 and clk.t == 0.0
