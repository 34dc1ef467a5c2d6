"""The steal-certified trial harness itself: retry/stop logic must be
exactly what BENCH/BASELINE.md §5 documents — these behaviors guard
every recorded number, so they get deterministic tests."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from bench import timed_trials  # noqa: E402


def _seq(values):
    it = iter(values)
    return lambda: next(it)


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
