"""Structural guards on the driver contract: the round-4 lesson was
that oracle-bearing queries falling outside the driver's ~50-entry
correctness window silently lose their driver-side certification, so
the ordering invariant is now a test, not a convention."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

DRIVER_WINDOW = 50


def test_every_oracle_query_sits_inside_the_driver_window():
    import __spark_entry__ as E

    q_keys = list(E.queries())
    oracle_keys = set(E.oracle_sql())
    missing = oracle_keys - set(q_keys)
    assert not missing, f"oracle_sql keys without a queries() entry: {missing}"
    window = set(q_keys[:DRIVER_WINDOW])
    outside = oracle_keys - window
    assert not outside, (
        f"exact-oracle queries outside the first {DRIVER_WINDOW} entries "
        f"(driver would not certify them): {outside}"
    )


def test_rows_only_queries_follow_oracle_bearing_ones():
    import __spark_entry__ as E

    q_keys = list(E.queries())
    oracle_keys = set(E.oracle_sql())
    first_rows_only = next(i for i, k in enumerate(q_keys) if k not in oracle_keys)
    stragglers = [k for k in q_keys[first_rows_only:] if k in oracle_keys]
    assert not stragglers, (
        f"oracle-bearing entries interleaved after the first rows-only "
        f"entry: {stragglers}"
    )
