"""Registry for persisted intermediates, so long-lived sessions can
release them.

Several operators persist a UDF-derived table because both sides of a
self-join reference it (re-running the signature/fingerprint UDF per
side measured 2-3x slower — see ops/dedup.py).  The handle must stay
cached until the caller CONSUMES the returned DataFrame, which the
operator cannot observe — so operators register their persisted handles
here and the session owner calls :func:`release_all` between queries
(bench.py does; a service would hook its request boundary).  Releasing
a plain persisted handle is always safe: an unpersisted plan that is
collected again simply recomputes.  The ONE exception is
checkpoint-backed results (:func:`local_checkpoint` handles, e.g. the
labels returned by connected components): their lineage is truncated
at the checkpoint, so after release they cannot recompute — release
only after the result has been consumed, which is exactly
release_all's between-queries contract.
"""

from __future__ import annotations

from typing import Any

_LIVE: list[Any] = []


def register(handle: Any) -> Any:
    """Track a persisted/cached handle for later release; returns it.
    Accepts anything with ``unpersist()`` — persisted DataFrames and
    ``SparkContext.broadcast`` handles (executor copies are dropped;
    a re-executed consumer re-fetches from the driver)."""
    _LIVE.append(handle)
    return handle


def release_all() -> int:
    """Unpersist every registered handle (idempotent); returns how many.
    Failures (beyond a stopped session) are surfaced as a warning — a
    silently failing release would let the exact storage-memory leak
    this module exists to prevent build back up unnoticed."""
    import warnings

    n = 0
    failed = 0
    for df in _LIVE:
        try:
            df.unpersist()
            n += 1
        except Exception:
            failed += 1
    _LIVE.clear()
    if failed:
        warnings.warn(
            f"release_all: {failed} handle(s) failed to unpersist "
            "(stopped session, or a live-session unpersist error)",
            RuntimeWarning,
            stacklevel=2,
        )
    return n


def live_count() -> int:
    return len(_LIVE)


class _LocalCheckpointHandle:
    """Releasable storage handle for a ``localCheckpoint`` —
    ``DataFrame.unpersist()`` does NOT free checkpoint RDD storage (the
    persistence belongs to the materialized RDD, not the plan cache),
    so this records the RDD ids the checkpoint created and unpersists
    them through the context's persistent-RDD map."""

    def __init__(self, sc, rdd_ids: list[int]) -> None:
        self._sc = sc
        self._ids = rdd_ids

    def unpersist(self) -> None:
        jmap = self._sc._jsc.getPersistentRDDs()
        for rid in self._ids:
            jrdd = jmap.get(rid)
            if jrdd is not None:
                jrdd.unpersist()


def local_checkpoint(df):
    """``df.localCheckpoint()`` (eager; truncates lineage for iterative
    algorithms whose per-round plans otherwise grow exponentially) with
    DETERMINISTIC storage release: returns ``(checkpointed_df, handle)``
    where ``handle.unpersist()`` frees the checkpoint storage — either
    immediately when a later round supersedes it, or via
    :func:`register` + :func:`release_all` for the final round."""
    sc = df.sparkSession.sparkContext
    before = {int(k) for k in sc._jsc.getPersistentRDDs().keySet().toArray()}
    out = df.localCheckpoint()
    after = {int(k) for k in sc._jsc.getPersistentRDDs().keySet().toArray()}
    return out, _LocalCheckpointHandle(sc, sorted(after - before))
