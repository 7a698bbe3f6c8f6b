"""Cache ownership for library entry points whose RETURNED DataFrame
is lazy over internal ``.cache()`` state.

Several operators cache an internal relation that both feeds multiple
subtrees of the returned plan and must outlive the call (the result
executes later, at the caller's action) — so the function cannot
unpersist it itself.  Left untracked, every call leaks one
session-lifetime cache entry: the round-4 bench measured exactly this
class drifting later queries 2-4× (ALS state), and round 5/6 fixed it
for ALS (``recommenders/als.py::release_last_state``) and the CF LSH
switch (``operators/cf_lsh.py::release_last_state``).

This module is the shared form of that pattern for the ANN family and
PageRank: operators register their internal caches with :func:`track`;
callers that loop over many operator invocations (benchmarks, model
sweeps, long sessions) call :func:`release_tracked` once the returned
DataFrames are materialized (collected / written / cached themselves).
A released relation is simply recomputed if its plan executes again —
correctness is unaffected.

OWNERSHIP MODEL (r6 ADVICE): the registry is process-global, so a bare
``release_tracked()`` drains EVERY tracked cache — it assumes a single
owner driving the session (a bench loop, a pytest session, one
pipeline).  Two concurrent consumers sharing a SparkSession must not
both call the bare form, or one will evict caches the other's
still-lazy plans rely on (a recompute, never a wrong result).  For
that case, :func:`scope` returns a token: ``track(df, owner=tok)``
plus ``release_tracked(tok)`` releases only that owner's caches and
leaves everything else persisted.  The bare forms remain the default
for the single-owner harnesses this repo actually runs (bench.py,
pytest), and the list cannot grow unboundedly there because each
measured query is followed by a drain.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame

#: (owner token | None, cached DataFrame) — None = the shared
#: single-owner pool drained by a bare release_tracked()
_tracked: list[tuple[object | None, DataFrame]] = []

#: guards _tracked (NOT the unpersist calls themselves — those are
#: thread-safe JVM-side); held only around list mutation so a slow
#: unpersist never blocks another thread's track()
_lock = threading.Lock()


def scope() -> object:
    """A fresh opaque owner token for scoped track/release (see module
    docstring's ownership model)."""
    return object()


def track(df: DataFrame, owner: object | None = None) -> DataFrame:
    """Register an internally-cached DataFrame for later release.

    ``owner`` (from :func:`scope`) attributes the cache to one consumer
    so a concurrent pipeline's ``release_tracked(other)`` cannot evict
    it; omitted, the cache joins the shared single-owner pool."""
    with _lock:
        _tracked.append((owner, df))
    return df


def release_tracked(owner: object | None = None) -> None:
    """Unpersist tracked caches (LIFO).  Safe to call at any point;
    plans that execute afterwards recompute instead of reading the
    cache.

    With ``owner=None`` (the single-owner harness form) EVERY tracked
    cache is drained regardless of owner — callers sharing a session
    with another live consumer must pass their own scope token
    instead."""
    # claim the victims under the lock, unpersist outside it: a
    # concurrent track()/release cannot lose or double-release an
    # entry because each entry leaves the list exactly once
    with _lock:
        if owner is None:
            victims = [df for _, df in reversed(_tracked)]
            _tracked.clear()
        else:
            victims = [df for tok, df in reversed(_tracked) if tok is owner]
            _tracked[:] = [e for e in _tracked if e[0] is not owner]
    for df in victims:
        df.unpersist()
