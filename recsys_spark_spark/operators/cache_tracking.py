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
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_tracked: list[DataFrame] = []


def track(df: DataFrame) -> DataFrame:
    """Register an internally-cached DataFrame for later release."""
    _tracked.append(df)
    return df


def release_tracked() -> None:
    """Unpersist every tracked cache (LIFO).  Safe to call at any
    point; plans that execute afterwards recompute instead of reading
    the cache."""
    while _tracked:
        _tracked.pop().unpersist()
