"""Process-scoped scratch directories for driver-local workdirs.

Several registered queries materialize driver-local state as part of
what they certify — the streaming twins' checkpoint/output workdirs
(plans/sketch.py, plans/windows_extra.py) and the incremental-dedup
signature store (plans/dedup.py).  Before r14 each invocation leaked a
fresh ``tempfile.mkdtemp`` directory (r13 ADVICE): a parity sweep over
120 queries left hundreds of orphaned store copies.  All such workdirs
now live under ONE per-process root that is removed at interpreter
exit, so repeated invocations still get isolated directories (the
correctness property: a replayed query must not see a prior run's
files) without accumulating beyond process lifetime.

Driver-local paths are a LOCAL-MODE convenience throughout (documented
at every call site); on a cluster these would be object-store URIs and
lifecycle would belong to the store's retention policy, not atexit.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile

_ROOT: str | None = None


def _cleanup() -> None:
    global _ROOT
    if _ROOT is not None:
        shutil.rmtree(_ROOT, ignore_errors=True)
        _ROOT = None


def scratch_dir(prefix: str) -> str:
    """A fresh empty directory under the process-wide scratch root
    (created lazily, removed at interpreter exit).  Each call returns
    a DISTINCT directory — callers that need run isolation (streaming
    checkpoints, signature stores) keep it."""
    global _ROOT
    if _ROOT is None:
        _ROOT = tempfile.mkdtemp(prefix="recsys_spark_scratch_")
        atexit.register(_cleanup)
    return tempfile.mkdtemp(prefix=prefix, dir=_ROOT)
