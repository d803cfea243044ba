"""Process-scoped scratch directories for staged fixtures.

Every staged-fixture key (txn-log tables, file-format sources,
checkpoint dirs) needs a temp directory that OUTLIVES the function
that created it — the returned DataFrame is lazy, and the caller
(driver, tests, sweeps) collects it only after the key returns — so
the keys cannot delete their staging on the way out. Before this
module they simply leaked: a full-registry sweep at the ~sf10 corpus
left ~900 staging dirs (tens of GB) in /tmp and eventually filled the
disk mid-sweep ("No space left on device" inside a shuffle spill).

``scratch_dir`` is a drop-in for ``tempfile.mkdtemp`` that registers
the directory for best-effort removal at interpreter exit — the
earliest point at which no lazy plan can still reference the files.
Long-lived servers would swap this for a TTL sweeper keyed on query
lifecycle; the contract (staging lives exactly as long as plans that
can read it) is the same.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile

_DIRS: list[str] = []


def scratch_dir(prefix: str, dir: str | None = None) -> str:
    """``tempfile.mkdtemp`` + atexit cleanup registration."""
    d = tempfile.mkdtemp(prefix=prefix, dir=dir)
    _DIRS.append(d)
    return d


@atexit.register
def _cleanup() -> None:  # pragma: no cover - exercised at exit
    for d in _DIRS:
        shutil.rmtree(d, ignore_errors=True)
