"""Release-on-next-call resource lifecycle (VERDICT r3 item 10).

Several declared queries return DataFrames whose plans lazily read
resources created during the call — persisted intermediates
(anomaly_mad, curate), scratch directories holding written files
(orc_roundtrip, compact_files, streaming upserts). The resource must
OUTLIVE the call (the caller hasn't executed the plan yet), but a
bench/driver sweep calls the same query hundreds of times per session,
so resources must not accumulate. Contract: each operator owns one
``Lifecycle``; a new call releases the previous call's holdings first,
so at most one generation is ever live. Consume (collect/write) each
returned DataFrame before invoking the same operator again.

Thread-safe: the holdings list swap happens under a lock, so two
threads racing the same operator cannot double-release or leak a
generation (the release callbacks themselves are idempotent —
``unpersist`` and ``rmtree(ignore_errors=True)``).
"""

from __future__ import annotations

import atexit
import shutil
import threading
import weakref
from collections.abc import Callable

#: every Lifecycle registers here so interpreter exit releases the LAST
#: generation too — release-on-next-call cannot fire after the final
#: call of a process, which leaked one scratch dir per session per
#: operator into /dev/shm (observed: ~1,800 dirs after a bench day)
_REGISTRY: list[weakref.ref] = []


def _release_all_at_exit() -> None:
    for ref in _REGISTRY:
        lc = ref()
        if lc is not None:
            lc.release()


atexit.register(_release_all_at_exit)


class Lifecycle:
    """Holds release callbacks for the most recent call of one operator."""

    def __init__(self) -> None:
        self._held: list[Callable[[], None]] = []
        self._lock = threading.Lock()
        self.dirs: list[str] = []  # introspection (tests): held dir paths
        _REGISTRY.append(weakref.ref(self))

    def release(self) -> None:
        """Release everything held from the previous call (idempotent)."""
        with self._lock:
            held, self._held = self._held, []
            self.dirs = []
        for fn in reversed(held):
            try:
                fn()
            except Exception:
                pass  # session stopped / dir already gone

    def hold(self, fn: Callable[[], None]) -> None:
        with self._lock:
            self._held.append(fn)

    def hold_df(self, df):
        """Track a persisted DataFrame; returns it for chaining."""
        self.hold(df.unpersist)
        return df

    def hold_dir(self, path: str) -> str:
        """Track a scratch directory; returns the path for chaining."""
        self.hold(lambda: shutil.rmtree(path, ignore_errors=True))
        with self._lock:
            self.dirs.append(path)
        return path
