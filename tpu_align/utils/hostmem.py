"""glibc allocator tuning for the host output pipeline.

The engine's host side churns large short-lived buffers every run (per-
bucket block chunks ~20 MB, the final pair-ordered output stream ~80 MB
at 100k-pair scale).  numpy serves those through malloc, and glibc's
default M_MMAP_THRESHOLD (128 KB) routes them to fresh mmap regions that
are unmapped on free -- so EVERY run re-pays first-touch page faults,
which on this class of VM cost ~25 us/page (~500 ms per 78 MB buffer;
measured, PERF.md "Host memory" note).

Raising M_MMAP_THRESHOLD/M_TRIM_THRESHOLD keeps large blocks on the brk
heap, where freed memory stays mapped and is reused: the fault cost is
paid once per process instead of once per run (78 MB copy: 760 ms cold
-> 9.9 ms steady-state on the bench box).

The reference pays the equivalent cost once via cudaMallocHost pinned
buffers allocated up front (cuda/LNW/LinearNeedlemanWunschV19.cu V9
"single flat allocation"); this is the glibc analogue for the host-side
buffers.
"""

from __future__ import annotations

import ctypes
import sys

_done = False

_M_TRIM_THRESHOLD = -1
_M_MMAP_THRESHOLD = -3


def tune_malloc_for_large_buffers() -> bool:
    """Keep large malloc blocks on the reusable heap (idempotent).
    Returns True if mallopt was applied (glibc present), False otherwise."""
    global _done
    if _done:
        return True
    if not sys.platform.startswith("linux"):
        return False
    try:
        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        ok = libc.mallopt(_M_MMAP_THRESHOLD, 1 << 30)
        ok &= libc.mallopt(_M_TRIM_THRESHOLD, 1 << 30)
    except OSError:  # non-glibc libc
        return False
    _done = bool(ok)
    return _done
