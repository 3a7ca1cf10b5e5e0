"""Phase timers and GCUPS accounting.

The reference accumulates per-phase microsecond buckets (memory management /
kernel / backtracking / printing) with gettimeofday timers (c++/timing.cpp:6-23)
and prints GCUPS = numCells / kernel_seconds * 1e-9 at exit
(cuda/LNW/LinearNeedlemanWunschV19.cu:669-680).  Same model here, on
time.perf_counter.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict


class PhaseTimer:
    """Accumulating wall-clock phase buckets."""

    def __init__(self):
        self.seconds: dict[str, float] = defaultdict(float)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.seconds[name] += time.perf_counter() - t0

    def add(self, name: str, secs: float) -> None:
        self.seconds[name] += secs

    @property
    def total(self) -> float:
        return sum(self.seconds.values())

    def gcups(self, num_cells: int, phase: str = "kernel") -> float:
        secs = self.seconds.get(phase, 0.0)
        if secs <= 0:
            return 0.0
        return num_cells / secs / 1e9

    def report(self) -> str:
        lines = [
            f"{name:>12}: {secs * 1e6:14.1f} us"
            for name, secs in sorted(self.seconds.items())
        ]
        lines.append(f"{'total':>12}: {self.total * 1e6:14.1f} us")
        return "\n".join(lines)
