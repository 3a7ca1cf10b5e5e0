"""Problem model: algorithm selection and scoring parameters.

This replaces the reference's two-tier config (argv flags -pairs/-match/
-mismatch/-gap/-open/-extend in c++/main.cpp:118-150 plus compile-time
#defines for algorithm selection, main.cpp:22-24) with one runtime config
object.
"""

from __future__ import annotations

import dataclasses
import enum


class Algorithm(enum.Enum):
    """The four DP aligners of the reference (SURVEY.md section 2).

    LNW: linear-gap Needleman-Wunsch (global)      -- c++/LinearNeedlemanWunsch.cpp
    LSW: linear-gap Smith-Waterman (local)         -- c++/LinearSmithWaterman.cpp
    ANW: affine-gap Gotoh Needleman-Wunsch (global)-- c++/AffineNeedlemanWunsch.cpp
    BSW: banded Smith-Waterman (local)             -- python/LinearBandedSmithWaterman.py
         (the Python file is the behavioral spec; the C++ BSW is a known-buggy
          prototype -- SURVEY.md section 7 "known reference bugs")
    """

    LNW = "lnw"
    LSW = "lsw"
    ANW = "anw"
    BSW = "bsw"

    @property
    def is_local(self) -> bool:
        return self in (Algorithm.LSW, Algorithm.BSW)

    @property
    def is_affine(self) -> bool:
        return self is Algorithm.ANW

    @property
    def is_banded(self) -> bool:
        return self is Algorithm.BSW


@dataclasses.dataclass(frozen=True)
class AlignmentParams:
    """Scoring parameters.

    Defaults mirror the reference CLI defaults (c++/main.cpp:128-132):
    match=3, mismatch=-1, gap=-2 for linear aligners; gap_open=-4,
    gap_extend=-1 for the affine aligner.  In the affine (Gotoh) recurrence
    opening a gap costs gap_open + gap_extend, matching
    c++/AffineNeedlemanWunsch.cpp:185-213 and the border initialization
    gap_open + i*gap_extend (AffineNeedlemanWunsch.cpp:43-53).
    """

    match: int = 3
    mismatch: int = -1
    gap: int = -2
    gap_open: int = -4
    gap_extend: int = -1
    band: int = 16  # BSW band half-width: cells with |row-col| < band are filled

    def __post_init__(self):
        if self.band < 1:
            raise ValueError(f"band must be >= 1, got {self.band}")

    def max_abs_score(self, max_query: int, max_ref: int) -> int:
        """Upper bound on |score| over any cell, for dtype selection."""
        n = max(max_query, max_ref)
        m = max_query + max_ref
        hi = n * max(abs(self.match), abs(self.mismatch), 1)
        lo = m * max(
            abs(self.mismatch),
            abs(self.gap),
            abs(self.gap_open) + abs(self.gap_extend),
        )
        return max(hi, lo)


# Note: there is deliberately no int16 score-dtype selection here.  The
# reference's V18/V19 s16x2 packing (cuda/LNW/LinearNeedlemanWunschV18.cu:
# 17-24) exists to double CUDA register lanes; on TPU a vreg already holds
# 1024 32-bit SIMD lanes and Mosaic cannot lower sub-32-bit rotates, so the
# kernels use int32 scores unconditionally (see kernels/fill.py).
