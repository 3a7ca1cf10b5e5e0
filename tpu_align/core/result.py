"""Result records for a single aligned pair."""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass
class AlignmentResult:
    """One pair's alignment outcome.

    Matches the reference's output block (c++/backtrack.cpp:205-210):
        <pair_num> | <score>
        <reference with '_' gaps>
        <relation: '*' match, '|' mismatch, ' ' gap>
        <query with '_' gaps>
    For local alignment with score 0 the three lines are empty
    (cuda/LinearSmithWaterman.cu host loop: backtrack from cell (0,0)).
    `extra_paths` holds additional co-optimal paths when a multi-path mode
    is requested (c++/LinearSmithWaterman.cpp BACKTRACK_ALL).
    """

    pair_num: int
    score: int
    ref_aligned: str = ""
    relation: str = ""
    query_aligned: str = ""
    extra_paths: list = dataclasses.field(default_factory=list)

    def block(self) -> str:
        """Format as the reference's 4-line output block."""
        lines = [
            f"{self.pair_num} | {self.score}",
            self.ref_aligned,
            self.relation,
            self.query_aligned,
        ]
        for (r, m, q) in self.extra_paths:
            lines.extend([r, m, q])
        return "\n".join(lines) + "\n"


def results_from_arrays(pair_ids, scores, out_buf, out_lens,
                        num_real: int) -> list[AlignmentResult]:
    """Decode the native walker's array contract -- out_buf (B, 3, stride)
    uint8 rows holding (reference, relation, query) bytes, out_lens (B,)
    valid lengths -- into per-pair AlignmentResults.  The single decoder
    for every consumer (host walk, device replay, engine records path)."""
    return [
        AlignmentResult(
            int(pair_ids[row]), int(scores[row]),
            # latin-1: byte-transparent, matching the oracle's _encode --
            # the parser accepts arbitrary non-newline bytes, and a >127
            # byte must round-trip instead of crashing the whole run
            out_buf[row, 0, :int(out_lens[row])].tobytes().decode("latin-1"),
            out_buf[row, 1, :int(out_lens[row])].tobytes().decode("latin-1"),
            out_buf[row, 2, :int(out_lens[row])].tobytes().decode("latin-1"),
        )
        for row in range(num_real)
    ]
