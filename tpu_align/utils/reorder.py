"""Canonicalize result-block ordering by pair id.

Equivalent of scripts/reorderOutput.py:30-51: multithreaded / multi-shard
output interleaves nondeterministically, so blocks ("<pairNum> | <score>"
followed by the 3 alignment lines) are re-sorted by pairNum before diffing
against golden files.
"""

from __future__ import annotations


def reorder_output(text: str) -> str:
    """Sort 4-line output blocks by their leading pair number."""
    lines = text.splitlines()
    blocks: list[tuple[int, list[str]]] = []
    current: list[str] | None = None
    key = -1
    for line in lines:
        parts = line.split(" | ")
        if len(parts) == 2 and parts[0].strip().lstrip("-").isdigit():
            if current is not None:
                blocks.append((key, current))
            key = int(parts[0])
            current = [line]
        elif current is not None:
            current.append(line)
        # lines before the first block header are dropped, as in the script
    if current is not None:
        blocks.append((key, current))
    blocks.sort(key=lambda kv: kv[0])
    out = []
    for _, blk in blocks:
        out.extend(blk)
    return "\n".join(out) + ("\n" if out else "")
