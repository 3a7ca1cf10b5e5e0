"""Canonicalize result-block ordering by pair id.

Equivalent of scripts/reorderOutput.py:30-51: multithreaded / multi-shard
output interleaves nondeterministically, so blocks ("<pairNum> | <score>"
followed by the 3 alignment lines) are re-sorted by pairNum before diffing
against golden files.
"""

from __future__ import annotations


def block_header_pair_num(line: str) -> int | None:
    """Pair number if `line` is a "<pairNum> | <score>" block header, else
    None.  The single definition of header detection (reorder + the
    multihost streaming merge share it): body lines can never alias a
    header -- alignment lines hold only bases/'_' and relation lines only
    '*', '|', ' ', so the integer check rejects both."""
    parts = line.split(" | ")
    if len(parts) == 2:
        try:  # int() also rejects what isdigit() would admit ("--5", "²")
            return int(parts[0])
        except ValueError:
            return None
    return None


def reorder_output(text: str) -> str:
    """Sort 4-line output blocks by their leading pair number."""
    lines = text.splitlines()
    blocks: list[tuple[int, list[str]]] = []
    current: list[str] | None = None
    key = -1
    for line in lines:
        pn = block_header_pair_num(line)
        if pn is not None:
            if current is not None:
                blocks.append((key, current))
            key = pn
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
