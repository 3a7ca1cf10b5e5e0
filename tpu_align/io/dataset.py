"""Pair-file parsing and the flat-buffer dataset representation.

File format (behavioral spec: c++/parseInput.cpp:81-113): three lines per
pair -- a seed/score line (ignored), the reference sequence, the query
sequence.  The total line count must be divisible by three
(parseInput.cpp:38-42).  The reference stores the whole file as one flat
char buffer with a `seqPair` offset/size table per pair and accumulates
dataset stats incl. the total DP cell count used for GCUPS
(parseInput.cpp:100); we keep the same representation (numpy uint8 flat
buffer + int64 offset/size arrays) because it is what the bucketing layer
gathers from, and the same INPUT_CAP of 10M pairs (parseInput.cpp:7).

Sequences over the digit alphabet "0123" are auto-translated to "ATCG"
(the reference does this with `tr` in cuda/convert.sh and in the scrapers,
web-scraper.py:5-12).
"""

from __future__ import annotations

import dataclasses
import os

import numpy as np

INPUT_CAP = 10_000_000  # c++/parseInput.cpp:7

# digit -> base translation (cuda/convert.sh: tr "0123" "ATCG")
_DIGIT_TO_BASE = np.arange(256, dtype=np.uint8)
for _d, _b in zip(b"0123", b"ATCG"):
    _DIGIT_TO_BASE[_d] = _b


@dataclasses.dataclass(frozen=True)
class DatasetStats:
    """Mirrors inputInfo (c++/parseInput.h:9-20)."""

    num_pairs: int
    num_bytes: int
    num_cells: int  # sum(ref_len * query_len) -- the GCUPS denominator
    min_reference_length: int
    min_query_length: int
    max_reference_length: int
    max_query_length: int
    avg_reference_length: float
    avg_query_length: float


class PairDataset:
    """Flat-buffer sequence-pair dataset.

    buffer:    uint8 flat array holding all sequence bytes
    ref_off/ref_len/qry_off/qry_len: int64 per-pair views into `buffer`
    (the seqPair table, c++/parseInput.h:22-29).
    """

    def __init__(self, buffer, ref_off, ref_len, qry_off, qry_len):
        self.buffer = np.ascontiguousarray(buffer, np.uint8)
        self.ref_off = np.asarray(ref_off, np.int64)
        self.ref_len = np.asarray(ref_len, np.int64)
        self.qry_off = np.asarray(qry_off, np.int64)
        self.qry_len = np.asarray(qry_len, np.int64)
        n = len(self.ref_off)
        if not (len(self.ref_len) == len(self.qry_off) == len(self.qry_len) == n):
            raise ValueError("pair table arrays must have equal length")

    # -- construction ------------------------------------------------------

    @classmethod
    def from_pairs(cls, pairs) -> "PairDataset":
        """Build from an iterable of (reference, query) strings."""
        chunks, ro, rl, qo, ql = [], [], [], [], []
        off = 0
        for ref, qry in pairs:
            rb = ref.encode("ascii") if isinstance(ref, str) else bytes(ref)
            qb = qry.encode("ascii") if isinstance(qry, str) else bytes(qry)
            chunks.append(rb)
            ro.append(off)
            rl.append(len(rb))
            off += len(rb)
            chunks.append(qb)
            qo.append(off)
            ql.append(len(qb))
            off += len(qb)
        buf = np.frombuffer(b"".join(chunks), np.uint8) if chunks else np.zeros(0, np.uint8)
        return cls(buf, ro, rl, qo, ql)

    # -- accessors ---------------------------------------------------------

    def __len__(self) -> int:
        return len(self.ref_off)

    def reference_bytes(self, i: int) -> np.ndarray:
        o = self.ref_off[i]
        return self.buffer[o : o + self.ref_len[i]]

    def query_bytes(self, i: int) -> np.ndarray:
        o = self.qry_off[i]
        return self.buffer[o : o + self.qry_len[i]]

    def reference(self, i: int) -> str:
        return self.reference_bytes(i).tobytes().decode("ascii")

    def query(self, i: int) -> str:
        return self.query_bytes(i).tobytes().decode("ascii")

    def pair(self, i: int) -> tuple[str, str]:
        return self.reference(i), self.query(i)

    def pairs(self):
        for i in range(len(self)):
            yield self.pair(i)

    @property
    def num_cells(self) -> int:
        return int(np.sum(self.ref_len * self.qry_len))

    def stats(self) -> DatasetStats:
        n = len(self)
        if n == 0:
            return DatasetStats(0, 0, 0, 0, 0, 0, 0, 0.0, 0.0)
        return DatasetStats(
            num_pairs=n,
            num_bytes=int(self.buffer.size),
            num_cells=self.num_cells,
            min_reference_length=int(self.ref_len.min()),
            min_query_length=int(self.qry_len.min()),
            max_reference_length=int(self.ref_len.max()),
            max_query_length=int(self.qry_len.max()),
            avg_reference_length=float(self.ref_len.mean()),
            avg_query_length=float(self.qry_len.mean()),
        )

    def slice(self, start: int, stop: int) -> "PairDataset":
        """Zero-copy row-subset view (buffer shared)."""
        sl = slice(start, stop)
        return PairDataset(
            self.buffer, self.ref_off[sl], self.ref_len[sl],
            self.qry_off[sl], self.qry_len[sl],
        )

    def select(self, idx) -> "PairDataset":
        idx = np.asarray(idx, np.int64)
        return PairDataset(
            self.buffer, self.ref_off[idx], self.ref_len[idx],
            self.qry_off[idx], self.qry_len[idx],
        )


def parse_pair_text(
    data: bytes, translate_digits: bool = True, use_native: bool = True
) -> PairDataset:
    """Parse the 3-line-per-pair format from an in-memory byte string.

    Uses the native single-pass parser (native/tpualign.cpp
    ta_parse_pairs, the c++/parseInput.cpp counterpart) when available;
    otherwise a vectorized numpy pass: find newline positions, derive
    per-line offsets, take every 3k+1'th line as reference and 3k+2'th as
    query (the byte-scan state machine of c++/parseInput.cpp:81-113).
    """
    if use_native:
        from tpu_align.native import native_parse_pair_bytes

        out = native_parse_pair_bytes(data, translate_digits=translate_digits)
        if out is not None:
            buf, ro, rl, qo, ql = out
            n = min(len(ro), INPUT_CAP)
            return PairDataset(buf, ro[:n], rl[:n], qo[:n], ql[:n])
    buf = np.frombuffer(data, np.uint8).copy()
    if buf.size and buf[-1] != 0x0A:  # tolerate missing trailing newline
        buf = np.append(buf, np.uint8(0x0A))
    nl = np.flatnonzero(buf == 0x0A)
    num_lines = nl.size
    if num_lines % 3 != 0:
        raise ValueError(f"number of lines not a multiple of 3: {num_lines}")
    if num_lines == 0:
        return PairDataset(np.zeros(0, np.uint8), [], [], [], [])
    num_pairs = min(num_lines // 3, INPUT_CAP)
    starts = np.empty(num_lines, np.int64)
    starts[0] = 0
    starts[1:] = nl[:-1] + 1
    ends = nl.astype(np.int64)
    # strip \r for CRLF files
    crlf = (ends > starts) & (buf[np.maximum(ends - 1, 0)] == 0x0D)
    ends = ends - crlf.astype(np.int64)
    ro = starts[1::3][:num_pairs]
    re_ = ends[1::3][:num_pairs]
    qo = starts[2::3][:num_pairs]
    qe = ends[2::3][:num_pairs]
    if translate_digits:
        buf = _DIGIT_TO_BASE[buf]
    return PairDataset(buf, ro, re_ - ro, qo, qe - qo)


def parse_pair_file(path: str | os.PathLike, translate_digits: bool = True) -> PairDataset:
    with open(path, "rb") as f:
        return parse_pair_text(f.read(), translate_digits=translate_digits)


def write_pair_file(path: str | os.PathLike, pairs, seed_fn=None) -> None:
    """Write (reference, query) pairs in the reference's 3-line format.

    seed_fn(i) supplies the first (ignored) line; defaults to the pair index.
    """
    with open(path, "w") as f:
        for i, (ref, qry) in enumerate(pairs):
            seed = str(i) if seed_fn is None else str(seed_fn(i))
            f.write(f"{seed}\n{ref}\n{qry}\n")
