"""Length bucketing: the TPU replacement for per-pair matrix mallocs.

The reference allocates a matrix per pair exactly sized to that pair
(cuda/LNW/LinearNeedlemanWunschV3.cu per-pair cudaMallocs, flattened into
one prefix-summed allocation in V9).  A TPU kernel needs static shapes, so
we group pairs into (query_pad, ref_pad) buckets -- lengths rounded up to
hardware-friendly multiples -- and batch each bucket.  Within a batch the
pair axis maps onto VPU sublanes and the reference axis onto the 128 lanes
(SURVEY.md section 7: batch-across-lanes is the recommended default).

Padding bytes for reference and query differ (0 vs 1) so a padded cell can
never look like a match; kernels additionally mask by true lengths.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from tpu_align.io.dataset import PairDataset

PAD_REF = 0
PAD_QRY = 1


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@dataclasses.dataclass(frozen=True)
class BucketSpec:
    """Bucketing policy.

    query_multiple: query padding granularity (DP row loop length).
    ref_multiple:   reference padding granularity (lane axis; 128 = VPU width).
    batch_pairs:    max pairs per batch (the V19 BATCH_SIZE analogue,
                    cuda/LNW/LinearNeedlemanWunschV19.cu:9).
    pair_multiple:  batch row padding granularity (sublane axis).
    """

    query_multiple: int = 32  # coarse default: every distinct kernel shape
    #                           costs a compile (minutes on remote backends)
    ref_multiple: int = 128
    batch_pairs: int = 2048
    pair_multiple: int = 8

    def padded_shape(self, qry_len: int, ref_len: int) -> tuple[int, int]:
        return (
            _round_up(max(qry_len, 1), self.query_multiple),
            _round_up(max(ref_len, 1), self.ref_multiple),
        )


@dataclasses.dataclass
class Bucket:
    """One fixed-shape batch of pairs ready for the fill kernel.

    ref_tokens: (B, N) uint8, PAD_REF beyond ref_len
    qry_tokens: (B, M) uint8, PAD_QRY beyond qry_len
    pair_ids:   (B,) int64 original dataset indices, -1 for padding rows
    """

    ref_tokens: np.ndarray
    qry_tokens: np.ndarray
    ref_len: np.ndarray  # (B,) int32
    qry_len: np.ndarray  # (B,) int32
    pair_ids: np.ndarray  # (B,) int64
    num_real: int

    @property
    def batch(self) -> int:
        return self.ref_tokens.shape[0]

    @property
    def padded_qry(self) -> int:
        return self.qry_tokens.shape[1]

    @property
    def padded_ref(self) -> int:
        return self.ref_tokens.shape[1]

    @property
    def real_cells(self) -> int:
        n = self.num_real
        return int(np.sum(self.ref_len[:n].astype(np.int64) * self.qry_len[:n]))

    @property
    def padded_cells(self) -> int:
        return self.batch * self.padded_qry * self.padded_ref


def _gather_padded(buf: np.ndarray, off: np.ndarray, lens: np.ndarray,
                   width: int, pad: int, rows: int) -> np.ndarray:
    """Flat-buffer -> (rows, width) padded token gather: threaded native
    memcpy pass when available, vectorized numpy otherwise."""
    n = len(off)
    if n:
        from tpu_align.native import native_gather_padded

        out = native_gather_padded(buf, off, lens, rows, width, pad)
        if out is not None:
            return out
    out = np.full((rows, width), pad, np.uint8)
    if n == 0 or buf.size == 0:  # all-empty dataset: nothing to gather
        return out
    col = np.arange(width, dtype=np.int64)
    pos = np.minimum(off[:, None] + col, buf.size - 1)
    np.copyto(out[:n], buf[pos], where=col < lens[:, None])
    return out


def _make_bucket(ds: PairDataset, idx: np.ndarray, mq: int, nr: int,
                 pair_multiple: int) -> Bucket:
    b_real = len(idx)
    b = _round_up(b_real, pair_multiple)
    rl = ds.ref_len[idx]
    ql = ds.qry_len[idx]
    ref_tokens = _gather_padded(ds.buffer, ds.ref_off[idx], rl, nr,
                                PAD_REF, b)
    qry_tokens = _gather_padded(ds.buffer, ds.qry_off[idx], ql, mq,
                                PAD_QRY, b)
    ref_len = np.zeros(b, np.int32)
    qry_len = np.zeros(b, np.int32)
    pair_ids = np.full(b, -1, np.int64)
    ref_len[:b_real] = rl
    qry_len[:b_real] = ql
    pair_ids[:b_real] = idx
    return Bucket(ref_tokens, qry_tokens, ref_len, qry_len, pair_ids, b_real)


def bucketize(ds: PairDataset, spec: BucketSpec | None = None) -> list[Bucket]:
    """Group pairs into fixed-shape buckets, preserving input order within
    each bucket (output ordering across buckets is restored later by pair id,
    the job scripts/reorderOutput.py does for the reference)."""
    spec = spec or BucketSpec()
    if len(ds) == 0:
        return []
    mq = np.maximum(ds.qry_len, 1)
    nr = np.maximum(ds.ref_len, 1)
    pad_q = -(-mq // spec.query_multiple) * spec.query_multiple
    pad_r = -(-nr // spec.ref_multiple) * spec.ref_multiple
    # group by (pad_q, pad_r) via lexicographic sort, stable so pair order kept
    order = np.lexsort((np.arange(len(ds)), pad_r, pad_q))
    keys = pad_q[order] * (1 << 32) + pad_r[order]
    boundaries = np.flatnonzero(np.diff(keys)) + 1
    groups = np.split(order, boundaries)
    buckets = []
    for g in groups:
        g = np.sort(g)  # restore input order within the group
        q, r = int(pad_q[g[0]]), int(pad_r[g[0]])
        for s in range(0, len(g), spec.batch_pairs):
            chunk = g[s : s + spec.batch_pairs]
            buckets.append(_make_bucket(ds, chunk, q, r, spec.pair_multiple))
    return buckets
