"""Microbenchmark of the host-side e2e phases at 100k-pair scale.

The device-traceback e2e path is: device fill+walk -> D2H move streams ->
native replay (ta_replay_moves) -> native block format (ta_format_blocks)
-> pair-order gather (ta_gather_spans).  The fill is 25 ms on hardware
(BENCH_r03); V12 total-time parity (440.6 ms for 100k pairs, BASELINE.md:22)
requires the HOST side to sustain >= ~250k pairs/sec on this 4-core box.
This script measures each native phase in isolation on synthetic-but-
structurally-real inputs (move streams with the same word layout and
length statistics the device walk produces).
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def synth_moves(num_pairs, seq_len, t16, rng):
    """Plausible packed move streams: mostly diagonal, ~8% indels."""
    t = t16 * 16
    codes = rng.choice(
        np.array([0, 1, 2, 3], np.uint32), size=(t, num_pairs),
        p=[0.0, 0.92, 0.04, 0.04],
    )
    # walks end after ~seq_len+indels steps; zero the tail
    steps = np.minimum(seq_len + rng.poisson(20, num_pairs), t - 1)
    codes[np.arange(t)[:, None] >= steps[None, :]] = 0
    shifts = (2 * (np.arange(t) % 16)).astype(np.uint32)
    packed = (codes << shifts[:, None]).reshape(t16, 16, num_pairs).sum(
        axis=1, dtype=np.uint32).astype(np.int32)
    return packed, steps


def main():
    from tpu_align.native import (native_format_blocks, native_gather_spans,
                                  native_replay_moves)
    from tpu_align.native.binding import available

    assert available(), "native library missing"
    rng = np.random.default_rng(7)
    num_pairs, seq_len = 100_000, 250
    n = m = 256
    t16 = -(-(2 * seq_len + 64) // 16)
    bucket = 16384

    ref_tokens = rng.integers(65, 91, (num_pairs, n), dtype=np.uint8)
    qry_tokens = rng.integers(65, 91, (num_pairs, m), dtype=np.uint8)
    packed_all, steps = synth_moves(num_pairs, seq_len, t16, rng)
    start_row = np.full(num_pairs, seq_len, np.int32)
    start_col = np.full(num_pairs, seq_len, np.int32)
    scores = np.full(num_pairs, 300, np.int32)

    for threads in (0, 1, 2, 4, 8):
        t_replay = t_format = t_gather = 0.0
        parts = []
        for lo in range(0, num_pairs, bucket):
            hi = min(lo + bucket, num_pairs)
            pk = np.ascontiguousarray(packed_all[:, lo:hi])
            t0 = time.perf_counter()
            out_buf, out_lens = native_replay_moves(
                pk, ref_tokens[lo:hi], qry_tokens[lo:hi],
                start_row[lo:hi], start_col[lo:hi], scores[lo:hi],
                local=False, num_threads=threads,
            )
            t_replay += time.perf_counter() - t0
            ids = np.arange(lo, hi, dtype=np.int64)
            t0 = time.perf_counter()
            chunk, spans = native_format_blocks(
                ids, scores[lo:hi], out_buf, out_lens, num_threads=threads)
            t_format += time.perf_counter() - t0
            parts.append((ids, chunk, spans))
        t0 = time.perf_counter()
        ids = np.concatenate([p[0] for p in parts])
        spans = np.vstack([p[2] for p in parts])
        base = row = 0
        for p in parts:
            spans[row:row + p[2].shape[0], 0] += base
            base += p[1].size
            row += p[2].shape[0]
        src = np.concatenate([p[1] for p in parts])
        order = np.argsort(ids, kind="stable")
        blocks = native_gather_spans(src, spans, order)
        t_gather = time.perf_counter() - t0
        total = t_replay + t_format + t_gather
        print(f"threads={threads}: replay {t_replay*1e3:7.1f} ms  "
              f"format {t_format*1e3:7.1f} ms  gather {t_gather*1e3:7.1f} ms"
              f"  total {total*1e3:7.1f} ms  "
              f"({num_pairs/total/1e3:.0f}k pairs/s)  out={blocks.size/1e6:.1f} MB")


if __name__ == "__main__":
    main()
