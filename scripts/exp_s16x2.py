"""The V18 s16x2 question, MEASURED (VERDICT round-3 item 5).

The reference's V18 -> V19 jump packs TWO alignments per 32-bit register
as int16 halves and maxes them with one hardware `__vibmax_s16x2`
(cuda/LNW/LinearNeedlemanWunschV19.cu:250-261) -- on Hopper the DPX unit
makes the packed op cost ONE instruction, so density doubles for free.

The TPU v5e VPU has 32-bit lanes and no dual-16-bit min/max/add ALU, so
the packed ops must be synthesized (SWAR).  This experiment runs the
stagger kernel's exact per-step core -- G-space LNW scores-only:
up-shift hand-off, substitution add, 2-max chain -- in two Pallas
kernels of identical structure:

  A. int32: one pair per lane (the production formulation).
  B. s16x2: two pairs per lane; adds are carry-isolated SWAR (5 ops vs
     1), maxes compare halves via masked 32-bit signed maxes
     (hi: mask to top half, 3 ops; lo: shift into the top half, 5 ops;
     combine, 1 op -- 9 ops vs 1).

Both kernels process the same number of CELLS per step per lane-pair;
the per-step op multiplier vs the 2x density decides the outcome.
Prints one JSON line per variant with cells/sec (GCUPS-equivalent for
the core loop) and the A/B ratio.

Run on real hardware: python scripts/exp_s16x2.py
"""

from __future__ import annotations

import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S = 32
P = 512
STEPS = 4096
MSB = -2147450880  # 0x8000_8000 as signed int32
HI = -65536  # 0xffff0000 as a plain int (folds as an immediate)


def _shift1(slab, fill_row):
    rolled = pltpu.roll(slab, 1, 0)
    rows = jax.lax.broadcasted_iota(jnp.int32, slab.shape, 0)
    return jnp.where(rows == 0, fill_row, rolled)


def _swar_add(a, b):
    """Packed dual-int16 add with carry isolation (5 ops)."""
    return ((a & ~MSB) + (b & ~MSB)) ^ ((a ^ b) & MSB)


def _swar_max(a, b):
    """Packed dual-int16 signed max (9 ops): hi halves compare as masked
    32-bit signed ints; lo halves are shifted into the top position."""
    hi = jnp.maximum(a & HI, b & HI)
    lo = jnp.maximum(a << 16, b << 16)
    return hi | ((lo >> 16) & 0xFFFF)


def _kernel(packed, steps, ref, h_ref, o_ref, rowbuf):
    del ref

    @pl.when(pl.program_id(0) == 0)
    def _init():
        rowbuf[:, :] = jnp.zeros_like(rowbuf)

    def body(k, carry):
        s1, up_prev = carry
        fill = rowbuf[pl.ds(0, 1), :]
        up = _shift1(s1, fill)
        diag = up_prev
        left = s1
        del k
        w = h_ref[pl.ds(0, S), :]  # stand-in substitution weights
        if packed:
            mm = _swar_add(diag, w)
            h = _swar_max(_swar_max(left, mm), up)
        else:
            mm = diag + w
            h = jnp.maximum(jnp.maximum(left, mm), up)
        return h, up

    junk = h_ref[:, :]
    h, up = jax.lax.fori_loop(0, steps, body, (junk, junk))
    o_ref[:, :] = h + up


@functools.partial(jax.jit, static_argnames=("packed", "steps"))
def run_core(x, packed, steps):
    return pl.pallas_call(
        _kernel_bound(packed, steps),
        grid=(x.shape[1] // P,),
        in_specs=[pl.BlockSpec((S, P), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.int32),
        out_specs=pl.BlockSpec((S, P), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((8, P), jnp.int32)],
    )(x)


def _kernel_bound(packed, steps):
    def k(ref, o_ref, rowbuf):
        _kernel(packed, steps, ref, ref, o_ref, rowbuf)
    return k


def main():
    b = 16 * P
    rng = np.random.default_rng(0)
    x = rng.integers(-100, 100, (S, b)).astype(np.int32)
    xd = jax.device_put(x)
    rtt_t = jax.device_put(np.zeros(4, np.int32))
    np.asarray(rtt_t + 1)
    t0 = time.perf_counter()
    np.asarray(rtt_t + 1)
    rtt = time.perf_counter() - t0

    results = {}
    for packed in (False, True):
        out = run_core(xd, packed, STEPS)
        np.asarray(out[0, :4])  # warm compile
        reps = 8
        t0 = time.perf_counter()
        for _ in range(reps):
            out = run_core(xd, packed, STEPS)
        np.asarray(out[0, :4])
        dt = (time.perf_counter() - t0 - rtt) / reps
        pairs_per_lane = 2 if packed else 1
        cells = S * STEPS * b * pairs_per_lane
        gcups = cells / dt / 1e9
        results[packed] = gcups
        print(json.dumps({
            "metric": "lnw_core_gcups_equiv",
            "kernel": "stagger-s16x2" if packed else "stagger-int32",
            "value": round(gcups, 1), "unit": "GCUPS-equiv (core loop)",
            "time_ms": round(dt * 1e3, 2),
            "backend": jax.default_backend(),
        }))
    print(json.dumps({
        "metric": "s16x2_vs_int32_ratio",
        "value": round(results[True] / results[False], 3),
        "note": "V18 analogue: >1 means packing wins on TPU",
    }), file=sys.stdout)


if __name__ == "__main__":
    main()
