"""Pallas device-traceback walk kernel.

The XLA `while_loop` walker (traceback/device.py) re-reads the direction
rows from HBM and pays the loop's per-iteration dispatch overhead on every
phase; at small batches that overhead dominates (PERF.md headroom #3).
This kernel runs the identical row-phase walk *inside* one Pallas program:
the current stripe's direction words live in VMEM, the walker state is
VMEM scratch carried across the stripe grid, and the per-phase critical
path is a handful of vector ops on lane-group registers.

Role model: the reference's on-GPU `backtracking()` thread
(cuda/LNW/LinearNeedlemanWunschV19.cu:26-110) -- the walk happens on the
accelerator and only packed move streams cross the host boundary.

Structure
---------
* grid = (lane groups, stripes); the stripe axis is iterated LAST-fastest
  and index-mapped in reverse, so each lane group walks stripes from the
  bottom of the DP matrix upward while its state persists in scratch.
* Within a stripe, a `lax.while_loop` advances the shared row phase m
  exactly like the XLA walker; the move semantics are literally the same
  function (`decide_step` -- byte-identical output by construction).
* A lane's direction word for row m is selected from the stripe slab with
  one dynamic-sublane read + compare-select per word plane (W ~ 18 for
  250bp); no per-lane gather is ever needed.
* Emitted codes land in a VMEM step buffer; the final grid step packs
  them 16-per-int32 and writes the packed block plus the phase count.

The phase budget contract matches the XLA walker: a reported step count
>= t_max - 1 means the budget ran out (lanes spent long insertion runs at
different rows) and the caller retries with a doubled t_max.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_align.kernels.fill import TILE_P, _default_interpret, bits_per_cell
from tpu_align.traceback.device import decide_step


def pallas_t_max_cap(dirs_shape) -> int:
    """Largest phase budget t_max whose VMEM residents fit the kernel's
    compiler limit.

    The walker keeps three t_max-scaled buffers live per lane group: the
    emit scratch (t_max, gt) int32, the packed output block (t_max/16, gt)
    and the stripe slab (W, S, gt).  The budget-doubling retry contract
    (device.device_walk_finalize) can grow t_max without bound on
    pathological serializing pairs; past this cap the retry would fail at
    COMPILE time with a Mosaic scoped-VMEM error instead of walking, so
    the dispatcher falls back to the XLA while_loop walker (HBM-resident
    state, no such ceiling) for budgets above it."""
    _, W, S, B = dirs_shape
    gt = _group_lanes(B)
    vmem = 100 * 1024 * 1024  # matches CompilerParams below
    slab = W * S * gt * 4
    # Mosaic double-buffers the grid-varying blocks (the dirs slab
    # changes per stripe, the packed output per lane group), so budget
    # 2x for both; the emit scratch is true scratch (single copy).
    fixed = 2 * slab + 8 * gt * 4 + 64 * 1024
    per_t = gt * 4 * (1 + 2 / 16)          # emit_buf + 2x packed out
    cap = int((vmem * 0.9 - fixed) / per_t)
    return max(16, (cap // 16) * 16)


def _group_lanes(b: int) -> int:
    """Widest lane group that divides the batch.  Pallas grid programs run
    SEQUENTIALLY on the TensorCore, so total walk time ~ (B / group) x
    phases x per-phase cost: wider groups directly divide the serial
    phase-loop count (measured: the 32k-pair bucket walk is loop-bound,
    not VPU-bound).  VMEM caps the group at 4096 lanes (slab + emit
    buffers ~25 MB)."""
    for g in (4096, 2048, 1024, 512, 256, TILE_P):
        if b % g == 0:
            return g
    return b  # interpret-mode small batches


@functools.partial(jax.jit, static_argnames=(
    "algorithm", "params", "stripe_s", "t_max", "interpret"))
def _walk_pallas_jit(algorithm, params, dirs, start_row, start_col, scores,
                     stripe_s, t_max, interpret=False):
    S = stripe_s
    bits = bits_per_cell(algorithm)
    spw = 32 // bits
    stripes, W, _, B = dirs.shape
    is_local = algorithm.is_local
    gt = _group_lanes(B)
    t16 = t_max // 16
    assert t_max % 16 == 0

    srow = start_row.astype(jnp.int32).reshape(1, B)
    scol = start_col.astype(jnp.int32).reshape(1, B)
    sc = scores.astype(jnp.int32).reshape(1, B)

    def kernel(dirs_ref, srow_ref, scol_ref, sc_ref, packed_ref, tout_ref,
               emit_buf, i_s, j_s, rem_s, anw_s, done_s, t_smem):
        sg = pl.program_id(1)
        num_stripes = pl.num_programs(1)
        sidx = num_stripes - 1 - sg  # real stripe (walk goes bottom-up)
        i0 = sidx * S

        @pl.when(sg == 0)
        def _init():
            i_s[:, :] = srow_ref[:, :]
            j_s[:, :] = scol_ref[:, :]
            rem_s[:, :] = sc_ref[:, :]
            anw_s[:, :] = jnp.zeros((1, gt), jnp.int32)
            if is_local:
                done_s[:, :] = (sc_ref[:, :] <= 0).astype(jnp.int32)
            else:
                done_s[:, :] = jnp.zeros((1, gt), jnp.int32)
            t_smem[0] = 0
            emit_buf[:, :] = jnp.zeros((t_max, gt), jnp.int32)

        def extract(sread, j):
            """Word holding cell (i0 + sread + 1, j) per lane: one dynamic
            sublane read per word plane + compare-select."""
            k = (j - 1) + sread
            w = k // spw
            word = jnp.zeros((1, gt), jnp.int32)
            for wi in range(W):
                plane = dirs_ref[0, wi, pl.ds(sread, 1), :]
                word = jnp.where(w == wi, plane, word)
            return (word >> (bits * (k % spw))) & ((1 << bits) - 1)

        def cond(state):
            m, t = state[0], state[1]
            return jnp.logical_and(m > i0, t < t_max - 1)

        def body(state):
            m, t, i, j, rem, anw, done = state
            code = extract(m - 1 - i0, j)
            emit, i, j, rem, anw, done = decide_step(
                algorithm, params, code, m, i, j, rem, anw, done != 0)
            emit_buf[pl.ds(t, 1), :] = emit
            more = jnp.logical_and(i == m, ~done)
            any_more = jnp.sum(more.astype(jnp.int32)) > 0
            done32 = done.astype(jnp.int32)
            # jump to the highest live row: empty rows cost no phases
            live_top = jnp.max(jnp.where(done32 != 0, 0, i))
            m = jnp.where(any_more, m, jnp.minimum(m - 1, live_top))
            return (m, t + 1, i, j, rem, anw, done32)

        # enter the stripe at its highest live row (0 phases if every
        # lane's cursor is already below this stripe)
        m0 = jnp.minimum(
            jnp.int32(i0 + S),
            jnp.max(jnp.where(done_s[:, :] != 0, 0, i_s[:, :])),
        )
        state = (m0, t_smem[0], i_s[:, :], j_s[:, :],
                 rem_s[:, :], anw_s[:, :], done_s[:, :])
        m, t, i, j, rem, anw, done = jax.lax.while_loop(cond, body, state)
        i_s[:, :] = i
        j_s[:, :] = j
        rem_s[:, :] = rem
        anw_s[:, :] = anw
        done_s[:, :] = done
        t_smem[0] = t

        @pl.when(sg == num_stripes - 1)
        def _finish():
            t = t_smem[0]
            if not is_local:
                # border flush: i == 0 with columns left -> insertions
                def fcond(fs):
                    t, j = fs[0], fs[1]
                    return jnp.logical_and(
                        jnp.sum((j > 0).astype(jnp.int32)) > 0,
                        t < t_max - 1,
                    )

                def fbody(fs):
                    t, j = fs
                    emit = jnp.where(j > 0, 3, 0).astype(jnp.int32)
                    emit_buf[pl.ds(t, 1), :] = emit
                    return (t + 1, j - (j > 0).astype(jnp.int32))

                t, j = jax.lax.while_loop(fcond, fbody, (t, j_s[:, :]))
                j_s[:, :] = j
            tout_ref[:, :] = jnp.full((1, gt), 1, jnp.int32) * t
            # pack 16 codes per int32 word (OR == sum: disjoint bit ranges)
            sh16 = 2 * jax.lax.broadcasted_iota(jnp.int32, (16, gt), 0)

            def pack(w2, _):
                slab = emit_buf[pl.ds(16 * w2, 16), :]
                word = jnp.sum(slab << sh16, axis=0, keepdims=True)
                packed_ref[pl.ds(w2, 1), :] = word
                return 0

            jax.lax.fori_loop(0, t16, pack, 0)

    grid = (B // gt, stripes)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, W, S, gt),
                         lambda g, s: (stripes - 1 - s, 0, 0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gt), lambda g, s: (0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gt), lambda g, s: (0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gt), lambda g, s: (0, g),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t16, B), jnp.int32),
            jax.ShapeDtypeStruct((1, B), jnp.int32),
        ],
        out_specs=[
            pl.BlockSpec((t16, gt), lambda g, s: (0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gt), lambda g, s: (0, g),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((t_max, gt), jnp.int32),  # emitted codes by phase
            pltpu.VMEM((1, gt), jnp.int32),      # i
            pltpu.VMEM((1, gt), jnp.int32),      # j
            pltpu.VMEM((1, gt), jnp.int32),      # rem (local re-scoring)
            pltpu.VMEM((1, gt), jnp.int32),      # affine walker state
            pltpu.VMEM((1, gt), jnp.int32),      # done
            pltpu.SMEM((1,), jnp.int32),         # shared phase counter
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(dirs, srow, scol, sc)
    packed, tout = out
    return packed, jnp.max(tout)


def pallas_banded_t_max_cap(dirs_shape) -> int:
    """pallas_t_max_cap analogue for the skewed banded layout (MW, B, K8):
    above this budget the dispatcher degrades to the XLA walker instead
    of failing a Mosaic scoped-VMEM compile on a doubling retry."""
    _, B, K8 = dirs_shape
    gt = _group_lanes(B)
    vmem = 100 * 1024 * 1024
    # 2x the grid-varying blocks (word plane, packed out) for Mosaic
    # double-buffering, as in pallas_t_max_cap
    fixed = 2 * K8 * gt * 4 + 8 * gt * 4 + 64 * 1024
    per_t = gt * 4 * (1 + 2 / 16)
    cap = int((vmem * 0.9 - fixed) / per_t)
    return max(16, (cap // 16) * 16)


@functools.partial(jax.jit, static_argnames=("params", "t_max", "interpret"))
def _walk_pallas_banded_jit(params, dirs, start_row, start_col, scores,
                            t_max, interpret=False):
    """Row-phase walk over the skewed banded dirs (kernels/banded.py:
    word (i-1)//16 of lane b holds slot k = j - i + band) as ONE Pallas
    program: grid = (lane groups, MW words bottom-up), per-word while
    loop, same `decide_step` as every other walk engine.  The only
    banded-specific step is the slot select: the (K8, gt) word plane
    reduces against the per-lane slot index in one masked sublane sum."""
    from tpu_align.core.params import Algorithm

    algorithm = Algorithm.BSW
    band = params.band
    MW, B, K8 = dirs.shape
    gt = _group_lanes(B)
    t16 = t_max // 16
    assert t_max % 16 == 0

    # lane-last relayout for the kernel (device-side transpose; XLA
    # schedules it behind the fill, off the walk's critical path)
    dirs_t = jnp.transpose(dirs, (0, 2, 1))  # (MW, K8, B)
    srow = start_row.astype(jnp.int32).reshape(1, B)
    scol = start_col.astype(jnp.int32).reshape(1, B)
    sc = scores.astype(jnp.int32).reshape(1, B)

    def kernel(dirs_ref, srow_ref, scol_ref, sc_ref, packed_ref, tout_ref,
               emit_buf, i_s, j_s, rem_s, done_s, t_smem):
        sg = pl.program_id(1)
        num_words = pl.num_programs(1)
        sidx = num_words - 1 - sg  # real word (walk goes bottom-up)
        i0 = sidx * 16

        @pl.when(sg == 0)
        def _init():
            i_s[:, :] = srow_ref[:, :]
            j_s[:, :] = scol_ref[:, :]
            rem_s[:, :] = sc_ref[:, :]
            done_s[:, :] = (sc_ref[:, :] <= 0).astype(jnp.int32)
            t_smem[0] = 0
            emit_buf[:, :] = jnp.zeros((t_max, gt), jnp.int32)

        plane = dirs_ref[0, :, :]  # (K8, gt): this word's band slots
        kiota = jax.lax.broadcasted_iota(jnp.int32, (K8, gt), 0)

        def cond(state):
            m, t = state[0], state[1]
            return jnp.logical_and(m > i0, t < t_max - 1)

        def body(state):
            m, t, i, j, rem, done = state
            slot = j - m + band  # per-lane band slot of cell (m, j)
            word = jnp.sum(jnp.where(kiota == slot, plane, 0),
                           axis=0, keepdims=True)
            code = (word >> (2 * ((m - 1) % 16))) & 3
            emit, i, j, rem, _, done = decide_step(
                algorithm, params, code, m, i, j, rem,
                jnp.zeros((), jnp.int32), done != 0)
            emit_buf[pl.ds(t, 1), :] = emit
            more = jnp.logical_and(i == m, ~done)
            any_more = jnp.sum(more.astype(jnp.int32)) > 0
            done32 = done.astype(jnp.int32)
            live_top = jnp.max(jnp.where(done32 != 0, 0, i))
            m = jnp.where(any_more, m, jnp.minimum(m - 1, live_top))
            return (m, t + 1, i, j, rem, done32)

        m0 = jnp.minimum(
            jnp.int32(i0 + 16),
            jnp.max(jnp.where(done_s[:, :] != 0, 0, i_s[:, :])),
        )
        state = (m0, t_smem[0], i_s[:, :], j_s[:, :], rem_s[:, :],
                 done_s[:, :])
        m, t, i, j, rem, done = jax.lax.while_loop(cond, body, state)
        i_s[:, :] = i
        j_s[:, :] = j
        rem_s[:, :] = rem
        done_s[:, :] = done
        t_smem[0] = t

        @pl.when(sg == num_words - 1)
        def _finish():
            t = t_smem[0]
            tout_ref[:, :] = jnp.full((1, gt), 1, jnp.int32) * t
            sh16 = 2 * jax.lax.broadcasted_iota(jnp.int32, (16, gt), 0)

            def pack(w2, _):
                slab = emit_buf[pl.ds(16 * w2, 16), :]
                word = jnp.sum(slab << sh16, axis=0, keepdims=True)
                packed_ref[pl.ds(w2, 1), :] = word
                return 0

            jax.lax.fori_loop(0, t16, pack, 0)

    grid = (B // gt, MW)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, K8, gt), lambda g, s: (MW - 1 - s, 0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gt), lambda g, s: (0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gt), lambda g, s: (0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gt), lambda g, s: (0, g),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t16, B), jnp.int32),
            jax.ShapeDtypeStruct((1, B), jnp.int32),
        ],
        out_specs=[
            pl.BlockSpec((t16, gt), lambda g, s: (0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gt), lambda g, s: (0, g),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((t_max, gt), jnp.int32),  # emitted codes by phase
            pltpu.VMEM((1, gt), jnp.int32),      # i
            pltpu.VMEM((1, gt), jnp.int32),      # j
            pltpu.VMEM((1, gt), jnp.int32),      # rem (re-scoring stop)
            pltpu.VMEM((1, gt), jnp.int32),      # done
            pltpu.SMEM((1,), jnp.int32),         # shared phase counter
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(dirs_t, srow, scol, sc)
    packed, tout = out
    return packed, jnp.max(tout)


def device_walk_pallas_banded(params, dirs, start_row, start_col, scores,
                              t_max, interpret=None):
    """Pallas banded walk; same contract as device._device_walk_banded."""
    if interpret is None:
        interpret = _default_interpret()
    return _walk_pallas_banded_jit(
        params, jnp.asarray(dirs), jnp.asarray(start_row),
        jnp.asarray(start_col), jnp.asarray(scores), t_max,
        interpret=interpret,
    )


def device_walk_pallas(algorithm, params, dirs, start_row, start_col,
                       scores, stripe_s, t_max, interpret=None):
    """Pallas row-phase walk; same contract as device._device_walk:
    (packed (T16, B) int32, phases) with phases >= t_max - 1 signalling
    budget exhaustion (caller retries doubled)."""
    if interpret is None:
        interpret = _default_interpret()
    return _walk_pallas_jit(
        algorithm, params, jnp.asarray(dirs), jnp.asarray(start_row),
        jnp.asarray(start_col), jnp.asarray(scores), stripe_s, t_max,
        interpret=interpret,
    )
