"""Device-side traceback: the reference's V8 move, TPU-native.

The reference's decisive end-state optimization moved backtracking onto the
GPU (cuda/LNW/LinearNeedlemanWunschV8.cu; V19.cu:26-110 `backtracking()`),
so only scores + alignment strings cross the device boundary instead of the
full direction matrices.  This module does the same on TPU: a jitted,
lane-vectorized walk over the packed stagger-layout direction words that
emits 2-bit MOVE codes, so only O(pairs x path-length / 16) words leave the
device -- ~128x less transfer than the direction tensor.

A naive per-pair pointer chase would serialize on the TPU scalar core and
per-lane random access (gather) does not exist on the VPU.  The walk is
instead synchronized by DP row ("row phases"):

* Every backward path visits rows in strictly decreasing order, spending a
  run of insertions inside a row and exactly one diagonal/deletion move to
  leave it.  So all lanes can process the SAME absolute row m per phase --
  idle until their path reaches m, finished lanes masked out.
* The stagger dirs tensor (stripes, W, S, B) transposes to (M, W, B) where
  the first axis is just the DP row i-1 -- one jnp dynamic slice with the
  SHARED scalar row index loads every lane's word row per phase.  No
  per-lane row gather ever happens.
* Within a row, a lane's word index w = k // spw (k = (j-1) + (i-1)%S)
  varies per lane, resolved with a one-hot reduction over the W (~18) words
  -- the only cross-lane-divergent access, and it is tiny.
* Move costs for the local re-scoring stop come from the CODES themselves
  (MAIN_DIAG_MATCH vs MAIN_DIAG_MISMATCH carry the match/mismatch
  distinction), so no per-lane sequence-character access is needed either.

Emitted stream: a dense (T, B) array of 2-bit codes packed 16/word, where
row t is one global walk step: 0 = no-op (lane idle/done), 1 = diagonal,
2 = query deletion, 3 = query insertion.  A lane's alignment is its
non-zero codes read in order (root-to...-end-to-start; the host reverses).
The host turns moves + raw sequences into the three output lines --
byte-identical to the dirs-walk by construction (same codes, same order).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from tpu_align.core import directions as D
from tpu_align.core.params import Algorithm, AlignmentParams
from tpu_align.core.result import AlignmentResult, results_from_arrays
from tpu_align.kernels.fill import bits_per_cell


# walker state codes for affine (c++/backtrack.cpp:214-356)
SCORING, INSERTION, DELETION = 0, 1, 2


def decide_step(algorithm, params, code, m, i, j, rem, anw_state, done):
    """One row-phase step of the backward walk: decide this lane's move and
    advance its cursor state.  Pure jnp on broadcastable arrays (``m`` is
    the shared scalar row), so the XLA while_loop walker below and the
    Pallas walk kernel (traceback/walk_kernel.py) share ONE definition of
    the move semantics -- byte-identical output by construction.

    Returns (emit, i, j, rem, anw_state, done) where emit is the 2-bit
    move code: 0 = no-op, 1 = diagonal, 2 = query deletion,
    3 = query insertion."""
    is_local = algorithm.is_local
    is_affine = algorithm.is_affine
    p = params
    main = code & 3

    in_row = jnp.logical_and(i == m, ~done)
    act = jnp.logical_and(in_row, j > 0)
    # border column: j == 0 with rows left -> forced deletion
    forced_del = jnp.logical_and(in_row, j == 0)

    if is_affine:
        # three-state Gotoh walk; E/F extend bits end or continue runs
        ins_now = jnp.logical_or(
            anw_state == INSERTION,
            jnp.logical_and(anw_state == SCORING,
                            main == D.MAIN_QUERY_INSERTION),
        )
        del_now = jnp.logical_or(
            anw_state == DELETION,
            jnp.logical_and(
                anw_state == SCORING,
                jnp.logical_and(main == D.MAIN_QUERY_DELETION,
                                ~ins_now),
            ),
        )
        ins_now = jnp.logical_and(ins_now, act)
        del_now = jnp.logical_and(del_now, act)
        diag_now = jnp.logical_and(
            act, jnp.logical_and(~ins_now, ~del_now)
        )
        # run continuation: extend bit set -> stay in the run
        ins_next = jnp.logical_and(ins_now,
                                   (code & D.BIT_E_EXTEND) != 0)
        del_next = jnp.logical_and(del_now,
                                   (code & D.BIT_F_EXTEND) != 0)
        new_state = jnp.where(
            ins_next, INSERTION, jnp.where(del_next, DELETION, SCORING)
        )
        anw_state = jnp.where(act, new_state, anw_state)
    else:
        ins_now = jnp.logical_and(act, main == D.MAIN_QUERY_INSERTION)
        diag_now = jnp.logical_and(
            act,
            jnp.logical_or(main == D.MAIN_DIAG_MATCH,
                           main == D.MAIN_DIAG_MISMATCH),
        )
        del_now = jnp.logical_and(act, main == D.MAIN_QUERY_DELETION)

    del_now = jnp.logical_or(del_now, forced_del)
    emit = jnp.where(
        ins_now, 3, jnp.where(del_now, 2, jnp.where(diag_now, 1, 0))
    )
    if is_local:
        cost = jnp.where(
            diag_now,
            jnp.where(main == D.MAIN_DIAG_MATCH, p.match, p.mismatch),
            jnp.where(emit > 0, p.gap, 0),
        )
        rem = rem - cost
    j = j - jnp.where(jnp.logical_or(ins_now, diag_now), 1, 0)
    i = i - jnp.where(jnp.logical_or(del_now, diag_now), 1, 0)
    if is_local:
        done = jnp.logical_or(
            done,
            jnp.logical_and(emit > 0, rem <= 0),
        )
        done = jnp.logical_or(
            done, jnp.logical_and(i == m, emit == 0)
        )  # never-started lanes (score <= 0)
    return emit, i, j, rem, anw_state, done


def _walk_phase_budget(m_rows: int, w_words: int, spw: int) -> int:
    """Initial phase budget: M + N(+pad) + M/2 slack, whole packed words.

    Lanes spending insertion runs at *different* rows serialize, so the
    phase count is data-dependent: at read-scale batches (32k lanes)
    nearly every DP row has SOME lane mid-insertion-run, measured at
    ~M + N + 0.1*M phases on the 100k-pair workload -- the old +4 slack
    made every bucket exhaust the budget and silently walk TWICE (the
    doubling retry).  M/2 covers per-row run maxima with margin;
    `device_traceback_moves` still detects exhaustion and retries
    doubled (same structure as the reference sizing its traceback
    buffers to worst-case path length,
    cuda/LNW/LinearNeedlemanWunschV19.cu:81)."""
    t = m_rows + w_words * spw + max(16, m_rows // 2)
    return -(-t // 16) * 16  # whole packed words


@functools.partial(jax.jit, static_argnames=("algorithm", "params",
                                             "stripe_s", "t_max"))
def _device_walk(algorithm, params, dirs, start_row, start_col, scores,
                 stripe_s, t_max):
    """Vectorized backward walk.  Returns (moves (T16, B) int32 packed
    16 codes/word, total_steps (scalar)).

    dirs: (stripes, W, S, B) stagger words (device array).
    A returned total_steps >= t_max - 1 means the phase budget ran out
    and the streams are truncated; callers must retry with a larger
    t_max (device_traceback_moves does).
    """
    S = stripe_s
    bits = bits_per_cell(algorithm)
    spw = 32 // bits
    stripes, W, _, B = dirs.shape
    M = stripes * S
    is_local = algorithm.is_local

    # (stripes, W, S, B) -> (M, W, B): axis 0 is DP row i-1
    rows_tensor = jnp.transpose(dirs, (0, 2, 1, 3)).reshape(M, W, B)

    i0 = start_row.astype(jnp.int32).reshape(B)
    j0 = start_col.astype(jnp.int32).reshape(B)
    rem0 = scores.astype(jnp.int32).reshape(B)
    out = jnp.zeros((t_max, B), jnp.int32)  # one code per global step
    w_iota = jnp.arange(W, dtype=jnp.int32)[:, None]  # (W, 1)

    def extract(row_words, i_scalar, j):
        """Per-lane 2/4-bit code of cell (i, j) from the row's words."""
        r = (i_scalar - 1) % S
        k = (j - 1) + r  # (B,)
        w = k // spw
        word = jnp.sum(
            jnp.where(w_iota == w[None, :], row_words, 0), axis=0
        )  # (B,) one-hot over the W words
        return (word >> (bits * (k % spw))) & ((1 << bits) - 1)

    def body(state):
        m, t, j, i, rem, anw_state, done, out = state
        row_words = jax.lax.dynamic_slice(
            rows_tensor, (m - 1, 0, 0), (1, W, B)
        )[0]
        code = extract(row_words, m, j)
        emit, i, j, rem, anw_state, done = decide_step(
            algorithm, params, code, m, i, j, rem, anw_state, done
        )
        out = jax.lax.dynamic_update_slice(out, emit[None, :], (t, 0))
        # lanes still inside row m (insertion run continues)?  Otherwise
        # jump straight to the highest row any live lane occupies --
        # empty rows cost no phases (local walks stop as soon as every
        # lane is done: the masked max is 0, so m drops below 1)
        more_this_row = jnp.logical_and(i == m, ~done)
        any_more = jnp.any(more_this_row)
        live_top = jnp.max(jnp.where(done, 0, i))
        m = jnp.where(any_more, m, jnp.minimum(m - 1, live_top))
        return m, t + 1, j, i, rem, anw_state, done, out

    def cond(state):
        m, t, j, i, rem, anw_state, done, out = state
        return jnp.logical_and(m >= 1, t < t_max - 1)

    if is_local:
        done0 = rem0 <= 0
    else:
        done0 = jnp.zeros(B, bool)
    m0 = jnp.minimum(jnp.int32(M), jnp.max(jnp.where(done0, 0, i0)))
    state = (m0, jnp.int32(0), j0, i0, rem0,
             jnp.zeros(B, jnp.int32), done0, out)
    m, t, j, i, rem, anw_state, done, out = jax.lax.while_loop(
        cond, body, state
    )

    # border flush: i == 0 with columns left -> insertions (global only)
    def flush_cond(state):
        t, j, out = state
        return jnp.logical_and(jnp.any(j > 0), t < t_max - 1)

    def flush_body(state):
        t, j, out = state
        emit = jnp.where(j > 0, 3, 0)
        out = jax.lax.dynamic_update_slice(out, emit[None, :], (t, 0))
        return t + 1, j - (j > 0), out

    if not is_local:
        t, j, out = jax.lax.while_loop(flush_cond, flush_body, (t, j, out))

    # pack 16 codes per int32 word: word w holds steps 16w..16w+15
    t16 = -(-t_max // 16)
    shifts = (2 * (jnp.arange(t_max) % 16)).astype(jnp.int32)
    padded = out << shifts[:, None]
    packed = jnp.sum(
        padded.reshape(t16, 16, B), axis=1, dtype=jnp.int32
    )  # OR == sum: disjoint bit ranges
    return packed, t


@functools.partial(jax.jit, static_argnames=("params", "t_max"))
def _device_walk_banded(params, dirs, start_row, start_col, scores, t_max):
    """Row-phase walk over the skewed banded dirs (MW, B, K8): slot
    k = j - i + band holds cell (i, j) (kernels/banded.py layout).
    Same contract as _device_walk; the re-scoring stop guarantees the
    cursor never reads an out-of-band cell while active (out-of-band
    H == 0, so `rem` reaches 0 exactly at the band edge)."""
    band = params.band
    algorithm = Algorithm.BSW
    MW, B, K8 = dirs.shape
    M = MW * 16  # 2-bit codes: 16 query rows per word

    i0 = start_row.astype(jnp.int32).reshape(B)
    j0 = start_col.astype(jnp.int32).reshape(B)
    rem0 = scores.astype(jnp.int32).reshape(B)
    out = jnp.zeros((t_max, B), jnp.int32)
    k_iota = jnp.arange(K8, dtype=jnp.int32)[None, :]  # (1, K8)

    def body(state):
        m, t, j, i, rem, done, out = state
        words = jax.lax.dynamic_slice(
            dirs, ((m - 1) // 16, 0, 0), (1, B, K8)
        )[0]  # (B, K8)
        slot = j - m + band  # per-lane band slot (may be out of range:
        #                       matches nothing -> word 0, never read live)
        word = jnp.sum(
            jnp.where(k_iota == slot[:, None], words, 0), axis=1
        )
        code = (word >> (2 * ((m - 1) % 16))) & 3
        emit, i, j, rem, _, done = decide_step(
            algorithm, params, code, m, i, j, rem,
            jnp.zeros((), jnp.int32), done)
        out = jax.lax.dynamic_update_slice(out, emit[None, :], (t, 0))
        any_more = jnp.any(jnp.logical_and(i == m, ~done))
        live_top = jnp.max(jnp.where(done, 0, i))
        m = jnp.where(any_more, m, jnp.minimum(m - 1, live_top))
        return m, t + 1, j, i, rem, done, out

    def cond(state):
        m, t = state[0], state[1]
        return jnp.logical_and(m >= 1, t < t_max - 1)

    done0 = rem0 <= 0
    m0 = jnp.minimum(jnp.int32(M), jnp.max(jnp.where(done0, 0, i0)))
    state = (m0, jnp.int32(0), j0, i0, rem0, done0, out)
    m, t, j, i, rem, done, out = jax.lax.while_loop(cond, body, state)

    t16 = t_max // 16
    shifts = (2 * (jnp.arange(t_max) % 16)).astype(jnp.int32)
    packed = jnp.sum(
        (out << shifts[:, None]).reshape(t16, 16, B), axis=1,
        dtype=jnp.int32,
    )
    return packed, t


EV_MAX = 32  # per-lane event slot bound in the compacted readback
EV_CAP_PER_LANE = 16  # flat buffer slots per lane (bucket-wide average)


@functools.partial(jax.jit, static_argnames=("ev_max",))
def _compact_events(packed, start_row, ev_max=EV_MAX, cap_per_lane=None):
    """Compress a walk's packed move stream into FLAT per-lane INDEL EVENTS.

    Between two non-diagonal moves every move is diagonal by definition,
    and the host replay re-derives match/mismatch by comparing sequence
    bytes -- so the only information the host needs is, per lane, the
    ordered list of (DP row before the move, ins-or-del).  At read-scale
    indel rates (~4%) that is ~10 events/pair vs ~540 2-bit phase codes,
    and the flat layout transfers 2 bytes/event + 2 bytes/lane instead of
    a (B, ev_max) worst-case-padded rectangle: the device-to-host
    move-stream transfer shrinks ~10x vs the full stream, which is the
    binding constraint on the tunneled backend (~35 MB/s,
    scripts/probe_tunnel.py; PERF.md).

    packed: (T16, B) int32, 16 2-bit codes/word (walk output).
    start_row: (B,) walk start rows.
    Returns (flat (B * cap_per_lane,) uint16 -- lane b's events at
    [sum(nev[:b]), +nev[b]), each payload (row << 1 | is_ins), walk
    order -- nev (B,) uint16 per-lane counts, max_nev, and total.
    Overflow (max_nev > ev_max or total > flat.size) means the caller
    must fall back to the full stream.

    Payload 0 cannot be a real event: a deletion needs row >= 1 and a
    row-0 insertion encodes as 1.  Requires T < 2**16 and rows < 2**14
    (device_walk_dispatch falls back to streams otherwise)."""
    t16, b = packed.shape
    t_total = t16 * 16
    # flat capacity <= b * ev_max so the sort-based flatten below always
    # has enough source slots
    cap = b * min(cap_per_lane or EV_CAP_PER_LANE, ev_max)
    shifts = (2 * jnp.arange(16, dtype=jnp.int32)).reshape(1, 16, 1)
    codes = ((packed[:, None, :] >> shifts) & 3).reshape(t_total, b)
    dec_r = jnp.logical_or(codes == 1, codes == 2).astype(jnp.int32)
    # row BEFORE each move: start_row minus prior row-consuming moves
    i_pre = (start_row.astype(jnp.int32)[None, :]
             - (jnp.cumsum(dec_r, axis=0) - dec_r))
    is_ev = codes >= 2
    payload = (i_pre << 1) | (codes == 3)
    tt = jnp.arange(t_total, dtype=jnp.int32)[:, None]
    key = jnp.where(is_ev, ((t_total - tt) << 15) | payload, 0)
    keys = jax.lax.top_k(key.T, ev_max)[0]  # (B, ev_max), phase-ascending
    p = (keys & 0x7FFF).astype(jnp.uint16)
    nev = jnp.sum(is_ev, axis=0, dtype=jnp.int32)  # (B,)
    offs = jnp.cumsum(nev) - nev                   # exclusive prefix
    total = offs[-1] + nev[-1]
    # Flatten by SORT, not scatter (TPU scatters serialize): each valid
    # slot's flat position is exactly offs[lane] + slot, an enumeration of
    # 0..total-1 -- so sorting (position, payload) by position lands every
    # payload at its flat index and invalid slots (key cap + slot-id,
    # still unique) sink past `total`.
    slot = jnp.arange(ev_max, dtype=jnp.int32)[None, :]
    g = jnp.where(slot < nev[:, None], offs[:, None] + slot,
                  cap + jnp.arange(p.size, dtype=jnp.int32).reshape(p.shape))
    _, flat_vals = jax.lax.sort((g.reshape(-1), p.reshape(-1).astype(
        jnp.int32)), num_keys=1)
    flat = flat_vals[:cap].astype(jnp.uint16)
    max_nev = jnp.max(nev)
    return flat, nev.astype(jnp.uint16), max_nev, total



def _copy_to_host_async(arrays) -> None:
    """Start device-to-host copies without blocking.  On a tunneled remote
    backend this lets bucket N+1's move streams transfer while the host
    replays bucket N's strings (the V19 print/kernel overlap applied to the
    D2H direction); the later device_get then finds the data staged."""
    for a in arrays:
        try:
            a.copy_to_host_async()
        except AttributeError:  # non-jax array (already host-side)
            pass


def device_walk_dispatch(
    algorithm: Algorithm,
    params: AlignmentParams,
    dirs,
    start_row, start_col, scores,
    stripe_s: int,
    walker: str = "xla",
    t_max: int | None = None,
    extras: tuple = (),
    start_copies: bool = True,
):
    """Dispatch the device walk asynchronously (JAX chains it after the
    bucket's fill on device -- the engine overlaps bucket N+1's walk with
    bucket N's host replay, the V19 pipelining applied to the V8 walk).

    extras: additional device arrays (e.g. this bucket's scores / start
    coordinates) to ride the SAME device_get as the move streams --
    readback coalescing: on a tunneled backend every separate readback
    costs a full round trip (PERF.md), so the walk result and everything
    the host replay needs transfer as one unit.

    Returns an opaque handle for device_walk_finalize."""
    from tpu_align.traceback.host import _check_affine_walkable

    _check_affine_walkable(algorithm)  # EF-bits knob: refuse, don't corrupt
    if t_max is not None:
        t_max = -(-t_max // 16) * 16  # packing needs a multiple of 16
    dirs = jnp.asarray(dirs)
    args = (jnp.asarray(start_row), jnp.asarray(start_col),
            jnp.asarray(scores))
    if algorithm.is_banded:
        mw, _, k8 = dirs.shape
        budget = _walk_phase_budget(mw * 16, k8, 1)
        xla_banded = functools.partial(_device_walk_banded, params, dirs,
                                       *args)
        if walker == "pallas":
            from tpu_align.traceback.walk_kernel import (
                device_walk_pallas_banded,
                pallas_banded_t_max_cap,
            )

            cap = pallas_banded_t_max_cap(dirs.shape)
            pallas_banded = functools.partial(device_walk_pallas_banded,
                                              params, dirs, *args)

            def walk(t_budget):
                # same VMEM-ceiling degradation as the stagger layouts:
                # oversized doubling retries fall back to the XLA walker
                if t_budget <= cap:
                    return pallas_banded(t_budget)
                return xla_banded(t_budget)
        else:
            walk = xla_banded
    elif walker == "pallas":
        from tpu_align.traceback.walk_kernel import (device_walk_pallas,
                                                     pallas_t_max_cap)
        stripes, W, _, _ = dirs.shape
        spw = 32 // bits_per_cell(algorithm)
        budget = _walk_phase_budget(stripes * stripe_s, W, spw)
        cap = pallas_t_max_cap(dirs.shape)
        pallas_walk = functools.partial(device_walk_pallas, algorithm,
                                        params, dirs, *args, stripe_s)
        xla_walk = functools.partial(_device_walk, algorithm, params, dirs,
                                     *args, stripe_s)

        def walk(t_budget):
            # budget-doubling retries can outgrow the Pallas kernel's VMEM
            # scratch (emit_buf is (t_max, gt)); degrade to the XLA walker
            # (HBM-resident state) instead of failing at compile time
            if t_budget <= cap:
                return pallas_walk(t_budget)
            return xla_walk(t_budget)
    elif walker == "xla":
        stripes, W, _, _ = dirs.shape
        spw = 32 // bits_per_cell(algorithm)
        budget = _walk_phase_budget(stripes * stripe_s, W, spw)
        walk = functools.partial(_device_walk, algorithm, params, dirs,
                                 *args, stripe_s)
    else:
        raise ValueError(f"unknown walker {walker!r}")
    t_max = t_max or budget
    packed, t = walk(t_max)
    extras = tuple(extras)
    if start_copies:
        _copy_to_host_async((packed, t) + extras)
    return walk, packed, t, t_max, extras


def device_walk_dispatch_events(
    algorithm: Algorithm,
    params: AlignmentParams,
    dirs,
    start_row, start_col, scores,
    stripe_s: int,
    walker: str = "xla",
    extras: tuple = (),
    ev_max: int = EV_MAX,
):
    """Dispatch the device walk with EVENT-COMPACTED readback: only
    per-lane indel events (_compact_events) + extras transfer; the full
    packed stream stays on device (fetched only if a lane overflows
    ev_max).  Falls back to a plain stream handle when the payload
    encoding cannot represent the shapes (rows >= 2**14 or phase budget
    >= 2**16 -- long-sequence workloads, which use hirschberg anyway).

    Returns a handle for device_walk_finalize_events."""
    if algorithm.is_banded:
        m_rows = dirs.shape[0] * 16
    else:
        m_rows = dirs.shape[0] * stripe_s
    handle = device_walk_dispatch(
        algorithm, params, dirs, start_row, start_col, scores, stripe_s,
        walker=walker, extras=extras, start_copies=False,
    )
    walk, packed, t, t_max, extras = handle
    # Mode choice.  m_rows < 2**14 is the payload encoding's hard limit
    # (row in 14 bits).  The t_max threshold is a CAPACITY heuristic,
    # not the encoding limit (the int32 sort key allows t_max < 2**16):
    # expected indel events scale with walk length (~4%/step), and the
    # flat buffer holds EV_CAP_PER_LANE (16) slots/lane on average --
    # beyond ~1-2k steps events would overflow and the fallback becomes
    # a COLD full-stream fetch (no async copy pre-started), strictly
    # worse than choosing stream mode here, whose copy overlaps.
    if m_rows >= 1 << 14 or t_max >= 1 << 12:
        _copy_to_host_async((packed, t) + extras)
        return handle  # stream-mode tuple; finalize_events detects it
    sr = jnp.asarray(start_row).reshape(-1)
    ev, nev, max_nev, total = _compact_events(packed, sr, ev_max=ev_max)
    _copy_to_host_async((ev, nev, t, max_nev, total) + extras)
    return {
        "walk": walk, "packed": packed, "t": t, "t_max": t_max,
        "extras": extras, "ev": ev, "nev": nev, "max_nev": max_nev,
        "total": total, "ev_max": ev_max, "start_row": sr,
    }


def device_walk_finalize_events(handle):
    """Block on an events-mode walk dispatch.  Returns either
    ("events", flat np.uint16, nev (B,) np.uint16, *extras) or
    ("stream", packed (T16, B) np.int32, steps, *extras) -- the stream
    form when the handle was a fallback or a lane overflowed ev_max /
    the flat buffer.  One device_get per outcome; budget-exhaustion
    retries double t_max and recompact, like device_walk_finalize."""
    if isinstance(handle, tuple):
        out = device_walk_finalize(handle)
        return ("stream", out[0], out[1], *out[2:])
    walk, t_max, ev_max = handle["walk"], handle["t_max"], handle["ev_max"]
    packed, t = handle["packed"], handle["t"]
    ev, nev = handle["ev"], handle["nev"]
    max_nev, total = handle["max_nev"], handle["total"]
    extras = tuple(handle["extras"])
    sr = handle["start_row"]
    for _ in range(32):
        got = jax.device_get((ev, nev, t, max_nev, total) + extras)
        ev_np, nev_np = got[0], got[1]
        # extras are host arrays now; device_get passes numpy through, so
        # retries below don't re-transfer them (device_walk_finalize:577
        # does the same)
        extras = tuple(got[5:])
        steps, mx, tot = int(got[2]), int(got[3]), int(got[4])
        if steps >= t_max - 1:  # phase budget exhausted: rewalk doubled
            t_max *= 2
            if t_max >= 1 << 12:  # past the events capacity heuristic
                # (see device_walk_dispatch_events): go straight to the
                # stream form instead of recompacting a walk this long
                packed, t = walk(t_max)
                out = device_walk_finalize(
                    (walk, packed, t, t_max, extras))
                return ("stream", out[0], out[1], *out[2:])
            packed, t = walk(t_max)
            ev, nev, max_nev, total = _compact_events(packed, sr,
                                                      ev_max=ev_max)
            continue
        if mx > ev_max or tot > ev_np.size:  # event overflow: full stream
            packed_np = jax.device_get(packed)
            return ("stream", packed_np, steps, *got[5:])
        return ("events", ev_np, nev_np, *got[5:])
    raise RuntimeError("device walk failed to converge")  # pragma: no cover


def device_walk_finalize(handle):
    """Block on a dispatched walk; returns (packed (T16, B) np.int32,
    steps int, *extras) -- extras are the host copies of any arrays that
    rode along in device_walk_dispatch(extras=...), fetched in the SAME
    device_get (one round trip for everything).

    Phases are shared across lanes (all lanes walk the same DP row), so
    the phase count is data-dependent: lanes spending long insertion runs
    at different rows serialize.  Walks that exhaust the budget are
    detected (steps >= t_max - 1) and retried with a doubled budget --
    the streams would otherwise be silently truncated."""
    walk, packed, t, t_max = handle[:4]
    extras = handle[4] if len(handle) > 4 else ()
    for _ in range(32):  # 2**32x the M+N budget is unreachable
        got = jax.device_get((packed, t) + tuple(extras))
        packed_np, t = got[0], got[1]
        if int(t) < t_max - 1:
            return (packed_np, int(t), *got[2:])
        t_max *= 2
        packed, t = walk(t_max)
        extras = got[2:]  # already host-side; don't refetch on retry
    raise RuntimeError("device walk failed to converge")  # pragma: no cover


def device_traceback_moves(
    algorithm: Algorithm,
    params: AlignmentParams,
    dirs,
    start_row, start_col, scores,
    stripe_s: int,
    walker: str = "xla",
):
    """Run the device walk; returns (packed_moves (T16, B) np.int32,
    steps int).  Only the packed moves cross the host boundary.

    walker="pallas" runs the walk loop as one Pallas program with the
    stripe slab in VMEM (traceback/walk_kernel.py); walker="xla" is the
    jitted while_loop formulation (both byte-identical via decide_step)."""
    return device_walk_finalize(device_walk_dispatch(
        algorithm, params, dirs, start_row, start_col, scores, stripe_s,
        walker=walker,
    ))


def moves_to_result(
    algorithm: Algorithm,
    pair_num: int,
    score: int,
    moves,  # (T,) uint8 codes 0..3, global-step order (backward walk)
    ref: str,
    qry: str,
    start_row: int,
    start_col: int,
) -> AlignmentResult:
    """Replay one lane's move stream into the three output lines.

    The stream is in walk order (end -> start); emission mirrors the dirs
    walkers (tpu_align/traceback/host.py) so output is byte-identical."""
    if algorithm.is_local and score <= 0:
        return AlignmentResult(pair_num, score)
    i, j = start_row, start_col
    out_r, out_m, out_q = [], [], []
    for mv in moves:
        if mv == 0:
            continue
        if mv == 1:  # diagonal
            rc, qc = ref[j - 1], qry[i - 1]
            out_r.append(rc)
            out_m.append(D.REL_MATCH if rc == qc else D.REL_MISMATCH)
            out_q.append(qc)
            i -= 1
            j -= 1
        elif mv == 2:  # query deletion
            out_r.append(D.GAP_CHAR)
            out_m.append(D.REL_GAP)
            out_q.append(qry[i - 1])
            i -= 1
        else:  # query insertion
            out_r.append(ref[j - 1])
            out_m.append(D.REL_GAP)
            out_q.append(D.GAP_CHAR)
            j -= 1
    return AlignmentResult(
        pair_num, score,
        "".join(reversed(out_r)),
        "".join(reversed(out_m)),
        "".join(reversed(out_q)),
    )


def device_traceback_bucket_arrays(
    algorithm: Algorithm,
    bucket,
    scores, srow, scol, dirs,
    params: AlignmentParams,
    stripe_s: int,
    walker: str = "xla",
    handle=None,
):
    """V8-style bucket traceback returning raw output ARRAYS.

    Returns (scores (nb,) int32, out_buf (nb, 3, stride) uint8,
    out_lens (nb,) int32) -- the engine's no-Python-strings output path
    feeds these straight to the native block formatter
    (native/tpualign.cpp ta_format_blocks).  When the native replayer is
    unavailable, falls back to returning the plain
    list[AlignmentResult] instead (callers dispatch on type).

    `dirs` stays a device array -- only scores/starts and the packed move
    stream (or its event-compacted form) are ever transferred.  `handle`
    accepts a walk already dispatched with device_walk_dispatch or
    device_walk_dispatch_events (the engine pipelines walks across
    buckets)."""
    nb = bucket.num_real
    if handle is None:
        handle = device_walk_dispatch(
            algorithm, params, dirs, srow, scol, scores, stripe_s,
            walker=walker, extras=(scores, srow, scol),
        )
    fin = finalize_any(handle, scores, srow, scol)
    return bucket_arrays_from_finalized(algorithm, bucket, params, fin)


def finalize_any(handle, scores=None, srow=None, scol=None):
    """Finalize either handle kind into a normalized tuple:
    ("events", flat np.uint16, nev np.uint16, sc, sr, sj) or
    ("stream", packed (T16, B) np.int32, steps, sc, sr, sj).

    scores/srow/scol fill in whatever did not ride the handle's readback
    as extras; numpy arrays pass through as-is (global walks: the engine
    passes the bucket's host-side qry_len/ref_len -- the global start
    coordinates -- so only the scores cross the tunnel)."""
    if isinstance(handle, dict):
        out = device_walk_finalize_events(handle)
        kind = out[0]
        if kind == "events":
            payload, steps, rest = (out[1], out[2]), None, out[3:]
        else:
            payload, steps, rest = out[1], int(out[2]), out[3:]
    else:
        out = device_walk_finalize(handle)
        kind, payload, steps, rest = "stream", out[0], out[1], out[2:]
    if len(rest) == 3:
        sc, sr, sj = (np.asarray(a) for a in rest)
    elif len(rest) == 1 and srow is not None and scol is not None:
        sc = np.asarray(rest[0])
        sr, sj = np.asarray(srow), np.asarray(scol)
    else:
        sc, sr, sj = (np.asarray(a)
                      for a in jax.device_get((scores, srow, scol)))
    if kind == "events":
        flat, nev = payload
        return ("events", flat, nev, sc, sr, sj)
    return ("stream", payload, steps, sc, sr, sj)


def bucket_blocks_from_finalized(algorithm, bucket, params, fin):
    """Fused fast path: event streams -> final formatted blocks in ONE
    native pass (ta_replay_events_blocks; no intermediate string buffer).
    Returns (pair_ids, scores, chunk, spans) for
    _BlockCollector.add_chunk, or None when the finalized result is a
    stream or the native library is absent (caller takes the arrays
    path)."""
    if fin[0] != "events":
        return None
    from tpu_align.native import (native_events_block_lens,
                                  native_replay_events_blocks)

    _, flat, nev, sc, sr, sj = fin
    nb = bucket.num_real
    ids = bucket.pair_ids[:nb]
    p = params
    ev_off = np.zeros(nev.shape[0] + 1, np.int64)
    np.cumsum(nev, out=ev_off[1:])
    dst_off = total = None
    if not algorithm.is_local:
        # Global walks: block lengths derive from the events alone, so the
        # chunk is written DENSE at exact final offsets (no stride holes,
        # no scratch copy) and the collector's final gather coalesces the
        # whole chunk into one memcpy.
        lens = native_events_block_lens(flat, ev_off[:nb + 1], sr[:nb],
                                        ids, sc[:nb])
        if lens is not None:
            dst_off = np.zeros(nb, np.int64)
            np.cumsum(lens[:-1], out=dst_off[1:])
            total = int(dst_off[-1] + lens[-1]) if nb else 0
    nat = native_replay_events_blocks(
        flat, ev_off[:nb + 1], bucket.ref_tokens[:nb],
        bucket.qry_tokens[:nb], sr[:nb], sj[:nb], sc[:nb], ids,
        local=algorithm.is_local,
        match=p.match, mismatch=p.mismatch, gap=p.gap,
        dst_off=dst_off, total=total,
    )
    if nat is None:
        return None
    chunk, spans = nat
    return ids, sc[:nb], chunk, spans


def bucket_arrays_from_finalized(algorithm, bucket, params, fin):
    """Replay a finalized walk into (scores, out_buf, out_lens) arrays,
    or a list[AlignmentResult] when the native replayers are absent."""
    nb = bucket.num_real
    if fin[0] == "events":
        _, flat, nev, sc, sr, sj = fin
        from tpu_align.native import native_replay_events

        ev_off = np.zeros(nev.shape[0] + 1, np.int64)
        np.cumsum(nev, out=ev_off[1:])
        p = params
        nat = native_replay_events(
            flat, ev_off[:nb + 1], bucket.ref_tokens[:nb],
            bucket.qry_tokens[:nb], sr[:nb], sj[:nb], sc[:nb],
            local=algorithm.is_local,
            match=p.match, mismatch=p.mismatch, gap=p.gap,
        )
        if nat is not None:
            out_buf, out_lens = nat
            return sc[:nb], out_buf, out_lens
        codes = _events_to_codes(flat, ev_off, sr, sj, sc, bucket,
                                 algorithm, params)
        packed, steps = None, codes.shape[0]
    else:
        _, packed, steps, sc, sr, sj = fin
        codes = None
    if packed is not None:
        from tpu_align.native import native_replay_moves

        nat = native_replay_moves(
            packed, bucket.ref_tokens[:nb], bucket.qry_tokens[:nb],
            sr[:nb], sj[:nb], sc[:nb], local=algorithm.is_local,
        )
        if nat is not None:
            out_buf, out_lens = nat
            return sc[:nb], out_buf, out_lens
        codes = unpack_moves(packed, steps)
    results = []
    for row in range(nb):
        pair_num = int(bucket.pair_ids[row])
        rlen = int(bucket.ref_len[row])
        qlen = int(bucket.qry_len[row])
        ref = bucket.ref_tokens[row, :rlen].tobytes().decode("ascii")
        qry = bucket.qry_tokens[row, :qlen].tobytes().decode("ascii")
        results.append(
            moves_to_result(
                algorithm, pair_num, int(sc[row]), codes[:, row], ref, qry,
                int(sr[row]), int(sj[row]),
            )
        )
    return results


def device_traceback_bucket(
    algorithm: Algorithm,
    bucket,
    scores, srow, scol, dirs,
    params: AlignmentParams,
    stripe_s: int,
    walker: str = "xla",
    handle=None,
) -> list:
    """Full V8-style bucket traceback: device walk + host replay.

    `dirs` stays a device array -- only scores/starts and the packed move
    stream are ever transferred.  String assembly uses the threaded native
    replayer (native/tpualign.cpp ta_replay_moves) when available.
    `handle` accepts a walk already dispatched with device_walk_dispatch
    (the engine pipelines walks across buckets)."""
    out = device_traceback_bucket_arrays(
        algorithm, bucket, scores, srow, scol, dirs, params, stripe_s,
        walker=walker, handle=handle,
    )
    if isinstance(out, list):
        return out
    sc, out_buf, out_lens = out
    return results_from_arrays(bucket.pair_ids, sc, out_buf, out_lens,
                               bucket.num_real)


def _events_to_codes(flat, ev_off, sr, sj, sc, bucket, algorithm, params):
    """Pure-Python fallback for native_replay_events: expand flat per-lane
    event payloads ((row << 1 | is_ins) uint16, lane b's events at
    flat[ev_off[b]:ev_off[b + 1]]) into dense (T, nb) move codes
    equivalent to the device stream -- diagonals between events, local
    re-scoring stop (mirrors native/tpualign.cpp replay_events_range)."""
    nb = bucket.num_real
    local = algorithm.is_local
    t_cap = bucket.qry_tokens.shape[1] + bucket.ref_tokens.shape[1] + 1
    codes = np.zeros((t_cap, nb), np.uint8)
    for b in range(nb):
        rem = int(sc[b])
        if local and rem <= 0:
            continue
        r, c = int(sr[b]), int(sj[b])
        ref = bucket.ref_tokens[b]
        qry = bucket.qry_tokens[b]
        t = 0
        done = False

        def diag():
            nonlocal r, c, t, rem, done
            codes[t, b] = 1
            t += 1
            if local:
                rem -= (params.match if ref[c - 1] == qry[r - 1]
                        else params.mismatch)
                if rem <= 0:
                    done = True
            r -= 1
            c -= 1

        for k in range(int(ev_off[b]), int(ev_off[b + 1])):
            if done:
                break
            p = int(flat[k])
            if p == 0:
                break
            i_e = p >> 1
            while r > i_e and not done:
                diag()
            if done:
                break
            codes[t, b] = 3 if (p & 1) else 2
            t += 1
            if p & 1:
                c -= 1
            else:
                r -= 1
            if local:
                rem -= params.gap
                if rem <= 0:
                    done = True
        if local:
            while not done and r > 0 and c > 0:
                diag()
        else:
            while r > 0:
                diag()
    return codes


def unpack_moves(packed: np.ndarray, steps: int) -> np.ndarray:
    """(T16, B) packed words -> (steps, B) uint8 codes."""
    t16, b = packed.shape
    shifts = (2 * np.arange(16, dtype=np.uint32))[None, :, None]
    codes = (
        (packed.astype(np.uint32)[:, None, :] >> shifts) & 3
    ).reshape(t16 * 16, b)
    return codes[:steps].astype(np.uint8)
