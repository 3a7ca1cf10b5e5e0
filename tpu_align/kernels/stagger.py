"""Stagger-wavefront Pallas fill kernels (LNW / LSW / ANW).

This is the vector form of the reference's warp stagger
(cuda/LNW/LinearNeedlemanWunschV19.cu:178-314): instead of sweeping whole
DP rows and resolving the within-row dependency with a log2(N) prefix-max
scan (kernels/fill.py), each of S sublanes owns one query row of a stripe
and the stripe advances along anti-diagonals -- sublane r at step k
computes cell (i, j) = (i0 + r + 1, k - r + 1).  Every dependency becomes
a unit sublane shift or a register from the previous step:

    left  H[i][j-1]  = own sublane, previous step        (s1)
    up    H[i-1][j]  = sublane r-1, previous step        (roll(s1, 1))
    diag  H[i-1][j-1]= sublane r-1, two steps back       (= previous
                       step's `up`: same roll, same fill row -- carried,
                       not recomputed)

so the ~21-op scan disappears and the kernel runs ~2x fewer VPU ops per
cell.  Work redundancy is only (N + S - 1)/N (pipeline fill/drain at the
stripe edges), the same amortization argument as the reference's 32-thread
warp stagger over long rows.

Cross-stripe hand-off: the stripe's bottom row is streamed into a VMEM
row buffer one column per step (dynamic sublane store), and the next
stripe's sublane 0 reads its up/diag neighbours back with one dynamic
sublane load per step -- the TPU analogue of the reference's cross-stripe
shared-memory hand-off (V19.cu:210-212, 290-292).

Reference characters: sublane r needs ref[k - r], a *reversed* S-window of
the reference that slides one position per step.  A reversed staging array
revref[t] = ref[N-1-(t-S)] turns this into one dynamic sublane slice per
step (revref[S+N-1-k .. +S]); no per-step shuffles.

Scores are kept in anti-diagonal G-space: every cell computed at step k
carries G = H - k*rc, where rc = gap (linear) or gap_extend (affine).
Both unit-gap moves come from step k-1, so `ins = left` and `dele = up`
with NO gap add (affine: E/F extends likewise lose their adds); the diag
comes from step k-2, so its two ranks fold into the substitution
constants (w - 2*rc).  All compared quantities at a step share the same
rank, so the `__vibmax >=` tie chains are bitwise UNCHANGED from H-space.
Rank is restored only at capture time: global aligners add ktarget*rc
once per stripe; LSW restores per step before its running max (the max
crosses steps of different rank).  The hand-off row buffer stores
G + S*rc so cross-stripe reads need no per-step correction, and stripe-0
init writes the H[0][j] border directly in read-rank form (a constant
2*gap for LNW, go+2*ge for ANW, a (2-j)*gap ramp for LSW).

Direction words pack the STEP axis: step k of a
stripe lands in word k//16 at bits 2*(k%16) (4-bit/8-step for affine), one
(S, P) word-plane written per 16 (8) steps, laid out (stripes, W, S, B).
The walker maps cell (i, j) -> stripe (i-1)//S, sublane (i-1)%S, step
k = (j-1) + (i-1)%S.

Tie-break semantics are exactly the reference's `__vibmax >=` chains via
the DPX layer, identical to kernels/fill.py (byte-compared in tests).
BSW keeps its own skewed-band kernel (kernels/banded.py).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_align.core import directions as D
from tpu_align.core.params import Algorithm, AlignmentParams
from tpu_align.kernels.fill import (
    NEG,
    TILE_P,
    BucketFill,
    _default_interpret,
    _pad_batch,
    bits_per_cell,
    host_pack_tokens,
    unpack_both,
)
from tpu_align.ops import dpx

STRIPE_S = 32  # query rows per stripe (sublane stagger width); tunable


def _round8(x: int) -> int:
    return -(-x // 8) * 8


def _imm32(v: int) -> int:
    """Wrap a Python int into signed-int32 range (pre-shifted direction
    codes reach bit 31, e.g. code 3 << 30)."""
    v &= 0xFFFFFFFF
    return v - (1 << 32) if v >= (1 << 31) else v


def _iota_s(shape):
    """Sublane-axis iota r = 0..S-1, broadcast over pairs."""
    return jax.lax.broadcasted_iota(jnp.int32, shape, dimension=0)


def _shift1(x, fill_row):
    """Sublane shift down by one: out[r] = x[r-1]; out[0] = fill_row
    (a (1, P) row, broadcast into sublane 0)."""
    rolled = pltpu.roll(x, 1, axis=0)
    return jnp.where(_iota_s(x.shape) == 0, fill_row, rolled)


def _make_stagger_kernel(algo: Algorithm, p: AlignmentParams, n_cols: int,
                         s_rows: int, k16: int, tile_p: int,
                         with_traceback: bool, emit_last_row: bool = False,
                         has_open_top: bool = False):
    is_local = algo.is_local
    is_affine = algo.is_affine
    # Measurement-only attribution knob (PERF.md, ANW dirs cost): pack the
    # 2-bit main code but SKIP the E/F extend-bit ORs.  Output dirs are NOT
    # walkable (affine traceback needs the extend bits); read at trace time,
    # so only fresh processes (bench A/B runs) see a change.  The walk
    # dispatchers REFUSE affine walks while this knob is active
    # (traceback/device.py, traceback/host.py) so it cannot silently
    # produce wrong alignments.
    ef_bits = os.environ.get("TPU_ALIGN_ANW_EF_BITS", "1") != "0"
    # Affine H value tree: from f_row (2 maxes) or the round-3
    # reassociated 3-max tree with f_open at depth 1.  Bitwise identical
    # by max associativity; the 2-max form trades path latency for one
    # op of throughput.  Measured (ab_r05.jsonl): with dirs ON the
    # kernel is throughput-bound and 2-max wins (141.5 -> 145.0 GCUPS);
    # scores-only is latency-bound and keeps the reassociated tree
    # (round-3 measurement).  Env knob overrides for A/B.
    _hm = os.environ.get("TPU_ALIGN_ANW_HMAX2", "")
    anw_hmax2 = (_hm == "1") if _hm else with_traceback
    # A/B knob: carry the reversed-ref window as a loop slab (roll + one
    # (1, P) row load per step) instead of re-slicing an (S, P) dynamic
    # window from VMEM every step.  Exact by construction: row r of step
    # k's window is ref[k-r], and rows entering past the sequence end
    # load revref's zero padding -- the same pad token the static slice
    # reads.  Trades VMEM load traffic for +S/8 carried vregs.
    rollref = os.environ.get("TPU_ALIGN_ROLLREF", "0") == "1"
    assert not (emit_last_row and is_local), "last-row mode is global-only"
    assert not (emit_last_row and with_traceback)
    assert not (has_open_top and not is_affine), "open_top is affine-only"
    S = s_rows
    bits = bits_per_cell(algo)
    spw = 32 // bits  # steps per direction word
    num_words = k16 // spw
    PAD = S + spw  # row-buffer slack below column 0 (block stores at the
    #                stripe edges land here instead of needing predication)
    # plain Python ints: they fold into the trace as immediates (a jnp
    # constant created here would be captured as a kernel const, which
    # pallas_call rejects)
    match_w = p.match
    mismatch_w = p.mismatch
    gap = p.gap
    go, ge = p.gap_open, p.gap_extend
    goe = p.gap_open + p.gap_extend
    # anti-diagonal rank constant: cells computed at step k carry
    # G = H - k*rc, so the per-step unit-gap adds vanish (see module doc)
    rc = ge if is_affine else gap
    wm2 = match_w - 2 * rc  # substitution weights absorb the diag's
    wx2 = mismatch_w - 2 * rc  # two-step rank difference
    # local argmax tracking: pack (score, column) into one int32 as
    # enc = (h << SH) - jcol, so the per-step update is a single max
    # (bigger h wins; equal h -> smaller column wins = first occurrence)
    # instead of a cmp + three selects on a loop-carried register pair.
    enc_sh = max((n_cols + 1).bit_length(), 1)
    use_enc = is_local and (
        max(match_w * n_cols, 1) < (1 << (31 - enc_sh))
    )
    # enc in per-step constant form: ((G + gap*k) << SH) - (k - io + 1)
    # = (G << SH) + enc_c1*k + (io - 1)
    enc_c1 = (gap << enc_sh) - 1

    def kernel(revref_ref, qry_ref, rlen_ref, qlen_ref, *rest):
        rest = list(rest)
        topen_ref = rest.pop(0) if has_open_top else None
        meta_ref = rest.pop(0)
        dirs_ref = rest.pop(0) if with_traceback else None
        # last-row capture targets: (K16, P) blocks in STEP space, G-rank k
        # (the jit wrapper gathers k = j-1+r per lane and restores rank).
        # Out blocks persist across the stripe grid axis, so the capture
        # max-merges in place: exactly one stripe's qlen-row sublane is
        # non-NEG per lane per step.
        caph_ref = rest.pop(0) if emit_last_row else None
        capf_ref = rest.pop(0) if (emit_last_row and is_affine) else None
        scratch = rest
        if is_affine:
            rowbuf_h, rowbuf_f, best_s, brow_s, bcol_s = scratch
        else:
            rowbuf_h, best_s, brow_s, bcol_s = scratch
            rowbuf_f = None
        stripe = pl.program_id(1)
        num_stripes = pl.num_programs(1)
        shape = (S, tile_p)
        io = _iota_s(shape)
        i0 = stripe * S  # rows of this stripe are i0+1 .. i0+S (1-based)
        i_slab = i0 + io + 1  # DP row per sublane
        rlen = rlen_ref[0:1, :]
        qlen = qlen_ref[0:1, :]
        qslab = qry_ref[:, :].astype(jnp.int32)  # (S, P) query chars

        @pl.when(stripe == 0)
        def _init():
            # DP border row H[0][j] (column j lives at sublane j + PAD),
            # written in read-rank form: rowbuf[j + PAD] is consumed as
            # `up` at step k = j-1 (and as `diag` one step later via the
            # up_prev carry), so it must hold H[0][j] - (j-2)*rc.
            cols = jax.lax.broadcasted_iota(
                jnp.int32, (rowbuf_h.shape[0], tile_p), 0
            ) - PAD
            if is_local:
                rowbuf_h[:, :] = (2 - cols) * gap  # H[0][j] = 0
            elif is_affine:
                # H[0][j] = go + j*ge (j >= 1; H[0][0] only via inject)
                rowbuf_h[:, :] = jnp.full_like(cols, goe + ge)
                rowbuf_f[:, :] = jnp.full_like(cols, NEG)  # F row 0 = -inf
            else:
                rowbuf_h[:, :] = jnp.full_like(cols, 2 * gap)  # = j*gap deranked
            best_s[:, :] = jnp.full((1, tile_p), NEG, jnp.int32)
            brow_s[:, :] = jnp.zeros((1, tile_p), jnp.int32)
            bcol_s[:, :] = jnp.zeros((1, tile_p), jnp.int32)
            if emit_last_row:
                caph_ref[:, :] = jnp.full(caph_ref.shape, NEG, jnp.int32)
                if is_affine:
                    capf_ref[:, :] = jnp.full(capf_ref.shape, NEG, jnp.int32)

        # per-stripe border columns (H[i][0] etc.), injected at step k == r
        # in read-rank form: `left` is consumed at rank k-1 = io-1, `diag`
        # at rank k-2 = io-2, so subtract (io-1)*rc resp. (io-2)*rc.
        if is_local:
            border_left = (1 - io) * gap  # H[i][0] = 0
            border_diag = (2 - io) * gap
        elif is_affine:
            # H[i][0] = tb + i*ge (tb = gap_open, or the Myers-Miller
            # boundary credit when open_top is given -- the border column
            # is a vertical gap starting at the top boundary): deranked
            # both collapse to tb + (i0+2)*ge
            if has_open_top:
                tb_row = topen_ref[0:1, :].astype(jnp.int32)  # (1, P)
                bcst = tb_row + (ge + (i0 + 1) * ge)
                border_left = jnp.broadcast_to(bcst, shape)
            else:
                tb_row = None
                border_left = jnp.full(shape, goe + (i0 + 1) * ge, jnp.int32)
            border_diag = jnp.where(  # i_slab==1 only at io==0: H[0][0]=0
                i_slab == 1, 2 * ge, border_left
            )
        else:
            # H[i][0] = i*gap: deranked both collapse to (i0+2)*gap
            border_left = jnp.full(shape, (i0 + 2) * gap, jnp.int32)
            border_diag = border_left
        neg_slab = jnp.full(shape, NEG, jnp.int32)
        qmask = i_slab <= qlen  # row within the true query
        qmask_eq = i_slab == qlen  # the final-row sublane (global capture)
        iom1 = io - 1
        # global capture: cell (qlen, rlen) is computed by the qlen-row
        # sublane at step k = rlen + r - 1; hoisting the target step turns
        # the per-step capture into one compare + one select
        ktarget = jnp.where(qmask_eq, rlen + io - 1, jnp.int32(NEG))
        kt0 = jnp.where(qmask_eq, ktarget, 0)  # overflow-safe restore factor

        def step(k, sub, carry, inject, enc_base=None):
            """One anti-diagonal step: sublane r computes column j = k-r+1.

            `inject` (compile-time) enables the j==1 border injections;
            they can only fire while k < S, so the bulk of the sweep runs
            a shorter dependency chain without them.  All values are in
            G-space (G = H - k*rc): up/left/E/F-extends need no gap add,
            and diag is the previous step's `up` verbatim (same roll,
            same hand-off fill row).  `sub` = k % spw as a compile-time
            int (k itself is traced in the bulk fori), so the direction
            constants are pre-shifted immediates and the bottom-row
            collect mask is a constant."""
            refslab_c = None
            if is_affine:
                if rollref:
                    (s1, up_prev, s1f, s1e, refslab_c,
                     acc, rowmax, rowcol) = carry
                else:
                    s1, up_prev, s1f, s1e, acc, rowmax, rowcol = carry
            elif rollref:
                s1, up_prev, refslab_c, acc, rowmax, rowcol = carry
                s1f = s1e = None
            else:
                s1, up_prev, acc, rowmax, rowcol = carry
                s1f = s1e = None
            # neighbour loads from the previous stripe's bottom row
            rbk1 = rowbuf_h[pl.ds(k + 1 + PAD, 1), :]
            up = _shift1(s1, rbk1)
            diag = up_prev
            left = s1
            if inject:
                inj = io == k  # sublane starting its row this step (j == 1)
                diag = jnp.where(inj, border_diag, diag)
                left = jnp.where(inj, border_left, left)
            # substitution: ref[k - r] via the sliding reversed window
            if rollref:
                refslab = refslab_c
                # pre-position the window for step k+1: one (1, P) row
                # enters at sublane 0 (zeros pad past the sequence end)
                nxt = revref_ref[
                    pl.ds(jnp.maximum(S + n_cols - 2 - k, 0), 1), :
                ].astype(jnp.int32)
                refslab_c = _shift1(refslab, nxt)
            else:
                start = jnp.maximum(S + n_cols - 1 - k, 0)
                refslab = revref_ref[pl.ds(start, S), :].astype(jnp.int32)
            is_match = refslab == qslab
            mm = diag + jnp.where(is_match, wm2, wx2)
            if is_affine:
                rbk1f = rowbuf_f[pl.ds(k + 1 + PAD, 1), :]
                upf = _shift1(s1f, rbk1f)
                # F: open vs extend, __vibmax open >= extend -> GAP_OPEN
                # (G-space: the shared +ge rank is dropped from both arms)
                f_open = up + go
                if has_open_top:
                    # row 1's vertical gap starts at the TOP boundary and
                    # opens at the Myers-Miller credit (rowbuf_f row 0 is
                    # NEG, so the max keeps this forced open)
                    f_open = jnp.where(i_slab == 1, up + tb_row, f_open)
                f_ext = upf
                f_row, f_open_wins = dpx.vibmax_s32(f_open, f_ext)
                # E: left-dependency, same-sublane previous step
                e_prev = jnp.where(io == k, neg_slab, s1e) if inject else s1e
                e_open = left + go
                e_ext = e_prev
                e_row, e_open_wins = dpx.vibmax_s32(e_open, e_ext)
                # H chain: best = mm; F >= best -> DEL; E >= best -> INS.
                # The VALUE is the 4-way max over {mm, f_ext, e_row,
                # f_open}, reassociated for the loop-carried cycle: the
                # two 1-step dependency paths both hit 4 links (up-path
                # roll/sel/+go with f_open at tree depth 1; left-path
                # +go/e-max with e_row at depth 2), and the f->h path's 5
                # links amortize over the 2-step h->f->h circuit (4.5
                # links/step) -- vs 6 links for the naive serial chain.
                # max is associative/commutative so h is bitwise
                # unchanged; the tie PREDICATES keep the reference's exact
                # `__vibmax >=` chain (same operands, off the cycle --
                # they only feed the direction word, and are dead code in
                # scores-only mode).
                if anw_hmax2:
                    h = jnp.maximum(jnp.maximum(mm, f_row), e_row)
                else:
                    h = jnp.maximum(
                        jnp.maximum(jnp.maximum(mm, f_ext), e_row), f_open
                    )
                if with_traceback:
                    _, take_del = dpx.vibmax_s32(f_row, mm)
                    # == e_row >= max(f_row, mm), the chain's final `>=`
                    take_ins = h == e_row
                    sh = bits * sub  # compile-time: pre-shift the codes
                    d = jnp.where(is_match, _imm32(D.MAIN_DIAG_MATCH << sh),
                                  _imm32(D.MAIN_DIAG_MISMATCH << sh))
                    d = jnp.where(take_del, _imm32(D.MAIN_QUERY_DELETION << sh), d)
                    d = jnp.where(take_ins, _imm32(D.MAIN_QUERY_INSERTION << sh), d)
                    if ef_bits:
                        d = d | jnp.where(f_open_wins, 0,
                                          _imm32(D.BIT_F_EXTEND << sh))
                        d = d | jnp.where(e_open_wins, 0,
                                          _imm32(D.BIT_E_EXTEND << sh))
                    acc = acc | d
            else:
                dele = up  # G-space: the +gap is the rank step
                ins = left
                # VALUE maxes reassociated so the roll path (dele) feeds
                # one final max: the loop-carried cycle h->h' drops from 4
                # to 3 links (ins = s1 verbatim and mm comes from the
                # PREVIOUS step's up, so max(ins, mm) runs parallel to the
                # roll).  h is bitwise unchanged (max associativity); the
                # tie predicates keep the exact reference chains and are
                # dead code in scores-only mode.
                if algo is Algorithm.LNW:
                    # chain (c++/LinearNeedlemanWunsch.cpp:122-126):
                    # best = mm; dele >= best -> DEL; ins >= best -> INS
                    h = jnp.maximum(jnp.maximum(ins, mm), dele)
                    if with_traceback:
                        _, take_del = dpx.vibmax_s32(dele, mm)
                        # == ins >= max(dele, mm), the chain's final `>=`
                        take_ins = h == ins
                else:
                    # LSW (cuda/LinearSmithWaterman.cu:126-137):
                    # best = mm; ins >= best -> INS; dele >= best -> DEL;
                    # 0-clamp (H = 0 is G = -k*gap; stop recovered by
                    # re-scoring in the walker)
                    b1 = jnp.maximum(ins, mm)
                    h = jnp.maximum(jnp.maximum(b1, -gap * k), dele)
                    if with_traceback:
                        _, take_ins = dpx.vibmax_s32(ins, mm)
                        _, take_del = dpx.vibmax_s32(dele, b1)
                if with_traceback:
                    sh = bits * sub  # compile-time: pre-shift the codes
                    d = jnp.where(is_match, _imm32(D.MAIN_DIAG_MATCH << sh),
                                  _imm32(D.MAIN_DIAG_MISMATCH << sh))
                    if algo is Algorithm.LNW:
                        d = jnp.where(take_del,
                                      _imm32(D.MAIN_QUERY_DELETION << sh), d)
                        d = jnp.where(take_ins,
                                      _imm32(D.MAIN_QUERY_INSERTION << sh), d)
                    else:
                        d = jnp.where(take_ins,
                                      _imm32(D.MAIN_QUERY_INSERTION << sh), d)
                        d = jnp.where(take_del,
                                      _imm32(D.MAIN_QUERY_DELETION << sh), d)
                    acc = acc | d

            jcol = k - iom1  # DP column per sublane
            if use_enc:
                # per-row running max over enc = (H << SH) - jcol; one
                # carried max per step.  Algebra folds the G-rank restore
                # (H = G + gap*k) and the column tiebreak into per-step
                # constants: enc = (G << SH) + c1*k + (io - 1) with
                # c1 = (gap << SH) - 1, so the slab work is one shift +
                # one add (enc_base carries c1*k + io - 1; c1*sub is a
                # compile-time immediate folded per unrolled step).
                # Bulk steps (k >= S > io) need NO validity mask: the
                # fill edge only exists while k < S (inject words), and
                # cells beyond a lane's rlen/qlen never win -- padded
                # tokens never match, so junk H strictly decays below the
                # row's valid maximum (rows > qlen are masked at the
                # stripe merge; the argmax is only consumed when the
                # global best > 0).
                enc = (h << enc_sh) + (enc_base + _imm32(enc_c1 * sub))
                if inject:
                    enc = jnp.where(io <= k, enc, NEG)
                rowmax = jnp.maximum(rowmax, enc)
            elif is_local:
                # per-row running max (strict > keeps the earliest column);
                # merged across rows once per stripe below
                valid = jnp.logical_and(
                    jnp.logical_and(io <= k, jcol <= rlen), qmask
                )
                cand = jnp.where(valid, h + gap * k, NEG)
                upd = cand > rowmax
                rowmax = jnp.where(upd, cand, rowmax)
                rowcol = jnp.where(upd, jcol, rowcol)
            else:
                # capture H[qlen][rlen] into the slab (at most one sublane
                # per lane per stripe matches); reduced once per stripe
                rowmax = jnp.where(ktarget == k, h, rowmax)

            if is_affine:
                if rollref:
                    return h, up, f_row, e_row, refslab_c, acc, rowmax, rowcol
                return h, up, f_row, e_row, acc, rowmax, rowcol
            if rollref:
                return h, up, refslab_c, acc, rowmax, rowcol
            return h, up, acc, rowmax, rowcol

        def word_step(wi, carry, inject):
            # one direction word's worth of steps, fully unrolled (the
            # fori_loop body is traced once; Mosaic software-pipelines the
            # serial step chain across the unrolled body).  The bottom-row
            # hand-off is a single spw-row block store per word: column
            # wi*spw - S + 2 + sub lands at slack-padded buffer offset
            # PAD + that (always >= 0; edge junk falls in the slack and is
            # never read -- reads stop at column N).  Each unrolled step's
            # bottom row is collected in a Python list and concatenated
            # once per word (sublane copies), not select-accumulated per
            # step (spw full-slab selects).
            slabs, word_carry = carry
            acc = jnp.zeros(shape, jnp.int32)
            nslab = (4 if is_affine else 2) + (1 if rollref else 0)
            st = slabs[:nslab] + (acc,) + word_carry
            bot_rows, botf_rows = [], []
            caph_rows, capf_rows = [], []
            # per-word slab constant of the enc running max: c1*k + io - 1
            # at k = wi*spw (the per-sub remainder folds as an immediate)
            enc_base = (iom1 + enc_c1 * (wi * spw)) if use_enc else None
            for sub in range(spw):
                st = step(wi * spw + sub, sub, st, inject,
                          enc_base=enc_base)
                bot_rows.append(st[0][S - 1:S, :])
                if is_affine:
                    botf_rows.append(st[2][S - 1:S, :])
                if emit_last_row:
                    # the qlen-row sublane's value this step (exactly one
                    # sublane matches per lane in the owning stripe; NEG
                    # elsewhere so the cross-stripe max-merge is exact)
                    caph_rows.append(jnp.max(
                        jnp.where(qmask_eq, st[0], NEG),
                        axis=0, keepdims=True))
                    if is_affine:
                        capf_rows.append(jnp.max(
                            jnp.where(qmask_eq, st[2], NEG),
                            axis=0, keepdims=True))
            slabs = st[:nslab]
            acc = st[nslab]
            word_carry = st[nslab + 1: nslab + 3]
            bot = jnp.concatenate(bot_rows, axis=0)
            if is_affine:
                botf = jnp.concatenate(botf_rows, axis=0)
            store_at = wi * spw - (S - 1) + 1 + PAD
            # store with the +S*rc fold so next-stripe reads are rank-free
            # (column j stored at step j+S-2, read as `up` at step j-1)
            rowbuf_h[pl.ds(store_at, spw), :] = bot + S * rc
            if is_affine:
                rowbuf_f[pl.ds(store_at, spw), :] = botf + S * rc
            if emit_last_row:
                at = pl.ds(wi * spw, spw)
                caph_ref[at, :] = jnp.maximum(
                    caph_ref[at, :], jnp.concatenate(caph_rows, axis=0))
                if is_affine:
                    capf_ref[at, :] = jnp.maximum(
                        capf_ref[at, :], jnp.concatenate(capf_rows, axis=0))
            if with_traceback:
                dirs_ref[0, wi, :, :] = acc
            return slabs, word_carry

        junk = jnp.zeros(shape, jnp.int32)
        # up_prev starts as junk: at step 0 every sublane's diag is either
        # injected (r == 0) or in the pipeline-fill region (r > 0)
        if is_affine:
            slabs = (junk, junk, neg_slab, neg_slab)
        else:
            slabs = (junk, junk)
        if rollref:
            # step-0 window: row r holds ref[-r] = revref[S+n-1+r] (all
            # zeros pad; real chars roll in from step 1)
            slabs = slabs + (
                revref_ref[pl.ds(S + n_cols - 1, S), :].astype(jnp.int32),
            )
        word_carry = (jnp.full(shape, NEG, jnp.int32),
                      jnp.zeros(shape, jnp.int32))  # rowcol unused for global
        # border injections can only fire during the first S steps: unroll
        # those words statically with the inject selects, run the bulk
        # without them
        inj_words = -(-S // spw)
        carry = (slabs, word_carry)
        for wi in range(min(inj_words, num_words)):
            carry = word_step(wi, carry, True)
        if num_words > inj_words:
            carry = jax.lax.fori_loop(
                inj_words, num_words,
                lambda wi, c: word_step(wi, c, False), carry,
            )
        slabs, word_carry = carry
        rowmax, rowcol = word_carry

        if is_local:
            if use_enc:
                # decode enc -> (h, jcol) once per stripe: jcol in [1, n]
                # implies floor(enc / 2^SH) = h - 1
                dec_h = (rowmax >> enc_sh) + 1
                rowcol = (dec_h << enc_sh) - rowmax
                rowmax = dec_h
            # merge the stripe's per-row maxima into the global best with
            # row-major first-occurrence semantics
            # (cuda/LinearSmithWaterman.cu:300-311)
            masked = jnp.where(qmask, rowmax, NEG)
            stripe_max = jnp.max(masked, axis=0, keepdims=True)
            enc = jnp.where(
                masked == stripe_max, io * jnp.int32(1 << 20) + rowcol,
                jnp.int32(2**30),
            )
            mn = jnp.min(enc, axis=0, keepdims=True)
            r_best = mn >> 20
            c_best = mn & ((1 << 20) - 1)
            upd = stripe_max > best_s[:, :]
            best_s[:, :] = jnp.where(upd, stripe_max, best_s[:, :])
            brow_s[:, :] = jnp.where(upd, i0 + r_best + 1, brow_s[:, :])
            bcol_s[:, :] = jnp.where(upd, c_best, bcol_s[:, :])
        else:
            # captured at step ktarget in G-space: restore H = G + k*rc
            restored = jnp.where(qmask_eq, rowmax + kt0 * rc, NEG)
            best_s[:, :] = jnp.maximum(
                best_s[:, :], jnp.max(restored, axis=0, keepdims=True)
            )
            brow_s[:, :] = qlen
            bcol_s[:, :] = rlen

        @pl.when(stripe == num_stripes - 1)
        def _emit():
            best = best_s[:, :]
            if is_local:
                pos = best > 0
                score = jnp.where(pos, best, 0)
                srow = jnp.where(pos, brow_s[:, :], 0)
                scol = jnp.where(pos, bcol_s[:, :], 0)
            else:
                score, srow, scol = best, brow_s[:, :], bcol_s[:, :]
            out_rows = _iota_s((8, tile_p))
            meta = jnp.where(out_rows == 0, score, 0)
            meta = jnp.where(out_rows == 1, srow, meta)
            meta = jnp.where(out_rows == 2, scol, meta)
            meta_ref[:, :] = meta

    return kernel


@functools.partial(jax.jit, static_argnames=(
    "algorithm", "params", "with_traceback", "interpret", "stripe_s",
    "emit_last_row"))
def _fill_stagger_jit(algorithm, params, ref_tokens, qry_tokens, ref_len,
                      qry_len, with_traceback=True, interpret=False,
                      stripe_s=STRIPE_S, emit_last_row=False, open_top=None):
    b, n = ref_tokens.shape
    m = qry_tokens.shape[1]
    S = stripe_s
    assert m % 8 == 0, (b, m, n)
    bp = b if interpret else _pad_batch(b)
    if bp != b:
        ref_tokens = jnp.pad(ref_tokens, ((0, bp - b), (0, 0)))
        qry_tokens = jnp.pad(qry_tokens, ((0, bp - b), (0, 0)),
                             constant_values=1)
        ref_len = jnp.pad(ref_len.reshape(-1), (0, bp - b))
        qry_len = jnp.pad(qry_len.reshape(-1), (0, bp - b))
        if open_top is not None:
            open_top = jnp.pad(open_top.reshape(-1), (0, bp - b),
                               constant_values=params.gap_open)
        b = bp
    if m % S:  # pad query rows to whole stripes
        pad_m = S - m % S
        qry_tokens = jnp.pad(qry_tokens, ((0, 0), (0, pad_m)),
                             constant_values=1)
        m = m + pad_m
    tile_p = TILE_P if not interpret else (TILE_P if b % TILE_P == 0 else b)
    bits = bits_per_cell(algorithm)
    spw = 32 // bits
    k16 = -(-(n + S - 1) // spw) * spw  # steps per stripe, whole words
    num_words = k16 // spw
    stripes = m // S
    grid = (b // tile_p, stripes)
    # reversed staging: revref[t] = ref[N-1-(t-S)]; sublane r of step k
    # reads revref[S+N-1-k+r] = ref[k-r]
    rl = _round8(n + 2 * S + spw)
    ref_t = ref_tokens.astype(jnp.int32).T  # (N, B)
    revref = jnp.zeros((rl, b), jnp.int32)
    revref = revref.at[S:S + n, :].set(ref_t[::-1, :])
    qry_t = qry_tokens.astype(jnp.int32).T  # (M, B)
    rlen_t = ref_len.reshape(1, b).astype(jnp.int32)
    qlen_t = qry_len.reshape(1, b).astype(jnp.int32)
    kernel = _make_stagger_kernel(
        algorithm, params, n, S, k16, tile_p, with_traceback,
        emit_last_row=emit_last_row, has_open_top=open_top is not None,
    )
    out_shape = [jax.ShapeDtypeStruct((8, b), jnp.int32)]
    out_specs = [
        pl.BlockSpec((8, tile_p), lambda i, s: (0, i),
                     memory_space=pltpu.VMEM)
    ]
    if with_traceback:
        out_shape.append(
            jax.ShapeDtypeStruct((stripes, num_words, S, b), jnp.int32)
        )
        out_specs.append(
            pl.BlockSpec((1, num_words, S, tile_p),
                         lambda i, s: (s, 0, 0, i), memory_space=pltpu.VMEM)
        )
    if emit_last_row:
        # step-space capture blocks; persist across the stripe grid axis
        for _ in range(2 if algorithm.is_affine else 1):
            out_shape.append(jax.ShapeDtypeStruct((k16, b), jnp.int32))
            out_specs.append(
                pl.BlockSpec((k16, tile_p), lambda i, s: (0, i),
                             memory_space=pltpu.VMEM)
            )
    in_specs = [
        pl.BlockSpec((rl, tile_p), lambda i, s: (0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((S, tile_p), lambda i, s: (s, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile_p), lambda i, s: (0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile_p), lambda i, s: (0, i),
                     memory_space=pltpu.VMEM),
    ]
    if open_top is not None:
        in_specs.append(pl.BlockSpec((1, tile_p), lambda i, s: (0, i),
                                     memory_space=pltpu.VMEM))
    rb = _round8(k16 + S + spw + 8)  # k16 reads + PAD slack + margin
    scratch_shapes = [pltpu.VMEM((rb, tile_p), jnp.int32)]  # H hand-off row
    if algorithm.is_affine:
        scratch_shapes.append(pltpu.VMEM((rb, tile_p), jnp.int32))  # F row
    scratch_shapes += [
        pltpu.VMEM((1, tile_p), jnp.int32),  # best score
        pltpu.VMEM((1, tile_p), jnp.int32),  # best row
        pltpu.VMEM((1, tile_p), jnp.int32),  # best col
    ]
    flops_per_cell = 16 if algorithm.is_affine else 10
    cost = pl.CostEstimate(
        flops=flops_per_cell * b * m * (n + S),
        bytes_accessed=b * (m + n) * 4
        + (b * stripes * num_words * S * 4 if with_traceback else 0),
        transcendentals=0,
    )
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_shape=out_shape,
        out_specs=out_specs,
        scratch_shapes=scratch_shapes,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        cost_estimate=cost,
    )(revref, qry_t, rlen_t, qlen_t,
      *(() if open_top is None
        else (open_top.reshape(1, b).astype(jnp.int32),)))
    meta = outs[0]
    dirs = outs[1] if with_traceback else None
    if emit_last_row:
        # capture blocks hold the qlen-row sublane's stream in STEP space
        # at G-rank k; H[qlen][j] lives at step k = j-1+r with
        # r = (qlen-1) % S.  Gather per lane and restore rank (+k*rc).
        rc = params.gap_extend if algorithm.is_affine else params.gap
        r = ((qry_len.reshape(-1).astype(jnp.int32) - 1) % S)  # (B,)
        k_idx = jnp.arange(n, dtype=jnp.int32)[:, None] + r[None, :]
        def to_rows(cap):
            return jnp.take_along_axis(cap, k_idx, axis=0) + k_idx * rc
        hlast = to_rows(outs[1])
        flast = to_rows(outs[2]) if algorithm.is_affine else None
        return meta[0, :], meta[1, :], meta[2, :], hlast, flast
    return meta[0, :], meta[1, :], meta[2, :], dirs


def fill_stagger_last_rows_async(
    algorithm: Algorithm,
    params: AlignmentParams,
    ref_tokens, qry_tokens, ref_len, qry_len,
    interpret: bool | None = None,
    open_top=None,
    stripe_s: int = STRIPE_S,
):
    """Stagger-wavefront scores-only fill that also emits the DP matrix's
    LAST ROW per pair (H[qlen][j], plus Gotoh F[qlen][j] for affine) --
    the same contract as kernels.fill.fill_last_rows_async but on the
    stagger formulation (~2x fewer VPU ops than the rowscan's prefix-max
    scan), which is what the Hirschberg recursion's split fills use.

    The qlen-row sublane's per-step stream is max-merged across stripes
    into a step-space capture block (exactly one stripe owns each lane's
    last row); the wrapper gathers k = j-1+r per lane and restores the
    anti-diagonal G-rank.  Returns (scores, hlast (N, B), flast-or-None).
    """
    if algorithm.is_local:
        raise ValueError("last-row fill is global-only (LNW/ANW)")
    if algorithm.is_affine and params.gap_open > 0:
        raise ValueError("ANW kernel requires gap_open <= 0")
    if open_top is not None and not algorithm.is_affine:
        raise ValueError("open_top is affine-only")
    if interpret is None:
        interpret = _default_interpret()
    scores, _, _, hlast, flast = _fill_stagger_jit(
        algorithm, params,
        jnp.asarray(ref_tokens), jnp.asarray(qry_tokens),
        jnp.asarray(ref_len), jnp.asarray(qry_len),
        with_traceback=False, interpret=interpret, stripe_s=stripe_s,
        emit_last_row=True,
        open_top=None if open_top is None else jnp.asarray(open_top),
    )
    return scores, hlast, flast


@functools.partial(jax.jit, static_argnames=(
    "algorithm", "params", "with_traceback", "interpret", "stripe_s"))
def _fill_stagger_packed_jit(algorithm, params, ref_packed, ref_lut,
                             qry_packed, qry_lut, ref_len, qry_len,
                             with_traceback=True, interpret=False,
                             stripe_s=STRIPE_S):
    rt, qt = unpack_both(ref_packed, ref_lut, qry_packed, qry_lut,
                         ref_len, qry_len)
    return _fill_stagger_jit(algorithm, params, rt, qt, ref_len, qry_len,
                             with_traceback=with_traceback,
                             interpret=interpret, stripe_s=stripe_s)


@functools.partial(jax.jit, static_argnames=(
    "algorithm", "params", "b", "n4", "m4", "with_traceback", "interpret",
    "stripe_s"))
def _fill_stagger_fused_jit(algorithm, params, blob, b, n4, m4,
                            with_traceback=True, interpret=False,
                            stripe_s=STRIPE_S):
    """Fill from a single fused upload buffer (io/packing.FusedBlob):
    the whole bucket crosses the tunnel in ONE transfer; slicing the six
    arrays back out is device-side relayout XLA folds into the kernel's
    input prologue."""
    from tpu_align.io.packing import defuse_bucket_blob

    rp, rlut, qp, qlut, rl, ql = defuse_bucket_blob(blob, b, n4, m4)
    rt, qt = unpack_both(rp, rlut, qp, qlut, rl, ql)
    return _fill_stagger_jit(algorithm, params, rt, qt, rl, ql,
                             with_traceback=with_traceback,
                             interpret=interpret, stripe_s=stripe_s)


def fill_stagger_bucket_async(
    algorithm: Algorithm,
    params: AlignmentParams,
    ref_tokens, qry_tokens, ref_len, qry_len,
    with_traceback: bool = True,
    interpret: bool | None = None,
    stripe_s: int = STRIPE_S,
    prestaged=None,
):
    """Dispatch one bucket's stagger fill; returns async JAX arrays
    (scores, srow, scol, dirs-(stripes, W, S, B)-or-None).

    prestaged: optional (ref_packed, ref_lut, qry_packed, qry_lut)
    already device_put by the caller -- the engine uploads buckets from a
    worker pool so several H2D streams run concurrently on tunneled
    backends (engine._upload)."""
    if algorithm.is_banded:
        raise ValueError("BSW uses the skewed banded kernel")
    if algorithm.is_affine and params.gap_open > 0:
        raise ValueError("ANW kernel requires gap_open <= 0")
    if interpret is None:
        interpret = _default_interpret()
    from tpu_align.io.packing import FusedBlob, fuse_bucket_blob

    packed = prestaged
    if packed is None:
        packed = host_pack_tokens(ref_tokens, qry_tokens, ref_len, qry_len)
        if packed is not None:
            # no prestaged upload: fuse host-side so dispatch still costs
            # ONE H2D transfer instead of six (io/packing.FusedBlob)
            packed = fuse_bucket_blob(packed, ref_len, qry_len)
    if isinstance(packed, FusedBlob):
        return _fill_stagger_fused_jit(
            algorithm, params, jnp.asarray(packed.blob),
            packed.b, packed.n4, packed.m4,
            with_traceback=with_traceback, interpret=interpret,
            stripe_s=stripe_s,
        )
    if packed is not None:  # legacy prestaged 4-tuple (already on device)
        return _fill_stagger_packed_jit(
            algorithm, params, *(jnp.asarray(p) for p in packed),
            jnp.asarray(ref_len), jnp.asarray(qry_len),
            with_traceback=with_traceback, interpret=interpret,
            stripe_s=stripe_s,
        )
    return _fill_stagger_jit(
        algorithm, params,
        jnp.asarray(ref_tokens), jnp.asarray(qry_tokens),
        jnp.asarray(ref_len), jnp.asarray(qry_len),
        with_traceback=with_traceback, interpret=interpret,
        stripe_s=stripe_s,
    )


def fill_stagger_bucket(
    algorithm: Algorithm,
    params: AlignmentParams,
    ref_tokens, qry_tokens, ref_len, qry_len,
    with_traceback: bool = True,
    interpret: bool | None = None,
    stripe_s: int = STRIPE_S,
) -> BucketFill:
    """Stagger fill (synchronous); dirs use the stagger word layout, tagged
    with BucketFill.stagger = stripe width S."""
    scores, srow, scol, dirs = fill_stagger_bucket_async(
        algorithm, params, ref_tokens, qry_tokens, ref_len, qry_len,
        with_traceback=with_traceback, interpret=interpret,
        stripe_s=stripe_s,
    )
    return BucketFill(
        np.asarray(scores), np.asarray(srow), np.asarray(scol),
        np.asarray(dirs) if dirs is not None else None,
        stagger=stripe_s,
    )
