"""TPU-equivalents of the CUDA DPX intrinsics (the reference's FakeDPX layer).

The reference defines its scoring idiom on 34 fused min/max/add SIMD
intrinsics (c++/FakeDPX.hpp:12-127, emulated on CPU in c++/FakeDPX.cpp and
hardware-native in the .cu kernels).  On TPU every lane of an (8,128) vreg
is already SIMD, so these become ordinary jnp elementwise expressions that
XLA fuses into single VPU ops; we provide them so scoring code reads like
the reference's intrinsic idiom and so the reference's unit-test suite
(c++/testFakeDPX.cpp) carries over verbatim.

All functions are elementwise and jit/pallas-safe:
  * `*_s32` variants take/return int32 arrays (or Python ints).
  * `*_u32` variants take/return uint32 arrays.
  * `*_s16x2`/`*_u16x2` variants take/return uint32 arrays holding two packed
    16-bit lanes, exactly like the CUDA register format
    (cuda/LNW/LinearNeedlemanWunschV19.cu:17-24 pack/unpack).
  * `vib*` variants return (value, predicate) tuples instead of writing
    through pointers; predicates are boolean arrays with the reference's
    `a >= b` tie semantics (FakeDPX.cpp:145-153).

The x2 variants exist for API parity and for the packed-s16x2 kernel
experiments; the production kernels use whole int16/int32 vregs instead of
packing two logical lanes per 32-bit word (a vreg already holds 1024 lanes).
"""

from __future__ import annotations

import jax.numpy as jnp

_U32 = jnp.uint32
_I32 = jnp.int32


def _as_i32(x):
    return jnp.asarray(x, _I32)


def _as_u32(x):
    return jnp.asarray(x, _U32)


# ---------------------------------------------------------------------------
# s16x2 pack/unpack helpers (public: kernels and tests use them)
# ---------------------------------------------------------------------------


def pack_s16x2(hi, lo):
    """Pack two int16 lanes into one uint32: hi in bits[31:16], lo in [15:0].

    Mirrors pack_s16x2 in cuda/LNW/LinearNeedlemanWunschV19.cu:17-19.
    """
    hi = jnp.asarray(hi, _I32)
    lo = jnp.asarray(lo, _I32)
    return ((hi.astype(_U32) << 16) | (lo.astype(_U32) & _U32(0xFFFF))).astype(_U32)


def unpack_s16x2(x):
    """Unpack a uint32 into two sign-extended int32 lanes (hi, lo)."""
    x = _as_u32(x).astype(_I32)
    hi = x >> 16  # arithmetic shift sign-extends
    lo = (x << 16) >> 16
    return hi, lo


def _unpack_u16x2(x):
    x = _as_u32(x)
    return (x >> 16).astype(_I32), (x & _U32(0xFFFF)).astype(_I32)


def _pack_u16x2(hi, lo):
    return ((hi.astype(_U32) & _U32(0xFFFF)) << 16) | (lo.astype(_U32) & _U32(0xFFFF))


def _map_s16x2(fn, *args):
    """Apply an int32-lane fn independently to hi/lo halfword lanes."""
    his, los = zip(*(unpack_s16x2(a) for a in args))
    return _pack_u16x2(fn(*his), fn(*los))


def _map_u16x2(fn, *args):
    his, los = zip(*(_unpack_u16x2(a) for a in args))
    return _pack_u16x2(fn(*his), fn(*los))


# ---------------------------------------------------------------------------
# 3-way max/min (FakeDPX.cpp:11-93)
# ---------------------------------------------------------------------------


def vimax3_s32(a, b, c):
    return jnp.maximum(jnp.maximum(_as_i32(a), _as_i32(b)), _as_i32(c))


def vimin3_s32(a, b, c):
    return jnp.minimum(jnp.minimum(_as_i32(a), _as_i32(b)), _as_i32(c))


def vimax3_u32(a, b, c):
    return jnp.maximum(jnp.maximum(_as_u32(a), _as_u32(b)), _as_u32(c))


def vimin3_u32(a, b, c):
    return jnp.minimum(jnp.minimum(_as_u32(a), _as_u32(b)), _as_u32(c))


def vimax3_s16x2(a, b, c):
    return _map_s16x2(lambda x, y, z: jnp.maximum(jnp.maximum(x, y), z), a, b, c)


def vimin3_s16x2(a, b, c):
    return _map_s16x2(lambda x, y, z: jnp.minimum(jnp.minimum(x, y), z), a, b, c)


def vimax3_u16x2(a, b, c):
    return _map_u16x2(lambda x, y, z: jnp.maximum(jnp.maximum(x, y), z), a, b, c)


def vimin3_u16x2(a, b, c):
    return _map_u16x2(lambda x, y, z: jnp.minimum(jnp.minimum(x, y), z), a, b, c)


# ---------------------------------------------------------------------------
# ReLU-fused variants (FakeDPX.cpp:95-143): result clamped to >= 0
# ---------------------------------------------------------------------------


def vimax_s32_relu(a, b):
    return jnp.maximum(jnp.maximum(_as_i32(a), _as_i32(b)), _I32(0))


def vimin_s32_relu(a, b):
    return jnp.maximum(jnp.minimum(_as_i32(a), _as_i32(b)), _I32(0))


def vimax_s16x2_relu(a, b):
    return _map_s16x2(lambda x, y: jnp.maximum(jnp.maximum(x, y), 0), a, b)


def vimin_s16x2_relu(a, b):
    return _map_s16x2(lambda x, y: jnp.maximum(jnp.minimum(x, y), 0), a, b)


def vimax3_s32_relu(a, b, c):
    return jnp.maximum(vimax3_s32(a, b, c), _I32(0))


def vimin3_s32_relu(a, b, c):
    return jnp.maximum(vimin3_s32(a, b, c), _I32(0))


def vimax3_s16x2_relu(a, b, c):
    return _map_s16x2(
        lambda x, y, z: jnp.maximum(jnp.maximum(jnp.maximum(x, y), z), 0), a, b, c
    )


def vimin3_s16x2_relu(a, b, c):
    return _map_s16x2(
        lambda x, y, z: jnp.maximum(jnp.minimum(jnp.minimum(x, y), z), 0), a, b, c
    )


# ---------------------------------------------------------------------------
# Predicate-returning max/min (FakeDPX.cpp:145-294)
#
# Predicate semantics: pred is True iff the FIRST argument wins, with ties
# going to the first argument (`a >= b`, FakeDPX.cpp:145-153).  This `>=` is
# what fixes the reference's traceback tie-breaking (SURVEY.md section 7
# "tie-breaking parity") -- every caller layers direction selection on it.
# ---------------------------------------------------------------------------


def vibmax_s32(a, b):
    a, b = _as_i32(a), _as_i32(b)
    pred = a >= b
    return jnp.where(pred, a, b), pred


def vibmin_s32(a, b):
    a, b = _as_i32(a), _as_i32(b)
    pred = a <= b
    return jnp.where(pred, a, b), pred


def vibmax_u32(a, b):
    a, b = _as_u32(a), _as_u32(b)
    pred = a >= b
    return jnp.where(pred, a, b), pred


def vibmin_u32(a, b):
    a, b = _as_u32(a), _as_u32(b)
    pred = a <= b
    return jnp.where(pred, a, b), pred


def _vib_x2(a_lanes, b_lanes, op_ge):
    preds, vals = [], []
    for x, y in zip(a_lanes, b_lanes):
        p = (x >= y) if op_ge else (x <= y)
        preds.append(p)
        vals.append(jnp.where(p, x, y))
    return vals, preds


def vibmax_s16x2(a, b):
    """Returns (packed_max, pred_hi, pred_lo) -- FakeDPX.cpp:185-210."""
    (ah, al), (bh, bl) = unpack_s16x2(a), unpack_s16x2(b)
    (vh, vl), (ph, pl) = _vib_x2((ah, al), (bh, bl), op_ge=True)
    return _pack_u16x2(vh, vl), ph, pl


def vibmin_s16x2(a, b):
    (ah, al), (bh, bl) = unpack_s16x2(a), unpack_s16x2(b)
    (vh, vl), (ph, pl) = _vib_x2((ah, al), (bh, bl), op_ge=False)
    return _pack_u16x2(vh, vl), ph, pl


def vibmax_u16x2(a, b):
    (ah, al), (bh, bl) = _unpack_u16x2(a), _unpack_u16x2(b)
    (vh, vl), (ph, pl) = _vib_x2((ah, al), (bh, bl), op_ge=True)
    return _pack_u16x2(vh, vl), ph, pl


def vibmin_u16x2(a, b):
    (ah, al), (bh, bl) = _unpack_u16x2(a), _unpack_u16x2(b)
    (vh, vl), (ph, pl) = _vib_x2((ah, al), (bh, bl), op_ge=False)
    return _pack_u16x2(vh, vl), ph, pl


# ---------------------------------------------------------------------------
# Fused add + max/min (FakeDPX.cpp:296-369) and +ReLU (FakeDPX.cpp:371-404)
# viaddmax(a, b, c) = max(a + b, c)
# ---------------------------------------------------------------------------


def viaddmax_s32(a, b, c):
    return jnp.maximum(_as_i32(a) + _as_i32(b), _as_i32(c))


def viaddmin_s32(a, b, c):
    return jnp.minimum(_as_i32(a) + _as_i32(b), _as_i32(c))


def viaddmax_u32(a, b, c):
    return jnp.maximum(_as_u32(a) + _as_u32(b), _as_u32(c))


def viaddmin_u32(a, b, c):
    return jnp.minimum(_as_u32(a) + _as_u32(b), _as_u32(c))


def _addwrap16(x, y):
    """int16 wraparound addition in int32 lanes (halfword register semantics)."""
    s = x + y
    return (s << 16) >> 16


def viaddmax_s16x2(a, b, c):
    return _map_s16x2(lambda x, y, z: jnp.maximum(_addwrap16(x, y), z), a, b, c)


def viaddmin_s16x2(a, b, c):
    return _map_s16x2(lambda x, y, z: jnp.minimum(_addwrap16(x, y), z), a, b, c)


def viaddmax_u16x2(a, b, c):
    return _map_u16x2(
        lambda x, y, z: jnp.maximum((x + y) & 0xFFFF, z), a, b, c
    )


def viaddmin_u16x2(a, b, c):
    return _map_u16x2(
        lambda x, y, z: jnp.minimum((x + y) & 0xFFFF, z), a, b, c
    )


def viaddmax_s32_relu(a, b, c):
    return jnp.maximum(viaddmax_s32(a, b, c), _I32(0))


def viaddmin_s32_relu(a, b, c):
    return jnp.maximum(viaddmin_s32(a, b, c), _I32(0))


def viaddmax_s16x2_relu(a, b, c):
    return _map_s16x2(
        lambda x, y, z: jnp.maximum(jnp.maximum(_addwrap16(x, y), z), 0), a, b, c
    )


def viaddmin_s16x2_relu(a, b, c):
    return _map_s16x2(
        lambda x, y, z: jnp.maximum(jnp.minimum(_addwrap16(x, y), z), 0), a, b, c
    )
