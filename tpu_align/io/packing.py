"""2-bit token packing for host->device uploads.

The remote-TPU tunnel moves ~35 MB/s (scripts/probe_tunnel.py), so the
(B, N) uint8 token arrays -- 512 padded bytes/pair at read scale -- are
the single largest end-to-end transfer.  DNA needs 2 bits/base: the host
packs 4 bases/byte with a per-bucket 4-entry LUT, and the device unpacks
with a few fused element ops before the fill kernel (XLA folds the unpack
into the kernel's input relayout; the cost is unmeasurable against the
4x smaller upload).

The reference has no analogue (PCIe made its 597 kB uploads free,
BASELINE.md spgpu row); this is a TPU-deployment-shaped optimization.

Packing is exact: pad bytes beyond each pair's length are regenerated
from the length mask, so unpack(pack(x)) == x for every byte the kernels
may read.  Sequences over alphabets larger than 4 symbols fall back to
the raw byte upload (maybe_pack_tokens returns None).
"""

from __future__ import annotations

import numpy as np


def maybe_pack_tokens(tokens: np.ndarray, lens: np.ndarray):
    """Pack (B, N) uint8 tokens to (B, N//4) uint8 if the real content
    (first lens[b] bytes per row) uses <= 4 distinct byte values and N is
    a multiple of 4.  Returns (packed, lut (4,) uint8) or None."""
    b, n = tokens.shape
    if n % 4 or b == 0:
        return None
    from tpu_align.native import native_pack_2bit

    nat = native_pack_2bit(tokens, np.asarray(lens))
    if nat is not None:
        return None if len(nat) == 3 else nat  # 3-tuple = wide alphabet
    col = np.arange(n, dtype=np.int64)
    mask = col < np.asarray(lens).reshape(-1, 1)
    seen = np.zeros(256, bool)
    seen[tokens.reshape(-1)] = True  # includes pad bytes
    # pads (0 / 1, io.bucketing) are regenerated on unpack; only count
    # values that appear inside real content
    real_vals = np.unique(tokens[mask]) if mask.any() else np.zeros(0, np.uint8)
    if real_vals.size > 4:
        return None
    lut = np.zeros(4, np.uint8)
    if real_vals.size:
        lut[: real_vals.size] = real_vals
        lut[real_vals.size :] = real_vals[0]
    inv = np.zeros(256, np.uint8)
    inv[lut] = np.arange(4, dtype=np.uint8)
    fill = lut[0]
    codes = inv[np.where(mask, tokens, fill)]
    packed = (
        codes[:, 0::4]
        | (codes[:, 1::4] << 2)
        | (codes[:, 2::4] << 4)
        | (codes[:, 3::4] << 6)
    )
    return np.ascontiguousarray(packed), lut


def unpack_tokens(packed, lut, lens, pad: int, n: int):
    """jnp inverse of maybe_pack_tokens: (B, N//4) uint8 + lut -> (B, N)
    uint8 with pad bytes regenerated beyond each row's length."""
    import jax.numpy as jnp

    b = packed.shape[0]
    shifts = jnp.array([0, 2, 4, 6], jnp.uint8)
    codes = (packed[:, :, None] >> shifts[None, None, :]) & 3
    toks = jnp.take(jnp.asarray(lut), codes.astype(jnp.int32)).reshape(b, n)
    col = jnp.arange(n, dtype=jnp.int32)[None, :]
    return jnp.where(col < jnp.asarray(lens).reshape(-1, 1).astype(jnp.int32),
                     toks, jnp.uint8(pad))
