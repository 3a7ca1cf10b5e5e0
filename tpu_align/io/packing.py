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

import dataclasses

import numpy as np


@dataclasses.dataclass(frozen=True)
class FusedBlob:
    """One bucket's entire upload as a single flat uint8 device array.

    The tunnel charges ~24 ms of dispatch overhead PER TRANSFER on top of
    bandwidth (scripts/probe_tunnel.py), so the six per-bucket arrays
    (ref/qry packed tokens, two 4-byte LUTs, two int32 length vectors)
    are concatenated host-side and `device_put` once; the fill jit slices
    them back apart on device (defuse_bucket_blob -- pure relayout, XLA
    fuses it into the kernel's input prologue)."""

    blob: object  # device or numpy uint8 (total,)
    b: int        # bucket batch size
    n4: int       # packed ref bytes per pair (ref_n // 4)
    m4: int       # packed qry bytes per pair (qry_n // 4)


def fuse_bucket_blob(packed, ref_len, qry_len) -> FusedBlob:
    """Flatten (ref_packed, ref_lut, qry_packed, qry_lut) + both length
    vectors into one uint8 buffer.  Lengths are serialized explicitly
    little-endian so the device-side reconstruction (shift/or in
    defuse_bucket_blob) is host-endianness-independent."""
    rp, rlut, qp, qlut = packed
    b, n4 = rp.shape
    m4 = qp.shape[1]
    rl = np.ascontiguousarray(ref_len, dtype="<i4").view(np.uint8)
    ql = np.ascontiguousarray(qry_len, dtype="<i4").view(np.uint8)
    blob = np.concatenate([
        rp.reshape(-1), qp.reshape(-1),
        np.ascontiguousarray(rlut, np.uint8),
        np.ascontiguousarray(qlut, np.uint8),
        rl.reshape(-1), ql.reshape(-1),
    ])
    return FusedBlob(blob, b, n4, m4)


def defuse_bucket_blob(fb_blob, b: int, n4: int, m4: int):
    """jnp inverse of fuse_bucket_blob (inside jit): returns
    (ref_packed, ref_lut, qry_packed, qry_lut, ref_len, qry_len)."""
    import jax.numpy as jnp

    o = 0
    rp = fb_blob[o:o + b * n4].reshape(b, n4); o += b * n4
    qp = fb_blob[o:o + b * m4].reshape(b, m4); o += b * m4
    rlut = fb_blob[o:o + 4]; o += 4
    qlut = fb_blob[o:o + 4]; o += 4

    def _i32(raw):  # (B*4,) LE bytes -> (B,) int32
        u = raw.reshape(b, 4).astype(jnp.uint32)
        v = u[:, 0] | (u[:, 1] << 8) | (u[:, 2] << 16) | (u[:, 3] << 24)
        return v.astype(jnp.int32)

    rl = _i32(fb_blob[o:o + 4 * b]); o += 4 * b
    ql = _i32(fb_blob[o:o + 4 * b])
    return rp, rlut, qp, qlut, rl, ql


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
