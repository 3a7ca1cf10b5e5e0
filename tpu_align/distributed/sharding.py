"""shard_map data parallelism over a 1-D `pairs` mesh axis.

The reference is single-GPU/single-node (SURVEY.md section 2.5: SLURM
requests exactly 1 node / 1 task, c++/runjob:7-8); the TPU framework is
first-class multi-chip.  The natural mapping for pairwise alignment is pure
data parallelism over pair batches: no DP-cell dependency ever crosses a
pair boundary, so each chip runs the fill kernel on its shard of the batch
over ICI-free compute, and collectives (`psum`/`pmax`) appear only for
run-level stats -- score maxima, GCUPS cell counts -- exactly the role
the reference's host-side aggregation plays (V19.cu:662-673).

Works identically on a real TPU slice and on a virtual
`--xla_force_host_platform_device_count=N` CPU mesh (tests/conftest.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from tpu_align.core.params import Algorithm, AlignmentParams
from tpu_align.io.bucketing import BucketSpec
from tpu_align.kernels.fill import _fill_jit
from tpu_align.kernels.stagger import _fill_stagger_jit

PAIRS_AXIS = "pairs"


def make_pairs_mesh(devices=None) -> Mesh:
    """1-D mesh over all (or the given) devices: the `pairs` data axis.

    On a multi-host slice ICI/DCN placement follows jax.devices() order;
    pair batches have no cross-chip traffic so topology barely matters.
    """
    devices = devices if devices is not None else jax.devices()
    import numpy as np

    return Mesh(np.asarray(devices), (PAIRS_AXIS,))


def shard_bucket_spec(mesh: Mesh, spec: BucketSpec | None = None) -> BucketSpec:
    """Adjust a BucketSpec so every bucket batch divides evenly across the
    mesh with a kernel-legal (multiple-of-8) per-device remainder."""
    spec = spec or BucketSpec()
    n = mesh.devices.size
    return BucketSpec(
        query_multiple=spec.query_multiple,
        ref_multiple=spec.ref_multiple,
        batch_pairs=max(spec.batch_pairs, 8 * n),
        pair_multiple=8 * n,
    )


def fill_sharded(
    mesh: Mesh,
    algorithm: Algorithm,
    params: AlignmentParams,
    ref_tokens,
    qry_tokens,
    ref_len,
    qry_len,
    with_traceback: bool = True,
    interpret: bool | None = None,
    kernel: str = "stagger",
    stripe_s: int | None = None,
):
    """Run the fill kernel data-parallel over the mesh's `pairs` axis.

    Inputs are host-global (B, ...) arrays with B divisible by
    8 * mesh size; outputs are global arrays sharded on the batch axis.
    Returns (scores, start_row, start_col, dirs-or-None) as JAX arrays.
    kernel selects the fill formulation ("stagger" default, "rowscan",
    or "banded" -- forced for the banded aligner); stripe_s the stagger
    stripe width (dirs layout (stripes, W, stripe_s, B) -- the walkers
    must be told the same value, which the engine guarantees).
    """
    from tpu_align.kernels.stagger import STRIPE_S

    if stripe_s is None:
        stripe_s = STRIPE_S
    if interpret is None:
        from tpu_align.kernels.fill import _default_interpret

        interpret = _default_interpret()
    if algorithm.is_banded:
        kernel = "banded"
    b = ref_tokens.shape[0]
    n_dev = mesh.devices.size
    if b % (8 * n_dev):
        raise ValueError(f"batch {b} not divisible by 8*{n_dev} devices")
    stagger = kernel == "stagger"

    out_specs = (P(PAIRS_AXIS), P(PAIRS_AXIS), P(PAIRS_AXIS))
    if with_traceback:
        # direction words: stagger (stripes, W, S, B) -- batch on axis 3;
        # rowscan word-major (MW, B, N) and banded skewed (MW, B, K8) --
        # batch on axis 1
        out_specs += ((P(None, None, None, PAIRS_AXIS),) if stagger
                      else (P(None, PAIRS_AXIS, None),))

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(PAIRS_AXIS, None), P(PAIRS_AXIS, None), P(PAIRS_AXIS),
                  P(PAIRS_AXIS)),
        out_specs=out_specs,
        check_vma=False,  # pallas_call out_shapes carry no vma metadata
    )
    def _local_fill(rt, qt, rl, ql):
        lb = rt.shape[0]
        if kernel == "banded":
            from tpu_align.kernels.banded import _fill_banded_jit
            scores, srow, scol, dirs = _fill_banded_jit(
                params, rt, qt, rl, ql,
                with_traceback=with_traceback, interpret=interpret,
            )
        elif stagger:
            scores, srow, scol, dirs = _fill_stagger_jit(
                algorithm, params, rt, qt, rl, ql,
                with_traceback=with_traceback, interpret=interpret,
                stripe_s=stripe_s,
            )
        else:
            scores, srow, scol, dirs = _fill_jit(
                algorithm, params, rt, qt, rl, ql,
                with_traceback=with_traceback, interpret=interpret,
            )
        # the kernel pads each shard to full 128-lane tiles internally;
        # slice back so shard concatenation preserves global pair order
        scores, srow, scol = scores[:lb], srow[:lb], scol[:lb]
        if with_traceback:
            return (scores, srow, scol,
                    dirs[..., :lb] if stagger else dirs[:, :lb, :])
        return scores, srow, scol

    outs = _local_fill(
        jnp.asarray(ref_tokens), jnp.asarray(qry_tokens),
        jnp.asarray(ref_len), jnp.asarray(qry_len),
    )
    if with_traceback:
        return outs
    return outs + (None,)


def walk_sharded_dispatch(
    mesh: Mesh,
    algorithm: Algorithm,
    params: AlignmentParams,
    dirs, start_row, start_col, scores,
    stripe_s: int,
    extras: tuple = (),
    walker: str = "xla",
):
    """Device traceback walk, data-parallel over the `pairs` axis: each
    chip walks its own shard of the stagger direction words (the walk is
    per-pair independent), so the full V8 pipeline -- fill + on-device
    walk -- runs sharded and only packed move streams leave the devices.
    Returns a handle for traceback.device.device_walk_finalize (the same
    doubling-retry contract as the single-device dispatch); `extras`
    arrays ride the same readback (see device_walk_dispatch).

    Each shard phases independently (like the Pallas walker's lane
    groups), so stream POSITIONS differ across shards; per-lane move
    sequences are the contract.  Returns (packed (T16, B) np, steps int);
    retries with a doubled phase budget on exhaustion (pmax-reduced).

    The banded aligner walks its skewed (MW, B, K8) dirs with the banded
    walker (stripe_s is ignored).

    NOTE: the walker selection below (budget + pallas cap + degrade-to-
    XLA) mirrors device_walk_dispatch (traceback/device.py) with the
    shard-local batch in the cap; harden both together."""
    from tpu_align.kernels.fill import bits_per_cell
    from tpu_align.traceback.device import (
        _device_walk,
        _device_walk_banded,
        _walk_phase_budget,
    )
    from tpu_align.traceback.host import _check_affine_walkable

    _check_affine_walkable(algorithm)  # EF-bits knob: refuse, don't corrupt

    n_sh = mesh.devices.size
    if algorithm.is_banded:
        mw, b_glob, k8 = dirs.shape
        t_max = _walk_phase_budget(mw * 16, k8, 1)
        dirs_spec = P(None, PAIRS_AXIS, None)
        xla_local = lambda d, sr, sc, s, t: _device_walk_banded(  # noqa: E731
            params, d, sr, sc, s, t)
        if walker == "pallas":
            from tpu_align.traceback.walk_kernel import (
                device_walk_pallas_banded,
                pallas_banded_t_max_cap,
            )

            cap = pallas_banded_t_max_cap((mw, b_glob // n_sh, k8))
            local = lambda d, sr, sc, s, t: (  # noqa: E731
                device_walk_pallas_banded(params, d, sr, sc, s, t)
                if t <= cap else xla_local(d, sr, sc, s, t))
        else:
            local = xla_local
    else:
        stripes, W, S, b_glob = dirs.shape
        spw = 32 // bits_per_cell(algorithm)
        t_max = _walk_phase_budget(stripes * stripe_s, W, spw)
        dirs_spec = P(None, None, None, PAIRS_AXIS)
        xla_local = lambda d, sr, sc, s, t: _device_walk(  # noqa: E731
            algorithm, params, d, sr, sc, s, stripe_s, t)
        if walker == "pallas":
            from tpu_align.traceback.walk_kernel import (
                device_walk_pallas,
                pallas_t_max_cap,
            )

            # VMEM cap on the SHARD-local batch (each chip walks B/n)
            cap = pallas_t_max_cap((stripes, W, S, b_glob // n_sh))
            local = lambda d, sr, sc, s, t: (  # noqa: E731
                device_walk_pallas(algorithm, params, d, sr, sc, s,
                                   stripe_s, t)
                if t <= cap else xla_local(d, sr, sc, s, t))
        else:
            local = xla_local

    def _run(t_max):
        @functools.partial(
            shard_map, mesh=mesh,
            in_specs=(dirs_spec, P(PAIRS_AXIS), P(PAIRS_AXIS),
                      P(PAIRS_AXIS)),
            out_specs=(P(None, PAIRS_AXIS), P()),
            check_vma=False,
        )
        def _local_walk(d, sr, sc, s):
            packed, t = local(d, sr, sc, s, t_max)
            return packed, jax.lax.pmax(t, PAIRS_AXIS)

        return _local_walk(dirs, jnp.asarray(start_row),
                           jnp.asarray(start_col), jnp.asarray(scores))

    packed, t = _run(t_max)
    extras = tuple(extras)
    from tpu_align.traceback.device import _copy_to_host_async
    _copy_to_host_async((packed, t) + extras)
    return _run, packed, t, t_max, extras


def walk_sharded(
    mesh: Mesh,
    algorithm: Algorithm,
    params: AlignmentParams,
    dirs, start_row, start_col, scores,
    stripe_s: int,
    walker: str = "xla",
):
    """Blocking sharded device walk: dispatch + finalize (doubling the
    phase budget on exhaustion).  Returns (packed (T16, B) np, steps)."""
    from tpu_align.traceback.device import device_walk_finalize

    return device_walk_finalize(walk_sharded_dispatch(
        mesh, algorithm, params, dirs, start_row, start_col, scores,
        stripe_s, walker=walker,
    ))


def global_stats(mesh: Mesh, scores, cells):
    """All-reduce run-level stats over the mesh: (max score, total cells).

    The only collectives in the framework -- psum/pmax over the pairs axis
    (SURVEY.md section 2.5 note 7)."""

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(PAIRS_AXIS), P(PAIRS_AXIS)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def _reduce(s, c):
        return (
            jax.lax.pmax(jnp.max(s, keepdims=True), PAIRS_AXIS),
            jax.lax.psum(jnp.sum(c, keepdims=True), PAIRS_AXIS),
        )

    mx, total = _reduce(jnp.asarray(scores), jnp.asarray(cells))
    return mx[0], total[0]
