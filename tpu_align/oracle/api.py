"""Convenience entry points for the NumPy oracle."""

from __future__ import annotations

from tpu_align.core.params import Algorithm, AlignmentParams
from tpu_align.core.result import AlignmentResult
from tpu_align.oracle.scalar import fill_scalar
from tpu_align.oracle.vectorized import fill_vectorized
from tpu_align.oracle.traceback import traceback_pair


def align_pair(
    algorithm: Algorithm,
    params: AlignmentParams,
    reference: str,
    query: str,
    pair_num: int = 0,
    engine: str = "vectorized",
    local_mode: str = "single",
    tie_policy: str = "cuda",
) -> AlignmentResult:
    fill_fn = fill_vectorized if engine == "vectorized" else fill_scalar
    fill = fill_fn(algorithm, params, reference, query, tie_policy=tie_policy)
    return traceback_pair(fill, reference, query, pair_num,
                          local_mode=local_mode, params=params)


def align_batch(
    algorithm: Algorithm,
    params: AlignmentParams,
    pairs,
    engine: str = "vectorized",
    local_mode: str = "single",
) -> list[AlignmentResult]:
    """Align [(reference, query), ...]; pair numbering follows input order."""
    return [
        align_pair(algorithm, params, ref, qry, pair_num=i, engine=engine,
                   local_mode=local_mode)
        for i, (ref, qry) in enumerate(pairs)
    ]
