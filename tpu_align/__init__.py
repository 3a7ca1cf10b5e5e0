"""tpu-align: a TPU-native pairwise sequence-alignment framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the DPX GPU
genomics reference project (four DP aligners -- linear-gap Needleman-Wunsch,
linear-gap Smith-Waterman, affine-gap Gotoh Needleman-Wunsch, and banded
Smith-Waterman -- with exact scores and full tracebacks over large pair
batches).

Layering (see SURVEY.md section 7):
  core/        problem model: algorithms, scoring params, direction codes
  ops/         DPX-equivalent vector ops (the TPU analogue of FakeDPX)
  io/          pair-file parsing, length bucketing, output formatting
  oracle/      NumPy reference aligners (the behavioral spec + golden generator)
  kernels/     Pallas TPU wavefront-fill kernels (batch-across-lanes design)
  traceback/   device transcript builder + host string formatter
  runtime/     batch engine, phase profiler, GCUPS accounting
  distributed/ shard_map data parallelism over a `pairs` mesh axis
  utils/       synthetic datasets, output reordering
"""

from tpu_align.core.params import AlignmentParams, Algorithm

__version__ = "0.1.0"

__all__ = ["AlignmentParams", "Algorithm", "__version__"]
