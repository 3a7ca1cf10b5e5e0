"""NumPy reference aligners: the behavioral spec and golden-file generator.

The reference project validated its outputs against an external web oracle
(web-scraper.py driving the Freiburg RNA Teaching tools) whose golden files
are LFS-absent; this package *is* the missing oracle (SURVEY.md section 4
"Implication for the TPU build").  Two independent implementations
cross-check each other:

  scalar.py     -- cell-at-a-time fill, a direct statement of the reference
                   recurrences and `>=` tie-break semantics; trivially
                   auditable, used as ground truth in tests.
  vectorized.py -- row-sweep NumPy fill using the linear-gap prefix-scan
                   identity (the "lazy-F" decomposition for affine);
                   produces bit-identical matrices, fast enough to generate
                   golden files for 100k-pair workloads.

Both produce the same FillResult; traceback.py turns direction matrices into
alignment strings exactly like c++/backtrack.cpp.
"""

from tpu_align.oracle.scalar import fill_scalar
from tpu_align.oracle.vectorized import fill_vectorized
from tpu_align.oracle.traceback import lnw_all_paths, traceback_pair
from tpu_align.oracle.api import align_pair, align_batch
from tpu_align.oracle.lcs import lcs, lcs_matrix

__all__ = [
    "fill_scalar",
    "fill_vectorized",
    "traceback_pair",
    "lnw_all_paths",
    "align_pair",
    "align_batch",
    "lcs",
    "lcs_matrix",
]
