from tpu_align.core.params import AlignmentParams, Algorithm, score_dtype_for
from tpu_align.core import directions

__all__ = ["AlignmentParams", "Algorithm", "score_dtype_for", "directions"]
