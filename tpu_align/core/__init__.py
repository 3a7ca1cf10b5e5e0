from tpu_align.core.params import AlignmentParams, Algorithm
from tpu_align.core import directions

__all__ = ["AlignmentParams", "Algorithm", "directions"]
