"""Pallas TPU wavefront-fill kernels."""

from tpu_align.kernels.fill import BucketFill, fill_bucket

__all__ = ["BucketFill", "fill_bucket"]
