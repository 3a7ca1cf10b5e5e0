"""Pallas TPU wavefront-fill kernels."""

from tpu_align.kernels.fill import BucketFill, fill_bucket, fill_bucket_async
from tpu_align.kernels.banded import (
    fill_banded_bucket,
    fill_banded_bucket_async,
)

__all__ = [
    "BucketFill",
    "fill_bucket",
    "fill_bucket_async",
    "fill_banded_bucket",
    "fill_banded_bucket_async",
]
