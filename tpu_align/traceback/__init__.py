"""Traceback layer: packed-direction-word decoding and alignment strings."""

from tpu_align.traceback.host import traceback_bucket, unpack_pair_dirs

__all__ = ["traceback_bucket", "unpack_pair_dirs"]
