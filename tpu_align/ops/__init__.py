from tpu_align.ops import dpx

__all__ = ["dpx"]
