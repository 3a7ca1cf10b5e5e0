"""ctypes binding to the native runtime (native/libtpualign.so)."""

from tpu_align.native.binding import (
    available,
    native_parse_pair_bytes,
    native_replay_moves,
    native_traceback_bucket,
)

__all__ = ["available", "native_parse_pair_bytes", "native_replay_moves",
           "native_traceback_bucket"]
