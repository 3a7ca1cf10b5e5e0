"""ctypes binding to the native runtime (native/libtpualign.so)."""

from tpu_align.native.binding import (
    available,
    native_format_blocks,
    native_gather_padded,
    native_gather_parts,
    native_gather_spans,
    native_pack_2bit,
    native_parse_pair_bytes,
    native_events_block_lens,
    native_replay_events,
    native_replay_events_blocks,
    native_replay_moves,
    native_traceback_bucket,
)

__all__ = ["available", "native_format_blocks", "native_gather_padded",
           "native_gather_parts", "native_gather_spans", "native_pack_2bit",
           "native_parse_pair_bytes", "native_events_block_lens",
           "native_replay_events",
           "native_replay_events_blocks",
           "native_replay_moves", "native_traceback_bucket"]
