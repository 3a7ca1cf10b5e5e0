"""ctypes loader + wrappers for the native runtime (native/tpualign.cpp).

The shared library is looked up next to the repo's native/ directory and in
the package directory; if absent, a build via `make -C native` is attempted
once.  Callers must handle `available() == False` (pure-Python fallbacks
exist for every native entry point).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_lock = threading.Lock()
_lib = None
_tried = False

_ALGO_CODE = {"lnw": 0, "lsw": 1, "anw": 2, "bsw": 3}


def _candidate_paths():
    here = os.path.dirname(os.path.abspath(__file__))
    repo = os.path.dirname(os.path.dirname(here))
    return [
        os.path.join(repo, "native", "libtpualign.so"),
        os.path.join(here, "libtpualign.so"),
    ]


def _try_build() -> None:
    here = os.path.dirname(os.path.abspath(__file__))
    repo = os.path.dirname(os.path.dirname(here))
    native_dir = os.path.join(repo, "native")
    if not os.path.exists(os.path.join(native_dir, "Makefile")):
        return
    try:
        subprocess.run(
            ["make", "-C", native_dir],
            check=True, capture_output=True, timeout=120,
        )
    except Exception:
        pass


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        for attempt in range(2):
            for path in _candidate_paths():
                if os.path.exists(path):
                    try:
                        lib = ctypes.CDLL(path)
                    except OSError:
                        continue
                    _configure(lib)
                    _lib = lib
                    return _lib
            if attempt == 0:
                _try_build()
        return None


def _configure(lib) -> None:
    i64 = ctypes.c_int64
    lib.ta_traceback_bucket.restype = ctypes.c_int
    lib.ta_traceback_bucket.argtypes = [
        ctypes.c_int, i64, i64, i64, i64, i64, i64, i64, i64,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, i64,
        ctypes.POINTER(ctypes.c_int32),  # dirs
        ctypes.POINTER(ctypes.c_uint8),  # ref_tokens
        ctypes.POINTER(ctypes.c_uint8),  # qry_tokens
        ctypes.POINTER(ctypes.c_int32),  # ref_len
        ctypes.POINTER(ctypes.c_int32),  # qry_len
        ctypes.POINTER(ctypes.c_int32),  # start_row
        ctypes.POINTER(ctypes.c_int32),  # start_col
        ctypes.POINTER(ctypes.c_int32),  # scores
        ctypes.c_char_p,                 # out_buf
        i64,                             # out_stride
        ctypes.POINTER(ctypes.c_int32),  # out_lens
        ctypes.c_int,                    # num_threads
    ]
    lib.ta_replay_moves.restype = ctypes.c_int
    lib.ta_replay_moves.argtypes = [
        i64, i64, i64, i64, i64, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32),  # moves
        ctypes.POINTER(ctypes.c_uint8),  # ref_tokens
        ctypes.POINTER(ctypes.c_uint8),  # qry_tokens
        ctypes.POINTER(ctypes.c_int32),  # start_row
        ctypes.POINTER(ctypes.c_int32),  # start_col
        ctypes.POINTER(ctypes.c_int32),  # scores
        ctypes.c_char_p,                 # out_buf
        i64,                             # out_stride
        ctypes.POINTER(ctypes.c_int32),  # out_lens
        ctypes.c_int,                    # num_threads
    ]
    lib.ta_replay_events.restype = ctypes.c_int
    lib.ta_replay_events.argtypes = [
        i64, i64, i64, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint16),  # events (flat)
        ctypes.POINTER(i64),              # ev_off
        ctypes.POINTER(ctypes.c_uint8),  # ref_tokens
        ctypes.POINTER(ctypes.c_uint8),  # qry_tokens
        ctypes.POINTER(ctypes.c_int32),  # start_row
        ctypes.POINTER(ctypes.c_int32),  # start_col
        ctypes.POINTER(ctypes.c_int32),  # scores
        ctypes.c_char_p,                 # out_buf
        i64,                             # out_stride
        ctypes.POINTER(ctypes.c_int32),  # out_lens
        ctypes.POINTER(ctypes.c_int32),  # out_scores (nullable)
        ctypes.c_int,                    # num_threads
    ]
    lib.ta_replay_events_blocks.restype = ctypes.c_int
    lib.ta_replay_events_blocks.argtypes = [
        i64, i64, i64, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint16),  # events (flat)
        ctypes.POINTER(i64),              # ev_off
        ctypes.POINTER(ctypes.c_uint8),  # ref_tokens
        ctypes.POINTER(ctypes.c_uint8),  # qry_tokens
        ctypes.POINTER(ctypes.c_int32),  # start_row
        ctypes.POINTER(ctypes.c_int32),  # start_col
        ctypes.POINTER(ctypes.c_int32),  # scores
        ctypes.POINTER(i64),             # pair_ids
        ctypes.c_char_p,                 # chunk
        i64,                             # blk_stride
        ctypes.POINTER(i64),             # dst_off (nullable)
        ctypes.POINTER(i64),             # spans
        ctypes.c_int,                    # num_threads
    ]
    lib.ta_events_block_lens.restype = None
    lib.ta_events_block_lens.argtypes = [
        i64,
        ctypes.POINTER(ctypes.c_uint16),  # events (flat)
        ctypes.POINTER(i64),              # ev_off
        ctypes.POINTER(ctypes.c_int32),  # start_row
        ctypes.POINTER(i64),             # pair_ids
        ctypes.POINTER(ctypes.c_int32),  # scores
        ctypes.POINTER(i64),             # lens
    ]
    lib.ta_format_blocks.restype = i64
    lib.ta_format_blocks.argtypes = [
        i64,
        ctypes.POINTER(ctypes.c_int32),  # pair_ids
        ctypes.POINTER(ctypes.c_int32),  # scores
        ctypes.c_char_p,                 # out_buf
        i64,                             # out_stride
        ctypes.POINTER(ctypes.c_int32),  # out_lens
        ctypes.c_char_p,                 # dst
        i64,                             # dst_cap
        ctypes.POINTER(i64),             # spans
        ctypes.c_int,                    # num_threads
    ]
    lib.ta_gather_spans.restype = i64
    lib.ta_gather_spans.argtypes = [
        ctypes.c_char_p,                 # src
        ctypes.POINTER(i64),             # spans
        ctypes.POINTER(i64),             # order
        i64,                             # count
        ctypes.c_char_p,                 # dst
    ]
    lib.ta_gather_parts.restype = i64
    lib.ta_gather_parts.argtypes = [
        ctypes.POINTER(ctypes.c_char_p),  # srcs
        ctypes.POINTER(i64),              # spans
        ctypes.POINTER(ctypes.c_int32),   # part_of
        ctypes.POINTER(i64),              # order
        i64,                              # count
        ctypes.c_char_p,                  # dst
        ctypes.c_int,                     # num_threads
    ]
    lib.ta_gather_padded.restype = None
    lib.ta_gather_padded.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(i64),
        ctypes.POINTER(i64), i64, i64, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
    ]
    lib.ta_pack_2bit.restype = ctypes.c_int
    lib.ta_pack_2bit.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(i64), i64, i64,
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int,
    ]
    lib.ta_count_pairs.restype = i64
    lib.ta_count_pairs.argtypes = [ctypes.POINTER(ctypes.c_uint8), i64]
    lib.ta_parse_pairs.restype = i64
    lib.ta_parse_pairs.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), i64, i64,
        ctypes.POINTER(i64), ctypes.POINTER(i64),
        ctypes.POINTER(i64), ctypes.POINTER(i64),
        ctypes.c_int,
    ]


def available() -> bool:
    return _load() is not None


def _ptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def native_traceback_bucket(
    algorithm_value: str,
    dirs: np.ndarray,        # (MW, B_total, N) int32, C-contiguous, or
    #                          (stripes, W, S, B_total) when stagger > 0
    ref_tokens: np.ndarray,  # (B, N) uint8, B <= B_total
    qry_tokens: np.ndarray,  # (B, M) uint8
    ref_len: np.ndarray,     # (B,) int32
    qry_len: np.ndarray,
    start_row: np.ndarray,
    start_col: np.ndarray,
    scores: np.ndarray,
    num_threads: int = 0,
    skew_band: int = 0,
    stagger: int = 0,
    bits: int = 4,
    match: int = 3,
    mismatch: int = -1,
    gap: int = -2,
):
    """Walk a whole bucket natively.  Returns (out_buf, out_lens) where
    out_buf is (B, 3, stride) uint8 with left-aligned ref/rel/qry strings of
    length out_lens[b].  None if the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    if stagger > 0:
        _, stag_w, _, b_total = dirs.shape
        mw, dirs_cols = 0, 0
    else:
        mw, b_total, dirs_cols = dirs.shape
        stag_w = 0
    b, n = ref_tokens.shape
    m = qry_tokens.shape[1]
    stride = m + n
    dirs = np.ascontiguousarray(dirs, np.int32)
    ref_tokens = np.ascontiguousarray(ref_tokens, np.uint8)
    qry_tokens = np.ascontiguousarray(qry_tokens, np.uint8)
    ref_len = np.ascontiguousarray(ref_len, np.int32)
    qry_len = np.ascontiguousarray(qry_len, np.int32)
    start_row = np.ascontiguousarray(start_row, np.int32)
    start_col = np.ascontiguousarray(start_col, np.int32)
    scores = np.ascontiguousarray(scores, np.int32)
    out_buf = np.zeros((b, 3, stride), np.uint8)
    out_lens = np.zeros(b, np.int32)
    rc = lib.ta_traceback_bucket(
        _ALGO_CODE[algorithm_value], b, b_total, mw, n, dirs_cols,
        skew_band, stagger, stag_w, bits, match, mismatch, gap, m,
        _ptr(dirs, ctypes.c_int32),
        _ptr(ref_tokens, ctypes.c_uint8), _ptr(qry_tokens, ctypes.c_uint8),
        _ptr(ref_len, ctypes.c_int32), _ptr(qry_len, ctypes.c_int32),
        _ptr(start_row, ctypes.c_int32), _ptr(start_col, ctypes.c_int32),
        _ptr(scores, ctypes.c_int32),
        out_buf.ctypes.data_as(ctypes.c_char_p), stride,
        _ptr(out_lens, ctypes.c_int32), num_threads,
    )
    if rc != 0:
        raise RuntimeError(f"ta_traceback_bucket failed: {rc}")
    return out_buf, out_lens


def native_replay_moves(
    moves: np.ndarray,       # (T16, B_total) int32 packed 2-bit codes
    ref_tokens: np.ndarray,  # (B, N) uint8, B <= B_total
    qry_tokens: np.ndarray,  # (B, M) uint8
    start_row: np.ndarray,
    start_col: np.ndarray,
    scores: np.ndarray,
    local: bool,
    num_threads: int = 0,
):
    """Replay device-walk move streams into alignment strings (threaded).
    Returns (out_buf (B, 3, stride) uint8, out_lens) or None if the native
    library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    t16, b_total = moves.shape
    b, n = ref_tokens.shape
    m = qry_tokens.shape[1]
    stride = m + n
    moves = np.ascontiguousarray(moves, np.int32)
    ref_tokens = np.ascontiguousarray(ref_tokens, np.uint8)
    qry_tokens = np.ascontiguousarray(qry_tokens, np.uint8)
    start_row = np.ascontiguousarray(start_row, np.int32)
    start_col = np.ascontiguousarray(start_col, np.int32)
    scores = np.ascontiguousarray(scores, np.int32)
    out_buf = np.zeros((b, 3, stride), np.uint8)
    out_lens = np.zeros(b, np.int32)
    rc = lib.ta_replay_moves(
        b, b_total, t16, n, m, 1 if local else 0,
        _ptr(moves, ctypes.c_int32),
        _ptr(ref_tokens, ctypes.c_uint8), _ptr(qry_tokens, ctypes.c_uint8),
        _ptr(start_row, ctypes.c_int32), _ptr(start_col, ctypes.c_int32),
        _ptr(scores, ctypes.c_int32),
        out_buf.ctypes.data_as(ctypes.c_char_p), stride,
        _ptr(out_lens, ctypes.c_int32), num_threads,
    )
    if rc != 0:
        raise RuntimeError(f"ta_replay_moves failed: {rc}")
    return out_buf, out_lens


def native_replay_events(
    events: np.ndarray,      # flat uint16 payloads (row << 1 | is_ins)
    ev_off: np.ndarray,      # (B + 1,) int64: lane b at [off[b], off[b+1])
    ref_tokens: np.ndarray,  # (B, N) uint8
    qry_tokens: np.ndarray,  # (B, M) uint8
    start_row: np.ndarray,
    start_col: np.ndarray,
    scores: np.ndarray,
    local: bool,
    match: int, mismatch: int, gap: int,
    num_threads: int = 0,
):
    """Replay event-compacted device-walk streams (traceback/device.py
    _compact_events) into alignment strings (threaded).  Returns
    (out_buf (B, 3, stride) uint8, out_lens) or None if the native
    library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    b, n = ref_tokens.shape
    m = qry_tokens.shape[1]
    stride = m + n
    events = np.ascontiguousarray(events, np.uint16)
    ev_off = np.ascontiguousarray(ev_off, np.int64)
    ref_tokens = np.ascontiguousarray(ref_tokens, np.uint8)
    qry_tokens = np.ascontiguousarray(qry_tokens, np.uint8)
    start_row = np.ascontiguousarray(start_row, np.int32)
    start_col = np.ascontiguousarray(start_col, np.int32)
    scores = np.ascontiguousarray(scores, np.int32)
    out_buf = np.zeros((b, 3, stride), np.uint8)
    out_lens = np.zeros(b, np.int32)
    rc = lib.ta_replay_events(
        b, n, m, 1 if local else 0, match, mismatch, gap,
        _ptr(events, ctypes.c_uint16), _ptr(ev_off, ctypes.c_int64),
        _ptr(ref_tokens, ctypes.c_uint8), _ptr(qry_tokens, ctypes.c_uint8),
        _ptr(start_row, ctypes.c_int32), _ptr(start_col, ctypes.c_int32),
        _ptr(scores, ctypes.c_int32),
        out_buf.ctypes.data_as(ctypes.c_char_p), stride,
        _ptr(out_lens, ctypes.c_int32), None, num_threads,
    )
    if rc != 0:
        raise RuntimeError(f"ta_replay_events failed: {rc}")
    return out_buf, out_lens


def native_events_block_lens(
    events: np.ndarray,      # flat uint16 payloads
    ev_off: np.ndarray,      # (B + 1,) int64
    start_row: np.ndarray,   # (B,)
    pair_ids: np.ndarray,    # (B,)
    scores: np.ndarray,      # (B,)
):
    """Exact formatted block length per pair, derived from events alone
    (GLOBAL walks: aligned length = start_row + #insertions).  Returns
    (B,) int64 or None if the library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    b = int(start_row.shape[0])
    events = np.ascontiguousarray(events, np.uint16)
    ev_off = np.ascontiguousarray(ev_off, np.int64)
    start_row = np.ascontiguousarray(start_row, np.int32)
    pair_ids = np.ascontiguousarray(pair_ids, np.int64)
    scores = np.ascontiguousarray(scores, np.int32)
    lens = np.empty(b, np.int64)
    lib.ta_events_block_lens(
        b, _ptr(events, ctypes.c_uint16), _ptr(ev_off, ctypes.c_int64),
        _ptr(start_row, ctypes.c_int32), _ptr(pair_ids, ctypes.c_int64),
        _ptr(scores, ctypes.c_int32), _ptr(lens, ctypes.c_int64),
    )
    return lens


def native_replay_events_blocks(
    events: np.ndarray,      # flat uint16 payloads
    ev_off: np.ndarray,      # (B + 1,) int64
    ref_tokens: np.ndarray,  # (B, N) uint8
    qry_tokens: np.ndarray,  # (B, M) uint8
    start_row: np.ndarray,
    start_col: np.ndarray,
    scores: np.ndarray,
    pair_ids: np.ndarray,    # (B,) int64
    local: bool,
    match: int, mismatch: int, gap: int,
    num_threads: int = 0,
    dst_off: np.ndarray | None = None,  # (B,) int64 dense offsets
    total: int | None = None,           # chunk size when dst_off given
):
    """Fused event replay + 4-line block formatting: one native pass from
    event streams to the final output bytes.  With dst_off/total (global
    walks only; from native_events_block_lens + cumsum) the chunk is
    DENSE -- every block lands at its exact final offset with no stride
    holes, so downstream gathers coalesce to one memcpy per chunk.
    Returns (chunk uint8, spans (B, 2) int64) or None if the library is
    unavailable."""
    lib = _load()
    if lib is None:
        return None
    b, n = ref_tokens.shape
    m = qry_tokens.shape[1]
    events = np.ascontiguousarray(events, np.uint16)
    ev_off = np.ascontiguousarray(ev_off, np.int64)
    ref_tokens = np.ascontiguousarray(ref_tokens, np.uint8)
    qry_tokens = np.ascontiguousarray(qry_tokens, np.uint8)
    start_row = np.ascontiguousarray(start_row, np.int32)
    start_col = np.ascontiguousarray(start_col, np.int32)
    scores = np.ascontiguousarray(scores, np.int32)
    pair_ids = np.ascontiguousarray(pair_ids, np.int64)
    if dst_off is not None:
        assert not local and total is not None
        dst_off = np.ascontiguousarray(dst_off, np.int64)
        blk_stride = 0
        chunk = np.empty(int(total), np.uint8)
        off_ptr = _ptr(dst_off, ctypes.c_int64)
    else:
        blk_stride = 26 + 3 * (m + n + 1)
        chunk = np.empty(b * blk_stride, np.uint8)
        off_ptr = None
    spans = np.zeros((b, 2), np.int64)
    rc = lib.ta_replay_events_blocks(
        b, n, m, 1 if local else 0, match, mismatch, gap,
        _ptr(events, ctypes.c_uint16), _ptr(ev_off, ctypes.c_int64),
        _ptr(ref_tokens, ctypes.c_uint8), _ptr(qry_tokens, ctypes.c_uint8),
        _ptr(start_row, ctypes.c_int32), _ptr(start_col, ctypes.c_int32),
        _ptr(scores, ctypes.c_int32), _ptr(pair_ids, ctypes.c_int64),
        chunk.ctypes.data_as(ctypes.c_char_p), blk_stride,
        off_ptr, _ptr(spans, ctypes.c_int64), num_threads,
    )
    if rc != 0:
        raise RuntimeError(f"ta_replay_events_blocks failed: {rc}")
    return chunk, spans


def native_format_blocks(
    pair_ids: np.ndarray,   # (B,)
    scores: np.ndarray,     # (B,)
    out_buf: np.ndarray,    # (B, 3, stride) uint8
    out_lens: np.ndarray,   # (B,)
    num_threads: int = 0,
):
    """Render every pair's 4-line output block into one contiguous uint8
    buffer (the reference's per-pair printf loop, vectorized + threaded).
    Returns (chunk (total,) uint8, spans (B, 2) int64 offset/length) or
    None if the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    b = int(pair_ids.shape[0])
    stride = out_buf.shape[2]
    pair_ids = np.ascontiguousarray(pair_ids, np.int32)
    scores = np.ascontiguousarray(scores, np.int32)
    out_buf = np.ascontiguousarray(out_buf, np.uint8)
    out_lens = np.ascontiguousarray(out_lens, np.int32)
    spans = np.zeros((b, 2), np.int64)
    # exact upper bound: header <= 26 bytes (two int32s + " | \n")
    cap = int(3 * (out_lens.astype(np.int64) + 1).sum() + 26 * b)
    chunk = np.empty(cap, np.uint8)
    total = lib.ta_format_blocks(
        b, _ptr(pair_ids, ctypes.c_int32), _ptr(scores, ctypes.c_int32),
        out_buf.ctypes.data_as(ctypes.c_char_p), stride,
        _ptr(out_lens, ctypes.c_int32),
        chunk.ctypes.data_as(ctypes.c_char_p), cap,
        _ptr(spans, ctypes.c_int64), num_threads,
    )
    if total < 0:  # pragma: no cover - cap is an exact upper bound
        chunk = np.empty(-total, np.uint8)
        total = lib.ta_format_blocks(
            b, _ptr(pair_ids, ctypes.c_int32), _ptr(scores, ctypes.c_int32),
            out_buf.ctypes.data_as(ctypes.c_char_p), stride,
            _ptr(out_lens, ctypes.c_int32),
            chunk.ctypes.data_as(ctypes.c_char_p), -total,
            _ptr(spans, ctypes.c_int64), num_threads,
        )
    return chunk[:total], spans


def native_gather_spans(src: np.ndarray, spans: np.ndarray,
                        order: np.ndarray):
    """Concatenate src spans in the given order; returns uint8 array or
    None if the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    src = np.ascontiguousarray(src, np.uint8)
    spans = np.ascontiguousarray(spans, np.int64)
    order = np.ascontiguousarray(order, np.int64)
    total = int(spans[order, 1].sum())
    dst = np.empty(total, np.uint8)
    done = lib.ta_gather_spans(
        src.ctypes.data_as(ctypes.c_char_p), _ptr(spans, ctypes.c_int64),
        _ptr(order, ctypes.c_int64), order.shape[0],
        dst.ctypes.data_as(ctypes.c_char_p),
    )
    assert done == total, (done, total)
    return dst


def native_gather_parts(srcs, spans: np.ndarray, part_of: np.ndarray,
                        order: np.ndarray, num_threads: int = 0):
    """Multi-source ordered span gather (threaded).  srcs: list of uint8
    arrays; block b = srcs[part_of[b]][spans[b,0]:+spans[b,1]].  Returns
    the gathered uint8 array or None if the library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    srcs = [np.ascontiguousarray(s, np.uint8) for s in srcs]
    spans = np.ascontiguousarray(spans, np.int64)
    part_of = np.ascontiguousarray(part_of, np.int32)
    order = np.ascontiguousarray(order, np.int64)
    total = int(spans[order, 1].sum()) if order.size else 0
    dst = np.empty(total, np.uint8)
    ptrs = (ctypes.c_char_p * max(len(srcs), 1))(
        *(s.ctypes.data_as(ctypes.c_char_p) for s in srcs))
    done = lib.ta_gather_parts(
        ptrs, _ptr(spans, ctypes.c_int64), _ptr(part_of, ctypes.c_int32),
        _ptr(order, ctypes.c_int64), order.shape[0],
        dst.ctypes.data_as(ctypes.c_char_p), num_threads,
    )
    assert done == total, (done, total)
    return dst


def native_gather_padded(buf: np.ndarray, off: np.ndarray, lens: np.ndarray,
                         rows: int, width: int, pad: int,
                         num_threads: int = 0):
    """Flat-buffer -> (rows, width) padded token gather (threaded).
    Returns the uint8 array or None if the library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    buf = np.ascontiguousarray(buf, np.uint8)
    off = np.ascontiguousarray(off, np.int64)
    lens = np.ascontiguousarray(lens, np.int64)
    out = np.empty((rows, width), np.uint8)
    n = len(off)
    if n < rows:  # padding rows beyond the real batch
        out[n:] = pad
    lib.ta_gather_padded(
        _ptr(buf, ctypes.c_uint8), _ptr(off, ctypes.c_int64),
        _ptr(lens, ctypes.c_int64), n, width, pad,
        _ptr(out, ctypes.c_uint8), num_threads,
    )
    return out


def native_pack_2bit(tokens: np.ndarray, lens: np.ndarray,
                     num_threads: int = 0):
    """2-bit token packing (threaded; see io/packing.py contract).
    Returns (packed (B, W/4) uint8, lut (4,) uint8), the distinct-value
    count as third element if > 4 (caller falls back to raw upload), or
    None if the library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    rows, width = tokens.shape
    tokens = np.ascontiguousarray(tokens, np.uint8)
    lens = np.ascontiguousarray(lens, np.int64)
    lut = np.zeros(4, np.uint8)
    out = np.empty((rows, width // 4), np.uint8)
    nv = lib.ta_pack_2bit(
        _ptr(tokens, ctypes.c_uint8), _ptr(lens, ctypes.c_int64),
        rows, width, _ptr(lut, ctypes.c_uint8), _ptr(out, ctypes.c_uint8),
        num_threads,
    )
    if nv > 4:
        return (None, None, nv)
    return (out, lut)


def native_parse_pair_bytes(data: bytes, translate_digits: bool = True):
    """Parse a 3-line pair file natively.  Returns (buffer, ref_off, ref_len,
    qry_off, qry_len) or None if the library is unavailable.  Raises
    ValueError on malformed input (line count not a multiple of 3)."""
    lib = _load()
    if lib is None:
        return None
    buf = np.frombuffer(data, np.uint8).copy()
    nbytes = buf.size
    npairs = lib.ta_count_pairs(_ptr(buf, ctypes.c_uint8), nbytes)
    if npairs < 0:
        raise ValueError("number of lines not a multiple of 3")
    i64 = ctypes.c_int64
    ro = np.zeros(npairs, np.int64)
    rl = np.zeros(npairs, np.int64)
    qo = np.zeros(npairs, np.int64)
    ql = np.zeros(npairs, np.int64)
    got = lib.ta_parse_pairs(
        _ptr(buf, ctypes.c_uint8), nbytes, npairs,
        _ptr(ro, i64), _ptr(rl, i64), _ptr(qo, i64), _ptr(ql, i64),
        1 if translate_digits else 0,
    )
    if got < 0:
        raise ValueError("malformed pair file")
    return buf, ro[:got], rl[:got], qo[:got], ql[:got]
