"""Multi-host orchestration helpers.

A TPU pod slice runs one Python process per host; `jax.distributed`
coordinates them and `jax.devices()` then spans all chips (ICI within the
slice, DCN across hosts).  Pair alignment is embarrassingly parallel over
pairs, so the multi-host recipe is:

  1. initialize() on every host,
  2. split the input by pair id across processes (`host_shard` -- a
     deterministic stride split, so no host-to-host data exchange is
     needed),
  3. run the normal AlignmentEngine on the local shard (each host drives
     its own chips via the single-host `pairs` mesh over local devices),
  4. write per-host output files and merge by pair id
     (`merge_output_files`, the scripts/reorderOutput.py job done
     properly -- SURVEY.md section 2.4).

Cross-host collectives are only needed for run-level stats; use
tpu_align.distributed.global_stats over a global mesh when scores must be
reduced on-device instead of via the merged files.
"""

from __future__ import annotations

import heapq

import jax
import numpy as np

from tpu_align.io.dataset import PairDataset


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> tuple[int, int]:
    """Initialize jax.distributed (no-op on a single host).

    Returns (process_index, process_count).  On TPU pods the arguments are
    auto-detected from the environment; pass them explicitly elsewhere.
    Single-host dev boxes (no coordinator, no pod metadata) stay
    single-process: the bare auto-detect attempt fails cleanly there.
    """
    if num_processes is None:
        # auto-detect path: jax.distributed reads the pod environment;
        # on a plain host it raises, which is the single-process case
        try:
            jax.distributed.initialize(
                coordinator_address=coordinator_address)
        except (RuntimeError, ValueError):
            pass
    elif num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return jax.process_index(), jax.process_count()


def host_shard(ds: PairDataset, process_index: int | None = None,
               process_count: int | None = None) -> tuple[PairDataset, np.ndarray]:
    """This host's strided slice of the dataset.

    Returns (shard, global_pair_ids); strided (rather than contiguous)
    assignment balances length skew across hosts.
    """
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    ids = np.arange(pi, len(ds), pc, dtype=np.int64)
    return ds.select(ids), ids


def renumber(results, global_ids: np.ndarray):
    """Rewrite shard-local pair numbers back to global ids (in place)."""
    for r in results:
        r.pair_num = int(global_ids[r.pair_num])
    return results


def iter_output_blocks(path):
    """Stream (pair_id, block_text) from an output-block file.

    A block is a "<pairNum> | <score>" header line plus every following
    line up to the next header (header detection is shared with
    utils.reorder -- one definition of the block format).  Memory is one
    block, not the file."""
    from tpu_align.utils.reorder import block_header_pair_num

    key = None
    current: list[str] = []
    with open(path) as f:
        for line in f:
            pn = block_header_pair_num(line)
            if pn is not None:
                if key is not None:
                    yield key, "".join(current)
                key = pn
                current = [line]
            elif key is not None:
                current.append(line)
        if key is not None:
            yield key, "".join(current)


def _checked_stream(path):
    last = None
    for k, block in iter_output_blocks(path):
        if last is not None and k < last:
            raise ValueError(
                f"{path} is not sorted by pair id ({k} after {last}); "
                "per-host shard outputs are pair-id-ordered by construction "
                "(engine sorts results) -- for arbitrary interleavings use "
                "tpu_align.utils.reorder_output on the concatenation")
        last = k
        yield k, block


def merge_output_files(paths, out_path) -> None:
    """Merge per-host output-block files into one file ordered by pair id.

    Streaming k-way merge (the scripts/reorderOutput.py job done at
    scale): each input is read one block at a time and blocks are emitted
    through a k-entry heap, so peak memory is one block per input stream
    regardless of file sizes -- multi-GB per-host outputs merge in O(1)
    memory.  Inputs must each be pair-id-sorted (host_shard + the
    engine's result ordering guarantee this); violations raise instead
    of silently mis-merging."""
    streams = [_checked_stream(p) for p in paths]
    with open(out_path, "w") as f:
        for _, block in heapq.merge(*streams, key=lambda kb: kb[0]):
            f.write(block)
