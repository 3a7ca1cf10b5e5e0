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

import jax
import numpy as np

from tpu_align.io.dataset import PairDataset
from tpu_align.utils.reorder import reorder_output


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> tuple[int, int]:
    """Initialize jax.distributed (no-op on a single host).

    Returns (process_index, process_count).  On TPU pods the arguments are
    auto-detected from the environment; pass them explicitly elsewhere.
    """
    if num_processes is not None and num_processes > 1:
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


def merge_output_files(paths, out_path) -> None:
    """Merge per-host output-block files into one file ordered by pair id."""
    text = "".join(open(p).read() for p in paths)
    with open(out_path, "w") as f:
        f.write(reorder_output(text))
