"""Synthetic read-pair workloads.

The reference benchmarks on the bandedSWA SRR7733443 100k-pair input
(c++/Makefile:4), which is git-LFS-absent; we regenerate statistically
similar workloads: short-read pairs where the query is a mutated copy of
the reference (substitutions + indels), so alignments are biologically
shaped rather than random-vs-random.
"""

from __future__ import annotations

import numpy as np

from tpu_align.io.dataset import PairDataset

_BASES = np.frombuffer(b"ATCG", np.uint8)


def mutate(rng: np.random.Generator, seq: np.ndarray, sub_rate=0.05,
           ins_rate=0.02, del_rate=0.02, bases: np.ndarray = _BASES
           ) -> np.ndarray:
    """Apply substitutions and indels to a uint8 base array.  New bases
    are drawn from `bases` so a reduced alphabet stays reduced (the
    tie-rich property all-paths golden generation relies on)."""
    n = seq.size
    keep = rng.random(n) >= del_rate
    subs = rng.random(n) < sub_rate
    out = seq.copy()
    out[subs] = bases[rng.integers(0, len(bases), int(subs.sum()))]
    out = out[keep]
    n_ins = int(rng.binomial(max(out.size, 1), ins_rate))
    if n_ins:
        pos = np.sort(rng.integers(0, out.size + 1, n_ins))
        out = np.insert(out, pos, bases[rng.integers(0, len(bases), n_ins)])
    return out


def synthetic_dataset(
    num_pairs: int,
    min_len: int = 96,
    max_len: int = 256,
    seed: int = 0,
    sub_rate: float = 0.05,
    indel_rate: float = 0.02,
    uniform_len: int | None = None,
    alphabet: str | None = None,
) -> PairDataset:
    """Generate `num_pairs` (reference, query) read pairs.

    Reference lengths are uniform in [min_len, max_len] (or fixed to
    uniform_len); queries are mutated copies, so their lengths scatter
    around the reference length.  A reduced `alphabet` (e.g. "AT") makes
    co-optimal ties rich (all-paths golden generation).
    """
    bases = np.frombuffer(alphabet.encode(), np.uint8) if alphabet else _BASES
    rng = np.random.default_rng(seed)
    pairs = []
    for _ in range(num_pairs):
        n = uniform_len or int(rng.integers(min_len, max_len + 1))
        ref = bases[rng.integers(0, len(bases), n)]
        qry = mutate(rng, ref, sub_rate, indel_rate, indel_rate, bases)
        if qry.size == 0:
            qry = bases[rng.integers(0, len(bases), 1)]
        pairs.append((ref.tobytes().decode(), qry.tobytes().decode()))
    return PairDataset.from_pairs(pairs)
