"""Regenerate the goldens/ trees (the correct-outputs/ equivalent).

The reference's golden files are git-LFS-absent (.MISSING_LARGE_BLOBS); the
NumPy oracle is this framework's golden generator (SURVEY.md section 4).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tpu_align.core.params import Algorithm  # noqa: E402
from tpu_align.verify import generate_goldens, verify_output  # noqa: E402


def main():
    root = os.path.join(os.path.dirname(__file__), "..", "goldens")
    for algo in Algorithm:
        out_dir = os.path.join(root, algo.value)
        in_path, out_path = generate_goldens(out_dir, algo)
        failures = verify_output(in_path, out_path, algo)
        assert not failures, failures[:5]
        print(f"{algo.value}: wrote + verified {out_dir}")
    # tie-rich all-paths goldens: short 2-letter-alphabet pairs make
    # co-optimal ties dense while keeping path counts bounded.  The
    # verifier parses multi-path blocks and re-scores every extra path.
    for algo, name in ((Algorithm.LNW, "lnw-all"), (Algorithm.LSW, "lsw-all")):
        out_dir = os.path.join(root, name)
        in_path, out_path = generate_goldens(
            out_dir, algo, num_pairs=24, min_len=4, max_len=10,
            local_mode="all", alphabet="AT", sub_rate=0.3, indel_rate=0.2)
        failures = verify_output(in_path, out_path, algo)
        assert not failures, failures[:5]
        print(f"{name}: wrote + verified {out_dir}")


if __name__ == "__main__":
    main()
