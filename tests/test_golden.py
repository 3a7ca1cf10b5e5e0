"""Golden-file regression: the TPU engine must reproduce the committed
goldens byte-for-byte, and the independent verifier must pass them (and
catch corruptions)."""

import os

import pytest

from tpu_align.core.params import Algorithm, AlignmentParams
from tpu_align.runtime.engine import align_file
from tpu_align.utils import reorder_output
from tpu_align.verify import parse_output_blocks, rescore_alignment, verify_output

GOLDENS = os.path.join(os.path.dirname(__file__), "..", "goldens")
ALGOS = [Algorithm.LNW, Algorithm.LSW, Algorithm.ANW, Algorithm.BSW]


def _paths(algo):
    d = os.path.join(GOLDENS, algo.value)
    return os.path.join(d, "input-data.txt"), os.path.join(d, "align-output.txt")


@pytest.mark.parametrize("algo", ALGOS)
def test_engine_reproduces_goldens(algo):
    from tpu_align.io.bucketing import BucketSpec

    in_path, out_path = _paths(algo)
    # coarse bucketing -> one kernel shape per algorithm (fast in interpret)
    got = align_file(
        in_path, algo, bucket_spec=BucketSpec(query_multiple=96, batch_pairs=256)
    ).output_text()
    with open(out_path) as f:
        want = f.read()
    assert reorder_output(got) == reorder_output(want)


@pytest.mark.parametrize("algo", ALGOS)
def test_goldens_verify(algo):
    in_path, out_path = _paths(algo)
    assert verify_output(in_path, out_path, algo) == []


def test_verifier_catches_corruption(tmp_path):
    in_path, out_path = _paths(Algorithm.LNW)
    text = open(out_path).read()
    # corrupt one score
    lines = text.splitlines()
    head = lines[0].split(" | ")
    lines[0] = f"{head[0]} | {int(head[1]) + 1}"
    bad = tmp_path / "bad.txt"
    bad.write_text("\n".join(lines) + "\n")
    failures = verify_output(in_path, bad, Algorithm.LNW)
    assert failures and "score" in failures[0]


def test_verifier_catches_illegal_path(tmp_path):
    in_path, out_path = _paths(Algorithm.LNW)
    blocks = parse_output_blocks(open(out_path).read())
    b = blocks[0]
    # flip one relation char: legality check must fire even if score matches
    rel = ("|" if b.relation[0] == "*" else "*") + b.relation[1:]
    b2 = type(b)(b.pair_num, b.score, b.ref_aligned, rel, b.query_aligned)
    from tpu_align.io.dataset import parse_pair_file

    ds = parse_pair_file(in_path)
    problems = rescore_alignment(
        Algorithm.LNW, AlignmentParams(), *ds.pair(0), b2
    )
    assert problems
