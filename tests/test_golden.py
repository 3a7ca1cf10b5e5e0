"""Golden-file regression: the TPU engine must reproduce the committed
goldens byte-for-byte, and the independent verifier must pass them (and
catch corruptions)."""

import os

import pytest

pytestmark = pytest.mark.slow  # heavy interpret-mode compiles; quick tier skips

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


@pytest.mark.parametrize("name,algo", [("lnw-all", Algorithm.LNW),
                                       ("lsw-all", Algorithm.LSW)])
def test_engine_reproduces_all_paths_goldens(name, algo):
    """-all-paths end to end: LNW enumerates every co-optimal global path
    (python/LinearNeedlemanWunsch.py:98-191), LSW walks every max cell
    (BACKTRACK_ALL).  Goldens are tie-rich (2-letter alphabet)."""
    d = os.path.join(GOLDENS, name)
    got = align_file(
        os.path.join(d, "input-data.txt"), algo,
        local_mode="all", output="records",
    ).output_text()
    with open(os.path.join(d, "align-output.txt")) as f:
        want = f.read()
    assert got == want
    # the tie-rich inputs must actually produce multi-path blocks
    assert len(want.splitlines()) > 24 * 4


def test_cli_lnw_all_paths(tmp_path):
    """-all-paths is CLI-reachable for the global aligner."""
    from tpu_align.cli import main

    d = os.path.join(GOLDENS, "lnw-all")
    out_file = tmp_path / "out.txt"
    rc = main(["-pairs", os.path.join(d, "input-data.txt"),
               "-algorithm", "lnw", "-all-paths", "-output", "records",
               "-out", str(out_file)])
    assert rc == 0
    with open(os.path.join(d, "align-output.txt")) as f:
        assert out_file.read_text() == f.read()


@pytest.mark.parametrize("name,algo", [("lnw-all", Algorithm.LNW),
                                       ("lsw-all", Algorithm.LSW)])
def test_all_paths_goldens_verify(name, algo):
    """The verifier parses multi-path blocks and re-scores every extra
    co-optimal path to the same optimum."""
    d = os.path.join(GOLDENS, name)
    assert verify_output(os.path.join(d, "input-data.txt"),
                         os.path.join(d, "align-output.txt"), algo) == []


def test_verifier_catches_bad_extra_path(tmp_path):
    from tpu_align.verify.golden import OutputBlock

    in_path, _ = _paths(Algorithm.LNW)
    from tpu_align.io.dataset import parse_pair_file

    ds = parse_pair_file(in_path)
    ref, qry = ds.pair(0)
    from tpu_align.oracle.api import align_pair

    good = align_pair(Algorithm.LNW, AlignmentParams(), ref, qry)
    bad = tmp_path / "bad.txt"
    # main path fine; extra path is the main path with one column doubled
    # (re-scores differently)
    extra = (good.ref_aligned + "_", good.relation + " ",
             good.query_aligned + "A")
    blk = OutputBlock(0, good.score, good.ref_aligned, good.relation,
                      good.query_aligned, [extra])
    text = (f"{blk.pair_num} | {blk.score}\n{blk.ref_aligned}\n"
            f"{blk.relation}\n{blk.query_aligned}\n"
            + "\n".join(extra) + "\n")
    single = tmp_path / "one.txt"
    single.write_text(text)
    from tpu_align.io.dataset import write_pair_file

    one_in = tmp_path / "in.txt"
    write_pair_file(one_in, [(ref, qry)])
    failures = verify_output(one_in, single, Algorithm.LNW)
    assert failures and "path 2" in failures[0]
