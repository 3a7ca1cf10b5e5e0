"""Auxiliary components: LCS, pretty printer, timing analysis, verify layer."""

import json

from tpu_align.core.params import Algorithm, AlignmentParams
from tpu_align.oracle.lcs import lcs, lcs_matrix
from tpu_align.oracle.scalar import fill_scalar
from tpu_align.utils.pretty import format_matrix, print_fill
from tpu_align.utils.timing_analysis import analyze, load_runs
from tpu_align.verify.golden import OutputBlock, rescore_alignment


def test_lcs_basic():
    length, paths = lcs("AGGTAB", "GXTXAYB")
    assert length == 4
    assert "GTAB" in paths


def test_lcs_matches_lnw_zero_penalty_structure():
    # LCS is NW with match=1, no penalties (python/testing.py:12-34 notes)
    length, _ = lcs("ACGT", "ACGT")
    assert length == 4
    assert lcs_matrix("ACGT", "ACGT")[-1, -1] == 4


def test_lcs_all_paths_ties():
    # "AB" vs "BA": two co-optimal single-char subsequences
    length, paths = lcs("AB", "BA", dedup=True)
    assert length == 1
    assert set(paths) == {"A", "B"}


def test_lcs_empty():
    assert lcs("", "ABC") == (0, [""])


def test_pretty_printer(capsys):
    fill = fill_scalar(Algorithm.ANW, AlignmentParams(), "ACG", "AG")
    txt = format_matrix(fill.h, "ACG", "AG", color=False)
    assert "Memo" in txt or "Matrix" in txt
    assert "ACG"[0] in txt
    print_fill(fill, "ACG", "AG", color=False)
    out = capsys.readouterr().out
    assert "Query-Insertion Matrix (E)" in out
    assert "Query-Deletion Matrix (F)" in out


def test_timing_analysis(tmp_path):
    runs = [
        {"label": "v1", "phases": {"kernel": 0.1, "backtrack": 0.05}},
        {"label": "v2", "phases": {"kernel": 0.02, "printing": 0.01}},
    ]
    path = tmp_path / "runs.jsonl"
    path.write_text("\n".join(json.dumps(r) for r in runs) + "\n")
    loaded = load_runs(str(path))
    table = analyze(loaded)
    assert "v1" in table and "kernel" in table
    assert "100.00" in table  # 0.1 s -> 100 ms


def test_rescore_affine_gap_runs():
    # one run of two query-gaps must charge a single open
    p = AlignmentParams()  # open -4 extend -1, match 3
    score = 2 * 3 + (-4 - 1) + (-1)  # 2 matches + open+ext + ext = 0
    block = OutputBlock(0, score, "AGGA", "*  *", "A__A")
    assert rescore_alignment(Algorithm.ANW, p, "AGGA", "AA", block) == []
    # and a run of two ref-gaps likewise
    block = OutputBlock(0, score, "A__A", "*  *", "AGGA")
    assert rescore_alignment(Algorithm.ANW, p, "AA", "AGGA", block) == []


def test_lnw_all_paths():
    """All-paths global enumeration (python/LinearNeedlemanWunsch.py BFS):
    every emitted path must be legal and re-score to the optimum."""
    from tpu_align.oracle import lnw_all_paths
    from tpu_align.oracle.scalar import fill_scalar
    from tpu_align.verify.golden import OutputBlock

    p = AlignmentParams(match=5, mismatch=-2, gap=-3)
    ref, qry = "ABxxxCDE", "ABCDE"  # the reference's testing.py example
    fill = fill_scalar(Algorithm.LNW, p, ref, qry)
    score, paths = lnw_all_paths(fill, p, ref, qry)
    assert score == fill.global_score
    assert paths
    for (r, m, q) in paths:
        block = OutputBlock(0, score, r, m, q)
        assert rescore_alignment(Algorithm.LNW, p, ref, qry, block) == []
    # a tie-rich pair must yield multiple distinct co-optimal paths
    p2 = AlignmentParams(match=1, mismatch=-1, gap=-1)
    fill2 = fill_scalar(Algorithm.LNW, p2, "AB", "BA")
    s2, paths2 = lnw_all_paths(fill2, p2, "AB", "BA")
    assert len(set(paths2)) > 1
    for (r, m, q) in paths2:
        block = OutputBlock(0, s2, r, m, q)
        assert rescore_alignment(Algorithm.LNW, p2, "AB", "BA", block) == []
    # max_paths truncation
    _, few = lnw_all_paths(fill2, p2, "AB", "BA", max_paths=1)
    assert len(few) == 1
