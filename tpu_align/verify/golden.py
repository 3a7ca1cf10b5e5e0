"""Golden outputs and independent verification.

The reference verifies against an external oracle: Playwright scrapers
replay every (input, output) pair against the Freiburg RNA Teaching
NW/SW/Gotoh web tools, asserting exact score equality and that the
program's path appears among the tool's enumerated optimal paths
(web-scraper.py:190-258, correct-outputs/*/web-scraper-*.py).  Its golden
files (correct-outputs/{LNW,LSW,ANW}/{input-data.txt,align-output.txt}) are
git-LFS-absent, so this framework regenerates its own goldens from the
NumPy oracle and verifies *stronger* than path membership: every reported
alignment is independently re-scored from its three output lines
(legality + exact score reconstruction) and the score is checked against
the oracle optimum -- no network, no <=10-path enumeration limit.
"""

from __future__ import annotations

import dataclasses
import os

from tpu_align.core import directions as D
from tpu_align.core.params import Algorithm, AlignmentParams
from tpu_align.io.dataset import PairDataset, parse_pair_file, write_pair_file
from tpu_align.oracle.api import align_batch, align_pair


# ---------------------------------------------------------------------------
# Golden generation (replaces the LFS-absent correct-outputs/ trees)
# ---------------------------------------------------------------------------


def generate_goldens(
    out_dir: str | os.PathLike,
    algorithm: Algorithm,
    num_pairs: int = 120,
    seed: int = 570,  # EECS 570, the reference's course
    params: AlignmentParams | None = None,
    min_len: int = 8,
    max_len: int = 96,
    local_mode: str = "single",
    alphabet: str | None = None,
    sub_rate: float = 0.05,
    indel_rate: float = 0.02,
) -> tuple[str, str]:
    """Write input-data.txt + align-output.txt for an algorithm; returns
    the two paths.  local_mode="all" writes multi-path blocks (all
    co-optimal paths); a reduced `alphabet` (e.g. "AT") makes ties rich."""
    from tpu_align.utils.synthetic import synthetic_dataset

    params = params or AlignmentParams()
    os.makedirs(out_dir, exist_ok=True)
    ds = synthetic_dataset(num_pairs, min_len=min_len, max_len=max_len,
                           seed=seed, alphabet=alphabet,
                           sub_rate=sub_rate, indel_rate=indel_rate)
    in_path = os.path.join(out_dir, "input-data.txt")
    out_path = os.path.join(out_dir, "align-output.txt")
    write_pair_file(in_path, list(ds.pairs()))
    results = align_batch(algorithm, params, list(ds.pairs()), engine="scalar",
                          local_mode=local_mode)
    with open(out_path, "w") as f:
        for r in results:
            f.write(r.block())
    return in_path, out_path


# ---------------------------------------------------------------------------
# Output parsing + independent re-scoring
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class OutputBlock:
    pair_num: int
    score: int
    ref_aligned: str
    relation: str
    query_aligned: str
    extra_paths: list = dataclasses.field(default_factory=list)


def parse_output_blocks(text: str) -> list[OutputBlock]:
    """Parse reference-format output blocks: a "<pairNum> | <score>"
    header plus a 3-line alignment, optionally followed by further 3-line
    co-optimal paths (multi-path modes: BACKTRACK_ALL / -all-paths) --
    collected into extra_paths.  Header detection is the shared
    block_header_pair_num rule (body lines cannot alias it)."""
    from tpu_align.utils.reorder import block_header_pair_num

    lines = text.splitlines()
    blocks = []
    i, n = 0, len(lines)
    while i < n:
        pn = block_header_pair_num(lines[i])
        if pn is None:
            raise ValueError(f"bad block header at line {i}: {lines[i]!r}")
        score = int(lines[i].split(" | ")[1])
        i += 1
        body = []
        while i < n and block_header_pair_num(lines[i]) is None:
            body.append(lines[i])
            i += 1
        if len(body) < 3:
            body += [""] * (3 - len(body))
        if (len(body) - 3) % 3:
            raise ValueError(
                f"pair {pn}: {len(body)} body lines (expected 3 + 3k)")
        extras = [tuple(body[j: j + 3]) for j in range(3, len(body), 3)]
        blocks.append(OutputBlock(pn, score, body[0], body[1], body[2],
                                  extras))
    return blocks


def rescore_alignment(
    algorithm: Algorithm,
    params: AlignmentParams,
    reference: str,
    query: str,
    block: OutputBlock,
) -> list[str]:
    """Independently validate one alignment block.  Returns a list of
    problems (empty = valid): the three lines must be equal-length, legal
    (sequence reconstruction, relation chars), and re-score exactly to the
    reported score.  Affine gap runs are re-scored as open+extends."""
    problems = []
    ra, rel, qa = block.ref_aligned, block.relation, block.query_aligned
    if not (len(ra) == len(rel) == len(qa)):
        return [f"line lengths differ: {len(ra)}/{len(rel)}/{len(qa)}"]
    if algorithm.is_local and block.score <= 0:
        if ra or rel or qa:
            problems.append("score<=0 local block must be empty")
        return problems
    # sequence reconstruction
    ref_chars = ra.replace(D.GAP_CHAR, "")
    qry_chars = qa.replace(D.GAP_CHAR, "")
    if algorithm.is_local:
        if ref_chars not in reference:
            problems.append("reference line is not a substring of reference")
        if qry_chars not in query:
            problems.append("query line is not a substring of query")
    else:
        if ref_chars != reference:
            problems.append("reference line does not reconstruct reference")
        if qry_chars != query:
            problems.append("query line does not reconstruct query")
    # legality + score
    score = 0
    in_ref_gap = in_qry_gap = False
    for rc, mc, qc in zip(ra, rel, qa):
        if rc == D.GAP_CHAR and qc == D.GAP_CHAR:
            problems.append("double gap column")
            break
        if rc == D.GAP_CHAR or qc == D.GAP_CHAR:
            if mc != D.REL_GAP:
                problems.append(f"gap column relation {mc!r} != ' '")
            if algorithm.is_affine:
                if rc == D.GAP_CHAR:
                    score += params.gap_extend + (
                        0 if in_ref_gap else params.gap_open
                    )
                    in_ref_gap, in_qry_gap = True, False
                else:
                    score += params.gap_extend + (
                        0 if in_qry_gap else params.gap_open
                    )
                    in_qry_gap, in_ref_gap = True, False
            else:
                score += params.gap
                in_ref_gap = in_qry_gap = False
        else:
            in_ref_gap = in_qry_gap = False
            if rc == qc:
                if mc != D.REL_MATCH:
                    problems.append(f"match column relation {mc!r} != '*'")
                score += params.match
            else:
                if mc != D.REL_MISMATCH:
                    problems.append(f"mismatch column relation {mc!r} != '|'")
                score += params.mismatch
    if score != block.score:
        problems.append(f"re-scored {score} != reported {block.score}")
    return problems


def verify_output(
    input_path: str | os.PathLike,
    output_path: str | os.PathLike,
    algorithm: Algorithm,
    params: AlignmentParams | None = None,
    max_failures: int = 20,
) -> list[str]:
    """Verify a program's output file against its input file.

    Checks, per pair (web-scraper.py:207-258 semantics, strengthened):
      1. the reported score equals the oracle-optimal score;
      2. the reported alignment is legal and re-scores to the reported score
         (for local aligners the displayed segment must re-score to the max).
    Returns a list of failure descriptions (empty = all pairs verified).
    """
    params = params or AlignmentParams()
    ds = parse_pair_file(input_path)
    with open(output_path) as f:
        blocks = parse_output_blocks(f.read())
    failures = []
    by_num = {b.pair_num: b for b in blocks}
    if len(by_num) != len(ds):
        failures.append(f"{len(by_num)} blocks for {len(ds)} input pairs")
    for i in range(len(ds)):
        if len(failures) >= max_failures:
            failures.append("... (more failures suppressed)")
            break
        if i not in by_num:
            failures.append(f"pair {i}: missing output block")
            continue
        block = by_num[i]
        ref, qry = ds.pair(i)
        want = align_pair(algorithm, params, ref, qry, pair_num=i,
                          engine="scalar")
        if block.score != want.score:
            failures.append(
                f"pair {i}: score {block.score} != oracle {want.score}"
            )
            continue
        for p in rescore_alignment(algorithm, params, ref, qry, block):
            failures.append(f"pair {i}: {p}")
        # multi-path blocks (-all-paths): every additional co-optimal path
        # must be legal and re-score to the same optimal score
        for k, (ra, rel, qa) in enumerate(block.extra_paths):
            sub = OutputBlock(i, block.score, ra, rel, qa)
            for p in rescore_alignment(algorithm, params, ref, qry, sub):
                failures.append(f"pair {i} path {k + 2}: {p}")
    return failures


def main(argv=None) -> int:
    import argparse
    import sys

    ap = argparse.ArgumentParser(
        prog="tpu-align-verify",
        description="Verify alignment output against the oracle "
                    "(the offline replacement for the reference's Freiburg "
                    "web-scraper verification)",
    )
    ap.add_argument("-pairs", required=True)
    ap.add_argument("-output", required=True)
    ap.add_argument("-algorithm", default="lnw",
                    choices=[a.value for a in Algorithm])
    ap.add_argument("-match", type=int, default=3)
    ap.add_argument("-mismatch", type=int, default=-1)
    ap.add_argument("-gap", type=int, default=-2)
    ap.add_argument("-open", dest="gap_open", type=int, default=-4)
    ap.add_argument("-extend", dest="gap_extend", type=int, default=-1)
    ap.add_argument("-band", type=int, default=16)
    args = ap.parse_args(argv)
    params = AlignmentParams(
        match=args.match, mismatch=args.mismatch, gap=args.gap,
        gap_open=args.gap_open, gap_extend=args.gap_extend, band=args.band,
    )
    failures = verify_output(
        args.pairs, args.output, Algorithm(args.algorithm), params
    )
    for f in failures:
        print(f"FAIL {f}", file=sys.stderr)
    if failures:
        return 1
    print("all pairs verified", file=sys.stderr)
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
