"""FASTA ingestion (io/fasta): external-format bytes -> pair files.

Covers the formats the reference's data pipeline met (SURVEY: SRA dumps
converted by cuda/convert.sh): CRLF and CR line endings, wrapped
sequence lines, lowercase bases, the digit alphabet (translated by the
pair parser, not the FASTA reader), and malformed inputs.
"""

import numpy as np
import pytest

from tpu_align.io.dataset import parse_pair_file
from tpu_align.io.fasta import fasta_to_pairfile, read_fasta, score_checksum


def test_read_fasta_formats(tmp_path):
    p = tmp_path / "a.fasta"
    p.write_bytes(b">r1 length=10\r\nATCGA\r\nTCGAT\r\n"
                  b">r2\nacgt\n\n>r3\rGGGG\rCC\r")
    recs = read_fasta(str(p))
    assert [h for h, _ in recs] == ["r1 length=10", "r2", "r3"]
    assert [s for _, s in recs] == [b"ATCGATCGAT", b"ACGT", b"GGGGCC"]


def test_read_fasta_rejects_malformed(tmp_path):
    p = tmp_path / "bad.fasta"
    p.write_bytes(b"ATCG\n>r1\nATCG\n")
    with pytest.raises(ValueError):
        read_fasta(str(p))
    p.write_bytes(b">empty\n>r2\nATCG\n")
    with pytest.raises(ValueError):
        read_fasta(str(p))


def test_fasta_to_pairfile_consecutive_and_two_file(tmp_path):
    fa = tmp_path / "reads.fasta"
    fa.write_bytes(b">a\nATCG\n>b\nATGG\n>c\nCCCC\n>d\nCCGC\n>odd\nTTTT\n")
    pf = tmp_path / "pairs.txt"
    n = fasta_to_pairfile(str(fa), str(pf))
    assert n == 2  # trailing unpaired read dropped
    ds = parse_pair_file(str(pf))
    assert ds.pair(0) == ("ATCG", "ATGG")
    assert ds.pair(1) == ("CCCC", "CCGC")
    # two-file positional mode: counts must match exactly
    fb = tmp_path / "qry.fasta"
    fb.write_bytes(b">x\nGGTT\n>y\nAACC\n")
    with pytest.raises(ValueError, match="record counts differ"):
        fasta_to_pairfile(str(fa), str(pf), queries_path=str(fb))
    fa2 = tmp_path / "refs2.fasta"
    fa2.write_bytes(b">a\nATCG\n>b\nATGG\n")
    n2 = fasta_to_pairfile(str(fa2), str(pf), queries_path=str(fb))
    assert n2 == 2
    ds2 = parse_pair_file(str(pf))
    assert ds2.pair(0) == ("ATCG", "GGTT")
    assert ds2.pair(1) == ("ATGG", "AACC")


def test_digit_fasta_matches_letter_fasta(tmp_path):
    """A '0123' dump and its 'ATCG' twin must parse to identical
    datasets (digit translation happens in the pair parser)."""
    rng = np.random.default_rng(3)
    seqs = [rng.integers(0, 4, int(rng.integers(5, 40))) for _ in range(8)]
    for alpha, name in ((b"ATCG", "l"), (b"0123", "d")):
        body = b"".join(
            b">%d\n%s\n" % (i, bytes(alpha[c] for c in s))
            for i, s in enumerate(seqs))
        (tmp_path / f"{name}.fasta").write_bytes(body)
        fasta_to_pairfile(str(tmp_path / f"{name}.fasta"),
                          str(tmp_path / f"{name}.pairs"))
    a = parse_pair_file(str(tmp_path / "l.pairs"))
    b = parse_pair_file(str(tmp_path / "d.pairs"))
    assert len(a) == len(b) == 4
    assert all(a.pair(i) == b.pair(i) for i in range(4))


def test_score_checksum_order_independent():
    assert score_checksum([3, 1, 2]) == score_checksum([1, 2, 3])
    assert score_checksum([3, 1, 2]) != score_checksum([1, 2, 4])
