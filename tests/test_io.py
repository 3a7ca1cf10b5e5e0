"""io layer tests: parsing, bucketing, synthetic data, output reordering."""

import numpy as np
import pytest

from tpu_align.io import (
    PairDataset,
    BucketSpec,
    bucketize,
    parse_pair_file,
    parse_pair_text,
    write_pair_file,
)
from tpu_align.utils import reorder_output, synthetic_dataset


def test_parse_roundtrip(tmp_path):
    pairs = [("ACGT", "ACG"), ("TTTT", "TATA"), ("G", "GGGGG")]
    path = tmp_path / "pairs.txt"
    write_pair_file(path, pairs)
    ds = parse_pair_file(path)
    assert len(ds) == 3
    assert [ds.pair(i) for i in range(3)] == pairs


def test_parse_digit_translation():
    # cuda/convert.sh: tr "0123" "ATCG"
    ds = parse_pair_text(b"0\n0123\n3210\n")
    assert ds.pair(0) == ("ATCG", "GCTA")


def test_parse_no_trailing_newline_and_crlf():
    ds = parse_pair_text(b"s\r\nACGT\r\nAC")
    assert ds.pair(0) == ("ACGT", "AC")


def test_parse_bad_line_count():
    with pytest.raises(ValueError, match="multiple of 3"):
        parse_pair_text(b"a\nb\n")


def test_stats_match_reference_semantics():
    ds = PairDataset.from_pairs([("ACGT", "AC"), ("ACGTACGT", "ACGTA")])
    st = ds.stats()
    assert st.num_pairs == 2
    # numCells = sum(refLen*qryLen) -- c++/parseInput.cpp:100
    assert st.num_cells == 4 * 2 + 8 * 5
    assert st.min_reference_length == 4
    assert st.max_reference_length == 8
    assert st.min_query_length == 2
    assert st.max_query_length == 5
    assert st.avg_reference_length == 6.0


def test_bucketize_shapes_and_coverage():
    ds = synthetic_dataset(100, min_len=5, max_len=300, seed=1)
    spec = BucketSpec(query_multiple=8, ref_multiple=128, batch_pairs=16)
    buckets = bucketize(ds, spec)
    seen = []
    for b in buckets:
        assert b.padded_ref % 128 == 0
        assert b.padded_qry % 8 == 0
        assert b.batch % 8 == 0
        assert b.batch >= b.num_real
        for row in range(b.num_real):
            i = int(b.pair_ids[row])
            seen.append(i)
            rl, ql = int(b.ref_len[row]), int(b.qry_len[row])
            assert rl == ds.ref_len[i] and ql == ds.qry_len[i]
            assert bytes(b.ref_tokens[row, :rl]) == ds.reference_bytes(i).tobytes()
            assert bytes(b.qry_tokens[row, :ql]) == ds.query_bytes(i).tobytes()
            # padding bytes differ so a padded cell can never match
            assert np.all(b.ref_tokens[row, rl:] == 0)
            assert np.all(b.qry_tokens[row, ql:] == 1)
        for row in range(b.num_real, b.batch):
            assert b.pair_ids[row] == -1
    assert sorted(seen) == list(range(100))


def test_bucketize_real_cells():
    ds = PairDataset.from_pairs([("ACGT" * 10, "ACGT" * 9)])
    buckets = bucketize(ds)
    assert sum(b.real_cells for b in buckets) == ds.num_cells


def test_reorder_output():
    blocks = "2 | 5\nAA\n**\nAA\n0 | 3\nB\n*\nB\n1 | -1\nC\n|\nD\n"
    out = reorder_output(blocks)
    assert out.startswith("0 | 3\n")
    assert out.index("1 | -1") < out.index("2 | 5")


def test_synthetic_dataset_properties():
    ds = synthetic_dataset(50, min_len=50, max_len=60, seed=7)
    st = ds.stats()
    assert st.num_pairs == 50
    assert 50 <= st.min_reference_length <= st.max_reference_length <= 60
    assert set(ds.buffer.tobytes()) <= set(b"ATCG")
