"""Dataset layer: pair-file parsing, length bucketing, output formatting."""

from tpu_align.io.dataset import (
    PairDataset,
    DatasetStats,
    parse_pair_file,
    parse_pair_text,
    write_pair_file,
)
from tpu_align.io.bucketing import Bucket, BucketSpec, bucketize

__all__ = [
    "PairDataset",
    "DatasetStats",
    "parse_pair_file",
    "parse_pair_text",
    "write_pair_file",
    "Bucket",
    "BucketSpec",
    "bucketize",
]
