"""Golden-file generation and independent output verification."""

from tpu_align.verify.golden import (
    generate_goldens,
    parse_output_blocks,
    rescore_alignment,
    verify_output,
)

__all__ = [
    "generate_goldens",
    "parse_output_blocks",
    "rescore_alignment",
    "verify_output",
]
