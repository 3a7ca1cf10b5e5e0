"""Utilities: synthetic workload generation, output reordering."""

from tpu_align.utils.synthetic import synthetic_dataset, mutate
from tpu_align.utils.reorder import reorder_output

__all__ = ["synthetic_dataset", "mutate", "reorder_output"]
