"""Batch engine: bucketed pipeline, phase profiling, GCUPS accounting."""

from tpu_align.runtime.engine import AlignmentEngine, EngineResult
from tpu_align.runtime.profiler import PhaseTimer

__all__ = ["AlignmentEngine", "EngineResult", "PhaseTimer"]
