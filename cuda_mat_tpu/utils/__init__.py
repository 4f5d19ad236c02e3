"""Timers, metrics, and observability helpers."""

from cuda_mat_tpu.utils.timing import PhaseTimer, second

__all__ = ["PhaseTimer", "second"]
