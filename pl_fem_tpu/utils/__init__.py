"""Utilities: phase timing / profiling hooks."""
from .profiling import PhaseTimer, device_trace

__all__ = ["PhaseTimer", "device_trace"]
