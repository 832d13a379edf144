"""Dataset generation: parametric space, samplers, records, orchestrator."""
from .generator import DatasetGenerator
from .parametric_space import (
    ParametricSpace,
    PhysicalValidator,
    SampleQualityScorer,
)
from .record import DatasetRecord
from .sampling import AdaptiveSampler, SmartSampler

__all__ = [
    "ParametricSpace",
    "PhysicalValidator",
    "SampleQualityScorer",
    "SmartSampler",
    "AdaptiveSampler",
    "DatasetRecord",
    "DatasetGenerator",
]
