"""Multi-chip scale-out: design-parallel solving over a device mesh."""
from .engine import design_mesh

__all__ = ["design_mesh"]
