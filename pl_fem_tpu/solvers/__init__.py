"""High-level eigenmode solvers (reference seam: solver_fem.py).

- :class:`ScalarHelmholtzSolver` — scalar Helmholtz pencil
  (solver_fem.py:245-276 capability).
- :class:`TrueVectorialMaxwellSolver` — vectorial H-field with divergence
  penalty (solver_fem.py:113-239 capability).

Both expose a ``backend`` switch: 'tpu' (factorization-free Chebyshev
subspace filtering, fully on device) or 'hybrid' (device assembly + host
ARPACK shift-invert — the parity oracle).
"""
from .postproc import (
    confinement_from_dofs,
    in_core_mask,
    polarization_from_powers,
)
from .scalar import ScalarHelmholtzSolver, build_scalar_pencil
from .vectorial import TrueVectorialMaxwellSolver

__all__ = [
    "ScalarHelmholtzSolver",
    "TrueVectorialMaxwellSolver",
    "build_scalar_pencil",
    "in_core_mask",
    "confinement_from_dofs",
    "polarization_from_powers",
]
