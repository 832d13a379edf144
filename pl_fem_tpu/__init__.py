"""pl_fem_tpu — TPU-native vectorial FEM photonic-lantern framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
KhaoulaAguech/pl-fem-vectoriel: fully vectorial H-field finite-element
eigenmode simulation of polymer photonic lanterns plus large-scale
parametric dataset generation, built TPU-first:

- host-side adaptive Delaunay meshing frozen into padded static-shape
  element arrays (bucketed for jit-cache reuse);
- vmapped per-element P2 quadrature assembly (all bilinear forms in one
  pass) feeding matrix-free block operators (batched 12x12 matmuls on
  the MXU + segment-sum scatter);
- a generalized LOBPCG (extremal, scalar Helmholtz) and a Chebyshev
  fold-filter subspace eigensolver (interior, vectorial H-field pencil)
  replacing ARPACK shift-invert;
- jitted sectional loss models, lax.scan coupled-mode-theory taper
  propagation, and shard_map dataset generation over the device mesh.
"""

__version__ = "0.2.0"

import os as _os

# Persistent XLA compile cache: the packed-sweep executables take
# minutes to build per bucket shape; cache them across processes.
# Opt out with PL_FEM_NO_COMPILE_CACHE=1.
if not _os.environ.get("PL_FEM_NO_COMPILE_CACHE"):
    try:
        import jax as _jax

        _cache = _os.environ.get(
            "PL_FEM_COMPILE_CACHE",
            _os.path.expanduser("~/.cache/pl_fem_tpu/xla"))
        # Scope ALL entries per host fingerprint: XLA:CPU entries are
        # AOT host machine code whose cache key does NOT cover machine
        # features — entries written on one host load on another as
        # mismatched codegen (XLA warns of SIGILL; observed
        # '+prefer-no-gather' executables run scalar-gather fallbacks,
        # pathologically slow — a CPU test that hit a foreign
        # chunk-kernel entry ground >40 min, and another died with a
        # Fatal abort). Keying on the env var alone missed runs that
        # force CPU via jax.config.update, so scope unconditionally:
        # TPU programs compile on the device service and simply don't
        # care which host subdir they live under.
        import hashlib as _hashlib
        try:
            with open("/proc/cpuinfo") as _f:
                _sig = "\n".join(
                    ln for ln in _f.read().splitlines()
                    if ln.startswith(("flags", "model name")))
        except OSError:
            _sig = "unknown"
        _tag = _hashlib.sha1(_sig.encode()).hexdigest()[:12]
        _cache = _os.path.join(_cache, f"host-{_tag}")
        _os.makedirs(_cache, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache)
        # cache EVERYTHING: through the axon remote compiler even
        # trivial elementwise programs cost ~0.4 s each to compile, and
        # a production sweep warmup touches ~70 of them — at the
        # default 2 s write floor they recompile every process (~60 s
        # of a cold bench warmup; /tmp/child_dbg.log post-mortem)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs",
                           0.0)
        _jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:                        # cache is best-effort only
        pass

from .constants import PHYS, PhysConst
from .config import (
    MeshConfig,
    PhotonicLanternDesignParameters,
    PhysicalConstants,
    SimulationConfig,
    SolverConfig,
)
from .materials import Air, IPDipCauchy, Silica
from .models import (
    MCFGeometry,
    MMFGeometry,
    PhotonicLantern,
    PhotonicLanternGeometry,
    TaperSection,
)

__all__ = [
    "PHYS", "PhysConst", "PhysicalConstants", "SimulationConfig",
    "SolverConfig", "MeshConfig", "PhotonicLanternDesignParameters",
    "IPDipCauchy", "Silica", "Air",
    "MCFGeometry", "MMFGeometry", "PhotonicLantern",
    "PhotonicLanternGeometry", "TaperSection",
    # lazy heavy subsystems (see __getattr__)
    "ScalarHelmholtzSolver", "TrueVectorialMaxwellSolver",
    "LossCalculator", "EnhancedLossCalculator", "VectorialLossCalculator",
    "CoupledModeTheory", "MeshGenerator",
    "DatasetGenerator", "DatasetRecord", "SmartSampler", "AdaptiveSampler",
    "ParametricSpace",
]

_LAZY = {
    "ScalarHelmholtzSolver": "solvers",
    "TrueVectorialMaxwellSolver": "solvers",
    "LossCalculator": "physics",
    "EnhancedLossCalculator": "physics",
    "VectorialLossCalculator": "physics",
    "CoupledModeTheory": "physics.cmt",
    "MeshGenerator": "ops.femgrid",
    "DatasetGenerator": "dataset",
    "DatasetRecord": "dataset",
    "SmartSampler": "dataset",
    "AdaptiveSampler": "dataset",
    "ParametricSpace": "dataset",
}


def __getattr__(name):
    """Lazy top-level exports: importing pl_fem_tpu stays light; heavy
    subsystems (jax-jitted solver/physics/dataset stacks) load on first
    attribute access."""
    if name in _LAZY:
        import importlib

        mod = importlib.import_module("." + _LAZY[name], __name__)
        return getattr(mod, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
