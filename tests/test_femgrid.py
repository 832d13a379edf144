"""Host mesher + P2 grid tests."""
import numpy as np
import pytest

from pl_fem_tpu.config import SimulationConfig
from pl_fem_tpu.models import MCFGeometry
from pl_fem_tpu.ops.femgrid import (
    MeshGenerator,
    TriMesh,
    adaptive_point_cloud,
    build_p2_grid,
    delaunay_mesh,
    export_device_grid,
)
from pl_fem_tpu.ops.mesh_quality import MeshQualityAnalyzer
from pl_fem_tpu.ops.quadrature import RULES, p2_shape


def _unit_square_mesh(n=4):
    ax = np.linspace(0, 1, n)
    X, Y = np.meshgrid(ax, ax)
    return delaunay_mesh(np.stack([X.ravel(), Y.ravel()], axis=1))


def test_p2_partition_of_unity():
    qp, qw = RULES[4]
    N, dN = p2_shape(qp)
    assert np.allclose(N.sum(axis=1), 1.0)
    assert np.allclose(dN.sum(axis=1), 0.0)
    assert np.isclose(qw.sum(), 0.5)  # reference triangle area


def test_uniform_refinement_counts_and_area():
    m = _unit_square_mesh(4)
    a0 = m.areas().sum()
    r = m.refined()
    assert r.n_tris == 4 * m.n_tris
    assert np.isclose(r.areas().sum(), a0)
    assert r.areas().min() > 0


def test_marked_refinement_conforming():
    m = _unit_square_mesh(5)
    a0 = m.areas().sum()
    marked = np.arange(m.n_tris // 3)
    r = m.refined_marked(marked)
    assert np.isclose(r.areas().sum(), a0)
    # conformity: every interior edge shared by exactly 2 triangles
    uniq, elem2edge = r.edges()
    counts = np.zeros(len(uniq), dtype=int)
    np.add.at(counts, elem2edge.ravel(), 1)
    assert counts.max() == 2
    assert r.areas().min() > 1e-12


def test_p2_grid_dof_count():
    m = _unit_square_mesh(4)
    uniq, _ = m.edges()
    g = build_p2_grid(m)
    assert g.n_dofs == m.n_points + len(uniq)
    # boundary of convex square: boundary dofs exist and interior non-empty
    assert len(g.boundary_dofs) > 0
    assert g.interior_mask.sum() == g.n_dofs - len(g.boundary_dofs)


def test_adaptive_cloud_density_near_cores():
    geom = MCFGeometry(7, 8.0, 1.2, 1.53, 1.0)
    pts = adaptive_point_cloud(geom, refinement=1.0)
    r_from_core = np.min(
        np.linalg.norm(pts[:, None, :] - geom.positions[None], axis=-1), axis=1)
    frac_near = (r_from_core < 2 * geom.r_core).mean()
    # cores cover ~1% of the domain area but should hold >30% of points
    assert frac_near > 0.3
    assert np.all(np.linalg.norm(pts, axis=1) <= geom.domain_radius * 1.02)


def test_mesh_generator_budget_and_cache():
    MeshGenerator.clear_cache()
    geom = MCFGeometry(7, 8.0, 1.2, 1.53, 1.0)
    cfg = SimulationConfig(mesh_min_points=3000, mesh_target_points=6000)
    g1 = MeshGenerator.generate(geom, 1.0, cfg)
    assert g1.n_points >= 3000
    g2 = MeshGenerator.generate(geom, 1.0, cfg)
    assert g2 is g1
    stats = MeshGenerator.get_cache_stats()
    assert stats["hits"] == 1 and stats["misses"] == 1


def test_mesh_quality_gates():
    geom = MCFGeometry(7, 8.0, 1.2, 1.53, 1.0)
    cfg = SimulationConfig(mesh_min_points=3000, mesh_target_points=6000)
    g = MeshGenerator.generate(geom, 1.0, cfg)
    ok, msg = MeshQualityAnalyzer.validate_mesh_quality(g.mesh)
    assert ok, msg
    m = MeshQualityAnalyzer.analyze(g.mesh)
    assert m["quality_mean"] > 0.5


def test_device_grid_export():
    geom = MCFGeometry(3, 8.0, 1.2, 1.53, 1.0)
    cfg = SimulationConfig(mesh_min_points=1500, mesh_target_points=4000)
    MeshGenerator.clear_cache()
    grid = MeshGenerator.generate(geom, 0.8, cfg)
    dg = export_device_grid(grid, bucket_rounding=4096)
    assert dg.elem_dofs.shape[0] % 4096 == 0
    assert dg.dof_coords.shape[0] % 4096 == 0
    assert dg.elem_valid.sum() == grid.n_elems
    assert dg.dof_valid.sum() == grid.n_dofs
    # quadrature weights: sum over valid elements = domain area (disk)
    area = dg.qp_w.sum()
    assert area == pytest.approx(np.pi * geom.domain_radius**2, rel=2e-2)
    # pad elements have zero weight
    assert np.all(dg.qp_w[~dg.elem_valid] == 0)
    # physical gradients reproduce a linear function exactly: f = 3x - 2y
    e = 0
    dofs = dg.elem_dofs[e]
    f = 3 * dg.dof_coords[dofs, 0] - 2 * dg.dof_coords[dofs, 1]
    gx = (dg.grad_phys[e, :, :, 0] * f).sum(axis=1)
    gy = (dg.grad_phys[e, :, :, 1] * f).sum(axis=1)
    assert np.allclose(gx, 3.0) and np.allclose(gy, -2.0)


def test_mesh_cache_respects_size_targets():
    """Two configs with different size targets must not alias one
    cache entry (regression: a finer request silently returned the
    cached coarse mesh)."""
    from pl_fem_tpu.config import SimulationConfig
    from pl_fem_tpu.models import MCFGeometry
    from pl_fem_tpu.ops.femgrid import MeshGenerator

    g = MCFGeometry(1, 8.0, 1.5, 1.535, 1.0, wavelength_um=1.55)
    MeshGenerator.clear_cache()
    cfg_a = SimulationConfig(mesh_min_points=300, mesh_target_points=1200)
    cfg_b = SimulationConfig(mesh_min_points=900, mesh_target_points=3600)
    ga = MeshGenerator.generate(g, 0.5, cfg_a)
    gb = MeshGenerator.generate(g, 0.5, cfg_b)
    assert gb.n_points > ga.n_points
    # and the cache still hits for an identical request
    ga2 = MeshGenerator.generate(g, 0.5, cfg_a)
    assert ga2 is ga
