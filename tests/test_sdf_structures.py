"""RealSdf oracle + UniformGridSdf tests.

Mirrors the reference debug apps UniformGridSdfTest and SdfOctreeTest
(golden-vs-brute-force on random samples) plus serialization round-trips.
"""
import numpy as np
import pytest

from sdflib_tpu.mesh import BoundingBox
from sdflib_tpu.sdf import RealSdf, SdfFunction, UniformGridSdf
from sdflib_tpu.utils.primitives import make_icosphere, make_torus


@pytest.fixture(scope="module")
def sphere_mesh():
    return make_icosphere(subdivisions=2, radius=0.4)


@pytest.fixture(scope="module")
def sphere_real(sphere_mesh):
    return RealSdf(sphere_mesh)


def test_real_sdf_sphere(sphere_real):
    rng = np.random.default_rng(0)
    pts = rng.uniform(-0.6, 0.6, (256, 3)).astype(np.float32)
    d = np.asarray(sphere_real.get_distance(pts))
    expected = np.linalg.norm(pts, axis=-1) - 0.4
    np.testing.assert_allclose(d, expected, atol=8e-3)


def test_real_sdf_batch_shapes(sphere_real):
    pts = np.zeros((4, 5, 3), np.float32)
    d = sphere_real.get_distance(pts)
    assert d.shape == (4, 5)
    d2, g = sphere_real.get_distance_and_gradient(pts)
    assert d2.shape == (4, 5) and g.shape == (4, 5, 3)


def test_uniform_grid_matches_oracle_at_corners(sphere_mesh, sphere_real):
    box = sphere_mesh.bounding_box.add_margin(0.1)
    grid = UniformGridSdf(sphere_mesh, box, depth=4)
    nx, ny, nz = grid.grid_size
    # Sample exactly at grid corners: trilinear == stored value == oracle
    xs = np.arange(nx, dtype=np.float32) * grid.cell_size + grid.box.min[0]
    pts = np.stack(
        [
            xs[: nx - 1],
            np.full(nx - 1, grid.box.min[1] + grid.cell_size),
            np.full(nx - 1, grid.box.min[2] + 2 * grid.cell_size),
        ],
        axis=-1,
    )
    d_grid = np.asarray(grid.get_distance(pts))
    d_real = np.asarray(sphere_real.get_distance(pts))
    np.testing.assert_allclose(d_grid, d_real, rtol=1e-4, atol=1e-5)


def test_uniform_grid_interior_accuracy(sphere_mesh, sphere_real):
    box = sphere_mesh.bounding_box.add_margin(0.1)
    grid = UniformGridSdf(sphere_mesh, box, depth=5)
    rng = np.random.default_rng(1)
    pts = rng.uniform(-0.35, 0.35, (256, 3)).astype(np.float32)
    d_grid = np.asarray(grid.get_distance(pts))
    d_real = np.asarray(sphere_real.get_distance(pts))
    # trilinear error bound ~ O(cell^2 * curvature); loose tolerance
    np.testing.assert_allclose(d_grid, d_real, atol=2.5 * grid.cell_size**2 / 0.4 + 2e-3)


def test_uniform_grid_gradient(sphere_mesh):
    """Analytic trilinear gradient == finite differences of the grid query
    (exact invariant; the reference leaves this gradient unimplemented)."""
    box = sphere_mesh.bounding_box.add_margin(0.1)
    grid = UniformGridSdf(sphere_mesh, box, depth=5)
    rng = np.random.default_rng(7)
    # Keep points well inside cells: the trilinear gradient is discontinuous
    # across cell faces, so an FD stencil must not straddle one.
    cell_idx = rng.integers(8, 24, (32, 3))
    frac = rng.uniform(0.2, 0.8, (32, 3))
    pts = (grid.box.min + (cell_idx + frac) * grid.cell_size).astype(np.float32)
    _, g = grid.get_distance_and_gradient(pts)
    g = np.array(g)
    eps = 1e-4
    fd = np.zeros_like(g)
    for ax in range(3):
        dp = np.zeros(3, np.float32)
        dp[ax] = eps
        fd[:, ax] = (
            np.asarray(grid.get_distance(pts + dp))
            - np.asarray(grid.get_distance(pts - dp))
        ) / (2 * eps)
    np.testing.assert_allclose(g, fd, atol=2e-3)
    # Directionally the gradient should be roughly radial (facet normals of
    # the subdiv-2 icosphere deviate up to ~11 degrees from the sphere's).
    gn = g / np.linalg.norm(g, axis=-1, keepdims=True)
    radial = pts / np.linalg.norm(pts, axis=-1, keepdims=True)
    assert np.mean(np.sum(gn * radial, axis=-1) > 0.9) > 0.9


def test_uniform_grid_save_load_roundtrip(tmp_path, sphere_mesh):
    box = sphere_mesh.bounding_box.add_margin(0.05)
    grid = UniformGridSdf(sphere_mesh, box, depth=3)
    path = str(tmp_path / "grid.npz")
    grid.save(path)
    loaded = SdfFunction.load(path)
    assert isinstance(loaded, UniformGridSdf)
    assert loaded.grid_size == grid.grid_size
    rng = np.random.default_rng(2)
    pts = rng.uniform(-0.3, 0.3, (64, 3)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(loaded.get_distance(pts)),
        np.asarray(grid.get_distance(pts)),
        rtol=1e-6,
    )


def test_real_sdf_torus():
    mesh = make_torus(R=0.3, r=0.1, nu=64, nv=32)
    sdf = RealSdf(mesh)
    rng = np.random.default_rng(3)
    pts = rng.uniform(-0.45, 0.45, (128, 3)).astype(np.float32)
    d = np.asarray(sdf.get_distance(pts))
    q = np.stack(
        [np.linalg.norm(pts[:, :2], axis=-1) - 0.3, pts[:, 2]], axis=-1
    )
    expected = np.linalg.norm(q, axis=-1) - 0.1
    np.testing.assert_allclose(d, expected, atol=1.5e-2)


def test_grid_octree_init_matches_basic():
    """UniformGridSdfOctreeTest role: BASIC and OCTREE inits must produce
    the same grid values (reference src/tools/UniformGridSdfOctreeTest)."""
    from sdflib_tpu.sdf.grid import UniformGridSdf
    from sdflib_tpu.utils.primitives import make_icosphere

    mesh = make_icosphere(subdivisions=1, radius=0.35)
    box = mesh.bounding_box.add_margin(0.1)
    basic = UniformGridSdf(mesh, box, depth=4, init_algorithm="basic")
    octree = UniformGridSdf(mesh, box, depth=4, init_algorithm="octree")
    np.testing.assert_allclose(
        np.asarray(basic.grid), np.asarray(octree.grid), rtol=1e-5, atol=1e-6
    )
