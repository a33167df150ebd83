"""OctreeSdf build + query tests — octree vs brute-force oracle.

Mirrors the reference's SdfOctreeTest debug app (OctreeSdf vs RealSdf on
random samples) plus structure-level invariants the reference only checks
visually.
"""
import numpy as np
import pytest

from sdflib_tpu.sdf import RealSdf, SdfFunction
from sdflib_tpu.sdf.octree import OctreeSdf
from sdflib_tpu.sdf.octree_builder import CHILDREN_INDEX_MASK, IS_LEAF_MASK
from sdflib_tpu.utils.primitives import make_icosphere, make_torus


@pytest.fixture(scope="module")
def sphere_mesh():
    return make_icosphere(subdivisions=2, radius=0.35)


@pytest.fixture(scope="module")
def sphere_real(sphere_mesh):
    return RealSdf(sphere_mesh)


@pytest.fixture(scope="module")
def sphere_octree(sphere_mesh):
    box = sphere_mesh.bounding_box.add_margin(0.14)  # ~20% margin, CLI default
    return OctreeSdf(
        sphere_mesh,
        box,
        max_depth=5,
        start_depth=2,
        termination_threshold=1e-3,
        init_algorithm="no_continuity",
    )


def test_octree_query_close_to_oracle(sphere_octree, sphere_real):
    rng = np.random.default_rng(0)
    lo = sphere_octree.box.min + 1e-3
    hi = sphere_octree.box.max - 1e-3
    pts = rng.uniform(lo, hi, (2048, 3)).astype(np.float32)
    d_oct = np.asarray(sphere_octree.get_distance(pts))
    d_real = np.asarray(sphere_real.get_distance(pts))
    err = np.abs(d_oct - d_real)
    rms = float(np.sqrt(np.mean(err**2)))
    # Termination threshold is 1e-3 on the per-node RMS integral; allow the
    # expected slack for nodes terminated right at the bound.
    assert rms < 4e-3, rms
    assert np.quantile(err, 0.95) < 8e-3


def test_octree_uniform_corners_exact(sphere_mesh, sphere_real):
    """UNIFORM build subdivides everything to max depth; at leaf corner
    lattice points the tricubic interpolates its own sample values, so the
    octree must equal the oracle there exactly."""
    box = sphere_mesh.bounding_box.add_margin(0.1)
    oct_ = OctreeSdf(
        sphere_mesh, box, max_depth=3, start_depth=1, init_algorithm="uniform"
    )
    s = 1 << 3
    cell = oct_.box.size[0] / s
    rng = np.random.default_rng(1)
    ii = rng.integers(0, s + 1, (128, 3))
    pts = (oct_.box.min + ii * cell).astype(np.float32)
    # nudge corner points into the domain interior so descent picks a
    # well-defined cell
    pts = np.clip(pts, oct_.box.min + 1e-5, oct_.box.max - 1e-5)
    d_oct = np.asarray(oct_.get_distance(pts))
    d_real = np.asarray(sphere_real.get_distance(pts))
    np.testing.assert_allclose(d_oct, d_real, atol=5e-4)


def test_octree_out_of_box_fallback(sphere_octree):
    """Outside the domain: box SDF + min border value (OctreeSdf.cpp:99-104)."""
    pts = np.array(
        [[10.0, 0.0, 0.0], [0.0, -5.0, 2.0], [3.0, 3.0, 3.0]], np.float32
    )
    d = np.asarray(sphere_octree.get_distance(pts))
    center = sphere_octree.box.center
    half = 0.5 * sphere_octree.box.size
    q = np.abs(pts - center) - half
    box_d = np.linalg.norm(np.maximum(q, 0), axis=-1) + np.minimum(
        q.max(axis=-1), 0
    )
    np.testing.assert_allclose(
        d, box_d + sphere_octree.min_border_value, rtol=1e-5
    )


def test_octree_gradient_normalized(sphere_octree):
    rng = np.random.default_rng(2)
    pts = rng.uniform(-0.3, 0.3, (128, 3)).astype(np.float32)
    d, g = sphere_octree.get_distance_and_gradient(pts)
    g = np.asarray(g)
    np.testing.assert_allclose(np.linalg.norm(g, axis=-1), 1.0, atol=1e-4)
    radial = pts / np.linalg.norm(pts, axis=-1, keepdims=True)
    assert np.mean(np.sum(g * radial, axis=-1) > 0.9) > 0.85


def test_octree_structure_invariants(sphere_octree):
    """Every inner node's children index and leaf coefficient index are in
    bounds; all max-depth paths end at leaves."""
    data = np.asarray(sphere_octree.octree_data)
    s = sphere_octree.start_grid_size
    n0 = s**3
    num_coeff = sphere_octree.num_coefficients

    stack = list(range(n0))
    depth = {i: sphere_octree.start_depth for i in range(n0)}
    leaves = 0
    while stack:
        idx = stack.pop()
        word = data[idx]
        d = depth[idx]
        if word & IS_LEAF_MASK:
            base = int(word & CHILDREN_INDEX_MASK)
            assert base + num_coeff <= len(data)
            leaves += 1
        else:
            base = int(word & CHILDREN_INDEX_MASK)
            assert d < sphere_octree.max_depth, "inner node at max depth"
            assert base + 8 <= len(data)
            for c in range(8):
                stack.append(base + c)
                depth[base + c] = d + 1
    assert leaves > 0


def test_octree_depth_density_sums_to_one(sphere_octree):
    density = sphere_octree.get_depth_density()
    np.testing.assert_allclose(density.sum(), 1.0, rtol=1e-5)


def test_octree_save_load_roundtrip(tmp_path, sphere_octree):
    path = str(tmp_path / "oct.npz")
    sphere_octree.save(path)
    loaded = SdfFunction.load(path)
    assert isinstance(loaded, OctreeSdf)
    rng = np.random.default_rng(3)
    pts = rng.uniform(-0.4, 0.4, (256, 3)).astype(np.float32)
    np.testing.assert_array_equal(
        np.asarray(loaded.get_distance(pts)),
        np.asarray(sphere_octree.get_distance(pts)),
    )
    assert loaded.max_depth == sphere_octree.max_depth
    assert loaded.min_border_value == pytest.approx(sphere_octree.min_border_value)


def test_octree_trilinear_variant(sphere_mesh, sphere_real):
    box = sphere_mesh.bounding_box.add_margin(0.1)
    oct_ = OctreeSdf(
        sphere_mesh,
        box,
        max_depth=5,
        start_depth=2,
        termination_threshold=1e-3,
        interpolation="trilinear",
    )
    rng = np.random.default_rng(4)
    pts = rng.uniform(-0.3, 0.3, (512, 3)).astype(np.float32)
    d_oct = np.asarray(oct_.get_distance(pts))
    d_real = np.asarray(sphere_real.get_distance(pts))
    assert np.sqrt(np.mean((d_oct - d_real) ** 2)) < 6e-3


def test_octree_torus(sphere_real):
    mesh = make_torus(R=0.3, r=0.12, nu=48, nv=24)
    box = mesh.bounding_box.add_margin(0.1)
    oct_ = OctreeSdf(mesh, box, max_depth=5, start_depth=2,
                     termination_threshold=1e-3)
    real = RealSdf(mesh)
    rng = np.random.default_rng(5)
    pts = rng.uniform(-0.4, 0.4, (1024, 3)).astype(np.float32)
    d_oct = np.asarray(oct_.get_distance(pts))
    d_real = np.asarray(real.get_distance(pts))
    assert np.sqrt(np.mean((d_oct - d_real) ** 2)) < 4e-3


def test_query_grid_matches_descent(sphere_octree):
    """The O(1) dense-grid query must agree with the descent query."""
    import copy

    rng = np.random.default_rng(7)
    lo = sphere_octree.box.min + 1e-4
    hi = sphere_octree.box.max - 1e-4
    pts = rng.uniform(lo, hi, (4096, 3)).astype(np.float32)
    # add out-of-box points and cell-boundary points
    pts = np.concatenate([
        pts,
        np.array([[5.0, 0, 0], [0, -4, 0]], np.float32),
        (sphere_octree.box.min
         + sphere_octree.box.size * np.array([[0.5, 0.25, 0.75]], np.float32)),
    ])

    d_descent = np.asarray(sphere_octree.get_distance(pts))
    dd, gd = sphere_octree.get_distance_and_gradient(pts)

    grid_oct = copy.copy(sphere_octree)
    grid_oct.build_query_grid()
    d_grid = np.asarray(grid_oct.get_distance(pts))
    dg, gg = grid_oct.get_distance_and_gradient(pts)

    np.testing.assert_allclose(d_grid, d_descent, atol=1e-6)
    np.testing.assert_allclose(np.asarray(dg), np.asarray(dd), atol=1e-6)
    np.testing.assert_allclose(np.asarray(gg), np.asarray(gd), atol=1e-4)


@pytest.mark.parametrize("strategy", ["lattice", "basic"])
def test_octree_strategy_cull_same_structure(sphere_mesh, strategy):
    """Influence-strategy culls (safe supersets) must produce the same
    tree shape and the same field values to sampling accuracy — every
    cull retains each sample point's nearest triangle, so only argmin
    TIES (equidistant winners at the icosphere's symmetry points, whose
    gradients differ) can perturb the fit — while keeping fewer
    triangles per node."""
    box = sphere_mesh.bounding_box.add_margin(0.14)
    kw = dict(max_depth=4, start_depth=1, termination_threshold=1e-3,
              init_algorithm="no_continuity")
    base = OctreeSdf(sphere_mesh, box, **kw)
    alt = OctreeSdf(sphere_mesh, box, strategy=strategy, **kw)
    assert alt.octree_data.shape == base.octree_data.shape
    assert alt.build_stats["leaves_per_depth"] == (
        base.build_stats["leaves_per_depth"]
    )
    rng = np.random.default_rng(11)
    pts = rng.uniform(box.min, box.max, (4096, 3)).astype(np.float32)
    d_a = np.asarray(alt.get_distance(pts))
    d_b = np.asarray(base.get_distance(pts))
    # below the 1e-3 termination threshold: tie-induced drift only
    np.testing.assert_allclose(d_a, d_b, atol=2e-4)

    tb = base.build_stats["tris_per_node"]
    ta = alt.build_stats["tris_per_node"]
    assert all(ta[d] <= tb[d] + 1e-9 for d in tb), (ta, tb)
    # the tightest level should actually be tighter, not just equal
    assert min(ta[d] / max(tb[d], 1e-9) for d in tb) < 0.9, (ta, tb)
