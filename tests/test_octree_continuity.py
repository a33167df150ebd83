"""CONTINUITY octree builder tests.

Mirrors the reference's default build path
(src/sdf/OctreeSdfBreadthFirstNoDelay.h): accuracy vs the brute-force
oracle, structure invariants, serialization, and the C0 property — jumps
across leaf faces must not exceed the NO_CONTINUITY build's on aggregate.
"""
import numpy as np
import pytest

from sdflib_tpu.sdf import RealSdf, SdfFunction
from sdflib_tpu.sdf.octree import OctreeSdf
from sdflib_tpu.sdf.octree_builder import CHILDREN_INDEX_MASK, IS_LEAF_MASK
from sdflib_tpu.utils.primitives import make_icosphere


@pytest.fixture(scope="module")
def sphere_mesh():
    return make_icosphere(subdivisions=2, radius=0.35)


@pytest.fixture(scope="module")
def sphere_real(sphere_mesh):
    return RealSdf(sphere_mesh)


@pytest.fixture(scope="module")
def cont_octree(sphere_mesh):
    box = sphere_mesh.bounding_box.add_margin(0.14)
    return OctreeSdf(
        sphere_mesh,
        box,
        max_depth=5,
        start_depth=2,
        termination_threshold=1e-3,
        init_algorithm="continuity",
    )


@pytest.fixture(scope="module")
def nocont_octree(sphere_mesh):
    box = sphere_mesh.bounding_box.add_margin(0.14)
    return OctreeSdf(
        sphere_mesh,
        box,
        max_depth=5,
        start_depth=2,
        termination_threshold=1e-3,
        init_algorithm="no_continuity",
    )


def test_continuity_query_close_to_oracle(cont_octree, sphere_real):
    rng = np.random.default_rng(0)
    lo = cont_octree.box.min + 1e-3
    hi = cont_octree.box.max - 1e-3
    pts = rng.uniform(lo, hi, (2048, 3)).astype(np.float32)
    d_oct = np.asarray(cont_octree.get_distance(pts))
    d_real = np.asarray(sphere_real.get_distance(pts))
    err = np.abs(d_oct - d_real)
    rms = float(np.sqrt(np.mean(err**2)))
    assert rms < 4e-3, rms
    assert np.quantile(err, 0.95) < 8e-3


def _face_jumps(oct_, n=4096, eps=1e-5, seed=7):
    """|d(p+) - d(p-)| for point pairs straddling internal cell faces of the
    max-depth lattice (a superset of the leaf faces)."""
    rng = np.random.default_rng(seed)
    s = 1 << oct_.max_depth
    cell = oct_.box.size[0] / s
    # random internal face points on x=const planes of the finest lattice
    fx = rng.integers(1, s, n)
    yz = rng.uniform(0, s, (n, 2))
    pts = np.stack([fx.astype(np.float64), yz[:, 0], yz[:, 1]], axis=-1)
    pts = oct_.box.min + pts * cell
    plus = pts.copy()
    minus = pts.copy()
    plus[:, 0] += eps
    minus[:, 0] -= eps
    dp = np.asarray(oct_.get_distance(plus.astype(np.float32)))
    dm = np.asarray(oct_.get_distance(minus.astype(np.float32)))
    return np.abs(dp - dm)


def test_continuity_reduces_face_jumps(cont_octree, nocont_octree):
    j_cont = _face_jumps(cont_octree)
    j_nc = _face_jumps(nocont_octree)
    # the continuity build must not be worse, and should be clearly better
    # in the tail where the no-continuity build has visible seams
    assert np.mean(j_cont) <= np.mean(j_nc) * 1.05 + 1e-7
    assert np.quantile(j_cont, 0.999) <= max(
        np.quantile(j_nc, 0.999) * 1.05, 5e-5
    )


def test_continuity_structure_invariants(cont_octree):
    data = np.asarray(cont_octree.octree_data)
    s = cont_octree.start_grid_size
    n0 = s**3
    num_coeff = cont_octree.num_coefficients

    stack = list(range(n0))
    depth = {i: cont_octree.start_depth for i in range(n0)}
    leaves = 0
    visited_coeffs = set()
    while stack:
        idx = stack.pop()
        word = data[idx]
        d = depth[idx]
        base = int(word & CHILDREN_INDEX_MASK)
        if word & IS_LEAF_MASK:
            assert base + num_coeff <= len(data)
            assert base not in visited_coeffs, "coefficient slot aliased"
            visited_coeffs.add(base)
            leaves += 1
        else:
            assert d < cont_octree.max_depth, "inner node at max depth"
            assert base + 8 <= len(data)
            for c in range(8):
                stack.append(base + c)
                depth[base + c] = d + 1
    assert leaves > 0


def test_continuity_stats_recorded(cont_octree):
    stats = cont_octree.build_stats
    assert "midpoints_clamped" in stats
    assert "resubdivided" in stats
    assert stats["midpoints_clamped"] > 0  # continuity actually engaged


def test_continuity_save_load_roundtrip(tmp_path, cont_octree):
    path = str(tmp_path / "cont.npz")
    cont_octree.save(path)
    loaded = SdfFunction.load(path)
    rng = np.random.default_rng(3)
    pts = rng.uniform(-0.4, 0.4, (256, 3)).astype(np.float32)
    np.testing.assert_array_equal(
        np.asarray(loaded.get_distance(pts)),
        np.asarray(cont_octree.get_distance(pts)),
    )


def test_continuity_strategy_cull_same_structure(sphere_mesh, cont_octree):
    """The pluggable influence-strategy cull must leave the continuity
    builder's output unchanged to sampling accuracy (safe superset; only
    argmin ties can drift) with fewer triangles per node."""
    box = sphere_mesh.bounding_box.add_margin(0.14)
    alt = OctreeSdf(
        sphere_mesh, box, max_depth=5, start_depth=2,
        termination_threshold=1e-3, init_algorithm="continuity",
        strategy="lattice",
    )
    base = cont_octree
    assert alt.octree_data.shape == base.octree_data.shape
    rng = np.random.default_rng(13)
    pts = rng.uniform(box.min, box.max, (4096, 3)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(alt.get_distance(pts)),
        np.asarray(base.get_distance(pts)),
        atol=2e-4,
    )
    tb = base.build_stats["tris_per_node"]
    ta = alt.build_stats["tris_per_node"]
    assert min(ta[d] / max(tb[d], 1e-9) for d in tb) < 0.9, (ta, tb)
