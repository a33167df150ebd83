"""Octree-tile sharding: per-chip structure ~1/N, results match the
replicated structure (SURVEY.md S5.7-5.8 scaling axis)."""
import numpy as np
import pytest

import jax

from sdflib_tpu.parallel.mesh import default_mesh
from sdflib_tpu.parallel.tiles import TiledExactOctreeSdf
from sdflib_tpu.sdf.exact_octree import ExactOctreeSdf
from sdflib_tpu.utils.primitives import make_torus


@pytest.fixture(scope="module")
def setup():
    mesh = make_torus(R=0.3, r=0.12, nu=24, nv=12)
    box = mesh.bounding_box.add_margin(0.14)
    kw = dict(max_depth=4, start_depth=2, min_triangles_per_node=16)
    rep = ExactOctreeSdf(mesh, box, **kw)
    tiled = TiledExactOctreeSdf(mesh, box, **kw)
    return mesh, rep, tiled


def test_tiled_matches_replicated(setup):
    mesh, rep, tiled = setup
    rng = np.random.default_rng(0)
    lo = np.asarray(rep.box.min) - 0.1       # includes out-of-box points
    hi = np.asarray(rep.box.max) + 0.1
    pts = rng.uniform(lo, hi, (8192, 3)).astype(np.float32)
    d_rep = np.asarray(rep.get_distance(pts))
    d_til = np.asarray(tiled.get_distance(pts))
    # The tiled path compiles a per-point scan where the replicated path
    # compiles the grouped kernel; XLA fuses the on-the-fly frame math
    # differently, so equidistant-winner ties can flip (observed <=6e-8).
    # Same-program determinism is asserted bit-exact separately below.
    np.testing.assert_allclose(d_rep, d_til, rtol=1e-6, atol=1e-7)


def test_tiled_structure_is_sharded(setup):
    _, rep, tiled = setup
    n_dev = len(jax.devices())
    assert tiled.arrays["bucket_fields"].shape[0] == n_dev
    # each shard's bucket table is a fraction of the replicated one's
    rep_rows = int(rep.bucket_ids.shape[0])
    per_shard_rows = int(tiled.arrays["bucket_ids"].shape[1])
    assert per_shard_rows < rep_rows
    # every stacked array is placed with the tile axis over the mesh
    for name, arr in tiled.arrays.items():
        spec = arr.sharding.spec
        assert spec and spec[0] is not None, name


def test_tiled_shard_determinism(setup):
    """Same query twice -> bit-identical (the psum routing is static)."""
    _, _, tiled = setup
    rng = np.random.default_rng(3)
    pts = rng.uniform(-0.4, 0.4, (2048, 3)).astype(np.float32)
    a = np.asarray(tiled.get_distance(pts))
    b = np.asarray(tiled.get_distance(pts))
    np.testing.assert_array_equal(a, b)


def test_tiled_gradient_matches_replicated(setup):
    """Sharded gradient query (ExactOctreeSdf.cpp:180-320 role) vs the
    replicated structure."""
    _, rep, tiled = setup
    rng = np.random.default_rng(7)
    lo = np.asarray(rep.box.min) - 0.1
    hi = np.asarray(rep.box.max) + 0.1
    pts = rng.uniform(lo, hi, (4096, 3)).astype(np.float32)
    d_r, g_r = rep.get_distance_and_gradient(pts)
    d_t, g_t = tiled.get_distance_and_gradient(pts)
    np.testing.assert_allclose(
        np.asarray(d_r), np.asarray(d_t), rtol=1e-6, atol=1e-7
    )
    # winner ties can flip between differently-fused programs; bound the
    # fraction of differing normalized gradients instead of ulp equality
    err = np.linalg.norm(np.asarray(g_r) - np.asarray(g_t), axis=-1)
    assert (err > 1e-4).mean() < 1e-3
    # same-program determinism IS bit-exact
    d_t2, g_t2 = tiled.get_distance_and_gradient(pts)
    np.testing.assert_array_equal(np.asarray(d_t), np.asarray(d_t2))
    np.testing.assert_array_equal(np.asarray(g_t), np.asarray(g_t2))


def test_tiled_save_load_roundtrip(setup, tmp_path):
    """SdfFunction conformance: save -> format-dispatched load -> bit-
    identical queries on the same chip count."""
    from sdflib_tpu.sdf.sdf_function import SdfFormat, SdfFunction

    _, _, tiled = setup
    assert tiled.get_format() == SdfFormat.EXACT_OCTREE_TILED
    path = str(tmp_path / "tiled.npz")
    tiled.save(path)
    loaded = SdfFunction.load(path)
    assert type(loaded).__name__ == "TiledExactOctreeSdf"
    rng = np.random.default_rng(9)
    pts = rng.uniform(-0.4, 0.4, (2048, 3)).astype(np.float32)
    np.testing.assert_array_equal(
        np.asarray(tiled.get_distance(pts)),
        np.asarray(loaded.get_distance(pts)),
    )


def test_tiled_single_cell_shards_exact():
    """start_depth=1 on 8 chips puts ONE start cell per shard: the shard
    flat array's start grid is 1 word, so child octets begin off an
    8-word row unless the builder pads the grid block (regression: the
    row-gather descent read children one word early and returned wrong
    triangles with wrong signs)."""
    from sdflib_tpu.triangle import calculate_mesh_triangle_data
    from sdflib_tpu.ops.point_triangle import signed_distance_batch
    import jax.numpy as jnp

    mesh = make_torus(R=0.3, r=0.12, nu=24, nv=12)
    box = mesh.bounding_box.add_margin(0.14)
    tiled = TiledExactOctreeSdf(
        mesh, box, max_depth=3, start_depth=1, min_triangles_per_node=8
    )
    soa = jax.tree.map(jnp.asarray, calculate_mesh_triangle_data(mesh))
    rng = np.random.default_rng(13)
    pts = rng.uniform(
        np.asarray(box.min), np.asarray(box.max), (2048, 3)
    ).astype(np.float32)
    oracle = np.asarray(signed_distance_batch(jnp.asarray(pts), soa))
    d = np.asarray(tiled.get_distance(pts))
    np.testing.assert_allclose(d, oracle, rtol=1e-6, atol=2e-5)


def test_tiled_octree_matches_replicated(tmp_path):
    """TiledOctreeSdf (fused-row grid in z-slabs) vs the replicated
    OctreeSdf grid query — same eval math, one psum."""
    from sdflib_tpu.parallel.tiles import TiledOctreeSdf
    from sdflib_tpu.sdf.octree import OctreeSdf
    from sdflib_tpu.sdf.sdf_function import SdfFunction

    mesh = make_torus(R=0.3, r=0.12, nu=24, nv=12)
    box = mesh.bounding_box.add_margin(0.14)
    rep = OctreeSdf(mesh, box, max_depth=4, start_depth=1,
                    termination_threshold=1e-3)
    rep.build_query_grid()
    tiled = TiledOctreeSdf(_octree=rep)
    rng = np.random.default_rng(11)
    lo = np.asarray(rep.box.min) - 0.1
    hi = np.asarray(rep.box.max) + 0.1
    pts = rng.uniform(lo, hi, (8192, 3)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(rep.get_distance(pts)),
        np.asarray(tiled.get_distance(pts)),
        rtol=1e-6, atol=1e-7,
    )
    d_r, g_r = rep.get_distance_and_gradient(pts)
    d_t, g_t = tiled.get_distance_and_gradient(pts)
    np.testing.assert_allclose(
        np.asarray(d_r), np.asarray(d_t), rtol=1e-6, atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(g_r), np.asarray(g_t), rtol=1e-5, atol=1e-5
    )
    # sharded placement + per-chip accounting
    n_dev = len(jax.devices())
    assert tiled.fat_grid.sharding.spec[0] is not None
    assert len(tiled.per_chip_grid_bytes()) == n_dev
    # save/load round trip through the format dispatch
    path = str(tmp_path / "tiled_oct.npz")
    tiled.save(path)
    loaded = SdfFunction.load(path)
    np.testing.assert_array_equal(
        np.asarray(tiled.get_distance(pts)),
        np.asarray(loaded.get_distance(pts)),
    )
