"""Native C ABI shim tests: C++ query engine vs the JAX query path
(SdfLibUnity FFI parity, reference src/tools/SdfLibUnity/SdfExportFunc.h).
"""
import numpy as np
import pytest

from sdflib_tpu.io.sdflib_binary import save_sdflib_bin
from sdflib_tpu.native import NativeOctreeSdf, native_available
from sdflib_tpu.sdf.octree import OctreeSdf
from sdflib_tpu.utils.primitives import make_icosphere

pytestmark = pytest.mark.skipif(
    not native_available(), reason="g++ toolchain unavailable"
)


@pytest.fixture(scope="module")
def octree():
    mesh = make_icosphere(subdivisions=2, radius=0.35)
    box = mesh.bounding_box.add_margin(0.14)
    return OctreeSdf(mesh, box, max_depth=4, start_depth=1,
                     termination_threshold=1e-3)


@pytest.fixture(scope="module")
def points(octree):
    rng = np.random.default_rng(0)
    inside = rng.uniform(
        octree.box.min + 1e-4, octree.box.max - 1e-4, (4096, 3)
    )
    outside = rng.uniform(1.0, 3.0, (128, 3)) * rng.choice(
        [-1.0, 1.0], (128, 3)
    )
    return np.concatenate([inside, outside]).astype(np.float32)


def test_native_matches_jax_query(octree, points):
    native = NativeOctreeSdf.from_octree(octree)
    d_native = native.get_distance(points)
    d_jax = np.asarray(octree.get_distance(points))
    np.testing.assert_allclose(d_native, d_jax, atol=2e-6)


def test_native_bin_roundtrip(tmp_path, octree, points):
    path = str(tmp_path / "oct.bin")
    save_sdflib_bin(octree, path)
    native = NativeOctreeSdf.load(path)

    assert native.start_grid_size == octree.start_grid_size
    np.testing.assert_allclose(native.bb_min, octree.box.min, rtol=1e-6)
    assert native.bb_size == pytest.approx(float(octree.box.size[0]))
    np.testing.assert_array_equal(
        native.octree_data, np.asarray(octree.octree_data)
    )

    d_native = native.get_distance(points[:512])
    d_jax = np.asarray(octree.get_distance(points[:512]))
    np.testing.assert_allclose(d_native, d_jax, atol=2e-6)

    # save from the native side and reload
    path2 = str(tmp_path / "oct2.bin")
    native.save(path2)
    native2 = NativeOctreeSdf.load(path2)
    np.testing.assert_array_equal(
        native2.octree_data, np.asarray(octree.octree_data)
    )


def test_native_gradient(octree):
    native = NativeOctreeSdf.from_octree(octree)
    p = np.array([0.21, -0.1, 0.05], np.float32)
    d, g = native.get_distance_and_gradient(p)
    d_jax, g_jax = octree.get_distance_and_gradient(p[None])
    assert d == pytest.approx(float(np.asarray(d_jax)[0]), abs=2e-6)
    np.testing.assert_allclose(g, np.asarray(g_jax)[0], atol=1e-4)
    assert np.linalg.norm(g) == pytest.approx(1.0, abs=1e-4)


def test_native_load_missing_file():
    with pytest.raises(IOError):
        NativeOctreeSdf.load("/nonexistent/q.bin")


# ---------------------------------------------------------------------------
# Format-generic parity: EXACT_OCTREE and GRID through the same C ABI
# (SdfExportFunc.h:31-47 format-generic getDistance role).
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def exact():
    from sdflib_tpu.sdf.exact_octree import ExactOctreeSdf

    mesh = make_icosphere(subdivisions=2, radius=0.35)
    box = mesh.bounding_box.add_margin(0.14)
    return ExactOctreeSdf(mesh, box, max_depth=4, start_depth=1,
                          min_triangles_per_node=16)


def test_native_exact_bin_matches_jax(tmp_path, exact, points):
    path = str(tmp_path / "exact.bin")
    save_sdflib_bin(exact, path)
    native = NativeOctreeSdf.load(path)
    assert native.format == "exact_octree"
    assert native.start_grid_size == exact.start_grid_size

    d_native = native.get_distance(points)
    d_jax = np.asarray(exact.get_distance(points))
    # bit-for-bit is not guaranteed (different reduction orders between the
    # batched argmin and the serial scan can pick different equidistant
    # winners), but distances must agree to fp32 rounding.
    np.testing.assert_allclose(d_native, d_jax, atol=2e-6)

    # native-side save must round-trip byte-identically re-loadable
    path2 = str(tmp_path / "exact2.bin")
    native.save(path2)
    native2 = NativeOctreeSdf.load(path2)
    d2 = native2.get_distance(points[:512])
    np.testing.assert_array_equal(d2, d_native[:512])


def test_native_exact_gradient(exact):
    native_path_points = np.array(
        [[0.21, -0.1, 0.05], [0.0, 0.31, -0.22], [0.9, 0.9, 0.9]], np.float32
    )
    import tempfile, os

    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "exact.bin")
        save_sdflib_bin(exact, path)
        native = NativeOctreeSdf.load(path)
        d_jax, g_jax = exact.get_distance_and_gradient(native_path_points)
        for i, p in enumerate(native_path_points):
            d, g = native.get_distance_and_gradient(p)
            assert d == pytest.approx(float(np.asarray(d_jax)[i]), abs=2e-6)
            np.testing.assert_allclose(g, np.asarray(g_jax)[i], atol=1e-4)


def test_native_grid_bin_matches_jax(tmp_path, points):
    from sdflib_tpu.sdf.grid import UniformGridSdf

    mesh = make_icosphere(subdivisions=2, radius=0.35)
    box = mesh.bounding_box.add_margin(0.14)
    grid = UniformGridSdf(mesh, box, depth=4)
    path = str(tmp_path / "grid.bin")
    save_sdflib_bin(grid, path)
    native = NativeOctreeSdf.load(path)
    assert native.format == "grid"

    d_native = native.get_distance(points)
    d_jax = np.asarray(grid.get_distance(points))
    np.testing.assert_allclose(d_native, d_jax, atol=2e-6)

    p = np.array([0.11, -0.2, 0.15], np.float32)
    d, g = native.get_distance_and_gradient(p)
    d_jax2, g_jax2 = grid.get_distance_and_gradient(p[None])
    assert d == pytest.approx(float(np.asarray(d_jax2)[0]), abs=2e-6)
    np.testing.assert_allclose(g, np.asarray(g_jax2)[0], atol=1e-3)


def test_native_octree_data_guard(tmp_path, exact):
    path = str(tmp_path / "exact.bin")
    save_sdflib_bin(exact, path)
    native = NativeOctreeSdf.load(path)
    with pytest.raises(ValueError):
        _ = native.octree_data
