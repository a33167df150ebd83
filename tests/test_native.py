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
