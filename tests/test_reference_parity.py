"""Cross-implementation parity vs the COMPILED reference kernels.

The golden files in tests/golden/data/ are produced by gen_golden.cpp,
which compiles the reference's own scalar kernels (TriangleUtils.h,
InterpolationMethods.h, the OctreeSdf.cpp:93-152 walk) from
/root/reference — see tests/golden/make_goldens.py. Unlike the rest of the
suite (which checks against this repo's own RealSdf oracle), these tests
anchor every parity claim to C++-computed values:

  * brute-force signed distance + gradient on 100k samples x 3 meshes
    (icosphere, torus, a non-manifold fin mesh exercising the reference's
    vertex-merge path, TriangleUtils.cpp:292-420);
  * TriangleData precompute (frames, b/c edges, pseudonormals);
  * tricubic fit -> value/gradient on random corner data;
  * the octree descent walk over a shared .bin structure;
  * a C++-WRITTEN .bin parsed by io/sdflib_binary.py.
"""
from __future__ import annotations

import os
import subprocess
import sys

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

DATA = os.path.join(os.path.dirname(__file__), "golden", "data")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(DATA), reason="golden data not generated"
)


def _regen_meshes():
    """Rebuild the same procedural meshes make_goldens.py used."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "golden"))
    from make_goldens import non_manifold_fin_mesh

    from sdflib_tpu.utils.primitives import make_icosphere, make_torus

    return {
        "icosphere": make_icosphere(subdivisions=3, radius=0.42),
        "torus": make_torus(R=0.3, r=0.12, nu=48, nv=24),
        "nonmanifold": non_manifold_fin_mesh(),
    }


@pytest.fixture(scope="module")
def meshes():
    return _regen_meshes()


@pytest.mark.parametrize("name", ["icosphere", "torus", "nonmanifold"])
def test_triangle_data_matches_cpp(name, meshes):
    """TriangleData precompute parity: frames, edge dirs, pseudonormals.

    Layout: 37 f32 = origin 3 | transform 9 (column-major) | b 2 | c 2 |
    v2 1 | v3 2 | edgesNormal 9 | verticesNormal 9 (TriangleUtils.h:50-54).
    """
    from sdflib_tpu.triangle import calculate_mesh_triangle_data

    g = np.load(os.path.join(DATA, f"dist_{name}.npz"))
    golden = g["tridata"]
    soa = calculate_mesh_triangle_data(meshes[name])

    T = golden.shape[0]
    assert soa.origin.shape[0] == T
    np.testing.assert_allclose(soa.origin, golden[:, 0:3], atol=1e-6)
    # golden transform columns -> row-major (T,3,3)
    gt = golden[:, 3:12].reshape(T, 3, 3).transpose(0, 2, 1)
    np.testing.assert_allclose(soa.transform, gt, atol=2e-5)
    np.testing.assert_allclose(soa.b, golden[:, 12:14], atol=1e-5)
    np.testing.assert_allclose(soa.c, golden[:, 14:16], atol=1e-5)
    np.testing.assert_allclose(soa.v2x, golden[:, 16], atol=1e-5)
    np.testing.assert_allclose(soa.v3xy, golden[:, 17:19], atol=1e-5)
    np.testing.assert_allclose(
        soa.edges_normal, golden[:, 19:28].reshape(T, 3, 3), atol=2e-4
    )
    np.testing.assert_allclose(
        soa.vertices_normal, golden[:, 28:37].reshape(T, 3, 3), atol=2e-4
    )


@pytest.mark.parametrize("name", ["icosphere", "torus", "nonmanifold"])
def test_brute_force_distance_matches_cpp(name, meshes):
    """RealSdf parity on 100k samples: our batched kernel vs the compiled
    reference scalar loop (BASELINE acceptance: allclose on distance and
    gradient)."""
    from sdflib_tpu.ops.point_triangle import (
        signed_distance_batch,
        signed_distance_grad_batch,
    )
    from sdflib_tpu.triangle import calculate_mesh_triangle_data

    g = np.load(os.path.join(DATA, f"dist_{name}.npz"))
    pts = g["points"]
    soa = jax.tree.map(jnp.asarray, calculate_mesh_triangle_data(meshes[name]))

    d = np.asarray(signed_distance_batch(jnp.asarray(pts), soa, impl="xla"))
    # |d| must match everywhere; tolerance covers fp32 association order.
    np.testing.assert_allclose(np.abs(d), np.abs(g["dist"]), atol=5e-5)
    # Sign may legitimately differ only where |d| ~ 0 (on-surface points).
    sign_mismatch = (np.sign(d) != np.sign(g["dist"])) & (
        np.abs(g["dist"]) > 1e-4
    )
    assert sign_mismatch.mean() < 1e-4, (
        f"{sign_mismatch.sum()} sign mismatches"
    )

    d2, grad = signed_distance_grad_batch(jnp.asarray(pts), soa, impl="xla")
    d2, grad = np.asarray(d2), np.asarray(grad)
    # Gradient comparison away from surface/tie regions (argmin winners can
    # differ at last-ulp ties; both gradients are then valid one-sided).
    stable = np.abs(g["dist"]) > 1e-3
    err = np.linalg.norm(grad - g["grad"], axis=-1)
    frac_bad = (err[stable] > 1e-3).mean()
    assert frac_bad < 5e-3, f"gradient mismatch fraction {frac_bad}"


def test_tricubic_matches_cpp():
    """Tricubic fit -> eval parity vs InterpolationMethods.h:292-455."""
    from sdflib_tpu.ops.interpolation import (
        tricubic_fit,
        tricubic_gradient,
        tricubic_interpolate,
    )

    g = np.load(os.path.join(DATA, "tricubic.npz"))
    corners = jnp.asarray(g["corners"])          # (n, 8, 8)
    sizes = jnp.asarray(g["node_sizes"])
    fracs = jnp.asarray(g["fracs"])

    coeffs = tricubic_fit(corners, sizes)
    scale = np.maximum(1.0, np.abs(g["coeffs"]).max(axis=1, keepdims=True))
    np.testing.assert_allclose(
        np.asarray(coeffs) / scale, g["coeffs"] / scale, atol=2e-4
    )
    vals = tricubic_interpolate(jnp.asarray(g["coeffs"]), fracs)
    np.testing.assert_allclose(np.asarray(vals), g["value"], atol=1e-4)
    grads = tricubic_gradient(jnp.asarray(g["coeffs"]), fracs)
    np.testing.assert_allclose(np.asarray(grads), g["grad"], atol=2e-3)


def test_octree_walk_matches_cpp():
    """Full query path vs the compiled reference walk over the SAME .bin."""
    from sdflib_tpu.io.sdflib_binary import load_sdflib_bin

    g = np.load(os.path.join(DATA, "octree_walk.npz"))
    sdf = load_sdflib_bin(os.path.join(DATA, "octree_torus.bin"))
    d = np.asarray(sdf.get_distance(jnp.asarray(g["points"])))
    np.testing.assert_allclose(d, g["dist"], atol=5e-5)
    d2, grad = sdf.get_distance_and_gradient(jnp.asarray(g["points"]))
    np.testing.assert_allclose(np.asarray(d2), g["dist"], atol=5e-5)
    err = np.linalg.norm(np.asarray(grad) - g["grad"], axis=-1)
    assert (err > 1e-3).mean() < 1e-3


def test_cpp_written_bin_loads_identically():
    """A .bin written by the C++ generator parses to the same structure and
    produces the same distances as the Python-written original."""
    from sdflib_tpu.io.sdflib_binary import load_sdflib_bin

    a = load_sdflib_bin(os.path.join(DATA, "octree_torus.bin"))
    b = load_sdflib_bin(os.path.join(DATA, "octree_torus_cpp.bin"))
    np.testing.assert_array_equal(
        np.asarray(a.octree_data), np.asarray(b.octree_data)
    )
    g = np.load(os.path.join(DATA, "octree_walk.npz"))
    pts = jnp.asarray(g["points"][:4096])
    np.testing.assert_array_equal(
        np.asarray(a.get_distance(pts)), np.asarray(b.get_distance(pts))
    )


def test_goldens_regenerable():
    """When the reference checkout + g++ are present, the generator must
    still compile (shims stay in sync with the reference headers)."""
    ref = "/root/reference"
    if not os.path.isdir(ref):
        pytest.skip("reference checkout not present")
    here = os.path.join(os.path.dirname(__file__), "golden")
    out = "/tmp/gen_golden_testbuild"
    cmd = [
        "g++", "-O2", "-std=c++17", "-fsyntax-only",
        "-I", os.path.join(here, "shim"),
        "-I", os.path.join(ref, "include"),
        os.path.join(here, "gen_golden.cpp"),
    ]
    subprocess.run(cmd, check=True)


# -- reference-BUILT structures (gen_builders.cpp) ---------------------------

BUILDERS_NPZ = os.path.join(DATA, "builders_torus.npz")

builders_mark = pytest.mark.skipif(
    not os.path.exists(BUILDERS_NPZ), reason="builder goldens not generated"
)


@builders_mark
@pytest.mark.parametrize("tag", ["octree_nc", "octree_cont"])
def test_reference_built_octree_matches_cpp(tag):
    """An OctreeSdf CONSTRUCTED BY THE COMPILED REFERENCE BUILDER
    (OctreeSdfDepthFirst.h NO_CONTINUITY / OctreeSdfBreadthFirstNoDelay.h
    CONTINUITY + VHQueries + TriCubicInterpolation), serialized through
    the reference's save(), must parse with our loader and produce the
    same distances/gradients as the compiled OctreeSdf::getDistance."""
    from sdflib_tpu.io.sdflib_binary import load_sdflib_bin

    g = np.load(BUILDERS_NPZ)
    sdf = load_sdflib_bin(os.path.join(DATA, f"builders_{tag}.bin"))
    pts = jnp.asarray(g["points"])
    d = np.asarray(sdf.get_distance(pts))
    np.testing.assert_allclose(d, g[f"{tag}_dist"], atol=5e-5)
    d2, grad = sdf.get_distance_and_gradient(pts)
    np.testing.assert_allclose(np.asarray(d2), g[f"{tag}_dist"], atol=5e-5)
    err = np.linalg.norm(np.asarray(grad) - g[f"{tag}_grad"], axis=-1)
    assert (err > 1e-3).mean() < 1e-3


@builders_mark
def test_reference_built_exact_octree_matches_cpp():
    """An ExactOctreeSdf built by the compiled reference builder
    (ExactOctreeSdfDepthFirst.h, PerNodeRegion influence) — including its
    bit-packed leaf sets and per-parent masks — must decode through
    io/sdflib_binary.py and match the compiled ExactOctreeSdf::getDistance
    bit-for-fp-rounding."""
    from sdflib_tpu.io.sdflib_binary import load_sdflib_bin

    g = np.load(BUILDERS_NPZ)
    sdf = load_sdflib_bin(os.path.join(DATA, "builders_exact.bin"))
    pts = jnp.asarray(g["points"])
    d = np.asarray(sdf.get_distance(pts))
    np.testing.assert_allclose(d, g["exact_dist"], atol=2e-5)
    d2, grad = sdf.get_distance_and_gradient(pts)
    np.testing.assert_allclose(np.asarray(d2), g["exact_dist"], atol=2e-5)
    err = np.linalg.norm(np.asarray(grad) - g["exact_grad"], axis=-1)
    assert (err > 1e-3).mean() < 1e-3


@builders_mark
def test_our_exact_bin_decodes_in_cpp():
    """Our _save_exact_bin container, decoded and queried by the COMPILED
    reference load()/getDistance (captured at golden-generation time),
    agrees with the reference-built exact tree — both are exact SDFs of
    the same mesh, so distances match regardless of tree shape."""
    g = np.load(BUILDERS_NPZ)
    rt = np.load(os.path.join(DATA, "exact_bin_roundtrip.npz"))
    np.testing.assert_array_equal(rt["points"], g["points"])
    np.testing.assert_allclose(rt["dist"], g["exact_dist"], atol=2e-5)


class _NativeEvalProxy:
    """Duck-typed SDF whose get_distance runs through the native C++ shim
    while every structural attribute (box, octree arrays for the node-grid
    overlay) comes from the JAX-loaded twin — so an image rendered through
    it differs from the JAX render ONLY by the evaluator."""

    def __init__(self, jax_sdf, native_sdf):
        self._jax = jax_sdf
        self._native = native_sdf

    def __getattr__(self, name):
        return getattr(self._jax, name)

    def get_distance(self, points):
        p = np.asarray(points, np.float32)
        return self._native.get_distance(p.reshape(-1, 3)).reshape(
            p.shape[:-1]
        )


def _load_cpp_bin_twins():
    from sdflib_tpu.io.sdflib_binary import load_sdflib_bin
    from sdflib_tpu.native import NativeSdf, native_available

    if not native_available():
        pytest.skip("g++ toolchain unavailable")
    path = os.path.join(DATA, "octree_torus_cpp.bin")
    return load_sdflib_bin(path), NativeSdf.load(path)


def test_plane_cut_pixels_match_native():
    """BASELINE image parity: the plane-cut frame (sdfOctreePlane.frag:18-52
    semantics) rendered from the C++-written golden .bin must be
    pixel-equal whether the distance field is evaluated by the JAX query
    or the native shim's C++ walk."""
    from sdflib_tpu.render.plane_cut import render_plane_cut

    jax_sdf, native_sdf = _load_cpp_bin_twins()
    img_jax = render_plane_cut(jax_sdf, resolution=128)
    img_nat = render_plane_cut(
        _NativeEvalProxy(jax_sdf, native_sdf), resolution=128
    )
    diff = np.abs(img_jax - img_nat)
    # evaluator deltas are ~1e-6 in distance; the shader's steep x^8 bands
    # amplify that near edges, so bound the mean tightly and allow only a
    # vanishing fraction of visibly-different pixels
    assert diff.mean() < 2e-3, f"mean pixel diff {diff.mean()}"
    assert (diff.max(axis=-1) > 0.05).mean() < 1e-3


def test_sphere_trace_pixels_match_native():
    """BASELINE image parity for the ray-marched frame: trace_octree's
    raycast semantics (sdfOctreeRender.comp:392-409 — step by max(d, 0),
    hit at d <= eps, give up past far) reproduced with the NATIVE
    evaluator on the host must yield the same hit mask and depths as the
    JAX tracer on the same golden .bin (beam/grid acceleration off: both
    sides march plain max(d, 0) steps, so trajectories are comparable)."""
    from sdflib_tpu.render.sphere_trace import trace_octree

    jax_sdf, native_sdf = _load_cpp_bin_twins()
    R = 64
    u = (np.arange(R, dtype=np.float32) + 0.5) / R - 0.5
    gu, gv = np.meshgrid(u, u)
    origins = np.stack(
        [gu * 0.9, gv * 0.9, np.full_like(gu, -1.1)], -1
    ).astype(np.float32)
    dirs = np.broadcast_to(
        np.array([0.0, 0.0, 1.0], np.float32), origins.shape
    ).copy()
    eps, far, max_iters = 1e-4, 3.0, 192

    res = trace_octree(
        jax_sdf, origins, dirs, eps=eps, far=far, max_iters=max_iters,
        beam=None, pyramid=False,
    )

    # host-side reference march through the native evaluator
    box_size = float(jax_sdf.box.size[0])
    pos = origins.reshape(-1, 3).copy()
    d_flat = dirs.reshape(-1, 3)
    acc = np.zeros(pos.shape[0], np.float32)
    last = np.full(pos.shape[0], np.inf, np.float32)
    active = np.ones(pos.shape[0], bool)
    for _ in range(max_iters):
        if not active.any():
            break
        d = native_sdf.get_distance(pos[active]).astype(np.float32)
        step = np.maximum(d, 0.0)
        pos[active] += d_flat[active] * step[:, None]
        acc[active] += step
        last[active] = d
        active[active.copy()] = (d > eps * box_size) & (
            acc[active] < far * box_size
        )
    hit_nat = (last <= eps * box_size).reshape(R, R)

    hit_jax = np.asarray(res.hit)
    agree = (hit_jax == hit_nat).mean()
    assert agree > 0.998, f"hit masks agree on {agree:.2%}"
    both = hit_jax & hit_nat
    np.testing.assert_allclose(
        np.asarray(res.depth)[both], acc.reshape(R, R)[both], atol=1e-3
    )
