"""Kernel-level property tests for the point-triangle distance kernels.

Mirrors the reference's TriangleDistanceTest (src/tools/TriangleDistanceTest/
main.cpp:5-60): random points, precomputed-frame distance vs the naive
3-vertex formula; plus sign correctness on analytic shapes.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdflib_tpu import calculate_mesh_triangle_data
from sdflib_tpu.mesh import Mesh
from sdflib_tpu.ops.point_triangle import (
    nearest_triangle,
    signed_dist_pair,
    signed_dist_grad_pair,
    signed_distance_batch,
    signed_distance_grad_batch,
    sq_dist_naive,
    sq_dist_pair,
)
from sdflib_tpu.utils.primitives import make_cube, make_icosphere, make_plane


def _random_triangles(rng, n):
    return rng.uniform(-1, 1, size=(n, 3, 3)).astype(np.float32)


def _frame_vs_naive(tris_v, points):
    verts = tris_v.reshape(-1, 3)
    idx = np.arange(verts.shape[0], dtype=np.uint32).reshape(-1, 3)
    mesh = Mesh(verts, idx)
    soa = calculate_mesh_triangle_data(mesh)

    frame_d = jax.vmap(
        jax.vmap(sq_dist_pair, in_axes=(None, 0)), in_axes=(0, None)
    )(jnp.asarray(points), jax.tree.map(jnp.asarray, soa))

    naive_d = jax.vmap(
        jax.vmap(sq_dist_naive, in_axes=(None, 0, 0, 0)),
        in_axes=(0, None, None, None),
    )(
        jnp.asarray(points),
        jnp.asarray(tris_v[:, 0]),
        jnp.asarray(tris_v[:, 1]),
        jnp.asarray(tris_v[:, 2]),
    )
    return np.asarray(frame_d), np.asarray(naive_d)


def test_sq_dist_matches_naive_on_reference_triangle():
    """The reference's own property test (TriangleDistanceTest/main.cpp:59-64)
    uses the acute triangle (-.5,-.5,0),(.5,-.5,0),(0,.5,0): frame kernel and
    naive formula must agree there."""
    tri = np.array(
        [[[-0.5, -0.5, 0.0], [0.5, -0.5, 0.0], [0.0, 0.5, 0.0]]], np.float32
    )
    rng = np.random.default_rng(2222)
    points = rng.uniform(-1, 1, size=(4096, 3)).astype(np.float32)
    frame_d, naive_d = _frame_vs_naive(tri, points)
    np.testing.assert_allclose(frame_d, naive_d, rtol=2e-4, atol=1e-5)


def test_sq_dist_overestimates_only_on_random_soup():
    """For very obtuse triangles the reference's vertex-region shortcut
    (TriangleUtils.h:90) can OVERestimate vs the exact naive formula (the
    edge Voronoi wedge of the far edge overlaps the `x >= v2x` half-space).
    This is safe at mesh level because the shared-edge neighbor reports the
    true edge distance. Property: frame >= naive, and equality holds for the
    vast majority of pairs."""
    rng = np.random.default_rng(0)
    tris_v = _random_triangles(rng, 64)
    points = rng.uniform(-2, 2, size=(512, 3)).astype(np.float32)
    frame_d, naive_d = _frame_vs_naive(tris_v, points)
    assert np.all(frame_d >= naive_d - 1e-3 - 1e-3 * np.abs(naive_d))
    agree = np.isclose(frame_d, naive_d, rtol=2e-4, atol=1e-5)
    assert agree.mean() > 0.95, f"agreement rate {agree.mean()}"


def test_mesh_min_distance_matches_naive_min():
    """At mesh level (closed surface) the min-over-triangles of the frame
    kernel is exact: any overestimated vertex-region pair is dominated by the
    neighboring triangle sharing the true nearest feature."""
    mesh = make_icosphere(subdivisions=2, radius=0.5)
    soa = jax.tree.map(jnp.asarray, calculate_mesh_triangle_data(mesh))
    rng = np.random.default_rng(11)
    points = rng.uniform(-1, 1, size=(256, 3)).astype(np.float32)

    best, _ = nearest_triangle(points, soa)

    a, b, c = mesh.triangle_vertices()
    naive_d = jax.vmap(
        jax.vmap(sq_dist_naive, in_axes=(None, 0, 0, 0)),
        in_axes=(0, None, None, None),
    )(jnp.asarray(points), jnp.asarray(a), jnp.asarray(b), jnp.asarray(c))
    naive_min = np.asarray(naive_d).min(axis=1)
    np.testing.assert_allclose(np.asarray(best), naive_min, rtol=2e-4, atol=1e-6)


def test_signed_abs_matches_sq_dist():
    rng = np.random.default_rng(1)
    mesh = make_icosphere(subdivisions=1)
    soa = jax.tree.map(jnp.asarray, calculate_mesh_triangle_data(mesh))
    points = rng.uniform(-1, 1, size=(256, 3)).astype(np.float32)

    sq = jax.vmap(jax.vmap(sq_dist_pair, in_axes=(None, 0)), in_axes=(0, None))(
        jnp.asarray(points), soa
    )
    sd = jax.vmap(jax.vmap(signed_dist_pair, in_axes=(None, 0)), in_axes=(0, None))(
        jnp.asarray(points), soa
    )
    np.testing.assert_allclose(
        np.abs(np.asarray(sd)), np.sqrt(np.asarray(sq)), rtol=2e-4, atol=2e-6
    )


def test_sphere_signed_distance():
    """SDF of an icosphere approximates |p| - r with correct sign."""
    mesh = make_icosphere(subdivisions=3, radius=0.5)
    soa = jax.tree.map(jnp.asarray, calculate_mesh_triangle_data(mesh))
    rng = np.random.default_rng(2)
    points = rng.uniform(-0.9, 0.9, size=(512, 3)).astype(np.float32)

    d = np.asarray(signed_distance_batch(points, soa))
    expected = np.linalg.norm(points, axis=-1) - 0.5
    # icosphere with 3 subdivisions is within ~2.5e-3 of the true sphere
    np.testing.assert_allclose(d, expected, atol=5e-3)


def test_cube_signed_distance():
    mesh = make_cube(size=1.0)
    soa = jax.tree.map(jnp.asarray, calculate_mesh_triangle_data(mesh))
    rng = np.random.default_rng(3)
    points = rng.uniform(-1, 1, size=(512, 3)).astype(np.float32)

    d = np.asarray(signed_distance_batch(points, soa))
    q = np.abs(points) - 0.5
    expected = np.linalg.norm(np.maximum(q, 0), axis=-1) + np.minimum(
        q.max(axis=-1), 0
    )
    np.testing.assert_allclose(d, expected, rtol=1e-4, atol=1e-5)


def test_gradient_matches_distance_direction():
    """Outside a sphere, gradient ~ p/|p|; inside, also p/|p| (nearest on
    surface). Checks the analytic gradient kernel end-to-end."""
    mesh = make_icosphere(subdivisions=3, radius=0.5)
    soa = jax.tree.map(jnp.asarray, calculate_mesh_triangle_data(mesh))
    rng = np.random.default_rng(4)
    points = rng.uniform(-0.9, 0.9, size=(256, 3)).astype(np.float32)
    points = points[np.abs(np.linalg.norm(points, axis=-1) - 0.5) > 0.05]

    d, g = signed_distance_grad_batch(points, soa)
    d, g = np.asarray(d), np.asarray(g)
    expected_dir = points / np.linalg.norm(points, axis=-1, keepdims=True)
    dots = np.sum(g * expected_dir, axis=-1)
    assert np.all(dots > 0.98), f"min grad alignment {dots.min()}"
    np.testing.assert_allclose(np.linalg.norm(g, axis=-1), 1.0, atol=1e-4)


def test_gradient_vs_finite_difference():
    mesh = make_icosphere(subdivisions=2, radius=0.5)
    soa = jax.tree.map(jnp.asarray, calculate_mesh_triangle_data(mesh))
    rng = np.random.default_rng(5)
    points = rng.uniform(-0.8, 0.8, size=(64, 3)).astype(np.float32)

    _, g = signed_distance_grad_batch(points, soa)
    g = np.asarray(g)

    eps = 1e-3
    fd = np.zeros_like(g)
    for ax in range(3):
        dp = np.zeros(3, np.float32)
        dp[ax] = eps
        dplus = np.asarray(signed_distance_batch(points + dp, soa))
        dminus = np.asarray(signed_distance_batch(points - dp, soa))
        fd[:, ax] = (dplus - dminus) / (2 * eps)

    # Skip points near feature boundaries where FD straddles a region change
    ok = np.linalg.norm(fd, axis=-1) > 0.9
    align = np.sum(g[ok] * fd[ok], axis=-1) / np.maximum(
        np.linalg.norm(fd[ok], axis=-1), 1e-9
    )
    assert np.mean(align > 0.99) > 0.9


def test_open_surface_plane():
    """Open surfaces use boundary pseudonormals; distance to a z=0 quad."""
    mesh = make_plane(size=1.0, res=2)
    soa = jax.tree.map(jnp.asarray, calculate_mesh_triangle_data(mesh))
    points = np.array(
        [[0.0, 0.0, 0.3], [0.1, -0.1, -0.25], [0.8, 0.0, 0.05]], np.float32
    )
    d = np.asarray(signed_distance_batch(points, soa))
    assert abs(d[0] - 0.3) < 1e-5
    assert abs(d[1] + 0.25) < 1e-5
    # Past the quad edge: boundary-edge pseudonormal defaults to the face
    # normal (TriangleUtils.h:40), so the sign comes from z.
    assert abs(d[2] - np.sqrt(0.3**2 + 0.05**2)) < 1e-5


def test_nearest_triangle_chunking_consistency():
    mesh = make_icosphere(subdivisions=2)
    soa = jax.tree.map(jnp.asarray, calculate_mesh_triangle_data(mesh))
    rng = np.random.default_rng(6)
    points = rng.uniform(-1, 1, size=(128, 3)).astype(np.float32)

    d1, i1 = nearest_triangle(points, soa, chunk=32)
    d2, i2 = nearest_triangle(points, soa, chunk=512)
    d1, i1, d2, i2 = map(np.asarray, (d1, i1, d2, i2))
    np.testing.assert_allclose(d1, d2, rtol=1e-6)
    # Indices may differ only on last-ulp ties between adjacent triangles
    # sharing the nearest feature (vectorization-dependent rounding).
    mismatch = i1 != i2
    assert mismatch.mean() < 0.1
    if mismatch.any():
        np.testing.assert_allclose(d1[mismatch], d2[mismatch], rtol=1e-5)


def test_grad_pair_consistent_with_signed_pair():
    mesh = make_icosphere(subdivisions=1)
    soa = jax.tree.map(jnp.asarray, calculate_mesh_triangle_data(mesh))
    rng = np.random.default_rng(7)
    points = jnp.asarray(rng.uniform(-1, 1, size=(64, 3)).astype(np.float32))

    tri0 = jax.tree.map(lambda x: x[3], soa)
    d_plain = jax.vmap(lambda p: signed_dist_pair(p, tri0))(points)
    d_grad = jax.vmap(lambda p: signed_dist_grad_pair(p, tri0)[0])(points)
    np.testing.assert_allclose(np.asarray(d_plain), np.asarray(d_grad), rtol=1e-6)


def test_naive_from_cols_matches_naive():
    """Column-accessor naive kernel (vertex-format scan buckets) must be
    bit-equivalent to sq_dist_naive on the same data."""
    import jax.numpy as jnp

    from sdflib_tpu.ops.point_triangle import (
        sq_dist_naive,
        sq_dist_naive_from_cols,
    )

    rng = np.random.default_rng(11)
    n = 4096
    p = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    a = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    b = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    c = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    ref = np.asarray(sq_dist_naive(jnp.asarray(p), jnp.asarray(a),
                                   jnp.asarray(b), jnp.asarray(c)))
    cols = np.concatenate([a, b, c], axis=1)  # (n, 9) [ax ay az bx ... cz]
    colsj = jnp.asarray(cols)
    got = np.asarray(sq_dist_naive_from_cols(
        jnp.asarray(p[:, 0]), jnp.asarray(p[:, 1]), jnp.asarray(p[:, 2]),
        lambda r: colsj[:, r],
    ))
    # differences are FMA-contraction noise at region boundaries where
    # both branches evaluate ~equal (observed <=1.5e-8 absolute)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-6)


def test_signed_dist_from_rows_matches_pair():
    """Row-accessor signed kernel (fused winner eval) must match the
    SoA pair kernel on random pairs, incl. sign."""
    import jax
    import jax.numpy as jnp

    from sdflib_tpu.ops.point_triangle import (
        pack_triangle_full_fields,
        signed_dist_from_rows,
        signed_dist_pair,
    )
    from sdflib_tpu.triangle import calculate_mesh_triangle_data
    from sdflib_tpu.utils.primitives import make_torus

    mesh = make_torus(R=0.3, r=0.12, nu=16, nv=8)
    soa = jax.tree.map(jnp.asarray, calculate_mesh_triangle_data(mesh))
    rng = np.random.default_rng(12)
    n = 4096
    p = jnp.asarray(rng.uniform(-0.6, 0.6, (n, 3)).astype(np.float32))
    ti = rng.integers(0, soa.origin.shape[0], n)
    full = pack_triangle_full_fields(soa)[jnp.asarray(ti)]     # (n, 37)
    got = np.asarray(signed_dist_from_rows(
        p[:, 0], p[:, 1], p[:, 2], lambda r: full[:, r]
    ))
    tri = jax.tree.map(lambda a: a[jnp.asarray(ti)], soa)
    ref = np.asarray(jax.vmap(signed_dist_pair)(p, tri))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)
