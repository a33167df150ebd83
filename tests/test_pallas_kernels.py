"""Pallas kernel tests (interpret mode on CPU; compiled path runs on TPU).

The nearest-triangle kernel must agree with the XLA scan path on squared
distances exactly up to fp32 contraction order; argmin indices may differ
only on last-ulp ties, in which case the signed distances through either
winner must still agree.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sdflib_tpu.triangle import TriangleDataSoA, calculate_mesh_triangle_data
from sdflib_tpu.ops.point_triangle import (
    nearest_triangle,
    signed_dist_pair,
    signed_distance_batch,
)
from sdflib_tpu.ops.pallas_kernels import nearest_triangle_pallas
from sdflib_tpu.utils.primitives import make_icosphere, make_torus


@pytest.fixture(scope="module")
def tris():
    mesh = make_icosphere(subdivisions=2, radius=0.35)
    return jax.tree.map(jnp.asarray, calculate_mesh_triangle_data(mesh))


def _gather(tris, idx):
    return TriangleDataSoA(*(jnp.asarray(f)[idx] for f in tris))


def test_pallas_nearest_matches_xla(tris):
    rng = np.random.default_rng(0)
    pts = rng.uniform(-0.5, 0.5, (300, 3)).astype(np.float32)
    b0, i0 = nearest_triangle(pts, tris)
    b1, i1 = nearest_triangle_pallas(pts, tris, interpret=True)
    np.testing.assert_allclose(
        np.asarray(b0), np.asarray(b1), atol=1e-7, rtol=1e-5
    )
    # tie-broken indices: signed distance through either winner agrees
    d0 = np.asarray(jax.vmap(signed_dist_pair)(jnp.asarray(pts), _gather(tris, i0)))
    d1 = np.asarray(jax.vmap(signed_dist_pair)(jnp.asarray(pts), _gather(tris, i1)))
    np.testing.assert_allclose(d0, d1, atol=1e-6)


def test_pallas_nearest_unaligned_sizes():
    """Point counts not divisible by the tile and tiny triangle counts."""
    mesh = make_torus(R=0.3, r=0.1, nu=7, nv=5)  # 70 triangles
    tris = jax.tree.map(jnp.asarray, calculate_mesh_triangle_data(mesh))
    rng = np.random.default_rng(1)
    for n in (1, 3, 130, 513):
        pts = rng.uniform(-0.5, 0.5, (n, 3)).astype(np.float32)
        b0, _ = nearest_triangle(pts, tris)
        b1, _ = nearest_triangle_pallas(pts, tris, interpret=True)
        np.testing.assert_allclose(
            np.asarray(b0), np.asarray(b1), atol=1e-7, rtol=1e-5
        )


def test_signed_distance_batch_impl_dispatch(tris):
    rng = np.random.default_rng(2)
    pts = rng.uniform(-0.5, 0.5, (128, 3)).astype(np.float32)
    d_xla = np.asarray(signed_distance_batch(pts, tris, impl="xla"))
    d_pal = np.asarray(signed_distance_batch(pts, tris, impl="pallas"))
    np.testing.assert_allclose(d_xla, d_pal, atol=1e-6)
