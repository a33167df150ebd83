"""Differentiable query + depth-image fitting tests (BASELINE config 4:
pixel-loss gradients to octree leaf coefficients converge on depth-image
fitting)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sdflib_tpu.diff.query import octree_coefficients, octree_query_diff
from sdflib_tpu.diff.render import depth_fit_loss, render_depth_diff
from sdflib_tpu.sdf.octree import OctreeSdf
from sdflib_tpu.utils.primitives import make_icosphere


@pytest.fixture(scope="module")
def octree():
    mesh = make_icosphere(subdivisions=2, radius=0.35)
    box = mesh.bounding_box.add_margin(0.14)
    return OctreeSdf(mesh, box, max_depth=4, start_depth=1,
                     termination_threshold=1e-3)


def _query_args(oct_):
    return dict(
        box_min=jnp.asarray(oct_.box.min),
        box_size=jnp.float32(oct_.box.size[0]),
        start_grid_size=oct_.start_grid_size,
        min_border_value=jnp.float32(oct_.min_border_value),
    )


def test_query_diff_matches_forward(octree):
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.uniform(-0.3, 0.3, (512, 3)).astype(np.float32))
    coeffs = octree_coefficients(octree.octree_data)
    d_diff = octree_query_diff(
        octree.octree_data, coeffs, pts, **_query_args(octree),
        levels=octree.max_depth - octree.start_depth,
    )
    d_fwd = octree.get_distance(pts)
    np.testing.assert_array_equal(np.asarray(d_diff), np.asarray(d_fwd))


def test_coefficient_gradient_is_scatter_of_monomials(octree):
    """d(query)/d(coeffs) at a single point must be nonzero exactly in that
    point's leaf coefficient slots."""
    pts = jnp.asarray([[0.05, -0.11, 0.2]], jnp.float32)
    coeffs = octree_coefficients(octree.octree_data)

    def f(c):
        return octree_query_diff(
            octree.octree_data, c, pts, **_query_args(octree),
            levels=octree.max_depth - octree.start_depth,
        )[0]

    g = np.asarray(jax.grad(f)(coeffs))
    nz = np.nonzero(g)[0]
    assert 1 <= len(nz) <= 64
    assert nz.max() - nz.min() < 64  # all within one coefficient block
    # finite-difference check on one touched coefficient
    i = int(nz[len(nz) // 2])
    eps = 1e-3
    cp = coeffs.at[i].add(eps)
    cm = coeffs.at[i].add(-eps)
    fd = (float(f(cp)) - float(f(cm))) / (2 * eps)
    assert fd == pytest.approx(float(g[i]), rel=1e-2, abs=1e-4)


def _camera_rays(n):
    u = (np.arange(n, dtype=np.float32) + 0.5) / n - 0.5
    gu, gv = np.meshgrid(0.6 * u, 0.6 * u)
    origins = np.stack([gu, gv, np.full_like(gu, -1.0)], -1).reshape(-1, 3)
    dirs = np.tile([[0.0, 0.0, 1.0]], (n * n, 1)).astype(np.float32)
    return jnp.asarray(origins), jnp.asarray(dirs)


def test_depth_fit_converges(octree):
    """Perturbed coefficients recover the target depth image by SGD on the
    pixel loss."""
    origins, dirs = _camera_rays(32)
    args = _query_args(octree)
    kw = dict(
        levels=octree.max_depth - octree.start_depth,
        num_coeff=64, interpolation="tricubic", max_iters=96,
    )

    coeffs0 = octree_coefficients(octree.octree_data)
    target_depth, target_hit = render_depth_diff(
        octree.octree_data, coeffs0, origins, dirs, *args.values(), **kw
    )

    # Noise scale matters: much larger flips silhouette pixels' hit masks
    # (discontinuous loss), much smaller drops the loss toward the fp32
    # noise floor where the Newton-correction gradient is unreliable.
    rng = np.random.default_rng(1)
    noise = jnp.asarray(
        rng.normal(0, 1e-3, coeffs0.shape).astype(np.float32)
    )
    coeffs = coeffs0 + noise

    loss_grad = jax.jit(
        jax.value_and_grad(
            lambda c: depth_fit_loss(
                octree.octree_data, c, origins, dirs, target_depth,
                target_hit, *args.values(), **kw,
            )
        )
    )

    loss0, _ = loss_grad(coeffs)
    # Adam: raw depth-pixel gradients are ~1e-3-scale, far smaller than the
    # coefficient perturbation, so plain SGD needs impractical step sizes.
    m = jnp.zeros_like(coeffs)
    v = jnp.zeros_like(coeffs)
    lr, b1, b2, eps_a = 2e-4, 0.9, 0.999, 1e-9
    for i in range(1, 61):
        _, g = loss_grad(coeffs)
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * g * g
        coeffs = coeffs - lr * (m / (1 - b1**i)) / (
            jnp.sqrt(v / (1 - b2**i)) + eps_a
        )
    loss_final, _ = loss_grad(coeffs)

    assert float(loss_final) < 0.15 * float(loss0), (
        float(loss0), float(loss_final)
    )
