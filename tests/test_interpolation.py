"""Property tests for the interpolation module.

Mirrors the reference's codegen verification role
(CalculateInterpolationParameters regenerates the matrices the reference
hardcodes; here we verify the solved system reproduces polynomials and
interpolation constraints exactly).
"""
import jax.numpy as jnp
import numpy as np

from sdflib_tpu.ops.interpolation import (
    MIDPOINT_POSITIONS,
    SIMPSON_WEIGHTS,
    TRAPEZOID_WEIGHTS,
    TRICUBIC_MATRIX,
    estimate_error_simpson,
    estimate_error_trapezoid,
    estimate_max_error,
    tricubic_fit,
    tricubic_gradient,
    tricubic_interpolate,
    trilinear_gradient,
    trilinear_interpolate,
)

CORNERS = np.array(
    [(x, y, z) for z in (0, 1) for y in (0, 1) for x in (0, 1)], np.float32
)


def _random_poly_eval(rng):
    """A random tricubic polynomial and its value/gradient evaluators."""
    coeffs = rng.standard_normal(64).astype(np.float64)

    def value(p):
        p = np.atleast_2d(p)
        mono = np.ones((p.shape[0], 64))
        for c in range(64):
            i, j, k = c % 4, (c // 4) % 4, c // 16
            mono[:, c] = p[:, 0] ** i * p[:, 1] ** j * p[:, 2] ** k
        return mono @ coeffs

    def grad(p):
        eps = 1e-6
        p = np.atleast_2d(p).astype(np.float64)
        out = np.zeros_like(p)
        for ax in range(3):
            dp = np.zeros(3)
            dp[ax] = eps
            out[:, ax] = (value(p + dp) - value(p - dp)) / (2 * eps)
        return out

    return coeffs, value, grad


def _second_derivs(value, p, ax1, ax2):
    eps = 1e-4
    d1 = np.zeros(3)
    d1[ax1] = eps
    d2 = np.zeros(3)
    d2[ax2] = eps
    return (
        value(p + d1 + d2)[0]
        - value(p + d1 - d2)[0]
        - value(p - d1 + d2)[0]
        + value(p - d1 - d2)[0]
    ) / (4 * eps * eps)


def test_tricubic_fit_recovers_polynomial():
    """Fitting corner data of a tricubic polynomial recovers it exactly
    (the system is square and invertible)."""
    rng = np.random.default_rng(0)
    coeffs, value, grad = _random_poly_eval(rng)

    # Build per-corner [f, fx, fy, fz, fxy, fxz, fyz, fxyz] analytically via
    # finite differences of the dense polynomial
    data = np.zeros((8, 8))
    for ci, corner in enumerate(CORNERS):
        data[ci, 0] = value(corner)[0]
        g = grad(corner)[0]
        data[ci, 1:4] = g
        data[ci, 4] = _second_derivs(value, corner, 0, 1)
        data[ci, 5] = _second_derivs(value, corner, 0, 2)
        data[ci, 6] = _second_derivs(value, corner, 1, 2)
        # fxyz via third mixed difference
        eps = 1e-3
        acc = 0.0
        for sx in (1, -1):
            for sy in (1, -1):
                for sz in (1, -1):
                    acc += sx * sy * sz * value(corner + eps * np.array([sx, sy, sz]))[0]
        data[ci, 7] = acc / (8 * eps**3)

    fitted = np.asarray(tricubic_fit(jnp.asarray(data, jnp.float32), 1.0))
    np.testing.assert_allclose(fitted, coeffs, rtol=2e-2, atol=5e-2)

    # Evaluation parity at random interior points
    rng_pts = rng.uniform(0, 1, (32, 3)).astype(np.float32)
    got = np.asarray(
        tricubic_interpolate(jnp.asarray(fitted)[None, :], jnp.asarray(rng_pts))
    )
    np.testing.assert_allclose(got, value(rng_pts), rtol=1e-3, atol=1e-3)


def test_tricubic_interpolation_constraints():
    """Value+gradient at corners reproduce the inputs exactly — this is the
    defining property of the Hermite system and what C1-at-corners means."""
    rng = np.random.default_rng(1)
    data = rng.standard_normal((8, 8)).astype(np.float32)
    data[:, 4:] = 0.0  # the builder zeroes cross derivatives
    coeffs = tricubic_fit(jnp.asarray(data), 1.0)

    vals = np.asarray(tricubic_interpolate(coeffs[None, :], jnp.asarray(CORNERS)))
    np.testing.assert_allclose(vals, data[:, 0], rtol=1e-4, atol=1e-5)

    grads = np.asarray(tricubic_gradient(coeffs[None, :], jnp.asarray(CORNERS)))
    np.testing.assert_allclose(grads, data[:, 1:4], rtol=1e-4, atol=1e-4)


def test_tricubic_node_size_scaling():
    """With node_size h, corner gradients are given in world units and the
    polynomial lives in unit-cube coords: interp gradient = h * world grad."""
    rng = np.random.default_rng(2)
    h = 0.25
    data = rng.standard_normal((8, 8)).astype(np.float32)
    data[:, 4:] = 0.0
    coeffs = tricubic_fit(jnp.asarray(data), h)
    grads = np.asarray(tricubic_gradient(coeffs[None, :], jnp.asarray(CORNERS)))
    np.testing.assert_allclose(grads, h * data[:, 1:4], rtol=1e-4, atol=1e-4)


def test_trilinear_roundtrip():
    rng = np.random.default_rng(3)
    vals = rng.standard_normal(8).astype(np.float32)
    got = np.asarray(
        trilinear_interpolate(jnp.asarray(vals)[None, :], jnp.asarray(CORNERS))
    )
    np.testing.assert_allclose(got, vals, rtol=1e-6)


def test_trilinear_gradient_analytic():
    vals = jnp.asarray(np.arange(8, dtype=np.float32))
    p = jnp.asarray(np.array([[0.3, 0.6, 0.2]], np.float32))
    g = np.asarray(trilinear_gradient(vals[None, :], p))[0]
    eps = 1e-3
    fd = np.zeros(3)
    for ax in range(3):
        dp = np.zeros((1, 3), np.float32)
        dp[0, ax] = eps
        diff = trilinear_interpolate(vals[None, :], p + dp) - trilinear_interpolate(
            vals[None, :], p - dp
        )
        fd[ax] = float(diff[0]) / (2 * eps)
    np.testing.assert_allclose(g, fd, rtol=1e-3, atol=1e-3)


def test_midpoint_lattice_matches_reference_order():
    """First and last few positions from OctreeSdfUtils.h:64-84."""
    expect_first = np.array(
        [[0.5, 0, 0], [0, 0.5, 0], [0.5, 0.5, 0], [1, 0.5, 0], [0.5, 1, 0]],
        np.float32,
    )
    np.testing.assert_array_equal(MIDPOINT_POSITIONS[:5], expect_first)
    np.testing.assert_array_equal(MIDPOINT_POSITIONS[9], [0.5, 0.5, 0.5])
    np.testing.assert_array_equal(MIDPOINT_POSITIONS[18], [0.5, 1.0, 1.0])
    # Weights: edge midpoints 2/64, face centers 4/64, center 8/64
    np.testing.assert_allclose(TRAPEZOID_WEIGHTS[0], 2 / 64)
    np.testing.assert_allclose(TRAPEZOID_WEIGHTS[2], 4 / 64)
    np.testing.assert_allclose(TRAPEZOID_WEIGHTS[9], 8 / 64)
    np.testing.assert_allclose(SIMPSON_WEIGHTS[9], 64 / 216)


def test_error_estimators_zero_for_exact_fit():
    """If midpoints are sampled from the polynomial itself, error is ~0."""
    rng = np.random.default_rng(4)
    coeffs = jnp.asarray(rng.standard_normal(64).astype(np.float32) * 0.1)
    mid = tricubic_interpolate(coeffs[None, :], jnp.asarray(MIDPOINT_POSITIONS))
    for fn in (estimate_error_trapezoid, estimate_error_simpson, estimate_max_error):
        err = float(fn(coeffs, mid))
        assert err < 1e-8, (fn.__name__, err)


def test_tricubic_matrix_is_integer_and_involutive():
    assert TRICUBIC_MATRIX.shape == (64, 64)
    assert np.all(TRICUBIC_MATRIX == np.rint(TRICUBIC_MATRIX))
    # The largest magnitude entries are the +-27 block (reference coeff[42])
    assert TRICUBIC_MATRIX.max() == 27 and TRICUBIC_MATRIX.min() == -27
