"""Differentiable depth rendering: pixel losses flow to leaf coefficients.

The BASELINE north-star demo: fit octree polynomial coefficients to depth
images. Sphere marching itself is not differentiated (the while_loop walks
on frozen coefficients); instead the converged surface point gets one
differentiable Newton correction along the ray,

    depth* = depth - d(p; coeffs) / <grad d, dir>,

so d(depth*)/d(coeffs) = -(d d/d coeffs)/<grad,dir> — the standard
differentiable-sphere-tracing estimator. Gradients w.r.t. coefficients
flow through the coefficient row gather (VJP = row scatter-add) of
octree_query_diff.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..render.sphere_trace import sphere_trace
from .query import octree_query_diff

__all__ = ["render_depth_diff", "depth_fit_loss"]


@partial(
    jax.jit,
    static_argnames=(
        "levels", "num_coeff", "interpolation", "max_iters", "fast"
    ),
)
def render_depth_diff(
    octree_u32,
    coeffs_f32,
    origins,
    dirs,
    box_min,
    box_size,
    start_grid_size,
    min_border_value,
    *,
    levels: int,
    num_coeff: int = 64,
    interpolation: str = "tricubic",
    eps: float = 1e-4,
    far: float = 4.0,
    max_iters: int = 256,
    fast: bool = True,
):
    """(depth, hit): ray depths differentiable w.r.t. ``coeffs_f32``.

    eps/far are in normalized octree space (box edge = 1). Missed rays
    return far * box_size with zero coefficient gradient."""
    frozen = jax.lax.stop_gradient(coeffs_f32)

    def dist_frozen(p):
        return octree_query_diff(
            octree_u32, frozen, p, box_min, box_size, start_grid_size,
            min_border_value, levels=levels, num_coeff=num_coeff,
            interpolation=interpolation, fast=fast,
        )

    hit, pos, depth, _ = sphere_trace(
        dist_frozen, origins, dirs,
        eps=eps * box_size, far=far * box_size, max_iters=max_iters,
    )
    pos = jax.lax.stop_gradient(pos)
    depth = jax.lax.stop_gradient(depth)
    hit = jax.lax.stop_gradient(hit)

    d, g = octree_query_diff(
        octree_u32, coeffs_f32, pos, box_min, box_size, start_grid_size,
        min_border_value, levels=levels, num_coeff=num_coeff,
        interpolation=interpolation, with_gradient=True, fast=fast,
    )
    # ray direction derivative of the SDF at the surface (entering: < 0)
    denom = jax.lax.stop_gradient(
        jnp.minimum(jnp.sum(g * dirs, axis=-1), -1e-2)
    )
    depth_star = depth - d / denom
    miss = jnp.float32(far) * box_size
    return jnp.where(hit, depth_star, miss), hit


def depth_fit_loss(
    octree_u32,
    coeffs_f32,
    origins,
    dirs,
    target_depth,
    target_hit,
    box_min,
    box_size,
    start_grid_size,
    min_border_value,
    **kw,
):
    """Mean squared depth error over rays hitting in BOTH renders —
    the fit objective of the BASELINE depth-image demo."""
    depth, hit = render_depth_diff(
        octree_u32, coeffs_f32, origins, dirs, box_min, box_size,
        start_grid_size, min_border_value, **kw,
    )
    m = (hit & target_hit).astype(depth.dtype)
    n = jnp.maximum(jnp.sum(m), 1.0)
    return jnp.sum(m * jnp.square(depth - target_depth)) / n
