"""Data-parallel differentiable fitting: the multi-chip training step.

Query points shard over the "rays" mesh axis; the octree coefficient
array is replicated, so XLA inserts one all-reduce for the coefficient
gradient (the BASELINE north-star mapping: gradient reduction = all-reduce
over ICI, overlapped with compute by XLA's scheduler).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..diff.query import octree_query_diff
from .mesh import default_mesh, pad_to_shards, replicated, sharded_rays

__all__ = ["data_parallel_fit_step", "fit_step"]


@partial(
    jax.jit,
    static_argnames=(
        "levels", "num_coeff", "interpolation", "fast", "start_grid_size"
    ),
)
def fit_step(
    octree_u32,
    coeffs,
    points,
    targets,
    weights,
    box_min,
    box_size,
    min_border_value,
    lr,
    *,
    start_grid_size: int,
    levels: int,
    num_coeff: int = 64,
    interpolation: str = "tricubic",
    fast: bool = True,
):
    """One weighted-MSE SGD step on the leaf polynomial coefficients.

    Module-level jit: repeat calls with the same shapes/statics reuse the
    compiled step (a per-call closure would retrace every iteration).
    ``weights`` masks padding points so they contribute zero gradient."""

    def loss_fn(c):
        d = octree_query_diff(
            octree_u32, c, points, box_min, box_size,
            start_grid_size, min_border_value,
            levels=levels, num_coeff=num_coeff,
            interpolation=interpolation, fast=fast,
        )
        n = jnp.maximum(jnp.sum(weights), 1.0)
        return jnp.sum(weights * jnp.square(d - targets)) / n

    loss, grads = jax.value_and_grad(loss_fn)(coeffs)
    return loss, coeffs - lr * grads


def data_parallel_fit_step(
    octree, coeffs, points, targets, mesh=None, *, lr: float = 1e-2
):
    """One sharded SGD step against an OctreeSdf's coefficients.

    points/targets shard over chips, coeffs replicate; returns
    (loss, new_coeffs) with new_coeffs replicated (XLA all-reduces the
    gradient). Padding points carry zero weight."""
    mesh = default_mesh() if mesh is None else mesh
    rep = replicated(mesh)
    rays = sharded_rays(mesh)

    pts = jnp.asarray(points, jnp.float32).reshape(-1, 3)
    tgt = jnp.asarray(targets, jnp.float32).reshape(-1)
    P = pts.shape[0]
    Pp = pad_to_shards(P, mesh)
    weights = (jnp.arange(Pp) < P).astype(jnp.float32)
    if Pp != P:
        center = jnp.asarray(octree.box.center, jnp.float32)
        pts = jnp.concatenate([pts, jnp.broadcast_to(center, (Pp - P, 3))])
        tgt = jnp.concatenate([tgt, jnp.zeros(Pp - P, jnp.float32)])

    return fit_step(
        jax.device_put(octree.octree_data, rep),
        jax.device_put(jnp.asarray(coeffs), rep),
        jax.device_put(pts, rays),
        jax.device_put(tgt, rays),
        jax.device_put(weights, rays),
        jnp.asarray(octree.box.min),
        jnp.float32(octree.box.size[0]),
        jnp.float32(octree.min_border_value),
        jnp.float32(lr),
        start_grid_size=octree.start_grid_size,
        levels=octree.max_depth - octree.start_depth,
        num_coeff=octree.num_coefficients,
        interpolation=octree.interpolation,
        fast=octree._fast_layout,
    )
