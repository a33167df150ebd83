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

__all__ = ["data_parallel_fit_step", "make_fit_step"]


def make_fit_step(
    octree_u32,
    box_min,
    box_size,
    start_grid_size,
    min_border_value,
    *,
    levels: int,
    num_coeff: int = 64,
    interpolation: str = "tricubic",
    lr: float = 1e-2,
    fast: bool = True,
):
    """A jitted (coeffs, points, targets) -> (loss, new_coeffs) SGD step
    on the leaf polynomial coefficients."""

    def loss_fn(coeffs, points, targets):
        d = octree_query_diff(
            octree_u32, coeffs, points, box_min, box_size,
            start_grid_size, min_border_value,
            levels=levels, num_coeff=num_coeff,
            interpolation=interpolation, fast=fast,
        )
        return jnp.mean(jnp.square(d - targets))

    @jax.jit
    def step(coeffs, points, targets):
        loss, grads = jax.value_and_grad(loss_fn)(coeffs, points, targets)
        return loss, coeffs - lr * grads

    return step


def data_parallel_fit_step(
    octree, coeffs, points, targets, mesh=None, *, lr: float = 1e-2
):
    """One sharded SGD step against an OctreeSdf's coefficients.

    points/targets shard over chips, coeffs replicate; returns
    (loss, new_coeffs) with new_coeffs replicated (XLA all-reduces the
    gradient)."""
    mesh = default_mesh() if mesh is None else mesh
    rep = replicated(mesh)
    rays = sharded_rays(mesh)

    pts = jnp.asarray(points, jnp.float32).reshape(-1, 3)
    tgt = jnp.asarray(targets, jnp.float32).reshape(-1)
    P = pts.shape[0]
    Pp = pad_to_shards(P, mesh)
    # padding rays contribute zero target error at the box center
    if Pp != P:
        center = jnp.asarray(octree.box.center, jnp.float32)
        pts = jnp.concatenate(
            [pts, jnp.broadcast_to(center, (Pp - P, 3))]
        )
        d_pad = octree.get_distance(center[None])[0]
        tgt = jnp.concatenate([tgt, jnp.full(Pp - P, d_pad)])

    step = make_fit_step(
        jax.device_put(octree.octree_data, rep),
        jnp.asarray(octree.box.min),
        jnp.float32(octree.box.size[0]),
        octree.start_grid_size,
        jnp.float32(octree.min_border_value),
        levels=octree.max_depth - octree.start_depth,
        num_coeff=octree.num_coefficients,
        interpolation=octree.interpolation,
        lr=lr,
        fast=octree._fast_layout,
    )
    coeffs = jax.device_put(jnp.asarray(coeffs), rep)
    pts = jax.device_put(pts, rays)
    tgt = jax.device_put(tgt, rays)
    loss, new_coeffs = step(coeffs, pts, tgt)
    return loss, new_coeffs
