"""Batched sphere tracing over an octree SDF.

TPU-native re-design of the reference GPU sphere tracer
(reference: src/render_engine/shaders/sdfOctreeRender.comp:392-409
``raycast`` — march while lastDistance > 1e-5, accumulated distance < far,
iterations < MAX_ITERATIONS=1024). The per-pixel GLSL loop becomes one
``lax.while_loop`` over the whole ray batch with per-lane active masks;
distances are evaluated in octree-normalized space with
distanceScale = 1 / boxSize (RenderSdf.cpp:127-128), minus the reference
demo's Perlin-noise/floor composition (SURVEY.md S7.6).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..sdf.octree import OctreeSdf, _octree_query

__all__ = ["TraceResult", "sphere_trace", "trace_octree"]


class TraceResult(NamedTuple):
    hit: jax.Array        # (...,) bool
    position: jax.Array   # (..., 3) world hit position (last march point)
    depth: jax.Array      # (...,) accumulated world-space distance
    normal: jax.Array     # (..., 3) normalized SDF gradient at the hit
    iterations: jax.Array  # (...,) int32 march steps taken


def sphere_trace(
    distance_fn,
    origins,
    dirs,
    *,
    eps: float = 1e-5,
    far: float = 10.0,
    max_iters: int = 1024,
):
    """Generic batched ray march. ``distance_fn(points)->(...,)`` must be
    jit-traceable. Loop semantics mirror raycast (comp shader :392-409):
    march by max(d, 0), stop when d <= eps (hit), accumulated > far, or
    iteration cap."""
    origins = jnp.asarray(origins, jnp.float32)
    dirs = jnp.asarray(dirs, jnp.float32)

    def cond(state):
        it, pos, acc, last_d, active = state
        return jnp.logical_and(it < max_iters, jnp.any(active))

    def body(state):
        it, pos, acc, last_d, active = state
        d = distance_fn(pos)
        step = jnp.maximum(d, 0.0)
        new_pos = pos + dirs * (step * active)[..., None]
        new_acc = acc + step * active
        new_last = jnp.where(active > 0, d, last_d)
        new_active = (
            active * (new_last > eps).astype(jnp.float32)
            * (new_acc < far).astype(jnp.float32)
        )
        return it + 1, new_pos, new_acc, new_last, new_active

    shape = origins.shape[:-1]
    init = (
        jnp.int32(0),
        origins,
        jnp.zeros(shape, jnp.float32),
        jnp.full(shape, jnp.inf, jnp.float32),
        jnp.ones(shape, jnp.float32),
    )
    it, pos, acc, last_d, _ = jax.lax.while_loop(cond, body, init)
    hit = last_d <= eps
    return hit, pos, acc, it


@partial(jax.jit, static_argnames=("levels", "num_coeff", "interpolation",
                                   "max_iters"))
def _trace_octree_jit(
    octree_u32,
    origins,
    dirs,
    box_min,
    box_size,
    start_grid_size,
    min_border_value,
    eps,
    far,
    *,
    levels: int,
    num_coeff: int,
    interpolation: str,
    max_iters: int,
):
    # The reference shader marches in octree-normalized space with
    # distanceScale = 1/boxSize (RenderSdf.cpp:128). Equivalent here: march
    # in world space and scale eps/far by boxSize.
    def dist_fn(points):
        return _octree_query(
            octree_u32, points, box_min, box_size, start_grid_size,
            min_border_value,
            levels=levels, num_coeff=num_coeff, interpolation=interpolation,
            with_gradient=False,
        )

    hit, pos, acc, it = sphere_trace(
        dist_fn, origins, dirs,
        eps=eps * box_size, far=far * box_size, max_iters=max_iters,
    )
    _, normal = _octree_query(
        octree_u32, pos, box_min, box_size, start_grid_size, min_border_value,
        levels=levels, num_coeff=num_coeff, interpolation=interpolation,
        with_gradient=True,
    )
    its = jnp.broadcast_to(it, hit.shape).astype(jnp.int32)
    return TraceResult(hit, pos, acc, normal, its)


def trace_octree(
    octree: OctreeSdf,
    origins,
    dirs,
    *,
    eps: float = 1e-5,
    far: float = 4.0,
    max_iters: int = 1024,
) -> TraceResult:
    """Sphere-trace rays against an OctreeSdf. eps/far are in normalized
    octree space (box edge = 1), matching the reference shader."""
    origins = jnp.asarray(origins, jnp.float32)
    dirs = jnp.asarray(dirs, jnp.float32)
    shape = origins.shape
    return jax.tree.map(
        lambda a: a.reshape(shape[:-1] + a.shape[1:] if a.ndim > 1 else shape[:-1]),
        _trace_octree_jit(
            octree.octree_data,
            origins.reshape(-1, 3),
            dirs.reshape(-1, 3),
            jnp.asarray(octree.box.min),
            jnp.float32(octree.box.size[0]),
            octree.start_grid_size,
            jnp.float32(octree.min_border_value),
            jnp.float32(eps),
            jnp.float32(far),
            levels=octree.max_depth - octree.start_depth,
            num_coeff=octree.num_coefficients,
            interpolation=octree.interpolation,
            max_iters=max_iters,
        ),
    )
