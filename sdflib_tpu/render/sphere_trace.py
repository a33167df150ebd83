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

from ..sdf.octree import OctreeSdf, _octree_query, _octree_query_grid

__all__ = ["TraceResult", "sphere_trace", "trace_octree"]


class TraceResult(NamedTuple):
    hit: jax.Array        # (...,) bool
    position: jax.Array   # (..., 3) world hit position (last march point)
    depth: jax.Array      # (...,) accumulated world-space distance
    normal: jax.Array     # (..., 3) normalized SDF gradient at the hit
    iterations: jax.Array  # (...,) int32 march steps taken


def sphere_trace_state(
    distance_fn,
    state,
    dirs,
    *,
    eps: float = 1e-5,
    far: float = 10.0,
    max_iters: int = 1024,
):
    """Resumable batched ray march. ``state`` = (pos, acc, last_d, active)
    per ray; returns the advanced state plus iterations run. Loop semantics
    mirror raycast (comp shader :392-409): march by max(d, 0), stop when
    d <= eps (hit), accumulated > far, or iteration cap."""
    dirs = jnp.asarray(dirs, jnp.float32)

    def cond(carry):
        it, (pos, acc, last_d, active) = carry
        return jnp.logical_and(it < max_iters, jnp.any(active))

    def body(carry):
        it, (pos, acc, last_d, active) = carry
        d = distance_fn(pos)
        step = jnp.maximum(d, 0.0)
        new_pos = pos + dirs * (step * active)[..., None]
        new_acc = acc + step * active
        new_last = jnp.where(active > 0, d, last_d)
        new_active = (
            active * (new_last > eps).astype(jnp.float32)
            * (new_acc < far).astype(jnp.float32)
        )
        return it + 1, (new_pos, new_acc, new_last, new_active)

    it, state = jax.lax.while_loop(cond, body, (jnp.int32(0), state))
    return it, state


def sphere_trace(
    distance_fn,
    origins,
    dirs,
    *,
    eps: float = 1e-5,
    far: float = 10.0,
    max_iters: int = 1024,
):
    """Generic batched ray march from fresh origins. Returns
    (hit, position, depth, iterations)."""
    origins = jnp.asarray(origins, jnp.float32)
    shape = origins.shape[:-1]
    init = (
        origins,
        jnp.zeros(shape, jnp.float32),
        jnp.full(shape, jnp.inf, jnp.float32),
        jnp.ones(shape, jnp.float32),
    )
    it, (pos, acc, last_d, _) = sphere_trace_state(
        distance_fn, init, dirs, eps=eps, far=far, max_iters=max_iters
    )
    hit = last_d <= eps
    return hit, pos, acc, it


@partial(jax.jit, static_argnames=("levels", "num_coeff", "interpolation",
                                   "max_iters", "grid_depth", "fast"))
def _march_state_jit(
    octree_u32,
    grid_u32,     # dense leaf grid, or a dummy when grid_depth is None
    state,        # (pos, acc, last_d, active)
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
    grid_depth: int | None = None,
    fast: bool = True,
):
    # The reference shader marches in octree-normalized space with
    # distanceScale = 1/boxSize (RenderSdf.cpp:128). Equivalent here: march
    # in world space and scale eps/far by boxSize.
    def dist_fn(points):
        if grid_depth is not None:
            return _octree_query_grid(
                octree_u32, grid_u32, points, box_min, box_size,
                min_border_value,
                grid_depth=grid_depth, num_coeff=num_coeff,
                interpolation=interpolation, with_gradient=False,
            )
        return _octree_query(
            octree_u32, points, box_min, box_size, start_grid_size,
            min_border_value,
            levels=levels, num_coeff=num_coeff, interpolation=interpolation,
            with_gradient=False, fast=fast,
        )

    it, state = sphere_trace_state(
        dist_fn, state, dirs,
        eps=eps * box_size, far=far * box_size, max_iters=max_iters,
    )
    return it, state


@partial(jax.jit,
         static_argnames=("levels", "num_coeff", "interpolation", "fast"))
def _trace_normals_jit(
    octree_u32, pos, box_min, box_size, start_grid_size, min_border_value,
    *, levels: int, num_coeff: int, interpolation: str, fast: bool = True,
):
    _, normal = _octree_query(
        octree_u32, pos, box_min, box_size, start_grid_size, min_border_value,
        levels=levels, num_coeff=num_coeff, interpolation=interpolation,
        with_gradient=True, fast=fast,
    )
    return normal


# Rays per compacted march block; the while_loop pays the slowest ray in a
# block, so unfinished rays are re-packed together between phases.
_TRACE_BLOCK = 1 << 15
# Iterations of the first all-rays phase: most rays (clean hits and clean
# misses) converge within this budget; the survivors — silhouette-grazing
# rays that need hundreds of steps — are compacted so the bulk of the batch
# stops paying march iterations for them.
_WARMUP_ITERS = 48


def trace_octree(
    octree: OctreeSdf,
    origins,
    dirs,
    *,
    eps: float = 1e-5,
    far: float = 4.0,
    max_iters: int = 1024,
    block_size: int | None = None,
) -> TraceResult:
    """Sphere-trace rays against an OctreeSdf. eps/far are in normalized
    octree space (box edge = 1), matching the reference shader.

    Two-phase schedule: a fixed warmup march over all rays, then the
    unfinished rays are compacted (argsort by active mask) and only they
    continue — the TPU-shaped replacement for the per-pixel divergence a
    GPU absorbs in hardware (RenderSdf.cpp:187)."""
    origins = jnp.asarray(origins, jnp.float32)
    dirs = jnp.asarray(dirs, jnp.float32)
    shape = origins.shape

    o = origins.reshape(-1, 3)
    d = dirs.reshape(-1, 3)
    R = o.shape[0]
    B = min(block_size or _TRACE_BLOCK, max(R, 1))
    Rp = -(-R // B) * B
    o = jnp.pad(o, [(0, Rp - R), (0, 0)])
    d_pad = jnp.pad(d, [(0, Rp - R), (0, 0)])
    # padded rays get a unit direction so steps stay finite...
    d = jnp.where(
        (jnp.arange(Rp) < R)[:, None], d_pad, jnp.array([1.0, 0.0, 0.0])
    )
    # ...and start inactive
    pad_active = (jnp.arange(Rp) < R).astype(jnp.float32)

    common = (
        jnp.asarray(octree.box.min),
        jnp.float32(octree.box.size[0]),
        octree.start_grid_size,
        jnp.float32(octree.min_border_value),
        jnp.float32(eps),
        jnp.float32(far),
    )
    grid = getattr(octree, "_query_grid", None)
    statics = dict(
        levels=octree.max_depth - octree.start_depth,
        num_coeff=octree.num_coefficients,
        interpolation=octree.interpolation,
        grid_depth=octree.max_depth if grid is not None else None,
        fast=octree._fast_layout,
    )
    grid_arr = grid if grid is not None else jnp.zeros((1, 2), jnp.uint32)

    def march(state, dirs_, iters):
        its, out = [], []
        n = state[1].shape[0]
        for i in range(0, n, B):
            blk = jax.tree.map(
                lambda a: jax.lax.dynamic_slice_in_dim(a, i, B), state
            )
            db = jax.lax.dynamic_slice_in_dim(dirs_, i, B)
            it, new = _march_state_jit(
                octree.octree_data, grid_arr, blk, db, *common,
                max_iters=iters, **statics,
            )
            its.append(it)
            out.append(new)
        merged = (
            jax.tree.map(lambda *xs: jnp.concatenate(xs), *out)
            if len(out) > 1
            else out[0]
        )
        return its, merged

    state = (
        o,
        jnp.zeros(Rp, jnp.float32),
        jnp.full(Rp, jnp.inf, jnp.float32),
        pad_active,
    )
    its_a, state = march(state, d, min(_WARMUP_ITERS, max_iters))
    iters_used = jnp.concatenate(
        [jnp.full(B, it, jnp.int32) for it in its_a]
    )

    active = state[3] > 0
    n_active = int(jnp.sum(active))
    if n_active > 0 and max_iters > _WARMUP_ITERS:
        order = jnp.argsort(~active)  # unfinished rays first
        inv = jnp.zeros_like(order).at[order].set(jnp.arange(Rp))
        state_s = jax.tree.map(lambda a: a[order], state)
        dirs_s = d[order]
        n_blk = min(-(-n_active // B) * B, Rp)
        head = jax.tree.map(lambda a: a[:n_blk], state_s)
        its_b, head = march(head, dirs_s[:n_blk],
                            max_iters - _WARMUP_ITERS)
        state_s = jax.tree.map(
            lambda h, full: jnp.concatenate([h, full[n_blk:]]), head, state_s
        )
        state = jax.tree.map(lambda a: a[inv], state_s)
        extra = jnp.concatenate(
            [jnp.full(B, it, jnp.int32) for it in its_b]
            + [jnp.zeros(Rp - n_blk, jnp.int32)]
        )[inv]
        iters_used = iters_used + extra

    pos, acc, last_d, _ = state
    eps_w = eps * float(octree.box.size[0])
    hit = last_d <= eps_w
    normal = _trace_normals_jit(
        octree.octree_data, pos, *common[:4],
        **{k: v for k, v in statics.items() if k != "grid_depth"},
    )
    res = TraceResult(hit, pos, acc, normal, iters_used)
    return jax.tree.map(
        lambda a: a[:R].reshape(
            shape[:-1] + a.shape[1:] if a.ndim > 1 else shape[:-1]
        ),
        res,
    )
