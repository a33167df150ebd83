"""Differentiable octree queries: gradients w.r.t. leaf coefficients.

The flat u32 octree array (topology) stays fixed; the polynomial
coefficients live in a separate float32 array ``coeffs`` (by default the
bitcast view of the same flat array, so coeffs[i] for leaf coefficient
slots are the real values). The query descends using the u32 topology and
gathers coefficients from ``coeffs`` — so d(query)/d(coeffs) flows through
the gather (its VJP is a scatter-add into the coefficient array), exactly
the design the BASELINE north star asks for (images differentiable w.r.t.
query points and leaf polynomial coefficients).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops.box import box_distance
from ..ops.interpolation import (
    tricubic_gradient,
    tricubic_interpolate,
    trilinear_gradient,
    trilinear_interpolate,
)
from ..sdf.octree import _select8
from ..sdf.octree_builder import CHILDREN_INDEX_MASK, IS_LEAF_MASK

__all__ = ["octree_query_diff", "octree_coefficients"]


def octree_coefficients(octree_u32) -> jax.Array:
    """Float32 view of the flat octree array, the trainable parameter."""
    return jax.lax.bitcast_convert_type(jnp.asarray(octree_u32), jnp.float32)


@partial(
    jax.jit,
    static_argnames=(
        "levels", "num_coeff", "interpolation", "with_gradient", "fast"
    ),
)
def octree_query_diff(
    octree_u32,
    coeffs_f32,
    points,
    box_min,
    box_size,
    start_grid_size,
    min_border_value,
    *,
    levels: int,
    num_coeff: int = 64,
    interpolation: str = "tricubic",
    with_gradient: bool = False,
    fast: bool = True,
):
    """Like OctreeSdf queries but differentiable w.r.t. ``coeffs_f32``
    (and w.r.t. ``points`` through the polynomial evaluation).

    fast=True assumes the aligned layout our builders emit (row-gather
    fetches; the coefficient row gather's VJP is a row scatter-add, which
    is equally fast)."""
    pts = points
    s = start_grid_size
    cell = box_size / s

    frac = (pts - box_min) / cell
    ipos = jnp.floor(frac).astype(jnp.int32)
    frac = frac - jax.lax.stop_gradient(ipos).astype(pts.dtype)
    in_box = jnp.all((ipos >= 0) & (ipos < s), axis=-1)
    ic = jnp.clip(ipos, 0, s - 1)
    node_idx = ic[..., 2] * (s * s) + ic[..., 1] * s + ic[..., 0]

    leaf_mask = jnp.uint32(IS_LEAF_MASK)
    cidx_mask = jnp.uint32(CHILDREN_INDEX_MASK)

    if fast:
        view8 = octree_u32.reshape(-1, 8)
        word = _select8(
            view8[node_idx >> 3], (node_idx & 7).astype(jnp.uint32)
        )
    else:
        word = octree_u32[node_idx]

    depth_steps = jnp.zeros(pts.shape[:-1], jnp.int32)
    for _ in range(levels):
        is_leaf = (word & leaf_mask) != 0
        fs = jax.lax.stop_gradient(frac)
        child = (
            ((fs[..., 2] >= 0.5).astype(jnp.uint32) << 2)
            + ((fs[..., 1] >= 0.5).astype(jnp.uint32) << 1)
            + (fs[..., 0] >= 0.5).astype(jnp.uint32)
        )
        base = word & cidx_mask
        if fast:
            nxt = _select8(view8[(base >> 3).astype(jnp.int32)], child)
        else:
            nxt = octree_u32[base + child]
        nfrac = 2.0 * frac - jax.lax.stop_gradient(jnp.floor(2.0 * frac))
        word = jnp.where(is_leaf, word, nxt)
        frac = jnp.where(is_leaf[..., None], frac, nfrac)
        depth_steps = depth_steps + (~is_leaf).astype(jnp.int32)

    base = (word & cidx_mask).astype(jnp.int32)
    if fast:
        shift = 6 if num_coeff == 64 else 3
        coeffs = coeffs_f32.reshape(-1, num_coeff)[base >> shift]
    else:
        gather_idx = base[..., None] + jnp.arange(num_coeff, dtype=jnp.int32)
        coeffs = coeffs_f32[gather_idx]

    interp = tricubic_interpolate if interpolation == "tricubic" else trilinear_interpolate
    d_in = interp(coeffs, frac)

    center = box_min + 0.5 * box_size
    d_out = box_distance(pts, center, jnp.full((3,), box_size, pts.dtype))
    d = jnp.where(in_box, d_in, d_out + min_border_value)
    if not with_gradient:
        return d
    gradf = tricubic_gradient if interpolation == "tricubic" else trilinear_gradient
    # World-space gradient: polynomial gradient / leaf edge length, where the
    # reached leaf has edge cell / 2^depth_steps (per point).
    leaf_size = cell / jnp.exp2(depth_steps.astype(pts.dtype))
    g = gradf(coeffs, frac) / leaf_size[..., None]
    return d, jnp.where(in_box[..., None], g, jnp.zeros_like(g))
