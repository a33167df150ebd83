"""Pallas TPU kernels for the hot compute paths.

``nearest_triangle_pallas`` is the fused points x triangles nearest-triangle
sweep — the #1 hot loop of the framework (the RealSdf oracle,
reference src/sdf/RealSdf.cpp:10-25, and every octree-build sampling pass).
The XLA path scans triangle chunks with a running min, materializing
(P, chunk) distance blocks between fusions; the Pallas kernel tiles points
along sublanes and triangles along lanes, keeps the whole
region-classified point-triangle distance (TriangleUtils.h:76-135
semantics) plus the running (min, argmin) in VMEM/registers, and only the
final (P,) best distance + index ever touch HBM.

Everything is elementwise fp32 VPU math — no MXU, so distance parity with
the reference holds (bf16 matmul contamination is the documented hazard).
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..triangle import TriangleDataSoA
from .point_triangle import (
    NUM_PACKED_FIELDS as _NUM_FIELDS,
    pack_triangle_fields,
    sq_dist_from_field_fn,
)

__all__ = [
    "pack_triangle_fields",
    "nearest_triangle_pallas",
    "pallas_available",
]


def _sq_dist_tile(px, py, pz, tf):
    """Region-classified squared distance for a (TK tris, PT points) tile:
    px/py/pz (1, PT) point coords along lanes, tf (TK, 19) triangle fields
    along sublanes -> (TK, PT). Shares the exact math (and tie-breaking)
    with the batch paths; the column-slice accessor keeps every broadcast
    2D ((TK,1) x (1,PT)) — a 3D fields intermediate would force Mosaic
    relayouts that blow the VMEM budget."""
    return sq_dist_from_field_fn(px, py, pz, lambda r: tf[:, r][:, None])


def _nearest_kernel(pts_ref, tf_ref, best_ref, idx_ref, *, tile_t, num_tris):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        best_ref[:] = jnp.full_like(best_ref, jnp.inf)
        idx_ref[:] = jnp.zeros_like(idx_ref)

    px = pts_ref[0:1, :]  # (1, PT)
    py = pts_ref[1:2, :]
    pz = pts_ref[2:3, :]
    sq = _sq_dist_tile(px, py, pz, tf_ref[:])  # (TK, PT)

    pt = sq.shape[1]
    tri_ids = (
        jax.lax.broadcasted_iota(jnp.int32, (tile_t, pt), 0) + j * tile_t
    )
    sq = jnp.where(tri_ids < num_tris, sq, jnp.inf)

    local_best = jnp.min(sq, axis=0, keepdims=True)        # (1, PT)
    local_idx = (
        jnp.argmin(sq, axis=0).astype(jnp.int32)[None, :] + j * tile_t
    )

    # Running min across triangle tiles; strict < keeps the lowest triangle
    # index on ties (OctreeSdfUtils.h:24 semantics).
    take = local_best < best_ref[:]
    best_ref[:] = jnp.where(take, local_best, best_ref[:])
    idx_ref[:] = jnp.where(take, local_idx, idx_ref[:])


def pallas_available() -> bool:
    return jax.default_backend() == "tpu"


@partial(jax.jit, static_argnames=("tile_p", "tile_t", "interpret"))
def _nearest_call(points_t, tf, *, tile_p, tile_t, interpret):
    P = points_t.shape[1]
    T = tf.shape[0]
    grid = (P // tile_p, pl.cdiv(T, tile_t))
    Tp = grid[1] * tile_t
    tf_pad = jnp.pad(tf, [(0, Tp - T), (0, 0)])

    kernel = partial(_nearest_kernel, tile_t=tile_t, num_tris=T)
    best, idx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (3, tile_p), lambda i, j: (0, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (tile_t, _NUM_FIELDS),
                lambda i, j: (j, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, tile_p), lambda i, j: (0, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, tile_p), lambda i, j: (0, i), memory_space=pltpu.VMEM
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, P), jnp.float32),
            jax.ShapeDtypeStruct((1, P), jnp.int32),
        ],
        interpret=interpret,
    )(points_t, tf_pad)
    return best[0], idx[0]


def nearest_triangle_pallas(
    points,
    tris: TriangleDataSoA,
    tile_p: int = 512,
    tile_t: int = 256,
    interpret: bool | None = None,
):
    """(squared distance, index) of the nearest triangle per point.

    Drop-in replacement for ops.point_triangle.nearest_triangle. On
    non-TPU backends runs in interpreter mode unless overridden (tests);
    production dispatch picks this only on TPU.
    """
    if interpret is None:
        interpret = not pallas_available()
    points = jnp.asarray(points, jnp.float32)
    P = points.shape[0]
    Pp = max(tile_p, -(-P // tile_p) * tile_p)
    pts_t = jnp.pad(points, [(0, Pp - P), (0, 0)]).T  # (3, Pp)
    tf = pack_triangle_fields(tris)
    best, idx = _nearest_call(
        pts_t, tf, tile_p=tile_p, tile_t=tile_t, interpret=interpret
    )
    return best[:P], idx[:P]
