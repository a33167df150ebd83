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

__all__ = [
    "pack_triangle_fields",
    "nearest_triangle_pallas",
    "pallas_available",
]

# Packed triangle-field rows (fields x triangles layout so each field is a
# (1, TK) lane-broadcast row inside the kernel).
_NUM_FIELDS = 19
_F_ORIGIN = 0       # 0:3   origin xyz
_F_TRANSFORM = 3    # 3:12  world->tri transform, row-major
_F_B = 12           # 12:14 edge v2->v3 2D direction
_F_C = 14           # 14:16 edge v3->v1 2D direction
_F_V2X = 16         # v2.x in triangle space
_F_V3 = 17          # 17:19 v3.xy in triangle space


def pack_triangle_fields(tris: TriangleDataSoA) -> jnp.ndarray:
    """(T, 19) fp32 field matrix: triangles on sublanes inside the kernel."""
    t = jax.tree.map(jnp.asarray, tris)
    rows = [
        t.origin[:, 0], t.origin[:, 1], t.origin[:, 2],
        t.transform[:, 0, 0], t.transform[:, 0, 1], t.transform[:, 0, 2],
        t.transform[:, 1, 0], t.transform[:, 1, 1], t.transform[:, 1, 2],
        t.transform[:, 2, 0], t.transform[:, 2, 1], t.transform[:, 2, 2],
        t.b[:, 0], t.b[:, 1],
        t.c[:, 0], t.c[:, 1],
        t.v2x,
        t.v3xy[:, 0], t.v3xy[:, 1],
    ]
    return jnp.stack(rows, axis=-1).astype(jnp.float32)


def _sq_dist_tile(px, py, pz, tf):
    """Region-classified squared distance for a (TK tris, PT points) tile.

    px/py/pz: (1, PT) point coords along lanes; tf: (TK, 19) triangle
    fields along sublanes. Mirrors ops.point_triangle.sq_dist_pair
    (TriangleUtils.h:76-135) including tie-breaking comparisons.
    """
    f = lambda r: tf[:, r][:, None]  # (TK, 1)

    dx = px - f(_F_ORIGIN)
    dy = py - f(_F_ORIGIN + 1)
    dz = pz - f(_F_ORIGIN + 2)

    ppx = f(_F_TRANSFORM + 0) * dx + f(_F_TRANSFORM + 1) * dy + f(_F_TRANSFORM + 2) * dz
    ppy = f(_F_TRANSFORM + 3) * dx + f(_F_TRANSFORM + 4) * dy + f(_F_TRANSFORM + 5) * dz
    ppz = f(_F_TRANSFORM + 6) * dx + f(_F_TRANSFORM + 7) * dy + f(_F_TRANSFORM + 8) * dz

    b0, b1 = f(_F_B), f(_F_B + 1)
    c0, c1 = f(_F_C), f(_F_C + 1)
    v2x = f(_F_V2X)
    v3x, v3y = f(_F_V3), f(_F_V3 + 1)

    de1 = -ppy
    de2 = (ppx - v2x) * b1 - ppy * b0
    de3 = ppx * c1 - ppy * c0
    z2 = ppz * ppz

    d_v1 = ppx * ppx + ppy * ppy + z2
    rx2 = ppx - v2x
    d_v2 = rx2 * rx2 + ppy * ppy + z2
    rx3, ry3 = ppx - v3x, ppy - v3y
    d_v3 = rx3 * rx3 + ry3 * ry3 + z2

    r1 = jnp.where(
        ppx <= 0.0, d_v1, jnp.where(ppx >= v2x, d_v2, de1 * de1 + z2)
    )
    dot_b_v2 = rx2 * b0 + ppy * b1
    dot_b_v3 = rx3 * b0 + ry3 * b1
    r2 = jnp.where(
        dot_b_v2 <= 0.0, d_v2, jnp.where(dot_b_v3 >= 0.0, d_v3, de2 * de2 + z2)
    )
    dot_c_v1 = ppx * c0 + ppy * c1
    dot_c_v3 = rx3 * c0 + ry3 * c1
    r3 = jnp.where(
        dot_c_v1 >= 0.0, d_v1, jnp.where(dot_c_v3 <= 0.0, d_v3, de3 * de3 + z2)
    )
    return jnp.where(
        de1 >= 0.0, r1, jnp.where(de2 >= 0.0, r2, jnp.where(de3 >= 0.0, r3, z2))
    )


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
