"""Exact octree SDF: leaves hold culled triangle lists — structure, builder,
and batched queries.

TPU-native re-design of the reference ExactOctreeSdf
(reference: include/SdfLib/ExactOctreeSdf.h:35-218,
src/sdf/ExactOctreeSdf.cpp:7-320, ExactOctreeSdfDepthFirst.h:27-683).

Key re-design decisions (SURVEY.md S2.4.7):
  * The reference compresses leaf triangle lists with two-tier bit packing
    (packed index sets + per-parent bitmasks) and decodes them per query
    through a mutable shared cache — not thread-safe and hostile to SIMD.
    Here leaves store *flat padded triangle-index buckets*: a (L, B) int32
    matrix (-1 padded). Queries are pure gathers + masked brute force, the
    TPU-idiomatic replacement.
  * Triangle culling per node uses the conservative center-distance
    criterion d(tri, center) <= min_t d(t, center) + node diagonal, which
    provably retains the nearest triangle for every point in the node
    (the role of PerNodeRegionTrianglesInfluence's GJK tests,
    TrianglesInfluence.h:767-860). Lists are therefore supersets of the
    reference's — queries stay exact, only list sizes differ.
  * Subdivision terminates at <= min_triangles_per_node or max_depth
    (ExactOctreeSdfDepthFirst.h:299-302; API default 128, CLI default 32).
  * Out-of-domain queries return box distance + sqrt(3)*box_size
    (ExactOctreeSdf.cpp:44-49) — note: NOT the same fallback as OctreeSdf.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..mesh import BoundingBox, Mesh
from ..triangle import TriangleDataSoA, calculate_mesh_triangle_data
from ..ops.box import box_distance, box_distance_gradient
from ..ops.point_triangle import (
    signed_dist_grad_pair,
    signed_dist_pair,
    sq_dist_pair,
)
from .octree_builder import CHILDREN_INDEX_MASK, IS_LEAF_MASK, _round_pow2
from .sdf_function import SdfFormat, SdfFunction

__all__ = ["ExactOctreeSdf"]


@jax.jit
def _center_cull_chunk(tris: TriangleDataSoA, centers, cand_idx, cand_valid, half):
    """Distances from node centers to candidate triangles + keep masks."""
    cand = jax.tree.map(lambda a: a[cand_idx], tris)
    sqd = jax.vmap(jax.vmap(sq_dist_pair, in_axes=(None, 0)))(centers, cand)
    sqd = jnp.where(cand_valid, sqd, jnp.inf)
    dc = jnp.sqrt(sqd)
    minc = jnp.min(dc, axis=1, keepdims=True)
    diag = 2.0 * jnp.sqrt(jnp.asarray(3.0, dc.dtype)) * half
    keep = (dc <= minc + diag) & cand_valid
    return keep, jnp.sum(keep, axis=1)


# Leaf triangle ids are stored CSR-style: one flat int32 array where each
# leaf's span starts at leaf_offset[l] and is padded with -1 up to a multiple
# of _LEAF_CHUNK. The query loops over chunks with a running min — memory is
# O(total triangles) instead of O(num_leaves * max_count), which matters for
# geometries with fat equidistant-shell interior leaves.
_LEAF_CHUNK = 64


@partial(jax.jit, static_argnames=("levels", "max_chunks", "with_gradient"))
def _exact_query(
    octree_u32,
    leaf_offset,     # (L,) int32 into tri_flat
    leaf_count,      # (L,) int32
    tri_flat,        # flat int32 triangle ids, -1 padded per leaf span
    tris: TriangleDataSoA,
    points,
    box_min,
    box_size,
    start_grid_size,
    *,
    levels: int,
    max_chunks: int,
    with_gradient: bool,
):
    """Descent + masked brute force over the leaf list
    (ExactOctreeSdf.cpp:38-178 semantics)."""
    pts = points
    s = start_grid_size
    cell = box_size / s

    frac = (pts - box_min) / cell
    ipos = jnp.floor(frac).astype(jnp.int32)
    frac = frac - ipos
    in_box = jnp.all((ipos >= 0) & (ipos < s), axis=-1)
    ic = jnp.clip(ipos, 0, s - 1)
    word = octree_u32[ic[..., 2] * (s * s) + ic[..., 1] * s + ic[..., 0]]

    leaf_mask = jnp.uint32(IS_LEAF_MASK)
    cidx_mask = jnp.uint32(CHILDREN_INDEX_MASK)
    for _ in range(levels):
        is_leaf = (word & leaf_mask) != 0
        # Reference ExactOctreeSdf uses strict '>' for child rounding
        # (ExactOctreeSdf.cpp:33-36), unlike OctreeSdf's '>='.
        child = (
            ((frac[..., 2] > 0.5).astype(jnp.uint32) << 2)
            + ((frac[..., 1] > 0.5).astype(jnp.uint32) << 1)
            + (frac[..., 0] > 0.5).astype(jnp.uint32)
        )
        nxt = octree_u32[(word & cidx_mask) + child]
        nfrac = 2.0 * frac
        nfrac = nfrac - jnp.floor(nfrac)
        word = jnp.where(is_leaf, word, nxt)
        frac = jnp.where(is_leaf[..., None], frac, nfrac)

    leaf_id = (word & cidx_mask).astype(jnp.int32)
    off = leaf_offset[leaf_id]                 # (P,)
    cnt = leaf_count[leaf_id]

    def chunk_step(i, carry):
        best, best_id = carry
        active = (i * _LEAF_CHUNK) < cnt
        idx = off[..., None] + i * _LEAF_CHUNK + jnp.arange(_LEAF_CHUNK)
        tri_ids = tri_flat[idx]                # (P, CH)
        valid = (tri_ids >= 0) & active[..., None]
        cand = jax.tree.map(lambda a: a[jnp.maximum(tri_ids, 0)], tris)
        sqd = jax.vmap(jax.vmap(sq_dist_pair, in_axes=(None, 0)))(pts, cand)
        sqd = jnp.where(valid, sqd, jnp.inf)
        local = jnp.min(sqd, axis=-1)
        local_id = jnp.take_along_axis(
            tri_ids, jnp.argmin(sqd, axis=-1)[..., None], axis=-1
        )[..., 0]
        take = local < best
        return jnp.where(take, local, best), jnp.where(take, local_id, best_id)

    init = (
        jnp.full(pts.shape[:-1], jnp.inf, pts.dtype),
        jnp.zeros(pts.shape[:-1], jnp.int32),
    )
    _, win_ids = jax.lax.fori_loop(0, max_chunks, chunk_step, init)
    win_tri = jax.tree.map(lambda a: a[jnp.maximum(win_ids, 0)], tris)

    center = box_min + 0.5 * box_size
    size3 = jnp.full((3,), box_size, pts.dtype)
    fallback = jnp.sqrt(jnp.asarray(3.0, pts.dtype)) * box_size

    if with_gradient:
        d_in, g_in = jax.vmap(signed_dist_grad_pair)(pts, win_tri)
        d_out, g_out = box_distance_gradient(pts, center, size3)
        d = jnp.where(in_box, d_in, d_out + fallback)
        g = jnp.where(in_box[..., None], g_in, g_out)
        return d, g
    d_in = jax.vmap(signed_dist_pair)(pts, win_tri)
    d_out = box_distance(pts, center, size3)
    return jnp.where(in_box, d_in, d_out + fallback)


def _build_exact(
    tris: TriangleDataSoA,
    box_min,
    box_size: float,
    max_depth: int,
    start_depth: int,
    min_triangles_per_node: int,
    pair_budget: int = 1 << 21,
):
    """Level-synchronous exact-octree build. Returns (octree_u32, leaf_tris,
    stats)."""
    tris_dev = jax.tree.map(jnp.asarray, tris)
    T = tris.num_triangles
    box_min = np.asarray(box_min, np.float32)

    s = 1 << start_depth
    n0 = s * s * s
    cell = box_size / s
    zi, yi, xi = np.meshgrid(np.arange(s), np.arange(s), np.arange(s), indexing="ij")
    centers = np.stack(
        [
            box_min[0] + cell * (xi.ravel() + 0.5),
            box_min[1] + cell * (yi.ravel() + 0.5),
            box_min[2] + cell * (zi.ravel() + 0.5),
        ],
        axis=-1,
    ).astype(np.float32)

    cand_idx = np.broadcast_to(np.arange(T, dtype=np.int32), (n0, T)).copy()
    cand_valid = np.ones((n0, T), bool)
    node_slots = np.arange(n0, dtype=np.int64)

    blocks = [np.zeros(n0, np.uint32)]
    total_len = n0
    slot_patches: list[tuple[np.ndarray, np.ndarray]] = []
    leaf_lists: list[np.ndarray] = []
    leaf_counter = 0
    half = 0.5 * cell
    depth = start_depth
    stats: dict = {"nodes_per_depth": {}, "tris_per_leaf": []}

    while centers.shape[0] > 0:
        N, K = centers.shape[0], cand_idx.shape[1]
        stats["nodes_per_depth"][depth] = N

        Kp = _round_pow2(K, 8)
        C = max(1, _round_pow2(pair_budget // max(Kp, 1) // 2, 1))
        Np = -(-N // C) * C
        pad = Np - N
        cen_p = np.pad(centers, [(0, pad), (0, 0)])
        ci_p = np.pad(cand_idx, [(0, pad), (0, Kp - K)], constant_values=0)
        va_p = np.pad(cand_valid, [(0, pad), (0, Kp - K)], constant_values=False)
        va_p[N:, 0] = True

        keeps = np.zeros((Np, Kp), bool)
        kcounts = np.zeros(Np, np.int64)
        for i in range(0, Np, C):
            sl = slice(i, i + C)
            k, kc = _center_cull_chunk(
                tris_dev,
                jnp.asarray(cen_p[sl]),
                jnp.asarray(ci_p[sl]),
                jnp.asarray(va_p[sl]),
                jnp.float32(half),
            )
            keeps[sl], kcounts[sl] = np.asarray(k), np.asarray(kc)
        keeps, kcounts = keeps[:N, :K], kcounts[:N]

        terminal = (kcounts <= min_triangles_per_node) | (depth == max_depth)

        # Emit leaves: leaf word = IS_LEAF | leaf_id.
        t_idx = np.nonzero(terminal)[0]
        if len(t_idx):
            for i in t_idx:
                kept = cand_idx[i][keeps[i]]
                leaf_lists.append(kept.astype(np.int32))
                stats["tris_per_leaf"].append(len(kept))
            leaf_ids = leaf_counter + np.arange(len(t_idx), dtype=np.int64)
            leaf_counter += len(t_idx)
            slot_patches.append(
                (node_slots[t_idx].copy(), (leaf_ids.astype(np.uint32) | IS_LEAF_MASK))
            )

        sub = np.nonzero(~terminal)[0]
        if len(sub) == 0:
            break
        M = len(sub)
        child_base = total_len + 8 * np.arange(M, dtype=np.int64)
        blocks.append(np.zeros(8 * M, np.uint32))
        total_len += 8 * M
        slot_patches.append((node_slots[sub].copy(), child_base.astype(np.uint32)))

        K_next = max(1, int(kcounts[sub].max(initial=1)))
        order = np.argsort(~keeps[sub], axis=1, kind="stable")[:, :K_next]
        new_cand = np.take_along_axis(cand_idx[sub], order, axis=1)
        new_valid = np.take_along_axis(keeps[sub], order, axis=1)

        child_offsets = np.array(
            [[(c & 1) * 2 - 1, ((c >> 1) & 1) * 2 - 1, ((c >> 2) & 1) * 2 - 1]
             for c in range(8)],
            np.float32,
        )
        centers = (
            centers[sub][:, None, :] + child_offsets[None] * (0.5 * half)
        ).reshape(M * 8, 3)
        node_slots = (child_base[:, None] + np.arange(8)[None]).reshape(-1)
        cand_idx = np.repeat(new_cand, 8, axis=0)
        cand_valid = np.repeat(new_valid, 8, axis=0)
        half *= 0.5
        depth += 1

    octree = np.concatenate(blocks)
    for slots, words in slot_patches:
        octree[slots] = words

    # CSR layout: each leaf's span padded with -1 to a _LEAF_CHUNK multiple.
    spans = [
        -(-max(len(l), 1) // _LEAF_CHUNK) * _LEAF_CHUNK for l in leaf_lists
    ] or [_LEAF_CHUNK]
    leaf_offset = np.zeros(max(leaf_counter, 1), np.int32)
    leaf_count = np.zeros(max(leaf_counter, 1), np.int32)
    tri_flat = np.full(int(np.sum(spans)), -1, np.int32)
    pos = 0
    for i, l in enumerate(leaf_lists):
        leaf_offset[i] = pos
        leaf_count[i] = len(l)
        tri_flat[pos : pos + len(l)] = l
        pos += spans[i]
    return octree, leaf_offset, leaf_count, tri_flat, stats


class ExactOctreeSdf(SdfFunction):
    """Octree whose leaves store exact nearest-triangle candidate lists."""

    def __init__(
        self,
        mesh: Mesh | None = None,
        box: BoundingBox | None = None,
        max_depth: int = 7,
        start_depth: int = 2,
        min_triangles_per_node: int = 128,
        _state: dict | None = None,
    ):
        if _state is not None:
            self._load_state(_state)
            return
        assert mesh is not None and box is not None
        cbox = box.cubified()
        self.box = cbox
        self.max_depth = int(max_depth)
        self.start_depth = int(start_depth)
        self.start_grid_size = 1 << self.start_depth
        self.min_triangles_per_node = int(min_triangles_per_node)

        soa = calculate_mesh_triangle_data(mesh)
        self.triangles: TriangleDataSoA = jax.tree.map(jnp.asarray, soa)
        octree, leaf_offset, leaf_count, tri_flat, stats = _build_exact(
            soa,
            cbox.min,
            float(cbox.size[0]),
            self.max_depth,
            self.start_depth,
            self.min_triangles_per_node,
        )
        self.octree_data = jnp.asarray(octree)
        self.leaf_offset = jnp.asarray(leaf_offset)
        self.leaf_count = jnp.asarray(leaf_count)
        self.tri_flat = jnp.asarray(tri_flat)
        self.build_stats = stats

    # -- queries ----------------------------------------------------------------

    def _query(self, points, with_gradient: bool):
        pts = jnp.asarray(points, jnp.float32)
        flat = pts.reshape(-1, 3)
        max_cnt = int(np.max(np.asarray(self.leaf_count), initial=1))
        out = _exact_query(
            self.octree_data,
            self.leaf_offset,
            self.leaf_count,
            self.tri_flat,
            self.triangles,
            flat,
            jnp.asarray(self.box.min),
            jnp.float32(self.box.size[0]),
            self.start_grid_size,
            levels=self.max_depth - self.start_depth,
            max_chunks=-(-max_cnt // _LEAF_CHUNK),
            with_gradient=with_gradient,
        )
        if with_gradient:
            d, g = out
            return d.reshape(pts.shape[:-1]), g.reshape(pts.shape)
        return out.reshape(pts.shape[:-1])

    def get_distance(self, points):
        return self._query(points, with_gradient=False)

    def get_distance_and_gradient(self, points):
        return self._query(points, with_gradient=True)

    def get_sample_area(self) -> BoundingBox:
        return self.box

    def get_format(self) -> SdfFormat:
        return SdfFormat.EXACT_OCTREE

    # -- serialization -----------------------------------------------------------

    def _state_arrays(self) -> dict:
        return {
            "box_min": np.asarray(self.box.min, np.float32),
            "box_max": np.asarray(self.box.max, np.float32),
            "start_grid_size": np.int32(self.start_grid_size),
            "max_depth": np.int32(self.max_depth),
            "min_triangles_per_node": np.int32(self.min_triangles_per_node),
            "octree_data": np.asarray(self.octree_data, np.uint32),
            "leaf_offset": np.asarray(self.leaf_offset, np.int32),
            "leaf_count": np.asarray(self.leaf_count, np.int32),
            "tri_flat": np.asarray(self.tri_flat, np.int32),
            **{
                f"tri_{name}": np.asarray(arr, np.float32)
                for name, arr in self.triangles._asdict().items()
            },
        }

    def _load_state(self, state: dict):
        self.box = BoundingBox(state["box_min"], state["box_max"])
        self.start_grid_size = int(state["start_grid_size"])
        self.start_depth = int(np.log2(self.start_grid_size))
        self.max_depth = int(state["max_depth"])
        self.min_triangles_per_node = int(state["min_triangles_per_node"])
        self.octree_data = jnp.asarray(state["octree_data"])
        self.leaf_offset = jnp.asarray(state["leaf_offset"])
        self.leaf_count = jnp.asarray(state["leaf_count"])
        self.tri_flat = jnp.asarray(state["tri_flat"])
        fields = TriangleDataSoA._fields
        self.triangles = TriangleDataSoA(
            *(jnp.asarray(state[f"tri_{n}"]) for n in fields)
        )
        self.build_stats = {}

    @classmethod
    def _from_state_arrays(cls, state: dict) -> "ExactOctreeSdf":
        return cls(_state=state)
