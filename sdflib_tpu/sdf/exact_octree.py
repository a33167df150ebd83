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

import os
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..mesh import BoundingBox, Mesh
from ..triangle import TriangleDataSoA, calculate_mesh_triangle_data
from ..ops.box import box_distance, box_distance_gradient
from ..ops.point_triangle import (
    pack_triangle_fields,
    pack_triangle_full_fields,
    signed_dist_grad_pair,
    signed_dist_from_rows,
    sq_dist_from_field_fn,
    sq_dist_from_vertex_cols,
    sq_dist_packed,
)
from ..ops.pallas_scan import (
    exact_scan_grouped_pallas,
    exact_scan_window_pallas,
)
from .octree import _build_leaf_grid, _select8
from .octree_builder import CHILDREN_INDEX_MASK, IS_LEAF_MASK, _round_pow2
from .sdf_function import SdfFormat, SdfFunction

__all__ = ["ExactOctreeSdf"]


def _bucket_sqdist(px, py, pz, field_fn, nf: int):
    """Squared distances from a bucket-row column accessor. 19-field
    frame rows use the region-classified kernel directly; 9-float vertex
    rows (the memory-scalable tier) derive the same frame on the fly
    (sq_dist_from_vertex_cols) — amortized over the group, and
    selection-exact where the naive 3-vertex formula is not."""
    if nf == 9:
        return sq_dist_from_vertex_cols(px, py, pz, field_fn)
    return sq_dist_from_field_fn(px, py, pz, field_fn)


# 8 cube corners in {-1,1}^3 (offset units of the node half size).
_CORNER_OFFS = np.array(
    [[(c & 1) * 2 - 1, ((c >> 1) & 1) * 2 - 1, ((c >> 2) & 1) * 2 - 1]
     for c in range(8)],
    np.float32,
)

# 27 half-step lattice anchors in {-1,0,1}^3 (node half-size units): the
# node partitions into 27-anchored overlapping half-size sub-cubes; any
# point lies within (half/2)*sqrt(3) of its anchor.
_LATTICE_OFFS = np.array(
    [[i, j, k] for k in (-1, 0, 1) for j in (-1, 0, 1) for i in (-1, 0, 1)],
    np.float32,
)


def _triangle_aabbs(tris: TriangleDataSoA):
    """(T, 6) per-triangle world AABB [min_xyz, max_xyz]."""
    vw = jnp.asarray(tris.v_world)  # (T, 3 verts, 3)
    return jnp.concatenate([vw.min(axis=1), vw.max(axis=1)], axis=-1)


@jax.jit
def _lattice_cull_chunk(packed, aabbs, centers, cand_idx, cand_valid, half):
    """Lattice-anchored triangle culling (the role of the reference's
    influence strategies, TrianglesInfluence.h:119-860, re-derived for
    batched evaluation): keep t iff for SOME half-step lattice anchor l,
    BOTH of two independently-safe tests pass:

      (A)  d_lb(t, subcube_l) <= min_t' d(t', l) + s,   s = (half/2)*sqrt(3)
      (B)  d(t, l) <= min_t' d(t', l) + 2*s

    Safety: a point p in the node lies in the half-size sub-cube of some
    anchor l with |p - l| <= s. If t is nearest at p then
      (A) d(t, subcube_l) <= d(t,p) = min_t' d(t',p) <= min_t' d(t',l) + s;
      (B) d(t, l) <= d(t,p) + |p-l| <= (min_t' d(t',l) + s) + s.
    Both hold for any winner, so their conjunction is still a safe
    superset. (A) uses the exact AABB(triangle)-to-sub-cube distance —
    loose by up to a triangle diameter for diagonal triangles; (B) reuses
    the exact point-triangle distances already computed for min_l, and
    caps that slack at 2s. On shell-like candidate sets (B) is the binding
    test and cuts list sizes substantially for free. Anchored at 27 points
    instead of 8 corners, the slack halves and each min is local. All
    device-resident; `packed` is the (T, 19) field matrix, `aabbs` the
    (T, 6) triangle AABBs."""
    fields = packed[cand_idx]                        # (C, K, 19) row gather
    ab = aabbs[cand_idx]                             # (C, K, 6) row gather
    px = centers[:, 0:1]
    py = centers[:, 1:2]
    pz = centers[:, 2:3]
    qh = 0.5 * half
    slack = jnp.sqrt(jnp.asarray(3.0, centers.dtype)) * qh
    offs = jnp.asarray(_LATTICE_OFFS, centers.dtype) * half  # (27, 3)

    # ROLLED anchor loop (lax.fori_loop), not a 27x python unroll: the
    # executable is what a process pays to compile-or-load on each
    # variant's first call (measured as ~98% of cold build wall time
    # through the remote transport), and rolling shrinks the program ~27x
    # for identical device work.
    def anchor_step(l, carry):
        keep, sqd_c = carry
        off = offs[l]
        sqd_l = sq_dist_packed(
            px + off[0], py + off[1], pz + off[2], fields
        )
        sqd_l = jnp.where(cand_valid, sqd_l, jnp.inf)
        # (0,0,0) = anchor 13: the node center — reused as the leaf sort key
        sqd_c = jnp.where(l == 13, sqd_l, sqd_c)
        min_l = jnp.sqrt(jnp.min(sqd_l, axis=1))     # (C,)

        anchor = centers + off[None]                 # (C, 3)
        lo = anchor[:, None, :] - qh
        hi = anchor[:, None, :] + qh
        gap = jnp.maximum(
            jnp.maximum(ab[..., 0:3] - hi, lo - ab[..., 3:6]), 0.0
        )
        d_lb = jnp.sqrt(jnp.sum(gap * gap, axis=-1))  # (C, K)
        bound_a = d_lb <= min_l[:, None] + slack
        cap_b = min_l[:, None] + 2.0 * slack
        bound_b = sqd_l <= cap_b * cap_b
        return keep | (bound_a & bound_b), sqd_c

    keep, sqd_center = jax.lax.fori_loop(
        0, 27, anchor_step,
        (jnp.zeros(cand_idx.shape, bool), jnp.zeros(cand_idx.shape)),
    )
    keep = keep & cand_valid
    return keep, jnp.sum(keep, axis=1), sqd_center


@jax.jit
def _region_cull_chunk(packed, aabbs, centers, cand_idx, cand_valid, half):
    """Per-node-region influence culling — the TPU-native equivalent of
    the reference's DEFAULT exact-build strategy
    (PerNodeRegionTrianglesInfluence, TrianglesInfluence.h:663-860,
    selected at ExactOctreeSdf.cpp:26), which tests each candidate
    against the LOCALLY BEST triangle's distance envelope instead of an
    absolute shell. The relative test's slack vanishes for nodes far
    from the surface (both fields grow in lockstep), which is why the
    reference's depth-7 lists average ~33 triangles where the absolute
    lattice/basic shells keep ~560 (r5 measurement on the 100k torus).

    Reference mechanism: warped-box GJK against the best triangle's
    corner-distance hull. Here the same envelope idea runs closed-form,
    per half-step lattice anchor l with sub-cube corner offsets q:

        keep t  iff  min over the 8 sub-cube corners q of
                     [ d_t(l) + g_t(l)·(q-l) - d_b(q) ]  <=  eps

    where b is the anchor's nearest candidate and g_t the unsigned
    distance gradient. Safety: if t is nearest at some p in sub-cube(l),
    then d_t(p) <= d_b(p); d_t is CONVEX (distance to a convex set), so
    its tangent at l under-estimates it everywhere, and d_b(p) is
    over-estimated by the trilinear interpolation of its sub-cube corner
    values (Jensen). Tangent-minus-trilinear is multilinear in p, so its
    box minimum sits at a corner — the min above — giving
    min_q phi <= phi(p) <= d_t(p) - d_b(p) <= 0. No iteration, no GJK:
    the whole test is elementwise VPU work, and the gradient comes from
    one vjp of the pair kernel (2(p - proj)). A near guard keeps any
    t with d_t(l) inside the sub-cube radius (gradients degenerate on
    the triangle itself), and eps absorbs fp32 noise — both only ADD
    triangles, so the superset stays valid."""
    C, K = cand_idx.shape
    fields = packed[cand_idx]                        # (C, K, 19) row gather
    px = centers[:, 0:1]
    py = centers[:, 1:2]
    pz = centers[:, 2:3]
    qh = 0.5 * half
    s = jnp.sqrt(jnp.asarray(3.0, centers.dtype)) * qh
    offs = jnp.asarray(_LATTICE_OFFS, centers.dtype) * half   # (27, 3)
    corner = jnp.asarray(_CORNER_OFFS, centers.dtype) * qh    # (8, 3)
    eps = 2e-3 * half

    def anchor_step(l, carry):
        keep, sqd_c = carry
        off = offs[l]
        lx = jnp.broadcast_to(px + off[0], (C, K))
        ly = jnp.broadcast_to(py + off[1], (C, K))
        lz = jnp.broadcast_to(pz + off[2], (C, K))
        sqd_l, vjp = jax.vjp(
            lambda a, b, c: sq_dist_packed(a, b, c, fields), lx, ly, lz
        )
        gx2, gy2, gz2 = vjp(jnp.ones_like(sqd_l))   # = 2 (p - proj)
        sqd_m = jnp.where(cand_valid, sqd_l, jnp.inf)
        sqd_c = jnp.where(l == 13, sqd_m, sqd_c)
        d_l = jnp.sqrt(sqd_m)
        inv = 0.5 / jnp.maximum(d_l, 1e-20)
        gx, gy, gz = gx2 * inv, gy2 * inv, gz2 * inv

        # the anchor's nearest candidate: one-hot in-row field select
        # into 19 separate (C,) vectors — a stacked (C, 19) array would
        # lane-pad 19 -> 128 (CLAUDE.md: never materialize (N, 19))
        oh = (
            jax.lax.broadcasted_iota(jnp.int32, (C, K), 1)
            == jnp.argmin(sqd_m, axis=1)[:, None]
        )
        fb = [
            jnp.sum(jnp.where(oh, fields[..., r], 0.0), axis=1)
            for r in range(fields.shape[-1])
        ]

        m = jnp.full((C, K), jnp.inf, centers.dtype)
        for c in range(8):
            qo = corner[c]
            d_b = jnp.sqrt(sq_dist_from_field_fn(
                (px + off[0])[:, 0] + qo[0],
                (py + off[1])[:, 0] + qo[1],
                (pz + off[2])[:, 0] + qo[2],
                lambda r: fb[r],
            ))                                       # (C,)
            phi = d_l + gx * qo[0] + gy * qo[1] + gz * qo[2] - d_b[:, None]
            m = jnp.minimum(m, phi)
        keep_l = (m <= eps) | (d_l <= s + eps)
        return keep | keep_l, sqd_c

    keep, sqd_center = jax.lax.fori_loop(
        0, 27, anchor_step,
        (jnp.zeros(cand_idx.shape, bool), jnp.zeros(cand_idx.shape)),
    )
    keep = keep & cand_valid
    return keep, jnp.sum(keep, axis=1), sqd_center


@jax.jit
def _basic_cull_chunk(packed, vworld, centers, cand_idx, cand_valid, half):
    """Reference BasicTrianglesInfluence semantics
    (TrianglesInfluence.h:119-168): keep t iff

        d(t, node_box) <= maxMinDist,
        maxMinDist = max over the 8 node corners of min_t' d(t', corner)

    — the criterion of the cited CGF 2023 paper ("Triangle Influence
    Supersets"). The reference evaluates the box-triangle distance with
    iterative GJK capped at 15 iterations (GJK.cpp:564-600); here it is
    the exact feature-pair enumeration (ops/gjk.py), batched. Returns the
    same (keep, counts, center-key) triple as the lattice cull."""
    from ..ops.gjk import box_triangle_distance

    fields = packed[cand_idx]                        # (C, K, 19)
    tv = vworld[cand_idx]                            # (C, K, 3, 3)
    px = centers[:, 0:1]
    py = centers[:, 1:2]
    pz = centers[:, 2:3]

    sqd_center = jnp.where(
        cand_valid, sq_dist_packed(px, py, pz, fields), jnp.inf
    )
    maxmin = jnp.zeros(centers.shape[0], centers.dtype)
    for c in range(8):
        off = jnp.asarray(_CORNER_OFFS[c]) * half
        sqd_c = sq_dist_packed(px + off[0], py + off[1], pz + off[2], fields)
        sqd_c = jnp.where(cand_valid, sqd_c, jnp.inf)
        maxmin = jnp.maximum(maxmin, jnp.sqrt(jnp.min(sqd_c, axis=1)))

    d_box = box_triangle_distance(
        jnp.broadcast_to(centers[:, None, :], tv.shape[:-2] + (3,)),
        jnp.full((3,), half, centers.dtype),
        tv,
    )                                                # (C, K)
    keep = (d_box <= maxmin[:, None]) & cand_valid
    return keep, jnp.sum(keep, axis=1), sqd_center


@jax.jit
def _per_vertex_cull_chunk(packed, vworld, centers, cand_idx, cand_valid, half):
    """Reference PerVertexTrianglesInfluence<1> semantics
    (TrianglesInfluence.h:286-476): each node corner's NEAREST candidate
    triangle defines an influence hull — the convex hull of spheres at
    the 8 corners with radii d(corner_c, nearest_i) - min_c d(corner_c,
    nearest_i) — and a candidate survives the test at its closest corner
    vId iff it is the corner's own nearest triangle or its distance to
    that hull is below minDist[vId] (IsNearMinimize, GJK.cpp:661-867).
    The hull distance uses the Frank-Wolfe LOWER bound
    (ops/gjk.py corner_sphere_hull_tri_lower), so only provably-outside
    triangles are culled — conservative where the reference's 15-iteration
    upper bound could over-cull."""
    from ..ops.gjk import corner_sphere_hull_tri_lower

    fields = packed[cand_idx]                        # (C, K, 19)
    tv = vworld[cand_idx]                            # (C, K, 3, 3)
    K = cand_idx.shape[1]
    px = centers[:, 0:1]
    py = centers[:, 1:2]
    pz = centers[:, 2:3]

    sqd_center = jnp.where(
        cand_valid, sq_dist_packed(px, py, pz, fields), jnp.inf
    )
    # d(corner_c, tri_k) for the 8 corners: (C, 8, K)
    corner_d = []
    for c in range(8):
        off = jnp.asarray(_CORNER_OFFS[c]) * half
        sqd_c = sq_dist_packed(px + off[0], py + off[1], pz + off[2], fields)
        corner_d.append(
            jnp.sqrt(jnp.where(cand_valid, sqd_c, jnp.inf))
        )
    D = jnp.stack(corner_d, axis=1)                  # (C, 8, K)

    # verticesInfo: local candidate index of each corner's nearest triangle
    nb = jnp.argmin(D, axis=2)                       # (C, 8)
    # region radii: d(corner_c, tri_nb[i]) for all corner pairs (C, 8i, 8c)
    nb_oh = nb[:, :, None, None] == jnp.arange(K)[None, None, None, :]
    radii = jnp.sum(
        jnp.where(nb_oh, D[:, None, :, :], 0.0), axis=3
    )                                                # (C, 8i, 8c)
    minv = jnp.min(radii, axis=2)                    # (C, 8)
    radii = radii - minv[:, :, None]

    # Test corner per candidate: the corner closest to the triangle.
    vid = jnp.argmin(D, axis=1)                      # (C, K)
    vid_oh = vid[:, None, :] == jnp.arange(8)[None, :, None]  # (C, 8, K)
    radii_k = jnp.sum(
        jnp.where(vid_oh[:, :, None, :], radii[:, :, :, None], 0.0), axis=1
    )                                                # (C, 8c, K)
    thr = jnp.sum(jnp.where(vid_oh, minv[:, :, None], 0.0), axis=1)  # (C, K)
    region_tri = jnp.sum(
        jnp.where(vid_oh, nb[:, :, None], 0), axis=1
    )                                                # (C, K)

    lower = corner_sphere_hull_tri_lower(
        jnp.broadcast_to(centers[:, None, :], (centers.shape[0], K, 3)),
        half,
        radii_k.transpose(0, 2, 1),                  # (C, K, 8)
        tv,
    )                                                # (C, K)
    own = region_tri == jnp.arange(K)[None, :]
    keep = (own | (lower <= thr)) & cand_valid
    return keep, jnp.sum(keep, axis=1), sqd_center


# Precise strategy: candidates are tested against every influence region;
# regions are capped to the strongest few (smallest corner distance) —
# dropping regions only weakens the cull, so exactness is unaffected.
_PRECISE_MAX_REGIONS = 16


@jax.jit
def _precise_cull_chunk(packed, vworld, centers, cand_idx, cand_valid, half):
    """Reference PreciseTrianglesInfluence semantics
    (TrianglesInfluence.h:191-284): every candidate whose 8-corner
    distances dip below maxMinDist spans an influence region (corner
    spheres with radii d(corner_c, tri_j)); a candidate is culled iff it
    lies provably outside ANY other candidate's region hull
    (isInsideConvexHull with threshold 0). Regions are capped at the
    _PRECISE_MAX_REGIONS tightest (exactness-preserving; see above), and
    the hull test is the conservative Frank-Wolfe lower bound."""
    from ..ops.gjk import corner_sphere_hull_tri_lower

    fields = packed[cand_idx]                        # (C, K, 19)
    tv = vworld[cand_idx]                            # (C, K, 3, 3)
    C, K = cand_idx.shape
    R = min(_PRECISE_MAX_REGIONS, K)
    px = centers[:, 0:1]
    py = centers[:, 1:2]
    pz = centers[:, 2:3]

    sqd_center = jnp.where(
        cand_valid, sq_dist_packed(px, py, pz, fields), jnp.inf
    )
    corner_d = []
    for c in range(8):
        off = jnp.asarray(_CORNER_OFFS[c]) * half
        sqd_c = sq_dist_packed(px + off[0], py + off[1], pz + off[2], fields)
        corner_d.append(
            jnp.sqrt(jnp.where(cand_valid, sqd_c, jnp.inf))
        )
    D = jnp.stack(corner_d, axis=1)                  # (C, 8, K)
    maxmin = jnp.max(jnp.min(D, axis=2), axis=1)     # (C,)

    # Region strength = min corner distance; valid iff any corner beats
    # maxMinDist (TrianglesInfluence.h:252-256).
    strength = jnp.min(D, axis=1)                    # (C, K)
    region_ok = jnp.any(D < maxmin[:, None, None], axis=1) & cand_valid
    key = jnp.where(region_ok, strength, jnp.inf)
    order = jnp.argsort(key, axis=1)[:, :R]          # (C, R) local indices
    oh_r = order[:, :, None] == jnp.arange(K)[None, None, :]  # (C, R, K)
    radii_r = jnp.einsum(
        "crk,cgk->crg", oh_r.astype(D.dtype), D
    )                                                # (C, R, 8)
    valid_r = jnp.take_along_axis(region_ok, order, axis=1)   # (C, R)

    lower = corner_sphere_hull_tri_lower(
        jnp.broadcast_to(centers[:, None, None, :], (C, R, K, 3)),
        half,
        jnp.broadcast_to(radii_r[:, :, None, :], (C, R, K, 8)),
        jnp.broadcast_to(tv[:, None], (C, R, K, 3, 3)),
    )                                                # (C, R, K)
    not_self = order[:, :, None] != jnp.arange(K)[None, None, :]
    culled = jnp.any(
        valid_r[:, :, None] & not_self & (lower > 0.0), axis=1
    )
    keep = ~culled & cand_valid
    return keep, jnp.sum(keep, axis=1), sqd_center


_CULL_STRATEGIES = ("lattice", "region", "basic", "precise", "per_vertex")


def prepare_cull_inputs(tris_dev: TriangleDataSoA, strategy: str):
    """(packed fields, geometry) device tables for a named influence
    strategy — (None, None) for the approx builders' free "distance"
    rule. One owner for the strategy->inputs mapping so the exact and
    both approx builders cannot drift."""
    if strategy == "distance":
        return None, None
    if strategy not in _CULL_STRATEGIES:
        raise ValueError(f"unknown cull strategy {strategy!r}")
    packed = pack_triangle_fields(tris_dev)
    geo = (
        _triangle_aabbs(tris_dev)
        if strategy in ("lattice", "region")
        else jnp.asarray(tris_dev.v_world)
    )
    return packed, geo


@partial(jax.jit, static_argnames=("C", "strategy"))
def _cull_group(packed, geo, centers, cand, valid, half, *, C: int, strategy: str):
    """All cull chunks of one node group as ONE compiled call (lax.map
    keeps the per-chunk transients bounded). The previous per-chunk eager
    loop paid 4 dispatch round trips per chunk through the remote
    transport — the dominant share of build wall time (PERF.md §1).
    `geo` is the triangle AABBs (lattice) or world vertices (the GJK
    strategies). The precise strategy's pair state carries an extra
    region factor, so its map chunk shrinks accordingly."""
    N = centers.shape[0]
    if strategy == "precise":
        C = max(8, C // _PRECISE_MAX_REGIONS)

    def one(args):
        cn, ci, cv = args
        if strategy == "lattice":
            return _lattice_cull_chunk(packed, geo, cn, ci, cv, half)
        if strategy == "region":
            return _region_cull_chunk(packed, geo, cn, ci, cv, half)
        if strategy == "precise":
            return _precise_cull_chunk(packed, geo, cn, ci, cv, half)
        if strategy == "per_vertex":
            return _per_vertex_cull_chunk(packed, geo, cn, ci, cv, half)
        return _basic_cull_chunk(packed, geo, cn, ci, cv, half)

    k, kc, sq = jax.lax.map(
        one,
        (
            centers.reshape(-1, C, 3),
            cand.reshape(-1, C, cand.shape[1]),
            valid.reshape(-1, C, valid.shape[1]),
        ),
    )
    return (
        k.reshape(N, -1),
        kc.reshape(N),
        sq.reshape(N, -1),
    )


@jax.jit
def _compact_rows(idx_rows, keep_rows):
    """Stable-compact kept entries to the front of each row; returns
    (compacted ids, kept mask) with the same width (slice on host)."""
    order = jnp.argsort(~keep_rows, axis=1, stable=True)
    return (
        jnp.take_along_axis(idx_rows, order, axis=1),
        jnp.take_along_axis(keep_rows, order, axis=1),
    )


@jax.jit
def _compact_leaf_rows(sqd_center, idx_rows, keep_rows):
    """Compact kept ids to the row front SORTED by distance to the leaf
    center (dropped entries last; keys precomputed by the cull kernel).
    Distance-ordered leaf lists let queries stop scanning once the
    remaining chunks provably cannot beat the running best — the fix for
    fat equidistant-shell interior leaves."""
    key = jnp.where(keep_rows, sqd_center, jnp.inf)
    order = jnp.argsort(key, axis=1, stable=True)
    return jnp.take_along_axis(idx_rows, order, axis=1)


# Leaf triangle ids are stored CSR-style: one flat int32 array where each
# leaf's span starts at leaf_offset[l] and is padded with -1 up to a multiple
# of _LEAF_CHUNK. Alongside the ids, the query uses DENORMALIZED field
# buckets: a (NB, CH*19) fp32 matrix holding the packed distance fields of
# every bucket's triangles. The reference bit-packs leaf sets and decodes
# them through a shared cache (ExactOctreeSdf.cpp:105-164); on TPU the
# opposite trade wins — spend memory replicating triangle fields per leaf so
# one 5 KB row gather fetches a whole bucket, instead of CH*19 scalar-core
# element gathers (~100x slower).
_LEAF_CHUNK = 64

# Slab height (rows) of the Pallas grouped scan's VMEM streaming window;
# bucket tables are row-padded to a multiple of this at build time.
_PALLAS_SLAB = 256


@partial(jax.jit, static_argnames=("levels",))
def _exact_descent(
    octree_u32, points, box_min, box_size, start_grid_size, *, levels: int
):
    """Row-gather descent to each point's leaf id
    (ExactOctreeSdf.cpp:57-66 semantics). Returns (leaf_id, in_box)."""
    pts = points
    s = start_grid_size
    cell = box_size / s

    frac = (pts - box_min) / cell
    ipos = jnp.floor(frac).astype(jnp.int32)
    frac = frac - ipos
    in_box = jnp.all((ipos >= 0) & (ipos < s), axis=-1)
    ic = jnp.clip(ipos, 0, s - 1)
    node_idx = ic[..., 2] * (s * s) + ic[..., 1] * s + ic[..., 0]

    view8 = octree_u32.reshape(-1, 8)
    word = _select8(view8[node_idx >> 3], (node_idx & 7).astype(jnp.uint32))

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
        base = word & cidx_mask
        nxt = _select8(view8[(base >> 3).astype(jnp.int32)], child)
        nfrac = 2.0 * frac
        nfrac = nfrac - jnp.floor(nfrac)
        word = jnp.where(is_leaf, word, nxt)
        frac = jnp.where(is_leaf[..., None], frac, nfrac)

    return (word & cidx_mask).astype(jnp.int32), in_box


@partial(jax.jit, static_argnames=("grid_depth",))
def _exact_descent_grid(leaf_grid_i32, points, box_min, box_size, *, grid_depth: int):
    """O(1) descent via a dense leaf-id grid at max_depth resolution: the
    per-point bit-walk (ExactOctreeSdf.cpp:57-66) becomes ONE row gather.
    Boundary points (frac exactly 0.5 at some level) may land in the upper
    neighbor leaf instead of the reference walk's lower one — both leaves'
    closed boxes contain the point, so both culled lists retain its true
    nearest triangle and the query stays exact."""
    g = 1 << grid_depth
    rel = (points - box_min) / box_size
    in_box = jnp.all((rel >= 0.0) & (rel < 1.0), axis=-1)
    cell = jnp.clip((rel * g).astype(jnp.int32), 0, g - 1)
    lin = (cell[..., 2] * g + cell[..., 1]) * g + cell[..., 0]
    rows = leaf_grid_i32.reshape(-1, 8)[lin >> 3]
    leaf = _select8(rows, (lin & 7).astype(jnp.int32))
    return leaf, in_box


@partial(jax.jit, static_argnames=("G",))
def _assign_groups(lid_s, *, G: int):
    """Leaf-coherent group assignment over leaf-sorted points: group =
    consecutive run of up to G points sharing one leaf id. Returns the
    per-point (group id, lane) — pure device prefix sums, no host data."""
    P = lid_s.shape[0]
    i = jnp.arange(P, dtype=jnp.int32)
    is_start = jnp.concatenate(
        [jnp.ones((1,), bool), lid_s[1:] != lid_s[:-1]]
    )
    seg_start = jax.lax.associative_scan(
        jnp.maximum, jnp.where(is_start, i, 0)
    )
    rank = i - seg_start
    boundary = is_start | (rank % G == 0)
    gid = jnp.cumsum(boundary.astype(jnp.int32)) - 1
    return gid, rank % G


# Exact int-in-float carrier for the payload scatter: 2^23 + id is exactly
# representable for id < 2^23, and ALWAYS a normal float. A bitcast carrier
# is NOT safe: leaf ids < 2^23 bitcast to DENORMAL float32s, and the TPU
# flushes denormals to zero wherever the payload passes through a float op
# — measured on v5e as gleaf==0 for every group (every distance wrong)
# while the same program is bit-exact on CPU.
_FLOAT_ID_BIAS = 8388608.0  # 2^23


@partial(jax.jit, static_argnames=("G", "NG"))
def _scatter_groups(pts_s, lid_s, gid, lane, *, G: int, NG: int):
    """Scatter leaf-sorted points into (NG, G) group slots with ONE fused
    (P, 4) payload scatter: [x, y, z, 2^23 + leaf-id]. Empty slots keep
    an +inf sentinel, from which occupancy derives elementwise, and every
    non-empty group's lane 0 is occupied by construction (rank % G == 0
    opens the group), so the group's leaf id reads from lane 0. Each
    multi-pass alternative (separate pts/valid/leaf scatters) costs a
    full latency-bound device pass per array at query batch sizes."""
    slot = gid * G + lane
    payload = jnp.concatenate(
        [
            pts_s,
            _FLOAT_ID_BIAS + lid_s.astype(pts_s.dtype)[:, None],
        ],
        axis=1,
    )
    buf = jnp.full((NG * G, 4), jnp.inf, pts_s.dtype).at[slot].set(
        payload, mode="drop"
    )
    buf = buf.reshape(NG, G, 4)
    gpts = buf[..., :3]
    gvalid = buf[..., 0] < jnp.inf
    lane0 = buf[:, 0, 3]
    gleaf = jnp.clip(
        jnp.where(jnp.isfinite(lane0), lane0 - _FLOAT_ID_BIAS, 0.0)
        .astype(jnp.int32),
        0,
        None,
    )
    return gpts, gvalid, gleaf, slot


def _exact_scan_grouped(
    bucket_row0,       # (L,) int32 first bucket ROW of each leaf
    leaf_count,        # (L,) int32
    leaf_centers,      # (L, 3) leaf box centers
    bucket_ids,        # (NB, CH) int32 triangle ids, -1 padded
    bucket_fields,     # (NB, CH*19) fp32 denormalized fields
    bucket_cmin,       # (NB,) min leaf-center distance of bucket triangles
    gpts,              # (NG, G, 3) grouped points (one leaf per group)
    gvalid,            # (NG, G) slot-occupied mask
    gleaf,             # (NG,) the group's leaf id
    *,
    max_chunks: int,
    early_exit: bool = True,
    prologue: int = 0,
):
    """Group-coherent masked brute force (ExactOctreeSdf.cpp:105-175 role).

    Every point in a group shares one leaf, so each 19*CH-float bucket row
    is gathered ONCE per group per chunk and broadcast across the group's
    G lanes — a G-fold cut in gather traffic vs the per-point scan.
    Early exit is the same distance-sorted bound as the per-point scan,
    evaluated per point; a group retires when all its lanes are done.
    G and CH are shape-derived: the caller picks the group width from the
    measured points-per-leaf density and the chunk width from the bucket
    build.

    ``prologue`` chunks run as a FIXED unrolled sequence whose gather
    indices do not depend on the loop carry: the early-exit while_loop
    serializes gather -> eval -> next gather (measured ~3.5x the cost of
    the same work with independent gathers, PERF.md §1), so the typical
    ceil(median_list/CH) chunks run carry-free and only the fat-list tail
    pays the serialized loop. If the whole block is empty padding
    (no valid lanes), the entire scan is skipped via lax.cond."""
    NG, G, _ = gpts.shape
    CH = bucket_ids.shape[1]
    bucket0 = bucket_row0[gleaf]                     # (NG,)
    cnt = leaf_count[gleaf]
    num_buckets = bucket_ids.shape[0]

    px, py, pz = gpts[..., 0:1], gpts[..., 1:2], gpts[..., 2:3]  # (NG,G,1)
    r_p = jnp.sqrt(
        jnp.sum(jnp.square(gpts - leaf_centers[gleaf][:, None, :]), axis=-1)
    )                                                 # (NG, G)
    nf = bucket_fields.shape[1] // CH

    def chunk_body(i, best, best_id, done, brow, gate):
        """One chunk: gather row `brow`, eval, update best/done. `gate`
        masks groups whose scan already retired (loop phase only)."""
        active = ((i * CH) < cnt) & gate
        tri_ids = bucket_ids[brow]                    # (NG, CH) row gather
        fields = bucket_fields[brow]                  # (NG, nf*CH)
        # 2D column slices, NOT a (NG, nf, CH) reshape: splitting the lane
        # dim into sublanes is a relayout copy the TPU pays every loop
        # iteration; lane slices fuse into the arithmetic for free.
        field_fn = lambda r: fields[:, None, r * CH : (r + 1) * CH]
        sqd = _bucket_sqdist(px, py, pz, field_fn, nf)  # (NG, G, CH)
        valid = (tri_ids >= 0)[:, None, :] & active[:, None, None]
        sqd = jnp.where(valid, sqd, jnp.inf)
        local = jnp.min(sqd, axis=-1)                 # (NG, G)
        amin = jnp.argmin(sqd, axis=-1)
        # in-row id pick via one-hot (take_along_axis would relayout)
        oh = (
            jax.lax.broadcasted_iota(jnp.int32, sqd.shape, 2)
            == amin[..., None]
        )
        local_id = jnp.sum(
            jnp.where(oh, tri_ids[:, None, :], 0), axis=-1
        )
        take = local < best
        best = jnp.where(take, local, best)
        best_id = jnp.where(take, local_id, best_id)

        exhausted = ((i + 1) * CH) >= cnt             # (NG,)
        if early_exit:
            nxt = jnp.minimum(bucket0 + i + 1, num_buckets - 1)
            unbeatable = bucket_cmin[nxt][:, None] - r_p > jnp.sqrt(best)
            done = done | exhausted[:, None] | unbeatable
        else:
            done = done | exhausted[:, None]
        return best, best_id, done

    def chunk_cond(carry):
        i, _, _, done = carry
        return (i < max_chunks) & ~jnp.all(done)

    def chunk_step(carry):
        i, best, best_id, done = carry
        gate = ~jnp.all(done, axis=1)
        brow = jnp.where(gate, bucket0 + i, 0)
        best, best_id, done = chunk_body(i, best, best_id, done, brow, gate)
        return i + 1, best, best_id, done

    def run(_):
        best = jnp.full((NG, G), jnp.inf, gpts.dtype)
        best_id = jnp.zeros((NG, G), jnp.int32)
        done = ~gvalid
        pro = min(prologue, max_chunks)
        for i in range(pro):
            # carry-INDEPENDENT gather index: pipelines across chunks
            brow = jnp.minimum(bucket0 + i, num_buckets - 1)
            gate = (i * CH) < cnt
            best, best_id, done = chunk_body(
                i, best, best_id, done, brow, gate
            )
        iters, _, win_ids, _ = jax.lax.while_loop(
            chunk_cond, chunk_step,
            (jnp.int32(pro), best, best_id, done),
        )
        return win_ids, iters

    def skip(_):
        return jnp.zeros((NG, G), jnp.int32), jnp.int32(0)

    return jax.lax.cond(jnp.any(gvalid), run, skip, None)


def _exact_scan_window_xla(
    bucket_ids,        # (NB_rows, CH) int32 triangle ids, -1 padded
    bucket_fields,     # (NB_rows, nf*CH) fp32 denormalized fields
    wpts,              # (NBK, G, 3) fixed windows of the leaf-sorted points
    wb0,               # (NBK, G) int32 per-POINT first bucket row
    wnc,               # (NBK, G) int32 per-POINT row count
    *,
    max_iters: int,
    prologue: int = 0,
):
    """Window scan in pure XLA (the pallas_window idea without Mosaic):
    fixed G-point windows of the sorted order are plain RESHAPES — no
    prefix-sum group assembly, no payload scatter, no winner-slot gather
    (measured +72 ms of the 2M-point query on v5e, PERF.md §2). A window
    straddling several consecutive leaves scans their UNION row span
    (contiguous: the bucket table is CSR in leaf order) and each point
    masks rows outside its own [wb0, wb0+wnc) — boundary-crossing eval
    waste in exchange for deleting whole latency-bound batch passes.

    The loop row pointer GAP-JUMPS: after each chunk it advances to the
    smallest row some lane still needs (a G-lane min, cheap), so rows of
    non-member leaves that merely lie BETWEEN scattered member leaves in
    the bucket table are never fetched. That makes ``G * max_chunks`` a
    true iteration bound (every visited row is needed by >= 1 lane, each
    lane needs <= max_chunks rows); for dense batches where member spans
    are contiguous the jump degenerates to row+1. ``prologue`` rows run
    carry-independently (lo + i), pipelining across chunks exactly like
    the grouped scan's fixed-trip prologue.

    No distance-sorted early-exit bound: per-point row bounds are already
    exact, and the bound's extra leaf-center gather + sqrt per chunk costs
    more than the ~0.5 chunks/point it saves (PERF.md §2).

    Reference role: ExactOctreeSdf.cpp:105-175 (the per-leaf candidate
    loop)."""
    NBK, G, _ = wpts.shape
    CH = bucket_ids.shape[1]
    nf = bucket_fields.shape[1] // CH
    num_rows = bucket_ids.shape[0]

    live = wnc > 0
    big = jnp.int32(2**30)
    lo = jnp.min(jnp.where(live, wb0, big), axis=1)       # (NBK,)
    hi = jnp.max(jnp.where(live, wb0 + wnc, 0), axis=1)   # (NBK,)
    wend = jnp.where(live, wb0 + wnc, 0)

    px, py, pz = wpts[..., 0:1], wpts[..., 1:2], wpts[..., 2:3]

    def chunk_body(row, best, best_id):
        r = jnp.clip(row, 0, num_rows - 1)
        tri_ids = bucket_ids[r]                           # (NBK, CH)
        fields = bucket_fields[r]                         # (NBK, nf*CH)
        # 2D column slices, NOT a (NBK, nf, CH) reshape (relayout copy)
        field_fn = lambda k: fields[:, None, k * CH : (k + 1) * CH]
        sqd = _bucket_sqdist(px, py, pz, field_fn, nf)    # (NBK, G, CH)
        pvalid = (row[:, None] >= wb0) & (row[:, None] < wend)
        valid = (tri_ids >= 0)[:, None, :] & pvalid[:, :, None]
        sqd = jnp.where(valid, sqd, jnp.inf)
        local = jnp.min(sqd, axis=-1)
        amin = jnp.argmin(sqd, axis=-1)
        oh = (
            jax.lax.broadcasted_iota(jnp.int32, sqd.shape, 2)
            == amin[..., None]
        )
        local_id = jnp.sum(jnp.where(oh, tri_ids[:, None, :], 0), axis=-1)
        take = local < best
        return (
            jnp.where(take, local, best),
            jnp.where(take, local_id, best_id),
        )

    def next_row(row):
        """Smallest row > `row` that some lane still needs (big if none)."""
        cand = jnp.where(
            live & (wb0 > row[:, None]),
            wb0,
            jnp.where(row[:, None] + 1 < wend, row[:, None] + 1, big),
        )
        return jnp.min(cand, axis=1)

    def cond(carry):
        i, row, _, _ = carry
        return (i < max_iters) & jnp.any(row < hi)

    def step(carry):
        i, row, best, best_id = carry
        best, best_id = chunk_body(row, best, best_id)
        return i + 1, next_row(row), best, best_id

    best = jnp.full((NBK, G), jnp.inf, wpts.dtype)
    best_id = jnp.zeros((NBK, G), jnp.int32)
    pro = min(prologue, max_iters)
    for i in range(pro):
        # carry-INDEPENDENT row index: pipelines across chunks. Gap rows
        # inside [lo, lo+pro) are wasted-but-masked work; the jump scan
        # resumes from the first still-needed row past the prologue.
        best, best_id = chunk_body(lo + i, best, best_id)
    _, _, _, win_ids = jax.lax.while_loop(
        cond, step, (jnp.int32(pro), next_row(lo + pro - 1) if pro else lo,
                     best, best_id)
    )
    return win_ids


@partial(
    jax.jit,
    static_argnames=(
        "use_grid", "grid_depth", "levels", "start_grid_size",
        "G", "NG", "NB", "max_chunks", "early_exit", "with_gradient",
        "prologue", "scan_impl", "pallas_interpret", "pack_shift",
    ),
)
def _exact_query_fused(
    octree_u32,
    leaf_grid_i32,     # dense cell->leaf grid (dummy when use_grid=False)
    bucket_row0,
    leaf_count,
    leaf_centers,
    bucket_ids,
    bucket_fields,
    bucket_cmin,
    leaf_scan_packed,  # (L,) int32 (row0 << pack_shift) | nchunks
    tris: TriangleDataSoA,
    pts,               # (P, 3) padded batch
    box_min,
    box_size,
    *,
    use_grid: bool,
    grid_depth: int,
    levels: int,
    start_grid_size: int,
    G: int,
    NG: int,
    NB: int,
    max_chunks: int,
    early_exit: bool,
    with_gradient: bool,
    prologue: int = 0,
    scan_impl: str = "xla",
    pallas_interpret: bool = False,
    pack_shift: int = 0,
):
    """The ENTIRE exact query as ONE compiled program: descent -> leaf
    sort -> group assignment/scatter -> length-ordered block scans
    (lax.map) -> unsort -> signed finish.

    One dispatch per query call. This matters independently of device
    time: through a remote-device transport every eager op and d2h sync
    pays a round trip (measured ~10-25 ms each on the axon tunnel), and
    the previous multi-dispatch pipeline (3 slices + 1 call per scan
    block, 2 scalar syncs) spent ~1 s of pure latency at 2M points. The
    group width G is chosen by the caller (cached per batch shape), so no
    data-dependent host decisions remain inside."""
    # -- descent ------------------------------------------------------------
    # The window scan never needs LEAF IDS — only each point's packed
    # (row0, nchunks). With the dense grid, the grid stores the packed
    # value directly (leaf_grid_i32 IS the packed grid then): descent's
    # one row gather returns the scan bounds, the sort keys on the packed
    # value (monotone in leaf id, so leaf-coherence is preserved), and no
    # per-point bounds gather exists at all.
    if use_grid:
        leaf_id, in_box = _exact_descent_grid(
            leaf_grid_i32, pts, box_min, box_size, grid_depth=grid_depth
        )
    else:
        leaf_id, in_box = _exact_descent(
            octree_u32, pts, box_min, box_size, start_grid_size,
            levels=levels,
        )
        if scan_impl == "xla_window":
            leaf_id = leaf_scan_packed[leaf_id]  # walk path: one gather

    # -- leaf-coherent ordering + grouping ----------------------------------
    # ONE multi-operand lax.sort carries the coordinates and the original
    # index with the key, replacing argsort + a separate (P, 3) permute
    # (each a full latency-bound pass; the variable-width sort payload
    # rides the same comparator network nearly for free).
    iota = jnp.arange(pts.shape[0], dtype=jnp.int32)
    lid_s, xs, ys, zs, order = jax.lax.sort(
        (leaf_id, pts[:, 0], pts[:, 1], pts[:, 2], iota), num_keys=1
    )
    pts_s = jnp.stack([xs, ys, zs], axis=-1)

    # -- scans ---------------------------------------------------------------
    iters = jnp.int32(0)
    if scan_impl == "xla_window":
        # Fixed G-point windows of the sorted order (see
        # _exact_scan_window_xla): windows/blocks are reshapes — no group
        # assembly at all. lid_s already IS the packed bounds value here.
        pk = lid_s
        b0_pt = (pk >> pack_shift).astype(jnp.int32)
        nc_pt = (pk & ((1 << pack_shift) - 1)).astype(jnp.int32)
        NW = pts_s.shape[0] // G
        nblocks = max(1, NW // NB)

        def wblk(args):
            bp, bb0, bnc = args
            return _exact_scan_window_xla(
                bucket_ids, bucket_fields, bp, bb0, bnc,
                max_iters=G * max_chunks, prologue=prologue,
            )

        wins = jax.lax.map(
            wblk,
            (
                pts_s.reshape(nblocks, -1, G, 3),
                b0_pt.reshape(nblocks, -1, G),
                nc_pt.reshape(nblocks, -1, G),
            ),
        )
        win_s = wins.reshape(-1)
    elif scan_impl == "pallas_window":
        # FIXED G-point windows of the sorted order: no prefix-sum group
        # assembly, no payload scatter, no winner unsort indirection —
        # windows are reshapes and the kernel masks rows per point
        # (ops/pallas_scan.py). A window straddling leaves scans the
        # union of its member spans.
        CH = bucket_ids.shape[1]
        b0_pt = bucket_row0[lid_s].astype(jnp.int32)
        nc_pt = (-(-leaf_count[lid_s] // CH)).astype(jnp.int32)
        wins = exact_scan_window_pallas(
            bucket_ids, bucket_fields, pts_s, b0_pt, nc_pt,
            G=G, H=_PALLAS_SLAB, interpret=pallas_interpret,
        )
        win_s = wins.reshape(-1)
    else:
        gid, lane = _assign_groups(lid_s, G=G)
        gpts, gvalid, gleaf, slot = _scatter_groups(
            pts_s, lid_s, gid, lane, G=G, NG=NG
        )
        # Group ids are assigned in leaf-sorted order, so EMPTY padding
        # groups are exactly the tail [n_groups, NG) — whole tail blocks
        # no-op without any reordering. (An explicit length-sort of the
        # groups was measured to cost more in NG-sized permutes than its
        # iteration uniformity saved once the scan loop got its
        # fixed-trip prologue.)
        if scan_impl == "pallas":
            # One Pallas program over all groups: each grid step
            # slab-streams its block's contiguous bucket-row span through
            # VMEM (ops/pallas_scan.py). Requires vertex-format buckets.
            wins = exact_scan_grouped_pallas(
                bucket_ids, bucket_fields, gpts, gleaf,
                bucket_row0, leaf_count,
                GB=min(256, NG), H=_PALLAS_SLAB,
                interpret=pallas_interpret,
            )
        else:
            # one compiled body, sequential over blocks
            def blk(args):
                bp, bv, bl = args
                return _exact_scan_grouped(
                    bucket_row0, leaf_count, leaf_centers,
                    bucket_ids, bucket_fields, bucket_cmin,
                    bp, bv, bl,
                    max_chunks=max_chunks, early_exit=early_exit,
                    prologue=prologue,
                )

            nblocks = NG // NB
            wins, iters = jax.lax.map(
                blk,
                (
                    gpts.reshape(nblocks, NB, G, 3),
                    gvalid.reshape(nblocks, NB, G),
                    gleaf.reshape(nblocks, NB),
                ),
            )
        win_s = wins.reshape(-1)[slot]          # winner per sorted point

    # -- finish in SORTED space, one scatter back ----------------------------
    # in_box recomputed elementwise on sorted points (cheaper than a
    # permute of the descent mask)
    rel = (pts_s - box_min) / box_size
    in_box_s = jnp.all((rel >= 0.0) & (rel < 1.0), axis=-1)
    out_s = _exact_finish(
        tris, pts_s, win_s, in_box_s, box_min, box_size,
        with_gradient=with_gradient,
    )
    # Unsort by SORTING on the carried original index (a permutation of
    # iota): a comparator-network pass over sequential memory, measured
    # cheaper than the random-access (P,) scatter it replaces.
    if with_gradient:
        d_s, g_s = out_s
        _, d, gx, gy, gz = jax.lax.sort(
            (order, d_s, g_s[:, 0], g_s[:, 1], g_s[:, 2]), num_keys=1
        )
        return (d, jnp.stack([gx, gy, gz], axis=-1)), iters
    _, d = jax.lax.sort((order, out_s), num_keys=1)
    return d, iters


@partial(
    jax.jit,
    static_argnames=("max_chunks", "dense_buckets", "early_exit", "chunk"),
)
def _exact_scan(
    leaf_offset,       # (L,) int32 into tri_flat, _LEAF_CHUNK-aligned
    leaf_count,        # (L,) int32
    leaf_centers,      # (L, 3) leaf box centers
    bucket_ids,        # (NB, CH) int32 triangle ids, -1 padded — or the
                       # FLAT CSR id array (huge id-only structures: the
                       # (rows, CH) reshape here inside the jit is a
                       # bitcast, not the multi-GB eager copy)
    bucket_fields,     # (NB, CH*19) fp32 fields, or (T, 19) packed matrix
    bucket_cmin,       # (NB,) min leaf-center distance of bucket triangles
    pts,               # (B, 3) leaf-coherent point block
    leaf_id,           # (B,)
    *,
    max_chunks: int,
    dense_buckets: bool = True,
    early_exit: bool = True,
    chunk: int | None = None,
):
    """Masked brute force over denormalized leaf buckets with
    distance-sorted early exit (ExactOctreeSdf.cpp:105-175 role). Points
    should be pre-sorted by leaf id so whole blocks exit early together."""
    if bucket_ids.ndim == 1:
        bucket_ids = bucket_ids.reshape(-1, chunk)
    CH = bucket_ids.shape[1]
    bucket0 = leaf_offset[leaf_id] // CH            # (B,) first bucket row
    cnt = leaf_count[leaf_id]
    num_buckets = bucket_ids.shape[0]

    px, py, pz = pts[..., 0:1], pts[..., 1:2], pts[..., 2:3]  # (P, 1)
    # Distance from each point to its leaf center — the early-exit bound:
    # an unscanned triangle t satisfies d(p,t) >= d(center,t) - r_p, and
    # leaf lists are sorted by center distance, so once
    # bucket_cmin[next] - r_p > best the scan is provably complete.
    r_p = jnp.sqrt(
        jnp.sum(jnp.square(pts - leaf_centers[leaf_id]), axis=-1)
    )

    def chunk_cond(carry):
        i, best, _, done = carry
        return (i < max_chunks) & ~jnp.all(done)

    def chunk_step(carry):
        i, best, best_id, done = carry
        active = ((i * CH) < cnt) & ~done
        brow = jnp.where(active, bucket0 + i, 0)
        tri_ids = bucket_ids[brow]                       # (P, CH) row gather
        if dense_buckets:
            fields = bucket_fields[brow]                 # (P, nf*CH)
            # lane slices, not a 3D reshape (lane->sublane relayout copy)
            field_fn = lambda r: fields[..., r * CH : (r + 1) * CH]
            nf = bucket_fields.shape[1] // CH
        else:  # memory-light: per-field element gathers from (T, 19)
            safe = jnp.maximum(tri_ids, 0)
            field_fn = lambda r: bucket_fields[:, r][safe]
            nf = bucket_fields.shape[1]
        valid = (tri_ids >= 0) & active[..., None]
        sqd = _bucket_sqdist(px, py, pz, field_fn, nf)   # (P, CH)
        sqd = jnp.where(valid, sqd, jnp.inf)
        local = jnp.min(sqd, axis=-1)
        local_id = jnp.take_along_axis(
            tri_ids, jnp.argmin(sqd, axis=-1)[..., None], axis=-1
        )[..., 0]
        take = local < best
        best = jnp.where(take, local, best)
        best_id = jnp.where(take, local_id, best_id)

        exhausted = ((i + 1) * CH) >= cnt
        if early_exit:
            nxt = jnp.minimum(bucket0 + i + 1, num_buckets - 1)
            unbeatable = bucket_cmin[nxt] - r_p > jnp.sqrt(best)
            done = done | exhausted | unbeatable
        else:
            done = done | exhausted
        return i + 1, best, best_id, done

    # carries derive from the data (r_p/leaf_id) rather than bare shapes so
    # they inherit the varying-axis type under shard_map (tiled queries)
    init = (
        jnp.int32(0),
        r_p * 0.0 + jnp.inf,
        leaf_id * 0,
        (leaf_id * 0) > 0,
    )
    _, _, win_ids, _ = jax.lax.while_loop(chunk_cond, chunk_step, init)
    return win_ids


@partial(jax.jit, static_argnames=("with_gradient",))
def _exact_finish(
    tris: TriangleDataSoA,
    points,
    win_ids,
    in_box,
    box_min,
    box_size,
    *,
    with_gradient: bool,
):
    """Signed evaluation of the winning triangle + out-of-box fallback
    (ExactOctreeSdf.cpp:44-49, :166-175).

    The distance path gathers ONE fused 37-field row per point
    (pack_triangle_full_fields) instead of ~12 separate SoA arrays —
    profiled as the dominant cost of the whole query at 2M points
    (each SoA gather is a full latency-bound pass, PERF.md §1). The
    gradient path still gathers the SoA (it additionally needs world
    vertices and runs far less often)."""
    pts = points
    center = box_min + 0.5 * box_size
    size3 = jnp.full((3,), box_size, pts.dtype)
    fallback = jnp.sqrt(jnp.asarray(3.0, pts.dtype)) * box_size
    safe_ids = jnp.maximum(win_ids, 0)

    if with_gradient:
        win_tri = jax.tree.map(lambda a: a[safe_ids], tris)
        d_in, g_in = jax.vmap(signed_dist_grad_pair)(pts, win_tri)
        d_out, g_out = box_distance_gradient(pts, center, size3)
        d = jnp.where(in_box, d_in, d_out + fallback)
        g = jnp.where(in_box[..., None], g_in, g_out)
        return d, g
    rows = pack_triangle_full_fields(tris)[safe_ids]   # (P, 37) one gather
    d_in = signed_dist_from_rows(
        pts[..., 0], pts[..., 1], pts[..., 2], lambda r: rows[..., r]
    )
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
    strategy: str = "region",
    futility: float | None = 0.8,
    seed_cells: tuple[int, int] | None = None,
    entry_budget: int = 1 << 27,
    shared_tables=None,
):
    """Level-synchronous exact-octree build. Returns (octree_u32, leaf_tris,
    stats).

    All (N, K) candidate state lives on DEVICE across levels — only small
    per-node scalars (keep counts, terminal masks) and the final leaf lists
    cross the host boundary. The per-node triangle cull is selected by
    ``strategy``: "region" (per-node-region relative test — the
    reference's DEFAULT exact strategy, PerNodeRegionTrianglesInfluence
    TrianglesInfluence.h:663-860, re-derived closed-form; ~10x tighter
    lists than the absolute shells, see _region_cull_chunk), "lattice"
    (house variant, 27 anchors + exact-distance cap), "basic" (reference
    BasicTrianglesInfluence corner criterion, TrianglesInfluence.h:
    119-168), "precise" (reference PreciseTrianglesInfluence region-hull
    criterion, :191-284) or "per_vertex"
    (PerVertexTrianglesInfluence<1> nearest-corner hull test, :286-476).

    ``futility`` adds a termination rule the reference lacks
    (ExactOctreeSdfDepthFirst.h:299-302 stops only at min-triangles or
    max-depth): a node whose culled list keeps >= futility * its parent's
    list becomes a leaf — subdividing it further cannot pay for itself.
    Interior nodes equidistant from a shell of triangles are the case:
    their lists barely shrink under subdivision, so without this rule they
    subdivide to max depth and the denormalized bucket memory (and leaf
    count) explodes with mesh size. Early termination anywhere is still
    EXACT — the distance-sorted scan early-exits after ~1 chunk in such
    leaves. None disables the rule (reference-shaped trees)."""
    if strategy not in _CULL_STRATEGIES:
        raise ValueError(
            f"strategy must be one of {_CULL_STRATEGIES}, got {strategy!r}"
        )
    if shared_tables is not None:
        # Reuse one uploaded (packed, aabbs, vworld) triple across several
        # builds over the same mesh (the per-shard tiled build was paying
        # this pack + upload once PER SHARD).
        packed, aabbs, vworld = shared_tables
    else:
        packed = jnp.asarray(pack_triangle_fields(tris))
        aabbs = _triangle_aabbs(tris)
        vworld = jnp.asarray(tris.v_world)
    T = tris.num_triangles
    box_min = np.asarray(box_min, np.float32)

    s = 1 << start_depth
    cell = box_size / s
    zi, yi, xi = np.meshgrid(np.arange(s), np.arange(s), np.arange(s), indexing="ij")
    centers_np = np.stack(
        [
            box_min[0] + cell * (xi.ravel() + 0.5),
            box_min[1] + cell * (yi.ravel() + 0.5),
            box_min[2] + cell * (zi.ravel() + 0.5),
        ],
        axis=-1,
    ).astype(np.float32)
    if seed_cells is not None:
        # Tile-sharded build: seed only the start cells [lo, hi). The
        # resulting structure is exactly the global build's subtrees for
        # those cells, with a LOCAL flat node array whose start grid is
        # the cell range (parallel/tiles.py routes queries by owner).
        lo, hi = seed_cells
        centers_np = centers_np[lo:hi]
    n0 = centers_np.shape[0]
    centers = jnp.asarray(centers_np)

    Tp = _round_pow2(T, 8)
    cand_idx = jnp.broadcast_to(
        jnp.pad(jnp.arange(T, dtype=jnp.int32), (0, Tp - T)), (n0, Tp)
    )
    cand_valid = jnp.broadcast_to(jnp.arange(Tp) < T, (n0, Tp))

    # The start-grid block must be padded to a multiple of 8 words: the
    # descent fetches children with one (-1, 8)-row gather assuming every
    # child octet is 8-aligned. A global grid (s^3 >= 8) is aligned for
    # free, but a seed_cells shard grid holds only cells-per-chip words.
    grid_words = -(-n0 // 8) * 8
    blocks = [np.zeros(grid_words, np.uint32)]
    total_len = grid_words
    slot_patches: list[tuple[np.ndarray, np.ndarray]] = []
    # (device ids (Lg, w) compacted-to-front, host counts (Lg,)) — the ids
    # stay on device; CSR assembly scatters them into tri_flat there
    # (device->host on this setup runs at ~17 MB/s, so leaf lists must
    # never round-trip).
    leaf_chunks: list[tuple[jax.Array, np.ndarray]] = []
    leaf_center_chunks: list[np.ndarray] = []
    leaf_counter = 0
    stats: dict = {"nodes_per_depth": {}, "tris_per_leaf": []}
    # Wall-time attribution (host-orchestrated build: the kcounts sync
    # absorbs all queued device work, so boundaries are meaningful).
    phase = {"cull": 0.0, "cull_enqueue": 0.0, "cull_sync": 0.0,
             "leaf_stage": 0.0, "child_prep": 0.0, "csr": 0.0}
    stats["phase_s"] = phase

    # Per-level node GROUPS bucketed by candidate width (x4 buckets): one
    # fat equidistant-shell node no longer forces its whole level to its
    # width — memory and compute track the actual list-size distribution.
    # group = (centers_dev (M,3), cand_idx_dev (M,Kg), cand_valid_dev,
    #          slots_np (M,))
    #
    # MEMORY STREAMING: work items are (groups, depth, half) on an explicit
    # DFS stack. Before a level whose projected children state (8x the
    # parent candidate entries, the `repeat` below) would exceed
    # ``entry_budget`` int32 entries, the parents are split into row slices
    # and each slice's SUBTREE builds to completion before the next starts
    # (depth-first). Live device state is then bounded by
    # O(entry_budget * remaining_depth) instead of O(full level width) —
    # the round-2 failure mode where a 100k-triangle mesh could not build
    # past depth 5 (whole levels of (N, K) candidate matrices exceeded
    # HBM). Splits keep sibling octets (rows are appended in 8-child
    # blocks) contiguous only incidentally; correctness needs no adjacency
    # because child pointers are patched through ``slot_patches``.
    half = 0.5 * cell
    work = [(
        [(centers, cand_idx, cand_valid,
          np.arange(n0, dtype=np.int64), None)],
        start_depth,
        half,
    )]
    stats["build_splits"] = 0
    # (A background-thread PREWARM of all plausible cull variants was
    # built and measured NET HARMFUL here: the remote compile service
    # serializes, so warming the ~6 menu variants that never occur
    # doubled the serial compile queue — 781 s cold vs 151 s without,
    # same session. The variant-count reduction above is the lever that
    # works; do not re-add speculative warmups.)

    while work:
        groups, depth, half = work.pop()
        proj = sum(8 * g[1].shape[0] * g[1].shape[1] for g in groups)
        n_nodes = sum(g[0].shape[0] for g in groups)
        if proj > entry_budget and n_nodes > 1:
            # Split parents into slices whose projected children fit.
            # The slice height is floored at 64 rows: the budget is
            # advisory, and unfloored tiny slices (one compile per new
            # (N, K) shape) cost far more in XLA compiles than the
            # bounded budget overshoot costs in HBM.
            per_slice = max(1, entry_budget // 8)
            slices: list[list] = [[]]
            acc = 0
            for g in groups:
                N, K = g[1].shape
                step = max(64, per_slice // max(K, 1))
                for i in range(0, N, step):
                    j = min(N, i + step)
                    part = (
                        g[0][i:j], g[1][i:j], g[2][i:j], g[3][i:j],
                        None if g[4] is None else g[4][i:j],
                    )
                    if acc and acc + (j - i) * K > per_slice:
                        slices.append([])
                        acc = 0
                    slices[-1].append(part)
                    acc += (j - i) * K
            slices = [s for s in slices if s]
            if len(slices) > 1:
                stats["build_splits"] += len(slices) - 1
                for s in reversed(slices):
                    work.append((s, depth, half))
                del groups
                continue
            # The 64-row floor can make further subdivision impossible;
            # build the (bounded-overshoot) single slice instead of
            # re-queueing it forever.
            groups = slices[0]
        stats["nodes_per_depth"][depth] = (
            stats["nodes_per_depth"].get(depth, 0) + n_nodes
        )
        if os.environ.get("SDFLIB_BUILD_VERBOSE"):
            import sys as _sys
            import time as _time
            print(
                f"[build] depth={depth} nodes={n_nodes} "
                f"groups={len(groups)} proj_entries={proj} "
                f"work_stack={len(work)} t={_time.strftime('%H:%M:%S')}",
                file=_sys.stderr, flush=True,
            )
        # children buckets: width -> list of (centers, cand, valid, slots)
        next_buckets: dict[int, list] = {}

        # Dispatch EVERY group's cull before the first sync: the host-side
        # leaf/child staging of group i then overlaps the device executing
        # group i+1's cull instead of serializing behind it.
        culled = []
        for centers_g, cand_g, valid_g, slots_g, pkc_g in groups:
            _pt0 = time.perf_counter()
            N, K = cand_g.shape
            C = max(8, _round_pow2(max(1, pair_budget // max(K, 1)), 1) // 2)
            # EXACTLY TWO dispatch shapes per K class: (C, K) for small
            # groups and (16C, K) super-chunks for large ones. Every
            # distinct (rows, K) shape is a fresh executable, and a
            # double-build probe measured the per-process first call of
            # each variant (compile-or-load through the remote transport)
            # as ~98% of build wall time — 696 s cold vs 17 s with warm
            # executables on the bench torus. Padding a group up to the
            # canonical shape wastes masked pair evals (device-cheap,
            # <~1 s/build); one more variant wastes tens of seconds per
            # process. 16 chunks per dispatch keeps the eager dispatch
            # count 16x below the per-chunk loop.
            SC = C if N <= C else C * 16
            pad = (-N) % SC
            cn, ci, cv = centers_g, cand_g, valid_g
            if pad:
                cn = jnp.pad(cn, [(0, pad), (0, 0)])
                ci = jnp.pad(ci, [(0, pad), (0, 0)])
                cv = jnp.pad(cv, [(0, pad), (0, 0)])
            geo = aabbs if strategy in ("lattice", "region") else vworld
            # one executable variant per distinct (rows=SC, K, C): track
            # them — each first call per process pays a compile-or-load
            # through the remote transport
            stats.setdefault("cull_shapes", {})
            key = (SC, K, C)
            stats["cull_shapes"][key] = (
                stats["cull_shapes"].get(key, 0) + (N + pad) // SC
            )
            parts = []
            for i in range(0, N + pad, SC):
                parts.append(_cull_group(
                    packed, geo,
                    jax.lax.dynamic_slice_in_dim(cn, i, SC),
                    jax.lax.dynamic_slice_in_dim(ci, i, SC),
                    jax.lax.dynamic_slice_in_dim(cv, i, SC),
                    jnp.float32(half),
                    C=C, strategy=strategy,
                ))
            if len(parts) > 1:
                keeps = jnp.concatenate([pt[0] for pt in parts])[:N]
                kc_dev = jnp.concatenate([pt[1] for pt in parts])[:N]
                sqd_cen = jnp.concatenate([pt[2] for pt in parts])[:N]
            else:
                keeps = parts[0][0][:N]
                kc_dev = parts[0][1][:N]
                sqd_cen = parts[0][2][:N]
            _enq = time.perf_counter() - _pt0
            phase["cull_enqueue"] += _enq
            # "cull" = enqueue + sync (it used to mirror cull_sync exactly,
            # a misleading duplicate in the phase table)
            phase["cull"] += _enq
            culled.append(
                (centers_g, cand_g, slots_g, pkc_g, keeps, kc_dev, sqd_cen)
            )

        for _gi in range(len(culled)):
            centers_g, cand_g, slots_g, pkc_g, keeps, kc_dev, sqd_cen = (
                culled[_gi]
            )
            # release the list's reference as each group is consumed —
            # otherwise every group's (N, K) cull outputs stay live on
            # device for the whole level (the `del keeps` below frees
            # nothing while the tuple still holds them)
            culled[_gi] = None
            _pt05 = time.perf_counter()
            kcounts = np.asarray(kc_dev)
            _pt1 = time.perf_counter()
            phase["cull_sync"] += _pt1 - _pt05
            phase["cull"] += _pt1 - _pt05
            K = cand_g.shape[1]

            terminal = (kcounts <= min_triangles_per_node) | (
                depth == max_depth
            )
            if futility is not None and pkc_g is not None:
                # Futility rule: subdividing barely shrank the list.
                terminal |= kcounts >= futility * pkc_g

            t_idx = np.nonzero(terminal)[0]
            if len(t_idx):
                t_dev = jnp.asarray(t_idx.astype(np.int32))
                ids_c = _compact_leaf_rows(
                    sqd_cen[t_dev], cand_g[t_dev], keeps[t_dev]
                )
                cnt_np = kcounts[t_idx]
                # Trim the stored rows to the chunk's real max list length
                # (kept ids are compacted to the front): the class width K
                # can be 4x the actual counts, and leaf chunks accumulate
                # on device for the whole build.
                wkeep = min(
                    ids_c.shape[1],
                    -(-max(int(cnt_np.max(initial=1)), 1) // _LEAF_CHUNK)
                    * _LEAF_CHUNK,
                )
                ids_c = ids_c[:, :wkeep]
                leaf_chunks.append((ids_c, cnt_np))
                leaf_center_chunks.append(np.asarray(centers_g[t_dev]))
                stats["tris_per_leaf"].extend(int(c) for c in cnt_np)
                leaf_ids = leaf_counter + np.arange(len(t_idx), dtype=np.int64)
                leaf_counter += len(t_idx)
                slot_patches.append(
                    (
                        slots_g[t_idx].copy(),
                        leaf_ids.astype(np.uint32) | IS_LEAF_MASK,
                    )
                )

            _pt2 = time.perf_counter()
            phase["leaf_stage"] += _pt2 - _pt1

            sub = np.nonzero(~terminal)[0]
            if len(sub) == 0:
                continue
            M = len(sub)
            child_base = total_len + 8 * np.arange(M, dtype=np.int64)
            blocks.append(np.zeros(8 * M, np.uint32))
            total_len += 8 * M
            slot_patches.append(
                (slots_g[sub].copy(), child_base.astype(np.uint32))
            )
            child_slots = (child_base[:, None] + np.arange(8)[None])

            # Bucket subdividing parents by kept-count: width class =
            # smallest 8*4^j >= count.
            kc_sub = kcounts[sub]
            wclass = np.ones_like(kc_sub) * 8
            while np.any(wclass < kc_sub):
                wclass = np.where(wclass < kc_sub, wclass * 4, wclass)

            # Merge SMALL classes into the next wider present class: a
            # class worth < one pair-budget chunk of work adds more in
            # fresh executable variants (each first call per process pays
            # a compile-or-load through the remote transport, measured as
            # the DOMINANT share of build wall time — cull_sync 519 s of a
            # 599 s build, ~15 distinct (SC, K, C) variants) than its
            # narrower width saves in padded pair evals.
            present = np.unique(wclass)
            for j in range(len(present) - 1):
                w = present[j]
                m = wclass == w
                # x8: children inherit the class; the merged group carries
                # 8 rows per parent below
                if 8 * int(m.sum()) * int(w) < pair_budget:
                    wclass[m] = present[j + 1]

            child_offsets = jnp.asarray(_CORNER_OFFS)
            for w in np.unique(wclass):
                m = wclass == w
                rows = jnp.asarray(sub[m].astype(np.int32))
                ids_c, keep_c = _compact_rows(cand_g[rows], keeps[rows])
                w_int = min(int(w), K)
                new_cand = jnp.repeat(ids_c[:, :w_int], 8, axis=0)
                new_valid = jnp.repeat(keep_c[:, :w_int], 8, axis=0)
                new_centers = (
                    centers_g[rows][:, None, :]
                    + child_offsets[None] * (0.5 * half)
                ).reshape(-1, 3)
                next_buckets.setdefault(w_int, []).append(
                    (new_centers, new_cand, new_valid,
                     child_slots[m].reshape(-1),
                     np.repeat(kc_sub[m], 8))
                )
            del keeps
            phase["child_prep"] += time.perf_counter() - _pt2

        # Merge same-width buckets into one group each and queue the next
        # level (LIFO: this subtree's children build before any sibling
        # slice queued above them).
        merged = []
        for w, parts in sorted(next_buckets.items()):
            if len(parts) == 1:
                cen, ci, cv, sl, pk = parts[0]
            else:
                cen = jnp.concatenate([p[0] for p in parts])
                ci = jnp.concatenate([p[1] for p in parts])
                cv = jnp.concatenate([p[2] for p in parts])
                sl = np.concatenate([p[3] for p in parts])
                pk = np.concatenate([p[4] for p in parts])
            merged.append((cen, ci, cv, sl, pk))
        if merged:
            work.append((merged, depth + 1, half * 0.5))

    _pt3 = time.perf_counter()
    # Pad the node array to whole 8-word rows for the row-gather descent.
    tail = (-total_len) % 64
    if tail:
        blocks.append(np.zeros(tail, np.uint32))
        total_len += tail
    octree = np.concatenate(blocks)
    for slots, words in slot_patches:
        octree[slots] = words

    # CSR layout: each leaf's span padded with -1 to a _LEAF_CHUNK multiple.
    # Offsets/counts are host metadata; the id payload is scattered into
    # tri_flat ON DEVICE straight from the per-level compacted rows.
    counts_all = (
        np.concatenate([c for _, c in leaf_chunks])
        if leaf_chunks
        else np.zeros(0, np.int64)
    )
    spans = (
        -(-np.maximum(counts_all, 1) // _LEAF_CHUNK) * _LEAF_CHUNK
    ).astype(np.int64)
    total = int(spans.sum()) if len(spans) else _LEAF_CHUNK
    # slab-align the CSR up front: make_bucket_tables pads bucket rows to
    # a _PALLAS_SLAB multiple, and for a chunk-aligned (reshape) table
    # that pad is a full COPY — a 2x transient of the multi-GB id table
    # that OOMed the depth-7/100k build (1.18e9 slots). Aligned here, the
    # pad is a no-op and the id table stays a view of tri_flat.
    slab_span = _LEAF_CHUNK * _PALLAS_SLAB
    total = -(-total // slab_span) * slab_span
    leaf_offset = np.zeros(max(leaf_counter, 1), np.int32)
    leaf_count = np.zeros(max(leaf_counter, 1), np.int32)
    if len(counts_all):
        leaf_offset[: len(counts_all)] = np.concatenate(
            [[0], np.cumsum(spans)[:-1]]
        )
        leaf_count[: len(counts_all)] = counts_all

    tri_flat = jnp.full(total, -1, jnp.int32)

    # Strip-mined, DONATED scatter: the whole-group (Lg, w) int64
    # position matrix was GB-scale for wide depth-7 level groups (the
    # 100k-mesh build OOMed exactly here, r5), and the undonated eager
    # scatter held tri_flat at 2x. Strips bound the transient to
    # ~2^26 entries; positions are int32 (slots < 2^31 always — the
    # field table would exceed HBM long before); out-of-span lanes are
    # dropped via an out-of-bounds sentinel.
    @partial(jax.jit, donate_argnums=(0,), static_argnames=("w",))
    def _csr_fill(buf, ids_c, off, cnt, *, w):
        lane = jnp.arange(w, dtype=jnp.int32)
        pos = off[:, None] + lane[None, :]
        pos = jnp.where(
            lane[None, :] < cnt[:, None], pos, jnp.int32(2**31 - 1)
        )
        return buf.at[pos.reshape(-1)].set(ids_c.reshape(-1), mode="drop")

    row0 = 0
    for ids_c, cnt in leaf_chunks:
        Lg, w = ids_c.shape
        off_np = leaf_offset[row0 : row0 + Lg].astype(np.int32)
        strip = max(1, (1 << 26) // max(w, 1))
        for s0 in range(0, Lg, strip):
            s1 = min(s0 + strip, Lg)
            # strip heights quantized to powers of two (compile-variant
            # menu: <= log2(strip) shapes per w class); pad rows scatter
            # nothing (cnt 0)
            rows = min(strip, 1 << (max(s1 - s0 - 1, 1)).bit_length())
            ids_s = ids_c[s0:s1]
            off_s = jnp.asarray(off_np[s0:s1])
            cnt_s = jnp.asarray(cnt[s0:s1].astype(np.int32))
            if s1 - s0 < rows:
                pad = rows - (s1 - s0)
                ids_s = jnp.pad(ids_s, [(0, pad), (0, 0)])
                off_s = jnp.pad(off_s, [(0, pad)])
                cnt_s = jnp.pad(cnt_s, [(0, pad)])
            tri_flat = _csr_fill(tri_flat, ids_s, off_s, cnt_s, w=w)
        row0 += Lg
    leaf_centers = (
        np.concatenate(leaf_center_chunks)
        if leaf_center_chunks
        else np.zeros((max(leaf_counter, 1), 3), np.float32)
    )
    if leaf_centers.shape[0] < max(leaf_counter, 1):
        leaf_centers = np.pad(
            leaf_centers,
            [(0, max(leaf_counter, 1) - leaf_centers.shape[0]), (0, 0)],
        )
    phase["csr"] = time.perf_counter() - _pt3
    return octree, leaf_offset, leaf_count, tri_flat, leaf_centers, stats


def make_bucket_tables(
    tri_flat,
    leaf_count,
    leaf_centers,
    packed_fields,
    vworld=None,
    *,
    chunk: int = _LEAF_CHUNK,
    byte_budget: int = 4 << 30,
    bucket_format: str = "auto",
):
    """Denormalized scan tables from a CSR leaf-list array: per-bucket
    triangle ids (NB, CH), FIELD-MAJOR flat field rows, and the per-bucket
    min center distance (the early-exit key). Field-major because the
    (slots, nf) triangle-major alternative would be lane-padded nf -> 128
    by the TPU tiled layout (a multi-x HBM blowup).

    Three storage tiers by memory (the denormalization replicates each
    triangle once per leaf list containing it, so bytes scale with the
    SUM of list lengths — the binding constraint at 100k+ triangles):
      1. 19-field frame rows (76 B/slot): exact region-classified scan;
      2. 9-float vertex rows (36 B/slot): candidate selection via the
         naive 3-vertex formula (TriangleUtils.h:383-401) — the winner is
         re-evaluated with the frame kernel, so final distances agree to
         fp rounding;
      3. None: id-only buckets, per-field element-gather fallback.

    ``chunk`` may divide the build-time span alignment (64) — bucket rows
    are then a reshape of tri_flat — or be a multiple of it (128/256):
    the CSR is REPACKED into wider chunk-aligned spans so each (G, CH)
    scan eval fills whole 128-lane vregs instead of half-masked ones, at
    the price of more -1 padding slots for short lists. Returns
    (ids, fields, cmin, bucket_row0) where bucket_row0[l] is leaf l's
    first bucket ROW (the query must not assume leaf_offset // CH)."""
    if os.environ.get("SDFLIB_BUILD_VERBOSE"):
        import sys as _sys
        live = sorted(
            ((a.nbytes, a.shape) for a in jax.live_arrays()), reverse=True
        )
        print(
            f"[buckets:entry] live_logical_mb="
            f"{sum(b for b, _ in live) // (1 << 20)} "
            f"top={[(b >> 20, s) for b, s in live[:8]]}",
            file=_sys.stderr, flush=True,
        )
    CH = chunk
    cnts = np.asarray(leaf_count)
    L = len(cnts)

    # Decide the storage tier BEFORE materializing anything: for id-only
    # structures (slots x 36 B over byte_budget — e.g. the depth-7/100k
    # build's 1.18e9 slots = 42 GB) the query dispatch never reads the
    # bucket tables at all (it takes the CSR fallback on
    # ``bucket_fields is None``), and even the (rows, CH) id reshape is
    # a 4.5 GB device COPY that pushed that build out of memory.
    n_slots = (
        int(np.asarray(tri_flat).size)
        if CH <= _LEAF_CHUNK
        else int((-(-np.maximum(cnts, 1) // CH)).sum()) * CH
    )
    nf_packed = packed_fields.shape[1]
    tier_vertex = (
        bucket_format in ("auto", "vertex9")
        and vworld is not None
        and n_slots * 9 * 4 <= byte_budget
    )
    tier_frame = (
        not tier_vertex
        and bucket_format != "vertex9"
        and n_slots * nf_packed * 4 <= byte_budget
    )
    if not tier_vertex and not tier_frame:
        spans_io = (
            ((-(-np.maximum(cnts, 1) // _LEAF_CHUNK)) * (_LEAF_CHUNK // CH))
            if CH <= _LEAF_CHUNK
            else (-(-np.maximum(cnts, 1) // CH))
        ).astype(np.int64)
        row0_io = np.concatenate(
            [[0], np.cumsum(spans_io)[:-1]]
        ).astype(np.int32)
        return None, None, jnp.zeros((1,), jnp.float32), jnp.asarray(row0_io)

    if CH <= _LEAF_CHUNK:
        assert _LEAF_CHUNK % CH == 0
        ids = jnp.asarray(tri_flat).reshape(-1, CH)
        # tri_flat spans are padded to _LEAF_CHUNK at build time; a leaf
        # owns its padded span's worth of CH-wide buckets.
        spans = (
            (-(-np.maximum(cnts, 1) // _LEAF_CHUNK)) * (_LEAF_CHUNK // CH)
        ).astype(np.int64)
    else:
        assert CH % _LEAF_CHUNK == 0
        tf = np.asarray(tri_flat)
        spans = (-(-np.maximum(cnts, 1) // CH)).astype(np.int64)
        spans64 = (-(-np.maximum(cnts, 1) // _LEAF_CHUNK)).astype(np.int64)
        off64 = np.concatenate([[0], np.cumsum(spans64)[:-1]]) * _LEAF_CHUNK
        row0w = np.concatenate([[0], np.cumsum(spans)[:-1]])
        nl = np.repeat(np.arange(L), cnts)
        k = np.arange(int(cnts.sum()), dtype=np.int64) - np.repeat(
            np.cumsum(cnts) - cnts, cnts
        )
        new_flat = np.full(int(spans.sum()) * CH, -1, np.int32)
        new_flat[row0w[nl] * CH + k] = tf[off64[nl] + k]
        ids = jnp.asarray(new_flat.reshape(-1, CH))
    bucket_row0 = np.concatenate([[0], np.cumsum(spans)[:-1]]).astype(
        np.int32
    )
    packed_fields = jnp.asarray(packed_fields)
    nf = packed_fields.shape[1]

    # Row-pad FIRST to a multiple of the Pallas scan's slab height so the
    # field table is built at its final size (an end-of-build jnp.pad of
    # the multi-GB table costs a 2x transient that OOMed the 100k-mesh
    # depth-7 build); the scan never reads pad rows live (ids are -1).
    NBp = -(-ids.shape[0] // _PALLAS_SLAB) * _PALLAS_SLAB
    if NBp != ids.shape[0]:
        ids = jnp.pad(
            ids, [(0, NBp - ids.shape[0]), (0, 0)], constant_values=-1
        )

    # auto prefers the vertex tier: 2.1x smaller AND measured ~9% faster
    # (gather bytes drop; the on-the-fly frame derivation amortizes over
    # the group). frame19 remains for precomputed-frame selection order.
    want_vertex = bucket_format in ("auto", "vertex9") and vworld is not None
    if want_vertex and ids.size * 9 * 4 <= byte_budget:
        source = jnp.asarray(vworld).reshape(-1, 9)
        nf = 9
    elif bucket_format != "vertex9" and ids.size * nf * 4 <= byte_budget:
        source = packed_fields
    else:
        source = None
    if os.environ.get("SDFLIB_BUILD_VERBOSE"):
        import sys as _sys
        live = sorted(
            ((a.nbytes, a.shape) for a in jax.live_arrays()), reverse=True
        )
        print(
            f"[buckets] rows={ids.shape[0]} slots={ids.size} "
            f"fields_bytes={0 if source is None else ids.size * int(nf) * 4} "
            f"live_logical_mb={sum(b for b, _ in live) // (1 << 20)} "
            f"top={[(b >> 20, s) for b, s in live[:6]]}",
            file=_sys.stderr, flush=True,
        )
    if source is not None:
        # Chunked + DONATED in-place assembly: the whole-table variant
        # (nf per-field arrays + a stacked copy) transiently held ~2x the
        # multi-GB field table and OOMed the 100k-triangle depth-7 build;
        # the donated updater keeps the peak at ~1x + one chunk.
        @partial(jax.jit, donate_argnums=(0,))
        def _fill(buf, ids_c, src, i):
            safe = jnp.maximum(ids_c, 0)
            mask = ids_c >= 0
            rows = jnp.concatenate(
                [
                    jnp.where(mask, src[:, r][safe], 0.0)
                    for r in range(src.shape[1])
                ],
                axis=1,
            )  # (C, nf*CHs) field-major
            return jax.lax.dynamic_update_slice(buf, rows, (i, 0))

        try:
            bucket_fields = jnp.zeros(
                (ids.shape[0], nf * CH), jnp.float32
            )
            Cf = 1 << 17
            for i in range(0, ids.shape[0], Cf):
                # a short last chunk is its own (second) jit variant
                bucket_fields = _fill(
                    bucket_fields, ids[i : i + Cf], source, i
                )
        except jax.errors.JaxRuntimeError:
            # HBM exhausted: degrade to id-only buckets (slower per-field
            # gathers at query time) instead of failing the build.
            bucket_fields = None
    else:
        bucket_fields = None

    # Which leaf owns each bucket, and the min distance from that leaf's
    # center to the bucket's triangles. Lists are sorted by center
    # distance, so bucket_cmin is non-decreasing within a leaf — the
    # query's early-exit bound.
    bucket_leaf = np.repeat(
        np.arange(L, dtype=np.int32), spans
    )[: ids.shape[0]]
    if len(bucket_leaf) < ids.shape[0]:
        bucket_leaf = np.pad(bucket_leaf, (0, ids.shape[0] - len(bucket_leaf)))
    # Per-bucket centers are gathered PER CHUNK on host: a device-resident
    # (NB, 3) array lane-pads 3 -> 128 (42x HBM, ~1 GB at 100k-mesh scale
    # — the depth-7 build OOMed exactly here).
    cen_np = np.asarray(leaf_centers)

    def _build_cmin(fields_or_none):
        # chunk over bucket rows: the distance eval holds ~25 (C, CH)
        # temporaries, so a full-NB sweep would transiently eat several GB
        C = 1 << 17
        parts = []
        for i in range(0, ids.shape[0], C):
            ids_c = ids[i : i + C]
            cen_c = jnp.asarray(cen_np[bucket_leaf[i : i + C]])
            if fields_or_none is not None:
                bf = fields_or_none[i : i + C]
                field_fn = lambda r: bf[:, r * CH : (r + 1) * CH]
                sqd = _bucket_sqdist(
                    cen_c[:, 0:1], cen_c[:, 1:2], cen_c[:, 2:3],
                    field_fn, nf,
                )
            else:
                safe = jnp.maximum(ids_c, 0)
                field_fn = lambda r: packed_fields[:, r][safe]
                sqd = sq_dist_from_field_fn(
                    cen_c[:, 0:1], cen_c[:, 1:2], cen_c[:, 2:3], field_fn
                )
            sqd = jnp.where(ids_c >= 0, sqd, jnp.inf)
            parts.append(jnp.sqrt(jnp.min(sqd, axis=1)))
        return jnp.concatenate(parts) if len(parts) > 1 else parts[0]

    try:
        if bucket_fields is None:
            # id-only (normally unreachable: the tier pre-check returns
            # early); degenerate shape = no early-exit bound
            bucket_cmin = jnp.zeros((1,), jnp.float32)
        else:
            bucket_cmin = _build_cmin(bucket_fields)
    except jax.errors.JaxRuntimeError:
        # HBM exhausted with the dense table resident: degrade to
        # id-only buckets rather than failing the build.
        bucket_fields = None
        if os.environ.get("SDFLIB_BUILD_VERBOSE"):
            import sys as _sys
            print("[buckets] HBM exhausted in cmin -> id-only buckets",
                  file=_sys.stderr, flush=True)
        # degenerate shape (1,) so the query KNOWS there is no early-exit
        # bound (a full-length zero table would pass the availability
        # check and silently disable the exit while still paying its
        # per-iteration gather)
        bucket_cmin = jnp.zeros((1,), jnp.float32)

    # (rows were slab-padded BEFORE field construction, see above)
    return ids, bucket_fields, bucket_cmin, jnp.asarray(bucket_row0)


class ExactOctreeSdf(SdfFunction):
    """Octree whose leaves store exact nearest-triangle candidate lists."""

    def __init__(
        self,
        mesh: Mesh | None = None,
        box: BoundingBox | None = None,
        max_depth: int = 7,
        start_depth: int = 2,
        min_triangles_per_node: int = 128,
        strategy: str = "region",
        futility: float | None = 0.8,
        entry_budget: int = 1 << 27,
        bucket_byte_budget: int | None = None,
        _state: dict | None = None,
    ):
        if _state is not None:
            self._load_state(_state)
            return
        assert mesh is not None and box is not None
        if bucket_byte_budget is not None:
            # instance override of the class default: structures near the
            # HBM limit (depth-7 / 100k-triangle) may trade query scratch
            # headroom for keeping the fast denormalized-field tier
            self._BUCKET_BYTE_BUDGET = int(bucket_byte_budget)
        cbox = box.cubified()
        self.box = cbox
        self.max_depth = int(max_depth)
        self.start_depth = int(start_depth)
        self.start_grid_size = 1 << self.start_depth
        self.min_triangles_per_node = int(min_triangles_per_node)
        self.strategy = strategy

        _t0 = time.perf_counter()
        soa = calculate_mesh_triangle_data(mesh)
        self.triangles: TriangleDataSoA = jax.tree.map(jnp.asarray, soa)
        _t1 = time.perf_counter()
        octree, leaf_offset, leaf_count, tri_flat, leaf_centers, stats = (
            _build_exact(
                soa,
                cbox.min,
                float(cbox.size[0]),
                self.max_depth,
                self.start_depth,
                self.min_triangles_per_node,
                strategy=self.strategy,
                futility=futility,
                entry_budget=entry_budget,
            )
        )
        self.octree_data = jnp.asarray(octree)
        self.leaf_offset = jnp.asarray(leaf_offset)
        self.leaf_count = jnp.asarray(leaf_count)
        self.tri_flat = jnp.asarray(tri_flat)
        # HOST-resident: a device (L, 3) array lane-pads 3 -> 128 (42x
        # HBM); only the grouped scan reads it at query time, via the
        # lazily cached device copy below.
        self.leaf_centers = np.asarray(leaf_centers, np.float32)
        self._leaf_centers_dev_cache = None
        self._sorted_lists = True  # builder emits center-distance-sorted lists
        self.build_stats = stats
        self.scan_chunk = _LEAF_CHUNK
        self._group_width_cache = {}
        _t2 = time.perf_counter()
        self._make_buckets()
        _t3 = time.perf_counter()
        self._default_scan_impl()
        self._leaf_grid = None
        self._leaf_grid_packed = None
        if self.max_depth <= self._AUTO_GRID_DEPTH:
            self.build_query_grid()
        stats["phase_s"].update(
            triangles=_t1 - _t0,
            level_loop=_t2 - _t1 - stats["phase_s"]["csr"],
            buckets=_t3 - _t2,
            grid=time.perf_counter() - _t3,
        )

    # Denormalized field buckets above this byte size fall back to
    # per-query field gathers (slower, O(T) memory instead of O(slots)).
    _BUCKET_BYTE_BUDGET = 4 << 30

    def _leaf_centers_dev(self):
        """Device copy of the (host-resident) leaf centers, cached on
        first use — only the grouped scan's early-exit bound reads it."""
        if self._leaf_centers_dev_cache is None:
            self._leaf_centers_dev_cache = jnp.asarray(self.leaf_centers)
        return self._leaf_centers_dev_cache

    def _default_scan_impl(self) -> None:
        """Window scan is the measured default (16.1 vs 6.0 M q/s for the
        grouped scan at 2M points on the r5 region-built torus, width 32);
        the grouped scan when the dense buckets or the packed bounds
        table are unavailable. The AUTO flag lets the query flip to the
        grouped scan for sparse batches (an explicit set_scan_impl call
        pins the choice)."""
        if self.bucket_fields is not None and self.leaf_scan_packed is not None:
            self.scan_impl = "xla_window"
        else:
            self.scan_impl = "xla"
        self.window_width = 32
        self._scan_impl_auto = True

    def _make_buckets(self):
        """Denormalized per-bucket triangle ids + packed distance fields
        (derived from tri_flat ON DEVICE; recomputed on load, never
        serialized). See make_bucket_tables."""
        self.packed_fields = pack_triangle_fields(self.triangles)
        # fixed-trip scan prologue: the chunks a median-length (sorted,
        # early-exiting) list needs — see _exact_scan_grouped
        cnts_np = np.asarray(self.leaf_count)
        med = float(np.median(cnts_np[cnts_np > 0])) if (cnts_np > 0).any() else 1.0
        self._scan_prologue = int(min(8, -(-med // self.scan_chunk)))
        (
            self.bucket_ids,
            self.bucket_fields,
            self.bucket_cmin,
            self.bucket_row0,
        ) = (
            make_bucket_tables(
                self.tri_flat,
                self.leaf_count,
                self.leaf_centers,
                self.packed_fields,
                self.triangles.v_world,
                chunk=self.scan_chunk,
                byte_budget=self._BUCKET_BYTE_BUDGET,
                bucket_format=getattr(self, "bucket_format", "auto"),
            )
        )
        # Packed per-leaf (first row << shift) | nchunks for the window
        # scan: the query reads both bounds with ONE element gather.
        # row0 sits in the HIGH bits deliberately: the fused query sorts
        # points on this value, so the scan's per-iteration row gathers
        # stay table-ordered. A scan-length-major packing (nchunks high)
        # was built and measured 23% SLOWER on v5e (8.8 vs 11.4 M q/s at
        # 2M points) despite 11% fewer sequential block iterations — the
        # scattered per-iteration gathers cost more than the straggler
        # rows save, and an offline model shows block-max waste is only
        # ~2.5x ideal with heavy leaves spatially clustered (r5).
        nch = -(-cnts_np // self.scan_chunk)  # 0 stays 0
        b0_np = np.asarray(self.bucket_row0).astype(np.int64)
        shift = max(1, int(np.max(nch, initial=1)).bit_length())
        if (int(b0_np.max(initial=0)) << shift) < 2**31:
            self._scan_pack_shift = shift
            self.leaf_scan_packed = jnp.asarray(
                ((b0_np << shift) | nch).astype(np.int32)
            )
        else:  # >2^26 packed bits: beyond the bucket byte budget anyway
            self._scan_pack_shift = 0
            self.leaf_scan_packed = None

    # -- queries ----------------------------------------------------------------

    # Per-call point block: bounds the transient (B, CH, 19) field gather
    # (~630 MB at 2^17) regardless of query batch size; larger blocks
    # amortize gather descriptors better (measured +21% over 2^15 on v5e).
    # Used only by the memory-light (no dense buckets) fallback scan.
    _QUERY_BLOCK = 1 << 17
    # Per-scan-call transient budget: the group block NB is sized so the
    # (NB, G, CH) distance matrices stay ~32 MB per temporary.
    _GROUP_PAIR_BUDGET = 1 << 23
    # Auto-build the dense leaf-id grid up to this depth (4 B/finest cell:
    # depth 7 -> 8 MB). Deeper structures can opt in via build_query_grid().
    _AUTO_GRID_DEPTH = 7

    def set_scan_impl(self, impl: str) -> None:
        """Select the candidate-scan backend: "xla" (leaf-aligned groups,
        lax.map over blocks, early-exit while loop), "xla_window" (fixed
        windows of the sorted order — deletes the group-assembly passes;
        see _exact_scan_window_xla), "pallas" (slab-streaming VMEM kernel
        over leaf-aligned groups), or "pallas_window" (the same kernel
        over fixed windows; see ops/pallas_scan.py). The Pallas backends
        require vertex-format buckets (the auto default), run in
        interpret mode off-TPU, and do NOT compile under Mosaic on
        v5e (dynamic single-lane slices need 128-alignment) — kept for
        interpret-mode study; use "xla_window" on hardware."""
        if impl not in ("xla", "xla_window", "pallas", "pallas_window"):
            raise ValueError(f"unknown scan impl {impl!r}")
        if impl == "xla_window":
            if self.bucket_fields is None:
                raise ValueError(
                    "xla_window scan requires dense field buckets"
                )
            if self.leaf_scan_packed is None:
                raise ValueError(
                    "bucket table too large for packed scan bounds"
                )
        if impl.startswith("pallas"):
            CH = self.scan_chunk
            if (
                self.bucket_fields is None
                or self.bucket_fields.shape[1] != 9 * CH
            ):
                raise ValueError(
                    "pallas scan requires vertex-format dense buckets"
                )
        self.scan_impl = impl
        self._scan_impl_auto = False

    def set_scan_chunk(self, chunk: int) -> None:
        """Rebuild the bucket tables with a different scan chunk width.
        Must divide the build-time span alignment (64), or be a multiple
        of it (128/256 repack the CSR into wider spans — full 128-lane
        vregs per scan eval, more padding slots for short lists; see
        make_bucket_tables). Smaller chunks cut the per-point eval floor
        (points pay >= one chunk of pairwise evals) at the price of more
        loop iterations for fat lists."""
        if chunk <= 64:
            if 64 % chunk:
                raise ValueError("scan chunk must divide 64")
        elif chunk % 64 or chunk > 256:
            raise ValueError("wide scan chunk must be 128 or 256")
        if int(chunk) == self.scan_chunk:
            return
        if chunk > 64:
            # Validate BEFORE mutating any state: the id-only fallback
            # indexes 64-aligned spans, so a wide repack without dense
            # fields would silently mis-address candidate rows.
            cnts = np.asarray(self.leaf_count)
            slots = int(np.sum(-(-np.maximum(cnts, 1) // chunk))) * chunk
            nf_est = (
                19
                if getattr(self, "bucket_format", "auto") == "frame19"
                else 9
            )
            if slots * nf_est * 4 > self._BUCKET_BYTE_BUDGET:
                raise ValueError(
                    "wide scan chunks require dense vertex buckets "
                    "within the byte budget"
                )
        self.scan_chunk = int(chunk)
        # Drop the old denormalized tables BEFORE rebuilding: at bench
        # scales they are multi-GB and two copies can exhaust HBM.
        self.bucket_fields = None
        self.bucket_ids = None
        self.bucket_cmin = None
        self._make_buckets()
        # chunk width changes every leaf's (row0, nchunks) packing
        self._rebuild_packed_grid()

    def build_query_grid(self) -> None:
        """Dense leaf-id grid at max_depth resolution: descent becomes one
        row gather (4 bytes x 8^max_depth of HBM). A second grid holds the
        packed scan bounds per cell so the window scan's descent gather
        returns (row0, nchunks) directly — no per-point bounds gather."""
        grid = _build_leaf_grid(
            np.asarray(self.octree_data), self.start_grid_size, self.max_depth
        )
        lid = (grid[:, 0] & CHILDREN_INDEX_MASK).astype(np.int32)
        self._leaf_grid = jnp.asarray(lid)
        self._rebuild_packed_grid(lid)

    def _rebuild_packed_grid(self, lid_np: np.ndarray | None = None) -> None:
        if self._leaf_grid is None or self.leaf_scan_packed is None:
            self._leaf_grid_packed = None
            return
        if lid_np is None:
            lid_np = np.asarray(self._leaf_grid)
        pk = np.asarray(self.leaf_scan_packed)
        self._leaf_grid_packed = jnp.asarray(pk[lid_np])

    def _descend(self, flat_p):
        if self._leaf_grid is not None:
            return _exact_descent_grid(
                self._leaf_grid,
                flat_p,
                jnp.asarray(self.box.min),
                jnp.float32(self.box.size[0]),
                grid_depth=self.max_depth,
            )
        return _exact_descent(
            self.octree_data,
            flat_p,
            jnp.asarray(self.box.min),
            jnp.float32(self.box.size[0]),
            self.start_grid_size,
            levels=self.max_depth - self.start_depth,
        )

    def _pick_group_width(self, flat_p, Pp: int) -> int:
        """Group width from the measured points-per-touched-leaf density,
        cached per padded batch size (the one data-dependent decision the
        fused query cannot make without a host sync). Oversized groups run
        mostly empty and inflate the pairwise-eval volume by 1/fill;
        undersized groups only add cheap gathers."""
        G = self._group_width_cache.get(Pp)
        if G is None:
            leaf_id, _ = self._descend(flat_p)
            lid_s = jnp.sort(leaf_id)
            n_leaves = int(jnp.sum(lid_s[1:] != lid_s[:-1])) + 1
            avg = max(1, Pp // max(n_leaves, 1))
            G = min(64, max(8, _round_pow2(avg, 1)))
            self._group_width_cache[Pp] = G
        return G

    def _query(self, points, with_gradient: bool):
        pts = jnp.asarray(points, jnp.float32)
        flat = pts.reshape(-1, 3)
        P = flat.shape[0]
        max_cnt = int(np.max(np.asarray(self.leaf_count), initial=1))

        B = self._QUERY_BLOCK
        if P < B:
            # small batches pad to the next power of two (floor 1024), not
            # the full block: a 4k-point query otherwise pays 131k points
            # of scan work. Pow-2 bucketing keeps compile variants bounded
            # (<= 8 sizes below the block).
            B = max(1 << (max(P - 1, 1)).bit_length(), 1024)
        Pp = -(-max(P, 1) // B) * B
        flat_p = jnp.pad(flat, [(0, Pp - P), (0, 0)])

        if self.bucket_fields is not None:
            impl = getattr(self, "scan_impl", "xla")
            if (
                getattr(self, "_scan_impl_auto", False)
                and impl == "xla_window"
                and Pp < 4 * int(self.leaf_offset.shape[0])
                # the grouped scan's float id carrier caps leaves at 2^23
                and int(self.leaf_offset.shape[0]) < (1 << 23)
            ):
                # sparse batches (< ~4 points/leaf, e.g. random points
                # over a depth-7 domain): fixed windows span many
                # scattered leaves and the gap-jumping loop degenerates
                # to per-row serial visits (r5: 1.27 vs 1.65 M q/s on
                # the 100k/d7 structure) — the grouped scan adapts its
                # group width to density instead
                impl = "xla"
            CH = self.scan_chunk
            max_chunks = -(-max_cnt // CH)
            if impl == "xla_window":
                # fixed window width: independent of leaf density
                G = int(getattr(self, "window_width", 8))
                NG = Pp // G  # number of windows (reshape, no scatter)
                NB = 64  # windows per block within the pair budget
                while NB * 2 * G * CH <= self._GROUP_PAIR_BUDGET:
                    NB *= 2
                NB = min(NB, NG)
            else:
                G = self._pick_group_width(flat_p, Pp)
                L = int(self.leaf_offset.shape[0])
                # the scatter's float id carrier is exact only below 2^23
                assert L < (1 << 23), (
                    "grouped scan leaf-id carrier limit; use "
                    "set_scan_impl('xla_window') for deeper structures"
                )
                # static bound on groups: sum over leaves of ceil(n_l/G)
                NG = _round_pow2(min(Pp, Pp // G + L), 64)
                NB = 64  # largest power of two within the pair budget
                while NB * 2 * G * CH <= self._GROUP_PAIR_BUDGET:
                    NB *= 2
                NB = min(NB, NG)
            use_grid = self._leaf_grid is not None
            if impl == "xla_window":
                # the fused program reads PACKED bounds from the grid in
                # window mode; set_scan_impl guarantees leaf_scan_packed
                # exists, and build_query_grid derives the packed grid
                assert not use_grid or self._leaf_grid_packed is not None
                grid_arr = self._leaf_grid_packed
            else:
                grid_arr = self._leaf_grid
            out, iters = _exact_query_fused(
                self.octree_data,
                grid_arr if use_grid else jnp.zeros(8, jnp.int32),
                self.bucket_row0,
                self.leaf_count,
                # the window scan never reads centers (no early-exit
                # bound); keep the padded (L, 3) array off-device then
                (
                    jnp.zeros((1, 3), jnp.float32)
                    if impl == "xla_window"
                    else self._leaf_centers_dev()
                ),
                self.bucket_ids,
                self.bucket_fields,
                self.bucket_cmin,
                (
                    self.leaf_scan_packed
                    if self.leaf_scan_packed is not None
                    else jnp.zeros(1, jnp.int32)
                ),
                self.triangles,
                flat_p,
                jnp.asarray(self.box.min),
                jnp.float32(self.box.size[0]),
                use_grid=use_grid,
                grid_depth=self.max_depth,
                levels=self.max_depth - self.start_depth,
                start_grid_size=self.start_grid_size,
                G=G,
                NG=NG,
                NB=NB,
                max_chunks=max_chunks,
                early_exit=self._sorted_lists,
                with_gradient=with_gradient,
                prologue=self._scan_prologue if self._sorted_lists else 0,
                scan_impl=impl,
                pallas_interpret=jax.default_backend() != "tpu",
                pack_shift=self._scan_pack_shift,
            )
            # diagnostics for roofline accounting (device array, unsynced)
            self._last_scan_stats = {
                "G": G, "NG": NG, "NB": NB, "CH": CH, "block_iters": iters,
            }
        else:
            leaf_id, in_box = self._descend(flat_p)
            order = jnp.argsort(leaf_id)
            pts_s = flat_p[order]
            lid_s = leaf_id[order]
            # the id-only fallback is always 64-alignable (set_scan_chunk
            # rejects wide chunks without dense fields)
            max_chunks = -(-max_cnt // self.scan_chunk)
            # huge id-only structures never materialize (rows, CH) bucket
            # tables (a multi-GB device copy, see make_bucket_tables);
            # the CSR id array reshapes for free INSIDE the jit
            ids = (
                self.bucket_ids
                if self.bucket_ids is not None
                else self.tri_flat            # reshaped inside the jit
            )
            n_rows = (
                ids.shape[0] if ids.ndim == 2
                else ids.shape[0] // self.scan_chunk
            )
            cmin = self.bucket_cmin
            ee = self._sorted_lists and (
                cmin is not None and cmin.shape[0] == n_rows
            )
            if not ee:
                cmin = jnp.zeros((1,), jnp.float32)
            win_parts = []
            for i in range(0, Pp, B):
                win_parts.append(
                    _exact_scan(
                        self.leaf_offset,
                        self.leaf_count,
                        self._leaf_centers_dev(),
                        ids,
                        self.packed_fields,
                        cmin,
                        jax.lax.dynamic_slice_in_dim(pts_s, i, B),
                        jax.lax.dynamic_slice_in_dim(lid_s, i, B),
                        max_chunks=max_chunks,
                        dense_buckets=False,
                        early_exit=ee,
                        chunk=self.scan_chunk,
                    )
                )
            win_s = (
                jnp.concatenate(win_parts)
                if len(win_parts) > 1
                else win_parts[0]
            )
            win_ids = jnp.zeros_like(win_s).at[order].set(win_s)
            out = _exact_finish(
                self.triangles,
                flat_p,
                win_ids,
                in_box,
                jnp.asarray(self.box.min),
                jnp.float32(self.box.size[0]),
                with_gradient=with_gradient,
            )
        if with_gradient:
            d, g = out
            return (
                d[:P].reshape(pts.shape[:-1]),
                g[:P].reshape(pts.shape),
            )
        return out[:P].reshape(pts.shape[:-1])

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
            "leaf_centers": np.asarray(self.leaf_centers, np.float32),
            "sorted_lists": np.bool_(self._sorted_lists),
            "strategy": np.array(getattr(self, "strategy", "lattice")),
            # the tier decision must survive save/load: a 6.5 GB depth-7
            # field table silently degraded to id-only on reload when the
            # instance budget was lost (r5)
            "bucket_byte_budget": np.int64(self._BUCKET_BYTE_BUDGET),
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
        self.strategy = str(state.get("strategy", "lattice"))
        if "bucket_byte_budget" in state:
            self._BUCKET_BYTE_BUDGET = int(state["bucket_byte_budget"])
        self.octree_data = jnp.asarray(state["octree_data"])
        self.leaf_offset = jnp.asarray(state["leaf_offset"])
        self.leaf_count = jnp.asarray(state["leaf_count"])
        self.tri_flat = jnp.asarray(state["tri_flat"])
        # The early-exit bound is only valid on distance-sorted lists.
        # sorted_lists is explicit in new saves; legacy builder saves carry
        # leaf_centers (implying sorted), anything else is unsorted (e.g.
        # structures re-saved after a reference .bin import).
        if "sorted_lists" in state:
            self._sorted_lists = bool(state["sorted_lists"])
        else:
            self._sorted_lists = "leaf_centers" in state
        if "leaf_centers" in state:
            self.leaf_centers = np.asarray(state["leaf_centers"], np.float32)
        else:
            self.leaf_centers = np.zeros(
                (max(int(np.asarray(state["leaf_count"]).shape[0]), 1), 3),
                np.float32,
            )
        self._leaf_centers_dev_cache = None
        fields = TriangleDataSoA._fields
        self.triangles = TriangleDataSoA(
            *(jnp.asarray(state[f"tri_{n}"]) for n in fields)
        )
        self.build_stats = {}
        self.scan_chunk = _LEAF_CHUNK
        self._group_width_cache = {}
        self._make_buckets()
        self._default_scan_impl()
        self._leaf_grid = None
        self._leaf_grid_packed = None
        if self.max_depth <= self._AUTO_GRID_DEPTH:
            self.build_query_grid()

    @classmethod
    def _from_state_arrays(cls, state: dict) -> "ExactOctreeSdf":
        return cls(_state=state)
