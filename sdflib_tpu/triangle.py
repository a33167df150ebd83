"""Per-triangle precomputation: local frames + pseudonormals (SoA layout).

TPU-native re-design of the reference TriangleData preprocessing
(reference: include/SdfLib/utils/TriangleUtils.h:20-72 and
src/utils/TriangleUtils.cpp:7-428). The output is a struct-of-arrays pytree
so the batched distance kernels (sdflib_tpu/ops/point_triangle.py) can
consume it directly on device.

Semantics preserved from the reference:
  * Local frame: origin = v1, x-axis along v2-v1, z-axis = face normal;
    ``transform`` maps world -> triangle space (TriangleUtils.h:27-31).
  * ``b``/``c`` are the normalized 2D directions of edges v2->v3 and v3->v1
    in triangle space; ``v2x``/``v3xy`` are the in-plane vertex positions.
  * Edge pseudonormals: sum of the two adjacent face normals, stored
    transformed into each triangle's frame (TriangleUtils.cpp:63-88).
  * Vertex pseudonormals: angle-weighted sums of incident face normals,
    stored transformed per-triangle (TriangleUtils.cpp:85-87, 422-425).
  * Non-manifold edges: vertices are merged by proximity (two-phase spatial
    hash in the reference, TriangleUtils.cpp:292-420; here an exact
    union-find over a rounded-coordinate hash) and edge pairing is retried.
  * The reference's degenerate-triangle special case is dead code
    (disabled by ``false &&`` at TriangleUtils.cpp:45) and is not recreated.

Precomputation runs on host (O(T), once per mesh) in float64 and is cast to
float32, matching reference fp32 numerics to ~1e-6 relative.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np

from .mesh import Mesh

__all__ = ["TriangleDataSoA", "calculate_mesh_triangle_data"]


class TriangleDataSoA(NamedTuple):
    """Struct-of-arrays per-triangle data; all float32, T = num triangles.

    This is a JAX pytree (NamedTuple of arrays); fields may live on host
    (numpy) or device (jax.Array).
    """

    origin: np.ndarray            # (T, 3) world position of v1
    transform: np.ndarray         # (T, 3, 3) world -> triangle-space matrix
    b: np.ndarray                 # (T, 2) edge v2->v3 direction (tri space)
    c: np.ndarray                 # (T, 2) edge v3->v1 direction (tri space)
    v2x: np.ndarray               # (T,) v2 x-coordinate in triangle space
    v3xy: np.ndarray              # (T, 2) v3 xy-coordinates in triangle space
    edges_normal: np.ndarray      # (T, 3, 3) edge pseudonormals (tri space)
    vertices_normal: np.ndarray   # (T, 3, 3) vertex pseudonormals (tri space)
    v_world: np.ndarray           # (T, 3, 3) world vertices [v1, v2, v3]

    @property
    def num_triangles(self) -> int:
        return int(self.origin.shape[0])

    def astype(self, dtype) -> "TriangleDataSoA":
        return TriangleDataSoA(*(np.asarray(f, dtype) for f in self))

    def triangle_normals(self) -> np.ndarray:
        """World-space unit face normals = third row of ``transform``."""
        return np.asarray(self.transform)[:, 2, :]


def _union_find_merge(vertices: np.ndarray, candidates: np.ndarray, threshold: float):
    """Map each candidate vertex id to a canonical representative among
    candidates closer than ``threshold``. Returns dict {vid: parent}.

    Replaces the reference's two-phase spatial hash merge
    (TriangleUtils.cpp:292-420) with an exact grid-hash union-find.
    """
    if len(candidates) == 0:
        return {}
    pos = vertices[candidates]
    cell = np.floor(pos / max(threshold, 1e-30)).astype(np.int64)
    parent = {int(v): int(v) for v in candidates}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    buckets: dict[tuple, list[int]] = {}
    for i, v in enumerate(candidates):
        base = cell[i]
        for dx in (0, 1):
            for dy in (0, 1):
                for dz in (0, 1):
                    key = (base[0] + dx, base[1] + dy, base[2] + dz)
                    buckets.setdefault(key, []).append(i)
    sq_thr = threshold * threshold
    for key, members in buckets.items():
        if len(members) < 2:
            continue
        for a_i in range(len(members)):
            for b_i in range(a_i + 1, len(members)):
                ia, ib = members[a_i], members[b_i]
                d = pos[ia] - pos[ib]
                if float(d @ d) < sq_thr:
                    ra, rb = find(int(candidates[ia])), find(int(candidates[ib]))
                    if ra != rb:
                        parent[max(ra, rb)] = min(ra, rb)
    return {v: find(v) for v in parent}


def calculate_mesh_triangle_data(mesh: Mesh, dtype=np.float32) -> TriangleDataSoA:
    """Build the TriangleDataSoA for a mesh (host, float64 internally)."""
    v = mesh.vertices.astype(np.float64)
    idx = mesh.indices.astype(np.int64)
    T = idx.shape[0]

    v0, v1, v2 = v[idx[:, 0]], v[idx[:, 1]], v[idx[:, 2]]

    # Local frames (TriangleUtils.h:23-42 semantics).
    def _norm(x):
        return x / np.maximum(np.linalg.norm(x, axis=-1, keepdims=True), 1e-300)

    sx = _norm(v1 - v0)
    sz = _norm(np.cross(v1 - v0, v2 - v0))
    sy = np.cross(sz, sx)
    frame = np.stack([sx, sy, sz], axis=-1)  # columns sx, sy, sz

    # Degenerate (zero-area / zero-edge) triangles produce a singular frame.
    # The reference lets glm::inverse emit garbage silently
    # (TriangleUtils.cpp:45 disables its degenerate path); we instead build a
    # valid orthonormal fallback frame so no NaN/inf ever reaches the device.
    det = np.linalg.det(frame)
    bad = ~np.isfinite(det) | (np.abs(det) < 1e-12)
    if np.any(bad):
        fb_x = _norm(np.where(np.linalg.norm(v1 - v0, axis=-1, keepdims=True) > 1e-30,
                              v1 - v0, np.array([1.0, 0.0, 0.0])))
        helper = np.where(np.abs(fb_x[:, :1]) < 0.9,
                          np.array([1.0, 0.0, 0.0]), np.array([0.0, 1.0, 0.0]))
        fb_z = _norm(np.cross(fb_x, helper))
        fb_y = np.cross(fb_z, fb_x)
        fb_frame = np.stack([fb_x, fb_y, fb_z], axis=-1)
        frame = np.where(bad[:, None, None], fb_frame, frame)
    transform = np.linalg.inv(frame)

    def _apply(m, x):
        return np.einsum("tij,tj->ti", m, x)

    b2 = _apply(transform, v2 - v1)[:, :2]
    b2 = b2 / np.maximum(np.linalg.norm(b2, axis=-1, keepdims=True), 1e-300)
    c2 = _apply(transform, v0 - v2)[:, :2]
    c2 = c2 / np.maximum(np.linalg.norm(c2, axis=-1, keepdims=True), 1e-300)
    v2x = _apply(transform, v1 - v0)[:, 0]
    v3xy = _apply(transform, v2 - v0)[:, :2]

    tri_normal = transform[:, 2, :]  # row 2 = world-space unit normal

    # --- Edge pseudonormals via edge pairing -------------------------------
    # Edge k of triangle t connects corner k to corner (k+1)%3.
    corners = idx  # (T, 3)
    e_a = corners  # (T, 3)
    e_b = corners[:, [1, 2, 0]]
    key_lo = np.minimum(e_a, e_b).ravel()
    key_hi = np.maximum(e_a, e_b).ravel()

    edges_normal_world = np.tile(np.array([0.0, 0.0, 1.0]), (T, 3, 1))
    # Default: reference default is (0,0,1) in TRIANGLE space, i.e. the face
    # normal direction (TriangleUtils.h:40) -- store sentinel and fix below.
    edge_assigned = np.zeros((T, 3), dtype=bool)

    def _pair_edges(klo, khi, slots):
        """Pair up edge slots sharing the same (lo,hi) key. Returns list of
        unpaired slot indices (into the flattened slots array)."""
        order = np.lexsort((khi, klo))
        unpaired = []
        i = 0
        n = len(order)
        while i < n:
            j = i
            while j + 1 < n and klo[order[j + 1]] == klo[order[i]] and khi[order[j + 1]] == khi[order[i]]:
                j += 1
            group = order[i : j + 1]
            # Pair greedily in insertion order (reference pairs first two
            # occurrences via map insert/erase, TriangleUtils.cpp:71-83).
            group = group[np.argsort(group)]
            g = 0
            while g + 1 < len(group):
                s1, s2 = slots[group[g]], slots[group[g + 1]]
                t1, k1 = divmod(s1, 3)
                t2, k2 = divmod(s2, 3)
                en = tri_normal[t1] + tri_normal[t2]
                edges_normal_world[t1, k1] = en
                edges_normal_world[t2, k2] = en
                edge_assigned[t1, k1] = True
                edge_assigned[t2, k2] = True
                g += 2
            if g < len(group):
                unpaired.append(slots[group[g]])
            i = j + 1
        return unpaired

    all_slots = np.arange(3 * T)
    unpaired = _pair_edges(key_lo, key_hi, all_slots)

    # --- Non-manifold handling: merge nearby vertices and retry ------------
    if unpaired:
        unpaired = np.asarray(unpaired, dtype=np.int64)
        ua = e_a.ravel()[unpaired]
        ub = e_b.ravel()[unpaired]
        cand = np.unique(np.concatenate([ua, ub]))
        bb_size = mesh.bounding_box.size.astype(np.float64)
        threshold = 1e-5 / max(float(bb_size.max()), 1e-30)
        vmap_merge = _union_find_merge(v, cand, threshold)
        remap = lambda x: vmap_merge.get(int(x), int(x))  # noqa: E731
        ra = np.asarray([remap(x) for x in ua])
        rb = np.asarray([remap(x) for x in ub])
        klo = np.minimum(ra, rb)
        khi = np.maximum(ra, rb)
        still = _pair_edges(klo, khi, unpaired)
        # Remaining boundary edges keep the reference default pseudonormal
        # (0,0,1) in triangle space == the face normal (open surfaces).
    else:
        vmap_merge = {}

    # --- Vertex pseudonormals (angle-weighted) -----------------------------
    vertex_normal = np.zeros_like(v)
    for k in range(3):
        a = idx[:, k]
        bq = idx[:, (k + 1) % 3]
        cq = idx[:, (k + 2) % 3]
        e1 = _norm(v[bq] - v[a])
        e2 = _norm(v[cq] - v[a])
        ang = np.arccos(np.clip(np.sum(e1 * e2, axis=-1), -1.0, 1.0))
        np.add.at(vertex_normal, a, ang[:, None] * tri_normal)

    # Merge + propagate pseudonormals across merged vertices
    # (TriangleUtils.cpp:398-410).
    if vmap_merge:
        groups: dict[int, list[int]] = {}
        for vid, p in vmap_merge.items():
            groups.setdefault(p, []).append(vid)
        for p, members in groups.items():
            total = vertex_normal[members].sum(axis=0)
            if p not in members:
                total = total + vertex_normal[p]
            vertex_normal[p] = total
            for m in members:
                vertex_normal[m] = total

    # Transform pseudonormals into each triangle's frame.
    edges_normal = np.einsum("tij,tkj->tki", transform, edges_normal_world)
    # Unassigned edges: reference default is (0,0,1) already in tri space.
    edges_normal[~edge_assigned] = np.array([0.0, 0.0, 1.0])

    vn_world = vertex_normal[idx]  # (T, 3corners, 3)
    vertices_normal = np.einsum("tij,tkj->tki", transform, vn_world)

    v_world = np.stack([v0, v1, v2], axis=1)

    return TriangleDataSoA(
        origin=v0.astype(dtype),
        transform=transform.astype(dtype),
        b=b2.astype(dtype),
        c=c2.astype(dtype),
        v2x=v2x.astype(dtype),
        v3xy=v3xy.astype(dtype),
        edges_normal=edges_normal.astype(dtype),
        vertices_normal=vertices_normal.astype(dtype),
        v_world=v_world.astype(dtype),
    )
