"""Octree-TILE sharding: the exact-octree structure partitioned by
start-grid cells across the device mesh (SURVEY.md S5.7-5.8; reference
start-grid layout OctreeSdf.h:256-258 is the natural 2^d^3 partition).

parallel/query.py replicates the whole structure per chip — fine until the
denormalized bucket tables (the largest arrays, O(sum of leaf-list
lengths)) outgrow one chip's HBM. Here each chip builds and stores ONLY
the subtrees rooted at its start cells (~1/N of the structure), queries
run SPMD under shard_map, and per-point results combine with one psum:

  * every chip receives the full (replicated) point batch — points are
    cheap (12 B each) next to bucket rows;
  * a point's owner is a pure function of its coordinates (its start
    cell), so routing is arithmetic, not communication;
  * each in-box point is evaluated by exactly one chip (out-of-box
    fallbacks are assigned to chip 0); psum assembles the full batch.

Per-tile builds produce exactly the subtrees the global build would (same
seed candidates, same cull, same level schedule), so distances are
bit-identical to the replicated path except at exact argmin ties between
equidistant triangles split across chunk boundaries.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..mesh import BoundingBox, Mesh
from ..sdf.exact_octree import (
    _LEAF_CHUNK,
    _build_exact,
    _exact_finish,
    _exact_scan,
    make_bucket_tables,
)
from ..sdf.octree import _select8
from ..sdf.octree_builder import CHILDREN_INDEX_MASK, IS_LEAF_MASK
from ..triangle import calculate_mesh_triangle_data
from ..ops.point_triangle import pack_triangle_fields
from .mesh import RAY_AXIS, default_mesh

__all__ = ["TiledExactOctreeSdf"]


def _pad_to(arr, n, fill=0):
    pad = [(0, n - arr.shape[0])] + [(0, 0)] * (arr.ndim - 1)
    return np.pad(np.asarray(arr), pad, constant_values=fill)


class TiledExactOctreeSdf:
    """ExactOctreeSdf with the structure sharded by start-grid tiles.

    Per-chip memory is ~1/N of the replicated structure (bucket tables
    dominate; only the (T, ...) triangle data is replicated for the final
    signed evaluation). Queries accept any (..., 3) batch and return the
    same distances as the replicated structure.
    """

    def __init__(
        self,
        mesh: Mesh | None = None,
        box: BoundingBox | None = None,
        max_depth: int = 5,
        start_depth: int = 2,
        min_triangles_per_node: int = 32,
        strategy: str = "lattice",
        futility: float | None = 0.8,
        device_mesh=None,
    ):
        assert mesh is not None and box is not None
        self.device_mesh = default_mesh() if device_mesh is None else device_mesh
        N = self.device_mesh.devices.size
        cbox = box.cubified()
        self.box = cbox
        self.max_depth = int(max_depth)
        self.start_depth = int(start_depth)
        s = 1 << self.start_depth
        n0 = s * s * s
        if n0 % N:
            raise ValueError(
                f"start grid ({n0} cells) must divide evenly over {N} chips"
                " — raise start_depth"
            )
        self.cells_per_chip = n0 // N

        soa = calculate_mesh_triangle_data(mesh)
        self.triangles = jax.tree.map(jnp.asarray, soa)
        self.packed_fields = pack_triangle_fields(self.triangles)

        shards = []
        for k in range(N):
            octree, loff, lcnt, tflat, lcen, _stats = _build_exact(
                soa,
                cbox.min,
                float(cbox.size[0]),
                self.max_depth,
                self.start_depth,
                int(min_triangles_per_node),
                strategy=strategy,
                futility=futility,
                seed_cells=(k * self.cells_per_chip,
                            (k + 1) * self.cells_per_chip),
            )
            ids, fields, cmin = make_bucket_tables(
                tflat, lcnt, lcen, self.packed_fields,
                self.triangles.v_world,
            )
            if fields is None:
                raise NotImplementedError(
                    "tiled shards above the dense-bucket budget are "
                    "unsupported; raise the shard count"
                )
            shards.append(
                dict(
                    octree=np.asarray(octree),
                    leaf_offset=np.asarray(loff),
                    leaf_count=np.asarray(lcnt),
                    leaf_centers=np.asarray(lcen),
                    bucket_ids=np.asarray(ids),
                    bucket_fields=np.asarray(fields),
                    bucket_cmin=np.asarray(cmin),
                )
            )

        # Stack shards with a leading chip axis (padded to the max shard
        # size per array) and place each row on its chip.
        self.shard_nodes = [int(s_["octree"].shape[0]) for s_ in shards]
        self.max_leaf_count = max(
            int(s_["leaf_count"].max(initial=1)) for s_ in shards
        )
        stacked = {}
        for name, fill in (
            ("octree", 0),
            ("leaf_offset", 0),
            ("leaf_count", 0),
            ("leaf_centers", 0),
            ("bucket_ids", -1),
            ("bucket_fields", 0),
            ("bucket_cmin", np.inf),
        ):
            n = max(s_[name].shape[0] for s_ in shards)
            n = -(-n // 64) * 64  # keep row-gather alignment after padding
            stacked[name] = np.stack([_pad_to(s_[name], n, fill) for s_ in shards])
        sharding = NamedSharding(self.device_mesh, P(RAY_AXIS))
        self.arrays = {
            k: jax.device_put(jnp.asarray(v), sharding)
            for k, v in stacked.items()
        }
        self._rep = NamedSharding(self.device_mesh, P())
        self.triangles = jax.tree.map(
            lambda a: jax.device_put(a, self._rep), self.triangles
        )
        self._query_fn = self._build_query_fn()

    def _build_query_fn(self):
        s = 1 << self.start_depth
        levels = self.max_depth - self.start_depth
        cpk = self.cells_per_chip
        max_chunks = -(-self.max_leaf_count // _LEAF_CHUNK)
        box_min = np.asarray(self.box.min, np.float32)
        box_size = np.float32(self.box.size[0])
        tris = self.triangles

        def body(oct_, loff, lcnt, lcen, bids, bflds, bcmin, pts):
            # one shard per chip: drop the leading chip axis
            oct_, loff, lcnt, lcen, bids, bflds, bcmin = (
                a[0] for a in (oct_, loff, lcnt, lcen, bids, bflds, bcmin)
            )
            k = jax.lax.axis_index(RAY_AXIS)

            cell_sz = box_size / s
            frac = (pts - box_min) / cell_sz
            ipos = jnp.floor(frac).astype(jnp.int32)
            frac = frac - ipos
            in_box = jnp.all((ipos >= 0) & (ipos < s), axis=-1)
            ic = jnp.clip(ipos, 0, s - 1)
            gcell = ic[..., 2] * (s * s) + ic[..., 1] * s + ic[..., 0]
            local = gcell - k * cpk
            mine = in_box & (local >= 0) & (local < cpk)
            local = jnp.clip(local, 0, cpk - 1)

            # descent over the LOCAL flat array (ExactOctreeSdf.cpp:57-66
            # semantics, '>' child rounding)
            view8 = oct_.reshape(-1, 8)
            word = _select8(view8[local >> 3], (local & 7).astype(jnp.int32))
            leaf_mask = jnp.uint32(IS_LEAF_MASK)
            cidx_mask = jnp.uint32(CHILDREN_INDEX_MASK)
            word = word.astype(jnp.uint32)
            for _ in range(levels):
                is_leaf = (word & leaf_mask) != 0
                child = (
                    ((frac[..., 2] > 0.5).astype(jnp.uint32) << 2)
                    + ((frac[..., 1] > 0.5).astype(jnp.uint32) << 1)
                    + (frac[..., 0] > 0.5).astype(jnp.uint32)
                )
                base = word & cidx_mask
                nxt = _select8(
                    view8[(base >> 3).astype(jnp.int32)], child
                ).astype(jnp.uint32)
                nfrac = 2.0 * frac
                nfrac = nfrac - jnp.floor(nfrac)
                word = jnp.where(is_leaf, word, nxt)
                frac = jnp.where(is_leaf[..., None], frac, nfrac)
            leaf_id = (word & cidx_mask).astype(jnp.int32)
            leaf_id = jnp.where(mine, leaf_id, 0)

            # leaf-coherent scan of MY points (foreign points sort last
            # as leaf 0 with a done-at-once mask via leaf_count clamp)
            order = jnp.argsort(jnp.where(mine, leaf_id, jnp.int32(2**30)))
            pts_s = pts[order]
            lid_s = leaf_id[order]
            win_s = _exact_scan(
                loff, lcnt, lcen, bids, bflds, bcmin,
                pts_s, lid_s,
                max_chunks=max_chunks,
                dense_buckets=True,
                early_exit=True,
            )
            win = jnp.zeros_like(win_s).at[order].set(win_s)

            d = _exact_finish(
                tris, pts, win, in_box,
                jnp.asarray(box_min), box_size,
                with_gradient=False,
            )
            # each point contributes from exactly one chip: its owner for
            # in-box points, chip 0 for the out-of-box fallback
            contrib = jnp.where(mine | (~in_box & (k == 0)), d, 0.0)
            return jax.lax.psum(contrib, RAY_AXIS)

        mesh = self.device_mesh
        shd = P(RAY_AXIS)
        rep = P()
        fn = jax.shard_map(
            body,
            mesh=mesh,
            in_specs=(shd,) * 7 + (rep,),
            out_specs=rep,
        )
        return jax.jit(fn)

    def get_distance(self, points):
        pts = jnp.asarray(points, jnp.float32)
        flat = jax.device_put(pts.reshape(-1, 3), self._rep)
        a = self.arrays
        d = self._query_fn(
            a["octree"], a["leaf_offset"], a["leaf_count"],
            a["leaf_centers"], a["bucket_ids"], a["bucket_fields"],
            a["bucket_cmin"], flat,
        )
        return d.reshape(pts.shape[:-1])

    def get_sample_area(self) -> BoundingBox:
        return self.box

    def per_chip_bucket_bytes(self) -> list[int]:
        """Bucket-table bytes per chip (the memory sharding actually buys)."""
        bf = self.arrays["bucket_fields"]
        return [int(np.prod(bf.shape[1:])) * 4] * bf.shape[0]
