"""Octree-TILE sharding: SDF structures partitioned across the device mesh
(SURVEY.md S5.7-5.8; reference start-grid layout OctreeSdf.h:256-258 is the
natural 2^d^3 partition).

parallel/query.py replicates the whole structure per chip — fine until the
structure outgrows one chip's HBM. Two sharded structures live here:

* ``TiledExactOctreeSdf`` — each chip builds and stores ONLY the subtrees
  rooted at its start cells (~1/N of the denormalized bucket tables, the
  largest arrays);
* ``TiledOctreeSdf`` — the approx octree's dense fused-row grid (the
  dominant memory at depth 7+: (2+64) u32 words per finest cell) sharded
  in contiguous z-slabs; the flat grid is z-major, so a chip's slab is a
  contiguous row range and ownership is pure coordinate arithmetic.

Shared query pattern:
  * every chip receives the full (replicated) point batch — points are
    cheap (12 B each) next to structure rows;
  * a point's owner is a pure function of its coordinates, so routing is
    arithmetic, not communication;
  * each in-box point is evaluated by exactly one chip (out-of-box
    fallbacks go to chip 0); ONE psum assembles the batch.

Both classes are full SdfFunction citizens: distance + gradient queries,
save()/SdfFunction.load() through their own format tags (loading requires
the same chip count the file was saved with — resharding a tiled container
means rebuilding shard boundaries).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..mesh import BoundingBox, Mesh
from ..sdf.sdf_function import SdfFormat, SdfFunction
from ..sdf.exact_octree import (
    _LEAF_CHUNK,
    _build_exact,
    _exact_finish,
    _exact_scan,
    _triangle_aabbs,
    make_bucket_tables,
)
from ..sdf.octree import _select8
from ..sdf.octree_builder import CHILDREN_INDEX_MASK, IS_LEAF_MASK
from ..triangle import TriangleDataSoA, calculate_mesh_triangle_data
from ..ops.point_triangle import pack_triangle_fields
from .mesh import RAY_AXIS, default_mesh

__all__ = ["TiledExactOctreeSdf", "TiledOctreeSdf"]


def _pad_to(arr, n, fill=0):
    pad = [(0, n - arr.shape[0])] + [(0, 0)] * (arr.ndim - 1)
    return np.pad(np.asarray(arr), pad, constant_values=fill)


class TiledExactOctreeSdf(SdfFunction):
    """ExactOctreeSdf with the structure sharded by start-grid tiles.

    Per-chip memory is ~1/N of the replicated structure (bucket tables
    dominate; only the (T, ...) triangle data is replicated for the final
    signed evaluation). Queries accept any (..., 3) batch and return the
    same distances/gradients as the replicated structure.
    """

    _STACK_FILL = (
        ("octree", 0),
        ("leaf_offset", 0),
        ("leaf_count", 0),
        ("leaf_centers", 0),
        ("bucket_ids", -1),
        ("bucket_fields", 0),
        ("bucket_cmin", np.inf),
    )

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
        _state: dict | None = None,
    ):
        if _state is not None:
            self._load_state(_state, device_mesh)
            return
        assert mesh is not None and box is not None
        self.device_mesh = default_mesh() if device_mesh is None else device_mesh
        N = self.device_mesh.devices.size
        cbox = box.cubified()
        self.box = cbox
        self.max_depth = int(max_depth)
        self.start_depth = int(start_depth)
        self.min_triangles_per_node = int(min_triangles_per_node)
        self.strategy = str(strategy)
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
        # ONE upload of the shared tables, reused by every shard build
        # (round 2 re-packed + re-uploaded them per shard).
        shared = (
            jnp.asarray(self.packed_fields),
            _triangle_aabbs(self.triangles),
            jnp.asarray(self.triangles.v_world),
        )

        shards = []
        for k in range(N):
            octree, loff, lcnt, tflat, lcen, _stats = _build_exact(
                soa,
                cbox.min,
                float(cbox.size[0]),
                self.max_depth,
                self.start_depth,
                self.min_triangles_per_node,
                strategy=self.strategy,
                futility=futility,
                seed_cells=(k * self.cells_per_chip,
                            (k + 1) * self.cells_per_chip),
                shared_tables=shared,
            )
            # default 64-chunk tables: bucket_row0 == leaf_offset // 64,
            # which the shard query derives from its padded leaf_offset
            ids, fields, cmin, _row0 = make_bucket_tables(
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
        for name, fill in self._STACK_FILL:
            n = max(s_[name].shape[0] for s_ in shards)
            n = -(-n // 64) * 64  # keep row-gather alignment after padding
            stacked[name] = np.stack([_pad_to(s_[name], n, fill) for s_ in shards])
        self._place(stacked)

    def _place(self, stacked: dict) -> None:
        """Device-place the stacked per-chip arrays and build query fns."""
        sharding = NamedSharding(self.device_mesh, P(RAY_AXIS))
        self.arrays = {
            k: jax.device_put(jnp.asarray(v), sharding)
            for k, v in stacked.items()
        }
        self._rep = NamedSharding(self.device_mesh, P())
        self.triangles = jax.tree.map(
            lambda a: jax.device_put(jnp.asarray(a), self._rep), self.triangles
        )
        self._query_fn = self._build_query_fn(with_gradient=False)
        self._query_grad_fn = None  # built on first gradient call

    def _build_query_fn(self, *, with_gradient: bool):
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

            out = _exact_finish(
                tris, pts, win, in_box,
                jnp.asarray(box_min), box_size,
                with_gradient=with_gradient,
            )
            # each point contributes from exactly one chip: its owner for
            # in-box points, chip 0 for the out-of-box fallback
            take = mine | (~in_box & (k == 0))
            if with_gradient:
                d, g = out
                return (
                    jax.lax.psum(jnp.where(take, d, 0.0), RAY_AXIS),
                    jax.lax.psum(
                        jnp.where(take[..., None], g, 0.0), RAY_AXIS
                    ),
                )
            return jax.lax.psum(jnp.where(take, out, 0.0), RAY_AXIS)

        mesh = self.device_mesh
        shd = P(RAY_AXIS)
        rep = P()
        fn = jax.shard_map(
            body,
            mesh=mesh,
            in_specs=(shd,) * 7 + (rep,),
            out_specs=(rep, rep) if with_gradient else rep,
        )
        return jax.jit(fn)

    def _run(self, points, fn):
        pts = jnp.asarray(points, jnp.float32)
        flat = jax.device_put(pts.reshape(-1, 3), self._rep)
        a = self.arrays
        return pts.shape[:-1], fn(
            a["octree"], a["leaf_offset"], a["leaf_count"],
            a["leaf_centers"], a["bucket_ids"], a["bucket_fields"],
            a["bucket_cmin"], flat,
        )

    def get_distance(self, points):
        shape, d = self._run(points, self._query_fn)
        return d.reshape(shape)

    def get_distance_and_gradient(self, points):
        if self._query_grad_fn is None:
            self._query_grad_fn = self._build_query_fn(with_gradient=True)
        shape, (d, g) = self._run(points, self._query_grad_fn)
        return d.reshape(shape), g.reshape(shape + (3,))

    def get_sample_area(self) -> BoundingBox:
        return self.box

    def get_format(self) -> SdfFormat:
        return SdfFormat.EXACT_OCTREE_TILED

    def per_chip_bucket_bytes(self) -> list[int]:
        """Bucket-table bytes per chip (the memory sharding actually buys)."""
        bf = self.arrays["bucket_fields"]
        return [int(np.prod(bf.shape[1:])) * 4] * bf.shape[0]

    # -- serialization ------------------------------------------------------

    def _state_arrays(self) -> dict:
        state = {
            "box_min": np.asarray(self.box.min, np.float32),
            "box_max": np.asarray(self.box.max, np.float32),
            "max_depth": np.int32(self.max_depth),
            "start_depth": np.int32(self.start_depth),
            "min_triangles_per_node": np.int32(self.min_triangles_per_node),
            "strategy": np.array(self.strategy),
            "cells_per_chip": np.int32(self.cells_per_chip),
            "shard_nodes": np.asarray(self.shard_nodes, np.int64),
            "max_leaf_count": np.int32(self.max_leaf_count),
            **{
                f"shard_{k}": np.asarray(jax.device_get(v))
                for k, v in self.arrays.items()
            },
            **{
                f"tri_{n}": np.asarray(a)
                for n, a in zip(
                    TriangleDataSoA._fields, jax.device_get(self.triangles)
                )
            },
        }
        return state

    def _load_state(self, state: dict, device_mesh=None) -> None:
        self.device_mesh = default_mesh() if device_mesh is None else device_mesh
        N = self.device_mesh.devices.size
        stacked = {
            k[len("shard_"):]: state[k]
            for k in state
            if k.startswith("shard_")
        }
        n_saved = next(iter(stacked.values())).shape[0]
        if n_saved != N:
            raise ValueError(
                f"tiled container was saved with {n_saved} shards but the "
                f"current mesh has {N} chips — rebuild instead of loading"
            )
        self.box = BoundingBox(state["box_min"], state["box_max"])
        self.max_depth = int(state["max_depth"])
        self.start_depth = int(state["start_depth"])
        self.min_triangles_per_node = int(state["min_triangles_per_node"])
        self.strategy = str(state["strategy"])
        self.cells_per_chip = int(state["cells_per_chip"])
        self.shard_nodes = [int(x) for x in state["shard_nodes"]]
        self.max_leaf_count = int(state["max_leaf_count"])
        self.triangles = TriangleDataSoA(
            *(state[f"tri_{n}"] for n in TriangleDataSoA._fields)
        )
        self.packed_fields = pack_triangle_fields(
            jax.tree.map(jnp.asarray, self.triangles)
        )
        self._place(stacked)

    @classmethod
    def _from_state_arrays(cls, state: dict) -> "TiledExactOctreeSdf":
        return cls(_state=state)


class TiledOctreeSdf(SdfFunction):
    """OctreeSdf (approx, polynomial leaves) with the dense fused-row grid
    sharded in z-slabs across the device mesh.

    The fused grid (2+num_coeff u32 words per finest cell, the dominant
    memory at depth 7+ — OctreeSdf.h:256-258's start-grid partition taken
    to the finest level) is z-major, so chip k owns the contiguous row
    range [k*rows, (k+1)*rows): ownership is one integer compare on the
    point's z cell. Distance and gradient queries run SPMD with a single
    psum; out-of-box fallbacks go to chip 0. Built from a host OctreeSdf
    build (the per-level approx builder is host-staged and cheap relative
    to its grid; sharding the BUILD itself is the exact octree's game).
    """

    def __init__(
        self,
        mesh: Mesh | None = None,
        box: BoundingBox | None = None,
        device_mesh=None,
        _state: dict | None = None,
        _octree=None,
        **octree_kwargs,
    ):
        if _state is not None:
            self._load_state(_state, device_mesh)
            return
        from ..sdf.octree import OctreeSdf

        self.device_mesh = default_mesh() if device_mesh is None else device_mesh
        if _octree is None:
            assert mesh is not None and box is not None
            _octree = OctreeSdf(mesh, box, **octree_kwargs)
        if _octree._fat_grid is None:
            _octree.build_query_grid()
        if _octree._fat_grid is None:
            raise ValueError("octree has no fused grid (trilinear depth>6?)")
        self.box = _octree.box
        self.max_depth = int(_octree.max_depth)
        self.interpolation = str(_octree.interpolation)
        self.num_coeff = 64 if self.interpolation == "tricubic" else 8
        self.min_border_value = float(_octree.min_border_value)
        self.value_range = float(getattr(_octree, "value_range", 1.0))
        fat = np.asarray(_octree._fat_grid)
        self._shard_fat(fat)

    def _shard_fat(self, fat: np.ndarray) -> None:
        N = self.device_mesh.devices.size
        g = 1 << self.max_depth
        if (g * g * g) % N:
            raise ValueError(
                f"grid ({g}^3 cells) must divide evenly over {N} chips"
            )
        self.rows_per_chip = fat.shape[0] // N
        sharding = NamedSharding(self.device_mesh, P(RAY_AXIS))
        self.fat_grid = jax.device_put(jnp.asarray(fat), sharding)
        self._rep = NamedSharding(self.device_mesh, P())
        self._query_fn = self._build_query_fn(with_gradient=False)
        self._query_grad_fn = None

    def _build_query_fn(self, *, with_gradient: bool):
        from ..ops.box import box_distance, box_distance_gradient
        from ..ops.interpolation import (
            tricubic_gradient,
            tricubic_interpolate,
            trilinear_gradient,
            trilinear_interpolate,
        )

        grid_depth = self.max_depth
        num_coeff = self.num_coeff
        interpolation = self.interpolation
        box_min = np.asarray(self.box.min, np.float32)
        box_size = np.float32(self.box.size[0])
        min_border_value = np.float32(self.min_border_value)
        rpc = self.rows_per_chip

        def body(fat, pts):
            k = jax.lax.axis_index(RAY_AXIS)
            g = 1 << grid_depth
            rel = (pts - box_min) / box_size
            in_box = jnp.all((rel >= 0.0) & (rel < 1.0), axis=-1)
            cell = jnp.clip((rel * g).astype(jnp.int32), 0, g - 1)
            lin = (cell[..., 2] * g + cell[..., 1]) * g + cell[..., 0]
            local = lin - k * rpc
            mine = in_box & (local >= 0) & (local < rpc)
            row = fat[jnp.clip(local, 0, rpc - 1)]

            depth = (row[..., 1] & jnp.uint32(0xFFFF)).astype(jnp.int32)
            scale = jnp.exp2(depth.astype(pts.dtype))
            f = rel * scale[..., None]
            frac = f - jnp.floor(f)
            coeffs = jax.lax.bitcast_convert_type(
                row[..., 2 : 2 + num_coeff], jnp.float32
            )
            if interpolation == "tricubic":
                d_in = tricubic_interpolate(coeffs, frac)
            else:
                d_in = trilinear_interpolate(coeffs, frac)

            center = box_min + 0.5 * box_size
            size3 = jnp.full((3,), box_size, pts.dtype)
            take = mine | (~in_box & (k == 0))
            if with_gradient:
                if interpolation == "tricubic":
                    g_in = tricubic_gradient(coeffs, frac)
                else:
                    g_in = trilinear_gradient(coeffs, frac)
                norm = jnp.sqrt(
                    jnp.sum(g_in * g_in, axis=-1, keepdims=True)
                )
                g_in = g_in / jnp.maximum(norm, 1e-30)
                d_out, g_out = box_distance_gradient(pts, center, size3)
                d = jnp.where(in_box, d_in, d_out + min_border_value)
                gr = jnp.where(in_box[..., None], g_in, g_out)
                return (
                    jax.lax.psum(jnp.where(take, d, 0.0), RAY_AXIS),
                    jax.lax.psum(
                        jnp.where(take[..., None], gr, 0.0), RAY_AXIS
                    ),
                )
            d_out = box_distance(pts, center, size3)
            d = jnp.where(in_box, d_in, d_out + min_border_value)
            return jax.lax.psum(jnp.where(take, d, 0.0), RAY_AXIS)

        fn = jax.shard_map(
            body,
            mesh=self.device_mesh,
            in_specs=(P(RAY_AXIS), P()),
            out_specs=(P(), P()) if with_gradient else P(),
        )
        return jax.jit(fn)

    def get_distance(self, points):
        pts = jnp.asarray(points, jnp.float32)
        flat = jax.device_put(pts.reshape(-1, 3), self._rep)
        return self._query_fn(self.fat_grid, flat).reshape(pts.shape[:-1])

    def get_distance_and_gradient(self, points):
        if self._query_grad_fn is None:
            self._query_grad_fn = self._build_query_fn(with_gradient=True)
        pts = jnp.asarray(points, jnp.float32)
        flat = jax.device_put(pts.reshape(-1, 3), self._rep)
        d, g = self._query_grad_fn(self.fat_grid, flat)
        return d.reshape(pts.shape[:-1]), g.reshape(pts.shape[:-1] + (3,))

    def get_sample_area(self) -> BoundingBox:
        return self.box

    def get_format(self) -> SdfFormat:
        return SdfFormat.OCTREE_TILED

    def per_chip_grid_bytes(self) -> list[int]:
        n = self.device_mesh.devices.size
        return [int(np.prod(self.fat_grid.shape[1:])) * 4 * self.rows_per_chip] * n

    # -- serialization ------------------------------------------------------

    def _state_arrays(self) -> dict:
        return {
            "box_min": np.asarray(self.box.min, np.float32),
            "box_max": np.asarray(self.box.max, np.float32),
            "max_depth": np.int32(self.max_depth),
            "interpolation": np.array(self.interpolation),
            "min_border_value": np.float32(self.min_border_value),
            "value_range": np.float32(self.value_range),
            "fat_grid": np.asarray(jax.device_get(self.fat_grid)),
        }

    def _load_state(self, state: dict, device_mesh=None) -> None:
        self.device_mesh = default_mesh() if device_mesh is None else device_mesh
        self.box = BoundingBox(state["box_min"], state["box_max"])
        self.max_depth = int(state["max_depth"])
        self.interpolation = str(state["interpolation"])
        self.num_coeff = 64 if self.interpolation == "tricubic" else 8
        self.min_border_value = float(state["min_border_value"])
        self.value_range = float(state["value_range"])
        self._shard_fat(np.asarray(state["fat_grid"]))

    @classmethod
    def _from_state_arrays(cls, state: dict) -> "TiledOctreeSdf":
        return cls(_state=state)
