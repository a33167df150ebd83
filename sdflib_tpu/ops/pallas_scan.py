"""Pallas TPU kernel for the exact-octree grouped candidate scan.

The XLA scan (`sdf/exact_octree._exact_scan_grouped`) pays two structural
costs on this hardware:

* the early-exit ``while_loop`` serializes gather -> eval -> next gather
  (measured ~3.5x the cost of the same work with carry-independent
  gathers, PERF.md §1), and
* early exit is BLOCK-granular: one fat-list group keeps its whole
  NB-group block iterating.

This kernel re-states the scan as slab streaming: groups arrive sorted by
leaf id, and the CSR bucket table is laid out in leaf order, so a block of
GB consecutive groups touches one CONTIGUOUS range of bucket rows. Each
grid step DMAs that block's row range from HBM into VMEM in H-row slabs
(one descriptor per slab — per-(group, chunk) row DMAs would be issue-
bound at ~500k descriptors per query) and every group then scans exactly
``ceil(count/CH)`` chunks out of VMEM — per-GROUP bounds, no while loop,
no per-lane dynamic gather (the CLAUDE.md Mosaic limit: rows are selected
by a scalar loop index, and the G x CH eval is a dense vector op).

The eval reuses ``sq_dist_from_vertex_cols`` — the same exact
region-classified kernel (TriangleUtils.h:76-135 semantics) as every
other path, deriving frames on the fly from the 9-float vertex-format
bucket rows.

Reference role: ExactOctreeSdf.cpp:105-175 (the per-leaf candidate loop).
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .point_triangle import sq_dist_from_vertex_cols

__all__ = ["exact_scan_grouped_pallas"]


def _scan_kernel(
    # scalar prefetch
    row0_ref,      # (NBLK,) int32: first bucket row of each block's span
    nrow_ref,      # (NBLK,) int32: rows in each block's span
    # blocked VMEM inputs (points TRANSPOSED: lane-sliced per group
    # without a per-group sublane<->lane relayout)
    gx_ref,        # (G, GB)
    gy_ref,
    gz_ref,
    b0_ref,        # (GB, 1) int32 per-group first bucket row
    nc_ref,        # (GB, 1) int32 per-group chunk count
    # HBM
    ids_hbm,       # (NBp, CH) int32
    fld_hbm,       # (NBp, 9*CH) f32
    # output
    win_ref,       # (GB, G) int32
    # scratch (double-buffered slabs)
    ids_a, ids_b,  # (H, CH) int32
    fld_a, fld_b,  # (H, 9*CH) f32
    best_ref,      # (GB, G) f32
    sem,           # (2, 2) DMA semaphores [buffer][ids/fld]
    *,
    H: int,
    GB: int,
    CH: int,
):
    b = pl.program_id(0)
    row0 = row0_ref[b]
    nrow = nrow_ref[b]
    nslab = pl.cdiv(nrow, H)
    bufs = ((ids_a, fld_a), (ids_b, fld_b))

    best_ref[:] = jnp.full_like(best_ref, jnp.inf)
    win_ref[:] = jnp.zeros_like(win_ref)

    def _base(s):
        # The physical fetch base is clamped so the fixed-size H-row DMA
        # never runs past the table (rows are padded to a multiple of H by
        # the bucket build, so NBp - H >= 0); group chunk bounds stay in
        # LOGICAL row coordinates and always land inside the clamped
        # window because every span ends at or before NBp.
        lo = row0 + s * H
        return lo, jnp.minimum(lo, jnp.int32(ids_hbm.shape[0] - H))

    def _dmas(s, k):
        lo_c = _base(s)[1]
        ids_v, fld_v = bufs[k]
        return (
            pltpu.make_async_copy(
                ids_hbm.at[pl.ds(lo_c, H)], ids_v, sem.at[k, 0]
            ),
            pltpu.make_async_copy(
                fld_hbm.at[pl.ds(lo_c, H)], fld_v, sem.at[k, 1]
            ),
        )

    @pl.when(nslab > 0)
    def _():
        for d in _dmas(0, 0):
            d.start()

    def _process(s, ids_vmem, fld_vmem):
        lo, lo_c = _base(s)
        hi = lo + H

        def group_body(g, _):
            b0 = b0_ref[g, 0]
            nc = nc_ref[g, 0]
            c_lo = jnp.maximum(b0, lo)
            c_hi = jnp.minimum(b0 + nc, hi)

            px = gx_ref[:, pl.ds(g, 1)]          # (G, 1) column slice
            py = gy_ref[:, pl.ds(g, 1)]
            pz = gz_ref[:, pl.ds(g, 1)]

            def chunk_body(c, carry):
                bst, wid = carry                  # (1, G) running min/id
                j = c - lo_c
                row = fld_vmem[pl.ds(j, 1), :]    # (1, 9*CH)
                tid = ids_vmem[pl.ds(j, 1), :]    # (1, CH)
                sqd = sq_dist_from_vertex_cols(
                    px, py, pz,
                    lambda r: row[:, r * CH:(r + 1) * CH],
                )                                 # (G, CH)
                sqd = jnp.where(tid >= 0, sqd, jnp.inf)
                loc = jnp.min(sqd, axis=1)[None, :]            # (1, G)
                am = jnp.argmin(sqd, axis=1)                   # (G,)
                oh = (
                    jax.lax.broadcasted_iota(jnp.int32, sqd.shape, 1)
                    == am[:, None]
                )
                lid = jnp.sum(jnp.where(oh, tid, 0), axis=1)[None, :]
                take = loc < bst
                return (
                    jnp.where(take, loc, bst),
                    jnp.where(take, lid, wid),
                )

            bst0 = best_ref[pl.ds(g, 1), :]
            wid0 = win_ref[pl.ds(g, 1), :]
            bst, wid = jax.lax.fori_loop(
                c_lo, c_hi, chunk_body, (bst0, wid0)
            )
            best_ref[pl.ds(g, 1), :] = bst
            win_ref[pl.ds(g, 1), :] = wid
            return 0

        jax.lax.fori_loop(0, GB, group_body, 0)

    def slab_body(s, _):
        parity = jax.lax.rem(s, 2)
        # start the NEXT slab's fetch before waiting on this one: the
        # ping-pong buffer hides the DMA behind this slab's group scans
        for k in (0, 1):
            @pl.when((parity == k) & (s + 1 < nslab))
            def _():
                for d in _dmas(s + 1, 1 - k):
                    d.start()

            @pl.when(parity == k)
            def _():
                for d in _dmas(s, k):
                    d.wait()
                _process(s, *bufs[k])
        return 0

    jax.lax.fori_loop(0, nslab, slab_body, 0)


@partial(
    jax.jit,
    static_argnames=("GB", "H", "interpret"),
)
def exact_scan_grouped_pallas(
    bucket_ids,    # (NB, CH) int32
    bucket_fields, # (NB, 9*CH) f32 vertex-format rows
    gpts,          # (NG, G, 3) grouped points (one leaf per group)
    gleaf,         # (NG,) leaf id per group
    bucket_row0,   # (L,) first bucket ROW of each leaf
    leaf_count,    # (L,)
    *,
    GB: int = 256,
    H: int = 256,
    interpret: bool = False,
):
    """Winner triangle ids (NG, G) for leaf-grouped points.

    Exact per-group chunk bounds (no early exit: the distance-sorted
    early-exit bound typically saves ~0.5 chunks/group, less than the
    while-loop serialization it costs). Empty groups (count 0) write id 0
    and are masked by the caller's slot validity.

    Both bucket tables must be row-padded to a multiple of ``H`` by the
    CALLER (the exact-octree build does this once): padding here would
    copy the multi-GB tables inside every query program.
    """
    NG, G, _ = gpts.shape
    CH = bucket_ids.shape[1]
    nf = bucket_fields.shape[1] // CH
    assert nf == 9, "pallas scan requires vertex-format buckets"
    assert NG % GB == 0
    assert bucket_ids.shape[0] % H == 0, "bucket rows must be H-padded"
    NBLK = NG // GB

    bucket0 = bucket_row0[gleaf].astype(jnp.int32)
    nchunk = -(-leaf_count[gleaf] // CH)
    # gleaf of empty padding groups is 0 (leaf 0's rows): harmless reads,
    # masked winners; keep their spans zero so block row ranges stay tight.
    has_pts = jnp.any(jnp.isfinite(gpts[..., 0]), axis=1)
    nchunk = jnp.where(has_pts, nchunk, 0).astype(jnp.int32)

    # Per-block contiguous row span (groups are leaf-sorted so bucket0 is
    # non-decreasing over non-empty groups).
    b0_blk = bucket0.reshape(NBLK, GB)
    nc_blk = nchunk.reshape(NBLK, GB)
    lo_blk = jnp.min(
        jnp.where(nc_blk > 0, b0_blk, jnp.int32(2**30)), axis=1
    )
    hi_blk = jnp.max(jnp.where(nc_blk > 0, b0_blk + nc_blk, 0), axis=1)
    row0 = jnp.minimum(lo_blk, jnp.int32(bucket_ids.shape[0]))
    nrow = jnp.maximum(hi_blk - row0, 0).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(NBLK,),
        in_specs=[
            pl.BlockSpec((G, GB), lambda b, *_: (0, b)),
            pl.BlockSpec((G, GB), lambda b, *_: (0, b)),
            pl.BlockSpec((G, GB), lambda b, *_: (0, b)),
            pl.BlockSpec((GB, 1), lambda b, *_: (b, 0)),
            pl.BlockSpec((GB, 1), lambda b, *_: (b, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((GB, G), lambda b, *_: (b, 0)),
        scratch_shapes=[
            pltpu.VMEM((H, CH), jnp.int32),
            pltpu.VMEM((H, CH), jnp.int32),
            pltpu.VMEM((H, nf * CH), jnp.float32),
            pltpu.VMEM((H, nf * CH), jnp.float32),
            pltpu.VMEM((GB, G), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    kernel = partial(_scan_kernel, H=H, GB=GB, CH=CH)
    # points with +inf padding slots would poison the eval -> sanitize;
    # transposed ONCE here (one XLA pass) so the kernel's per-group fetch
    # is a plain lane slice
    gx = jnp.nan_to_num(gpts[..., 0], posinf=0.0).T
    gy = jnp.nan_to_num(gpts[..., 1], posinf=0.0).T
    gz = jnp.nan_to_num(gpts[..., 2], posinf=0.0).T
    win = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((NG, G), jnp.int32),
        interpret=interpret,
    )(
        row0, nrow,
        gx, gy, gz,
        bucket0[:, None], nchunk[:, None],
        bucket_ids, bucket_fields,
    )
    return win
