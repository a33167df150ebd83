"""Pallas TPU kernels for the exact-octree candidate scan.

The XLA scan (`sdf/exact_octree._exact_scan_grouped`) pays two structural
costs on this hardware:

* the early-exit ``while_loop`` serializes gather -> eval -> next gather
  (measured ~3.5x the cost of the same work with carry-independent
  gathers, PERF.md §1), and
* early exit is BLOCK-granular: one fat-list group keeps its whole
  NB-group block iterating.

The kernel re-states the scan as slab streaming: points arrive sorted by
leaf id, and the CSR bucket table is laid out in leaf order, so a block
of GB consecutive groups touches one CONTIGUOUS range of bucket rows.
Each grid step DMAs that block's row range from HBM into VMEM in
double-buffered H-row slabs (one descriptor per slab — per-(group, chunk)
row DMAs would be issue-bound at ~500k descriptors per query) and every
group then scans its chunk range out of VMEM with PER-POINT row bounds —
no while loop, no per-lane dynamic gather (the CLAUDE.md Mosaic limit:
rows are selected by a scalar loop index, and the G x CH eval is a dense
vector op).

Two grouping modes share the kernel:

* ``exact_scan_grouped_pallas`` — leaf-aligned (NG, G) groups from the
  fused query's scatter: every point in a group shares one leaf, so the
  per-point bounds are uniform within a group.
* ``exact_scan_window_pallas`` — FIXED G-point windows of the sorted
  order, no scatter/prefix-sum assembly at all: a window may straddle a
  few consecutive leaves, so its scan range is the union span and each
  point masks rows outside its own leaf (the per-point bounds do real
  work). Eliminates two full latency-bound batch passes at the price of
  boundary-crossing eval waste; A/B measured on hardware.

The eval reuses ``sq_dist_from_vertex_cols`` — the same exact
region-classified kernel (TriangleUtils.h:76-135 semantics) as every
other path, deriving frames on the fly from the 9-float vertex-format
bucket rows.

Reference role: ExactOctreeSdf.cpp:105-175 (the per-leaf candidate loop).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .point_triangle import sq_dist_from_vertex_cols

__all__ = ["exact_scan_grouped_pallas", "exact_scan_window_pallas"]


def _scan_kernel(
    # scalar prefetch
    row0_ref,      # (NBLK,) int32: first bucket row of each block's span
    nrow_ref,      # (NBLK,) int32: rows in each block's span
    # blocked VMEM inputs (all TRANSPOSED (G, GB): lane-sliced per group
    # without a per-group sublane<->lane relayout)
    gx_ref,        # (G, GB)
    gy_ref,
    gz_ref,
    b0_ref,        # (G, GB) int32 per-POINT first bucket row
    nc_ref,        # (G, GB) int32 per-POINT chunk count
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
            b0v = b0_ref[:, pl.ds(g, 1)]         # (G, 1) per-point bounds
            ncv = nc_ref[:, pl.ds(g, 1)]
            live = ncv > 0
            c_lo = jnp.maximum(
                jnp.min(jnp.where(live, b0v, jnp.int32(2**30))), lo
            )
            c_hi = jnp.minimum(jnp.max(jnp.where(live, b0v + ncv, 0)), hi)

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
                pvalid = (c >= b0v) & (c < b0v + ncv)          # (G, 1)
                sqd = jnp.where((tid >= 0) & pvalid, sqd, jnp.inf)
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


def _scan_call(
    bucket_ids, bucket_fields, gx, gy, gz, b0T, ncT,
    *, GB: int, H: int, interpret: bool,
):
    """Shared pallas_call: all point/bound arrays are transposed (G, NG).

    Both bucket tables must be row-padded to a multiple of ``H`` by the
    CALLER (the exact-octree build does this once): padding here would
    copy the multi-GB tables inside every query program.
    """
    G, NG = gx.shape
    CH = bucket_ids.shape[1]
    nf = bucket_fields.shape[1] // CH
    assert nf == 9, "pallas scan requires vertex-format buckets"
    assert NG % GB == 0
    assert bucket_ids.shape[0] % H == 0, "bucket rows must be H-padded"
    NBLK = NG // GB

    # Per-block contiguous row span (points are leaf-sorted so spans are
    # non-decreasing over live points).
    b0r = b0T.reshape(G, NBLK, GB)
    ncr = ncT.reshape(G, NBLK, GB)
    live = ncr > 0
    lo_blk = jnp.min(
        jnp.where(live, b0r, jnp.int32(2**30)), axis=(0, 2)
    )
    hi_blk = jnp.max(jnp.where(live, b0r + ncr, 0), axis=(0, 2))
    row0 = jnp.minimum(lo_blk, jnp.int32(bucket_ids.shape[0]))
    nrow = jnp.maximum(hi_blk - row0, 0).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(NBLK,),
        in_specs=[
            pl.BlockSpec((G, GB), lambda b, *_: (0, b)),
            pl.BlockSpec((G, GB), lambda b, *_: (0, b)),
            pl.BlockSpec((G, GB), lambda b, *_: (0, b)),
            pl.BlockSpec((G, GB), lambda b, *_: (0, b)),
            pl.BlockSpec((G, GB), lambda b, *_: (0, b)),
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
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((NG, G), jnp.int32),
        interpret=interpret,
    )(
        row0, nrow,
        gx, gy, gz, b0T, ncT,
        bucket_ids, bucket_fields,
    )


@partial(jax.jit, static_argnames=("GB", "H", "interpret"))
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
    """Winner triangle ids (NG, G) for leaf-aligned point groups.

    Exact per-group chunk bounds (no early exit: the distance-sorted
    early-exit bound typically saves ~0.5 chunks/group, less than the
    while-loop serialization it costs). Empty groups (count 0) write id 0
    and are masked by the caller's slot validity.
    """
    NG, G, _ = gpts.shape
    CH = bucket_ids.shape[1]

    bucket0 = bucket_row0[gleaf].astype(jnp.int32)
    nchunk = -(-leaf_count[gleaf] // CH)
    # Empty padding groups carry gleaf = 0 (the scatter decode clips the
    # +inf sentinel), so the gathers above read leaf 0's values —
    # harmless only because has_pts zeroes their chunk counts below,
    # which also keeps block row spans tight. Do not drop the mask.
    has_pts = jnp.any(jnp.isfinite(gpts[..., 0]), axis=1)
    nchunk = jnp.where(has_pts, nchunk, 0).astype(jnp.int32)

    # points with +inf padding slots would poison the eval -> sanitize;
    # transposed ONCE here (one XLA pass) so the kernel's per-group fetch
    # is a plain lane slice
    gx = jnp.nan_to_num(gpts[..., 0], posinf=0.0).T
    gy = jnp.nan_to_num(gpts[..., 1], posinf=0.0).T
    gz = jnp.nan_to_num(gpts[..., 2], posinf=0.0).T
    b0T = jnp.broadcast_to(bucket0[None, :], (G, NG))
    ncT = jnp.broadcast_to(nchunk[None, :], (G, NG))
    return _scan_call(
        bucket_ids, bucket_fields, gx, gy, gz, b0T, ncT,
        GB=GB, H=H, interpret=interpret,
    )


@partial(jax.jit, static_argnames=("G", "GB", "H", "interpret"))
def exact_scan_window_pallas(
    bucket_ids,    # (NB, CH) int32
    bucket_fields, # (NB, 9*CH) f32 vertex-format rows
    pts_s,         # (P, 3) points SORTED by leaf id
    b0_pt,         # (P,) int32 first bucket row of each point's leaf
    nc_pt,         # (P,) int32 chunk count of each point's leaf
    *,
    G: int,
    GB: int = 256,
    H: int = 256,
    interpret: bool = False,
):
    """Winner ids (P // G, G) for FIXED G-point windows of the sorted
    order — no group assembly: windows are plain reshapes, and
    ``wins.reshape(-1)`` is already in sorted point order. A window that
    straddles leaves scans the union of its member spans (contiguous by
    construction) with per-point masking."""
    P = pts_s.shape[0]
    assert P % G == 0
    NG = P // G
    gx = pts_s[:, 0].reshape(NG, G).T
    gy = pts_s[:, 1].reshape(NG, G).T
    gz = pts_s[:, 2].reshape(NG, G).T
    b0T = b0_pt.astype(jnp.int32).reshape(NG, G).T
    ncT = nc_pt.astype(jnp.int32).reshape(NG, G).T
    return _scan_call(
        bucket_ids, bucket_fields, gx, gy, gz, b0T, ncT,
        GB=min(GB, NG), H=H, interpret=interpret,
    )
