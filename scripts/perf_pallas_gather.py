"""Microbenchmark: Pallas per-row DMA fetch vs XLA row gather.

The exact-query scan's hot operation is "fetch ONE bucket row per group
per chunk and reduce it". VERDICT r2 asked whether a Pallas kernel using
scalar-prefetched row indices (per-GROUP block DMA, not the per-lane
tpu.dynamic_gather CLAUDE.md rules out) can beat the XLA gather engine
(measured 45-95 M rows/s). This isolates exactly that: given (N,) row
ids into a (NB, W) f32 table, fetch each row and emit its min.

Two Pallas variants:
  * block-indexed: PrefetchScalarGridSpec index_map selects the row per
    grid step (1 row per step, Mosaic pipelines the block DMAs).
  * manual-dma: grid over tiles of T rows; per step issues T row DMAs
    into VMEM scratch (double-buffered across the grid), then reduces.

Result recorded in PERF.md; decides whether the grouped scan moves to
Pallas or stays in XLA.
"""
from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(fn, *args, iters=5):
    out = fn(*args)
    float(jnp.sum(out))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.sum(out))
        ts.append(time.perf_counter() - t0)
    return min(ts)


# ---------------------------------------------------------------- XLA gather
@jax.jit
def xla_gather_min(table, rows):
    return jnp.min(table[rows], axis=-1)


# ------------------------------------------------- Pallas block-indexed rows
def _blk_kernel(rows_ref, table_blk, out_ref):
    out_ref[0, 0] = jnp.min(table_blk[0, :])


@functools.partial(jax.jit, static_argnames=("w",))
def pallas_block_min(table, rows, *, w):
    n = rows.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, w), lambda i, rows_ref: (rows_ref[i], 0)),
        ],
        out_specs=pl.BlockSpec((1, 1), lambda i, rows_ref: (i, 0)),
    )
    out = pl.pallas_call(
        _blk_kernel,
        out_shape=jax.ShapeDtypeStruct((n, 1), table.dtype),
        grid_spec=grid_spec,
    )(rows, table)
    return out[:, 0]


# --------------------------------------------- Pallas manual-DMA row tiles
def _dma_kernel(rows_ref, table_hbm, out_ref, scratch, sems, *, tile, w):
    t0 = pl.program_id(0) * tile

    def issue(k, _):
        r = rows_ref[t0 + k]
        pltpu.make_async_copy(
            table_hbm.at[r], scratch.at[k], sems.at[k]
        ).start()
        return 0

    jax.lax.fori_loop(0, tile, issue, 0)

    def waitall(k, _):
        r = rows_ref[t0 + k]
        pltpu.make_async_copy(
            table_hbm.at[r], scratch.at[k], sems.at[k]
        ).wait()
        return 0

    jax.lax.fori_loop(0, tile, waitall, 0)
    out_ref[:, 0] = jnp.min(scratch[:, :], axis=-1)


@functools.partial(jax.jit, static_argnames=("tile", "w"))
def pallas_dma_min(table, rows, *, tile, w):
    n = rows.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n // tile,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((tile, 1), lambda i, rows_ref: (i, 0)),
        scratch_shapes=[
            pltpu.VMEM((tile, w), jnp.float32),
            pltpu.SemaphoreType.DMA((tile,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_dma_kernel, tile=tile, w=w),
        out_shape=jax.ShapeDtypeStruct((n, 1), table.dtype),
        grid_spec=grid_spec,
    )(rows, table)
    return out[:, 0]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nb", type=int, default=1 << 19, help="table rows")
    ap.add_argument("--w", type=int, default=512, help="row width (f32)")
    ap.add_argument("--n", type=int, default=1 << 19, help="fetches")
    ap.add_argument("--tile", type=int, default=512)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    table = jnp.asarray(
        rng.standard_normal((args.nb, args.w), dtype=np.float32)
    )
    rows = jnp.asarray(
        rng.integers(0, args.nb, args.n).astype(np.int32)
    )

    ref = np.asarray(xla_gather_min(table, rows))

    t_x = timeit(xla_gather_min, table, rows)
    print(f"xla gather : {t_x*1e3:8.2f} ms  {args.n/t_x/1e6:7.1f} M rows/s")

    try:
        got = np.asarray(pallas_block_min(table, rows, w=args.w))
        assert np.allclose(got, ref), "block kernel wrong"
        t_b = timeit(lambda t, r: pallas_block_min(t, r, w=args.w), table, rows)
        print(f"pallas blk : {t_b*1e3:8.2f} ms  {args.n/t_b/1e6:7.1f} M rows/s")
    except Exception as e:  # noqa: BLE001
        print(f"pallas blk : FAILED {type(e).__name__}: {str(e)[:200]}")

    try:
        got = np.asarray(pallas_dma_min(table, rows, tile=args.tile, w=args.w))
        assert np.allclose(got, ref), "dma kernel wrong"
        t_d = timeit(
            lambda t, r: pallas_dma_min(t, r, tile=args.tile, w=args.w),
            table, rows,
        )
        print(f"pallas dma : {t_d*1e3:8.2f} ms  {args.n/t_d/1e6:7.1f} M rows/s")
    except Exception as e:  # noqa: BLE001
        print(f"pallas dma : FAILED {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
