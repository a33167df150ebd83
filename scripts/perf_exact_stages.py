"""Per-stage ablation of the fused exact query on the real TPU.

Builds jitted prefix-programs of the query pipeline and times each, so the
incremental cost of every stage is measured in THIS session (tunnel
weather makes cross-session comparisons invalid, CLAUDE.md).
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from functools import partial

from perf_exact import get_structure  # noqa: E402  (same scripts dir)


def timeit(fn, *args, iters=5):
    import jax.numpy as jnp
    out = fn(*args)
    # force: scalar readback on first leaf
    leaf = out[0] if isinstance(out, tuple) else out
    float(jnp.sum(leaf.astype(jnp.float32)))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        leaf = out[0] if isinstance(out, tuple) else out
        float(jnp.sum(leaf.astype(jnp.float32)))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    import jax
    import jax.numpy as jnp
    from sdflib_tpu.sdf import exact_octree as eo

    ex = get_structure(False)
    n = 1 << 21
    rng = np.random.default_rng(0)
    lo = np.asarray(ex.box.min) + 1e-4
    hi = np.asarray(ex.box.max) - 1e-4
    pts = jnp.asarray(rng.uniform(lo, hi, (n, 3)).astype(np.float32))

    box_min = jnp.asarray(ex.box.min)
    box_size = jnp.float32(ex.box.size[0])
    G = ex._pick_group_width(pts, n)
    L = int(ex.leaf_offset.shape[0])
    NG = eo._round_pow2(min(n, n // G + L), 64)
    CH = ex.scan_chunk
    max_cnt = int(np.max(np.asarray(ex.leaf_count), initial=1))
    max_chunks = -(-max_cnt // CH)
    NB = 64
    while NB * 2 * G * CH <= ex._GROUP_PAIR_BUDGET:
        NB *= 2
    NB = min(NB, NG)
    print(f"G={G} NG={NG} NB={NB} CH={CH} max_chunks={max_chunks} L={L}")

    gd = ex.max_depth

    @jax.jit
    def s1_descent(p):
        return eo._exact_descent_grid(
            ex._leaf_grid, p, box_min, box_size, grid_depth=gd
        )[0]

    @jax.jit
    def s2_argsort(p):
        lid, _ = eo._exact_descent_grid(
            ex._leaf_grid, p, box_min, box_size, grid_depth=gd
        )
        return jnp.argsort(lid)

    @jax.jit
    def s3_permute(p):
        lid, _ = eo._exact_descent_grid(
            ex._leaf_grid, p, box_min, box_size, grid_depth=gd
        )
        order = jnp.argsort(lid)
        return p[order], lid[order]

    @jax.jit
    def s3b_lax_sort(p):
        lid, _ = eo._exact_descent_grid(
            ex._leaf_grid, p, box_min, box_size, grid_depth=gd
        )
        iota = jnp.arange(p.shape[0], dtype=jnp.int32)
        lid_s, xs, ys, zs, order = jax.lax.sort(
            (lid, p[:, 0], p[:, 1], p[:, 2], iota), num_keys=1
        )
        return xs, lid_s, order

    @jax.jit
    def s4_groups(p):
        lid, _ = eo._exact_descent_grid(
            ex._leaf_grid, p, box_min, box_size, grid_depth=gd
        )
        order = jnp.argsort(lid)
        pts_s = p[order]
        lid_s = lid[order]
        gid, lane = eo._assign_groups(lid_s, G=G)
        return eo._scatter_groups(pts_s, lid_s, gid, lane, G=G, NG=NG)[0]

    @jax.jit
    def s5_scan(p):
        lid, _ = eo._exact_descent_grid(
            ex._leaf_grid, p, box_min, box_size, grid_depth=gd
        )
        order = jnp.argsort(lid)
        pts_s = p[order]
        lid_s = lid[order]
        gid, lane = eo._assign_groups(lid_s, G=G)
        gpts, gvalid, gleaf, slot = eo._scatter_groups(
            pts_s, lid_s, gid, lane, G=G, NG=NG
        )

        def blk(args):
            bp, bv, bl = args
            return eo._exact_scan_grouped(
                ex.bucket_row0, ex.leaf_count, ex.leaf_centers,
                ex.bucket_ids, ex.bucket_fields, ex.bucket_cmin,
                bp, bv, bl,
                max_chunks=max_chunks, early_exit=True,
                prologue=ex._scan_prologue,
            )

        nblocks = NG // NB
        wins, _ = jax.lax.map(
            blk,
            (
                gpts.reshape(nblocks, NB, G, 3),
                gvalid.reshape(nblocks, NB, G),
                gleaf.reshape(nblocks, NB),
            ),
        )
        return wins.reshape(-1)[slot]

    @jax.jit
    def s5p_scan_pallas(p):
        lid, _ = eo._exact_descent_grid(
            ex._leaf_grid, p, box_min, box_size, grid_depth=gd
        )
        iota = jnp.arange(p.shape[0], dtype=jnp.int32)
        lid_s, xs, ys, zs, order = jax.lax.sort(
            (lid, p[:, 0], p[:, 1], p[:, 2], iota), num_keys=1
        )
        pts_s = jnp.stack([xs, ys, zs], axis=-1)
        gid, lane = eo._assign_groups(lid_s, G=G)
        gpts, gvalid, gleaf, slot = eo._scatter_groups(
            pts_s, lid_s, gid, lane, G=G, NG=NG
        )
        from sdflib_tpu.ops.pallas_scan import exact_scan_grouped_pallas

        wins = exact_scan_grouped_pallas(
            ex.bucket_ids, ex.bucket_fields, gpts, gleaf,
            ex.bucket_row0, ex.leaf_count,
            GB=min(256, NG), H=eo._PALLAS_SLAB,
        )
        return wins.reshape(-1)[slot]

    @jax.jit
    def s5w_scan_window(p):
        lid, _ = eo._exact_descent_grid(
            ex._leaf_grid, p, box_min, box_size, grid_depth=gd
        )
        iota = jnp.arange(p.shape[0], dtype=jnp.int32)
        lid_s, xs, ys, zs, order = jax.lax.sort(
            (lid, p[:, 0], p[:, 1], p[:, 2], iota), num_keys=1
        )
        pts_s = jnp.stack([xs, ys, zs], axis=-1)
        from sdflib_tpu.ops.pallas_scan import exact_scan_window_pallas

        b0_pt = ex.bucket_row0[lid_s].astype(jnp.int32)
        nc_pt = (-(-ex.leaf_count[lid_s] // CH)).astype(jnp.int32)
        wins = exact_scan_window_pallas(
            ex.bucket_ids, ex.bucket_fields, pts_s, b0_pt, nc_pt,
            G=G, H=eo._PALLAS_SLAB,
        )
        return wins.reshape(-1)

    # --- XLA window-scan path (the r4 default impl) ----------------------
    # Uses the PACKED grid: descent's gather returns (row0<<shift)|nchunks.
    try:
        ex.set_scan_impl("xla_window")
    except ValueError:
        pass
    WG = int(getattr(ex, "window_width", 16))
    shift = ex._scan_pack_shift
    WNB = 64
    while WNB * 2 * WG * CH <= ex._GROUP_PAIR_BUDGET:
        WNB *= 2
    WNB = min(WNB, n // WG)
    pgrid = ex._leaf_grid_packed

    def _window_prefix(p, run_scan: bool):
        pk, _ = eo._exact_descent_grid(
            pgrid, p, box_min, box_size, grid_depth=gd
        )
        iota = jnp.arange(p.shape[0], dtype=jnp.int32)
        pk_s, xs, ys, zs, order = jax.lax.sort(
            (pk, p[:, 0], p[:, 1], p[:, 2], iota), num_keys=1
        )
        if not run_scan:
            return xs, pk_s, order
        pts_s = jnp.stack([xs, ys, zs], axis=-1)
        b0_pt = (pk_s >> shift).astype(jnp.int32)
        nc_pt = (pk_s & ((1 << shift) - 1)).astype(jnp.int32)
        NW = pts_s.shape[0] // WG
        nblocks = max(1, NW // WNB)

        def wblk(args):
            bp, bb0, bnc = args
            return eo._exact_scan_window_xla(
                ex.bucket_ids, ex.bucket_fields, bp, bb0, bnc,
                max_iters=WG * max_chunks, prologue=ex._scan_prologue,
            )

        wins = jax.lax.map(
            wblk,
            (
                pts_s.reshape(nblocks, -1, WG, 3),
                b0_pt.reshape(nblocks, -1, WG),
                nc_pt.reshape(nblocks, -1, WG),
            ),
        )
        return pts_s, wins.reshape(-1), order

    @jax.jit
    def s3w_sort_packed(p):
        return _window_prefix(p, run_scan=False)

    @jax.jit
    def s5wx_scan_window_xla(p):
        return _window_prefix(p, run_scan=True)[1]

    @jax.jit
    def s6w_finish_window(p):
        pts_s, win_s, order = _window_prefix(p, run_scan=True)
        rel = (pts_s - box_min) / box_size
        in_box_s = jnp.all((rel >= 0.0) & (rel < 1.0), axis=-1)
        out_s = eo._exact_finish(
            ex.triangles, pts_s, win_s, in_box_s, box_min, box_size,
            with_gradient=False,
        )
        _, d = jax.lax.sort((order, out_s), num_keys=1)
        return d

    @jax.jit
    def s6_finish(p):
        lid, _ = eo._exact_descent_grid(
            ex._leaf_grid, p, box_min, box_size, grid_depth=gd
        )
        order = jnp.argsort(lid)
        pts_s = p[order]
        lid_s = lid[order]
        gid, lane = eo._assign_groups(lid_s, G=G)
        gpts, gvalid, gleaf, slot = eo._scatter_groups(
            pts_s, lid_s, gid, lane, G=G, NG=NG
        )

        def blk(args):
            bp, bv, bl = args
            return eo._exact_scan_grouped(
                ex.bucket_row0, ex.leaf_count, ex.leaf_centers,
                ex.bucket_ids, ex.bucket_fields, ex.bucket_cmin,
                bp, bv, bl,
                max_chunks=max_chunks, early_exit=True,
                prologue=ex._scan_prologue,
            )

        nblocks = NG // NB
        wins, _ = jax.lax.map(
            blk,
            (
                gpts.reshape(nblocks, NB, G, 3),
                gvalid.reshape(nblocks, NB, G),
                gleaf.reshape(nblocks, NB),
            ),
        )
        win_s = wins.reshape(-1)[slot]
        rel = (pts_s - box_min) / box_size
        in_box_s = jnp.all((rel >= 0.0) & (rel < 1.0), axis=-1)
        return eo._exact_finish(
            ex.triangles, pts_s, win_s, in_box_s, box_min, box_size,
            with_gradient=False,
        )

    full = partial(ex.get_distance)

    def try_timeit(name, fn, *args):
        try:
            t = timeit(fn, *args)
            print(f"  [{name}: {t*1e3:.1f} ms]", flush=True)
            return t
        except Exception as e:
            print(f"  [{name} failed: {repr(e)[:160]}]", flush=True)
            return float("nan")

    with_pallas = os.environ.get("SDFLIB_STAGES_PALLAS", "1") != "0"
    with_grouped = os.environ.get("SDFLIB_STAGES_GROUPED", "1") != "0"
    t1 = try_timeit("descent", s1_descent, pts)
    tw3 = try_timeit("sort_packed(win)", s3w_sort_packed, pts)
    tw5 = try_timeit("window_scan_xla", s5wx_scan_window_xla, pts)
    tw6 = try_timeit("window_finish", s6w_finish_window, pts)
    twf = try_timeit("window_full", full, pts)
    print("--- xla_window path ---")
    print(f"descent                  {t1*1e3:7.1f} ms")
    print(f"+packed sort             {tw3*1e3:7.1f} ms  (+{(tw3-t1)*1e3:.1f})")
    print(f"+window scan (xla)       {tw5*1e3:7.1f} ms  (+{(tw5-tw3)*1e3:.1f})")
    print(f"+finish+unsort           {tw6*1e3:7.1f} ms  (+{(tw6-tw5)*1e3:.1f})")
    print(f"full query               {twf*1e3:7.1f} ms  (+{(twf-tw6)*1e3:.1f})")
    if not with_grouped:
        return
    t2 = try_timeit("argsort", s2_argsort, pts)
    t3 = try_timeit("permute", s3_permute, pts)
    t3b = try_timeit("lax_sort", s3b_lax_sort, pts)
    t4 = try_timeit("groups", s4_groups, pts)
    t5 = try_timeit("scan", s5_scan, pts)
    if with_pallas:
        t5p = try_timeit("scan_pallas", s5p_scan_pallas, pts)
        t5w = try_timeit("scan_window", s5w_scan_window, pts)
    else:
        t5p = t5w = float("nan")
    t6 = try_timeit("finish", s6_finish, pts)
    t7 = try_timeit("full", full, pts)

    print(f"descent                  {t1*1e3:7.1f} ms")
    print(f"+argsort                 {t2*1e3:7.1f} ms  (+{(t2-t1)*1e3:.1f})")
    print(f"+permute                 {t3*1e3:7.1f} ms  (+{(t3-t2)*1e3:.1f})")
    print(f"descent+lax.sort(5 ops)  {t3b*1e3:7.1f} ms  (vs permute path {t3*1e3:.1f})")
    print(f"+groups+scatter          {t4*1e3:7.1f} ms  (+{(t4-t3)*1e3:.1f})")
    print(f"+scan+slotgather  (xla)  {t5*1e3:7.1f} ms  (+{(t5-t4)*1e3:.1f})")
    print(f"+scan+slotgather (plls)  {t5p*1e3:7.1f} ms  (scan delta +{(t5p-t4)*1e3:.1f})")
    print(f"sort+WINDOW scan (plls)  {t5w*1e3:7.1f} ms  (vs grouped pallas {t5p*1e3:.1f})")
    print(f"+finish(sorted)          {t6*1e3:7.1f} ms  (+{(t6-t5)*1e3:.1f})")
    print(f"full query (unsorted out){t7*1e3:7.1f} ms  (+{(t7-t6)*1e3:.1f})")


if __name__ == "__main__":
    main()
