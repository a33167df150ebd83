"""Per-stage attribution of the fused-pyramid sphere trace on the TPU
(VERDICT r5 task 2: 'where does the pyramid's win go?'). Times, in one
session: the beam prepass, the round-1 march at several block sizes, one
full-array 11-operand compaction sort, the normals query, and the whole
trace. Timing fences are scalar readbacks (CLAUDE.md).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def fence(x):
    import jax.numpy as jnp
    return float(jnp.sum(x if x.dtype != jnp.uint32 else x.astype(jnp.float32)))


def timeit(fn, iters=3):
    out = fn()
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    import jax
    import jax.numpy as jnp

    import importlib

    # render/__init__ re-exports the sphere_trace FUNCTION, which shadows
    # the submodule under plain `import ... as`
    st = importlib.import_module("sdflib_tpu.render.sphere_trace")
    from sdflib_tpu.sdf.sdf_function import SdfFunction

    cache = os.path.expanduser("~/.cache/sdflib_tpu/bench/torus_approx_d6.npz")
    oct_ = SdfFunction.load(cache)
    oct_.build_query_grid()

    R = 1024
    u = (np.arange(R, dtype=np.float32) + 0.5) / R - 0.5
    gu, gv = np.meshgrid(u, u)
    origins = np.stack([gu, gv, np.full_like(gu, -1.2)], -1).astype(np.float32)
    dirs = np.broadcast_to(np.array([0.0, 0.0, 1.0], np.float32),
                           origins.shape).copy()
    o = jnp.asarray(origins.reshape(-1, 3))
    d = jnp.asarray(dirs.reshape(-1, 3))
    Rp = o.shape[0]

    grid = oct_._fat_grid
    box_min = jnp.asarray(oct_.box.min)
    box_size = jnp.float32(oct_.box.size[0])
    sgs = jnp.int32(oct_.start_grid_size)
    mbv = jnp.float32(oct_.min_border_value)
    eps = jnp.float32(1e-5)
    far = jnp.float32(4.0)
    statics = dict(
        levels=oct_.max_depth - oct_.start_depth,
        num_coeff=oct_.num_coefficients,
        interpolation=oct_.interpolation,
        grid_depth=oct_.max_depth, fast=oct_._fast_layout, grid_fat=True,
    )
    out = {}

    # --- beam prepass ------------------------------------------------------
    bb = 16
    seg = jnp.asarray(np.arange(Rp) // bb, jnp.int32)
    ntiles = Rp // bb
    o_c, d_c, r0, rd = st._beam_setup_jit(o, d, seg, ntiles=ntiles)
    thr = float(getattr(oct_, "termination_threshold", 1e-3))
    margin = jnp.float32(1e-5 * float(box_size) + 4.0 * thr)

    def beam():
        t = st._beam_prepass_jit(
            oct_.octree_data, grid, o_c, d_c, r0, rd,
            box_min, box_size, sgs, mbv, margin,
            far * box_size, max_iters=256, **statics)
        fence(t)
        return t

    out["beam_prepass_ms"] = timeit(beam) * 1e3

    # --- round-1 march (8 fixed trips over all rays) at several B ----------
    state0 = (o, jnp.zeros(Rp, jnp.float32), jnp.full(Rp, jnp.inf),
              jnp.ones(Rp, jnp.float32))

    for B in (1 << 17, 1 << 18, 1 << 19, 1 << 20):
        nb = Rp // B

        @jax.jit
        def march_blocks(stt, dd):
            def blk(args):
                s, db = args
                return st._march_state_jit(
                    oct_.octree_data, grid, s, db, box_min, box_size,
                    sgs, mbv, eps, far, max_iters=8, fixed_trips=True,
                    **statics)

            its, head = jax.lax.map(
                blk,
                (jax.tree.map(lambda a: a.reshape((nb, B) + a.shape[1:]), stt),
                 dd.reshape(nb, B, 3)))
            return head[1]

        f = lambda: (lambda x: (fence(x), x)[1])(march_blocks(state0, d))
        out[f"round1_8it_B{B}_ms"] = timeit(f) * 1e3

    # --- one full-array 11-operand compaction sort --------------------------
    @jax.jit
    def compact(stt, dd, perm):
        pos, acc, last_d, active = stt
        key = (active <= 0).astype(jnp.int32)
        outs = jax.lax.sort(
            (key, pos[:, 0], pos[:, 1], pos[:, 2], acc, last_d, active,
             dd[:, 0], dd[:, 1], dd[:, 2], perm), num_keys=1, is_stable=True)
        return outs[1]

    perm = jnp.arange(Rp)
    f = lambda: (lambda x: (fence(x), x)[1])(compact(state0, d, perm))
    out["compact_sort_full_ms"] = timeit(f) * 1e3

    # --- normals (fat-grid gradient query, production config) ---------------
    @jax.jit
    def normals(p):
        _, g = st._octree_query_grid(
            oct_.octree_data, grid, p, box_min, box_size, mbv,
            grid_depth=oct_.max_depth, num_coeff=oct_.num_coefficients,
            interpolation=oct_.interpolation, with_gradient=True,
            grid_fat=True)
        return g

    f = lambda: (lambda x: (fence(x), x)[1])(normals(o))
    out["normals_ms"] = timeit(f) * 1e3

    # --- whole trace (reference point) --------------------------------------
    from sdflib_tpu.render.sphere_trace import trace_octree

    def whole():
        res = trace_octree(oct_, origins, dirs, max_iters=1024)
        fence(res.depth)
        return res.depth

    out["whole_trace_ms"] = timeit(whole) * 1e3
    out["whole_trace_rays_per_s"] = Rp / (out["whole_trace_ms"] / 1e3)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
