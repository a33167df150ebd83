"""Time the sphere tracer on the real TPU (VERDICT r2 item 4 harness).

Builds the bench torus octree (depth 6), then times a 1024x1024 frame
under the current schedule (beam prepass + leaf-box/free-radius exit
steps, render/sphere_trace.py), printing one JSON line with the rate and
the per-round (iters, marched, still_active) histogram. Timing fences
are scalar readbacks (CLAUDE.md: block_until_ready does not wait through
the axon tunnel).

Usage: python scripts/trace_bench.py [resolution=1024]
"""
import json
import sys
import time

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax.numpy as jnp

    from sdflib_tpu.render.sphere_trace import trace_octree
    from sdflib_tpu.sdf.octree import OctreeSdf
    from sdflib_tpu.utils.primitives import make_torus

    R = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    cache = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.expanduser("~/.cache/sdflib_tpu/bench/torus_approx_d6.npz")
    )
    t0 = time.perf_counter()
    if cache and os.path.exists(cache):
        from sdflib_tpu.sdf.sdf_function import SdfFunction

        oct_ = SdfFunction.load(cache)
        print(f"load: {time.perf_counter() - t0:.1f}s", flush=True)
    else:
        mesh = make_torus(R=0.3, r=0.12, nu=96, nv=48)
        box = mesh.bounding_box.add_margin(0.14)
        oct_ = OctreeSdf(
            mesh, box, max_depth=6, start_depth=2,
            termination_threshold=1e-3, init_algorithm="no_continuity",
        )
        print(f"build: {time.perf_counter() - t0:.1f}s", flush=True)
        if cache:
            os.makedirs(os.path.dirname(cache) or ".", exist_ok=True)
            oct_.save(cache)
    oct_.build_query_grid()

    u = (np.arange(R, dtype=np.float32) + 0.5) / R - 0.5
    gu, gv = np.meshgrid(u, u)
    origins = np.stack([gu, gv, np.full_like(gu, -1.2)], -1).astype(
        np.float32
    )
    dirs = np.broadcast_to(
        np.array([0.0, 0.0, 1.0], np.float32), origins.shape
    ).copy()

    # stage rays on device before timing (tunnel h2d is ~35 MB/s and not
    # the tracer; a fixed camera re-renders the same rays)
    origins = jnp.asarray(origins)
    dirs = jnp.asarray(dirs)
    float(jnp.sum(origins) + jnp.sum(dirs))
    stats: dict = {}
    res = trace_octree(oct_, origins, dirs, max_iters=1024, stats_out=stats)
    cks = float(jnp.sum(res.depth))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        res = trace_octree(oct_, origins, dirs, max_iters=1024)
        float(jnp.sum(res.depth))
        ts.append(time.perf_counter() - t0)
    best = min(ts)
    print(json.dumps({
        "rays_per_s": R * R / best,
        "best_ms": best * 1e3,
        "all_ms": [round(t * 1e3, 1) for t in ts],
        "hit_frac": float(jnp.mean(res.hit.astype(jnp.float32))),
        "mean_iters": float(jnp.mean(res.iterations.astype(jnp.float32))),
        "checksum_depth": cks,
        "rounds": stats.get("rounds"),
    }), flush=True)


if __name__ == "__main__":
    main()
