"""Exact-query perf harness (real TPU). Builds the bench torus structure
once, caches it to /tmp/ex_torus.npz, then times the 2M-point query.

Usage: python scripts/perf_exact.py [--rebuild] [--iters N] [--points LOG2]

Timing fences are scalar readbacks (block_until_ready does not wait
through the axon tunnel, CLAUDE.md); the ~20-26 ms host round trip floor
is included in every measurement, matching bench.py's methodology.
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CACHE = "/tmp/ex_torus.npz"


def get_structure(rebuild: bool):
    from sdflib_tpu.sdf.exact_octree import ExactOctreeSdf
    if rebuild or not os.path.exists(CACHE):
        from sdflib_tpu.utils.primitives import make_torus
        mesh = make_torus(R=0.3, r=0.12, nu=96, nv=48)
        box = mesh.bounding_box.add_margin(0.14)
        t0 = time.perf_counter()
        ex = ExactOctreeSdf(
            mesh, box, max_depth=6, start_depth=2, min_triangles_per_node=32
        )
        print(f"build: {time.perf_counter() - t0:.1f}s", file=sys.stderr)
        ex.save(CACHE)
        return ex
    t0 = time.perf_counter()
    from sdflib_tpu.sdf.sdf_function import SdfFunction
    ex = SdfFunction.load(CACHE)
    print(f"load: {time.perf_counter() - t0:.1f}s", file=sys.stderr)
    return ex


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rebuild", action="store_true")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--points", type=int, default=21)
    args = ap.parse_args()

    import jax.numpy as jnp

    ex = get_structure(args.rebuild)
    n = 1 << args.points
    rng = np.random.default_rng(0)
    lo = np.asarray(ex.box.min) + 1e-4
    hi = np.asarray(ex.box.max) - 1e-4
    pts = jnp.asarray(rng.uniform(lo, hi, (n, 3)).astype(np.float32))

    d = ex.get_distance(pts)
    ref = float(jnp.sum(d))
    times = []
    for _ in range(args.iters):
        t0 = time.perf_counter()
        d = ex.get_distance(pts)
        float(jnp.sum(d))
        times.append(time.perf_counter() - t0)
    times = np.array(times)
    best = times.min()
    print(f"checksum {ref:.4f}")
    print(
        f"n={n}  best {best*1e3:.1f} ms = {n/best/1e6:.2f} M q/s   "
        f"median {np.median(times)*1e3:.1f} ms = "
        f"{n/np.median(times)/1e6:.2f} M q/s   all={np.round(times*1e3,1)}"
    )


if __name__ == "__main__":
    main()
