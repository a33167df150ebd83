"""Probe the streamed exact build at depth 7 on the ~100k-tri torus
(VERDICT r2 item 2 harness): build wall time, splits, tris/leaf, and the
2^20-point query rate. One JSON line. Timing fences are scalar readbacks
(CLAUDE.md: block_until_ready does not wait through the axon tunnel).

Usage: python scripts/bigmesh_probe.py [max_depth=7] [impl=xla] [cache.npz]

With a cache path, the built structure is saved there on first run and
loaded on later runs (cold builds through the tunnel cost tens of
minutes; the query sweep itself is minutes).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax.numpy as jnp

    from sdflib_tpu.sdf.exact_octree import ExactOctreeSdf
    from sdflib_tpu.sdf.sdf_function import SdfFunction
    from sdflib_tpu.utils.primitives import make_torus

    depth = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    impl = sys.argv[2] if len(sys.argv) > 2 else "xla"
    cache = sys.argv[3] if len(sys.argv) > 3 else None
    min_tris = int(sys.argv[4]) if len(sys.argv) > 4 else 32
    # denormalized-field tier cap (bytes); the depth-7/100k structure's
    # slot count decides between the fast vertex tier and id-only buckets
    byte_budget = int(sys.argv[5]) if len(sys.argv) > 5 else (10 << 30)
    if cache and not cache.endswith(".npz"):
        cache += ".npz"  # np.savez appends it; keep the exists() check honest
    t0 = time.perf_counter()
    if cache and os.path.exists(cache):
        ex = SdfFunction.load(cache)
        if int(ex.max_depth) != depth:
            raise SystemExit(
                f"cache {cache} was built at depth {int(ex.max_depth)}, "
                f"not the requested {depth}; pass a different cache path"
            )
        print(f"load: {time.perf_counter() - t0:.1f}s", flush=True)
    else:
        mesh = make_torus(R=0.3, r=0.12, nu=420, nv=120)
        box = mesh.bounding_box.add_margin(0.14)
        ex = ExactOctreeSdf(
            mesh, box, max_depth=depth, start_depth=3,
            min_triangles_per_node=min_tris,
            bucket_byte_budget=byte_budget,
        )
        build_s = time.perf_counter() - t0
        if cache:
            ex.save(cache)
        tpl = np.asarray(ex.build_stats["tris_per_leaf"], np.float64)
        print(json.dumps({
            "build_s": build_s,
            "build_splits": ex.build_stats.get("build_splits"),
            "num_leaves": int(tpl.size),
            "mean_tris_per_leaf": float(tpl.mean()),
            "median_tris_per_leaf": float(np.median(tpl)),
            "max_tris_per_leaf": float(tpl.max()),
            "bucket_rows": (
                int(ex.bucket_ids.shape[0])
                if ex.bucket_ids is not None else 0
            ),
            "bucket_mb": (
                float(ex.bucket_ids.nbytes + ex.bucket_fields.nbytes) / 1e6
                if ex.bucket_fields is not None
                else float(ex.tri_flat.nbytes) / 1e6
            ),
            "bucket_tier": (
                "fields" if ex.bucket_fields is not None else "id-only"
            ),
        }), flush=True)

    try:
        ex.set_scan_impl(impl)
    except ValueError as e:
        print(json.dumps({"impl_error": repr(e)}), flush=True)
    n = 1 << 20
    rng = np.random.default_rng(0)
    lo = np.asarray(ex.box.min) + 1e-4
    hi = np.asarray(ex.box.max) - 1e-4
    pts = jnp.asarray(rng.uniform(lo, hi, (n, 3)).astype(np.float32))
    d = ex.get_distance(pts)
    cks = float(jnp.sum(d))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        d = ex.get_distance(pts)
        float(jnp.sum(d))
        ts.append(time.perf_counter() - t0)
    best = min(ts)
    print(json.dumps({
        "impl": impl,
        "qps": n / best,
        "best_ms": best * 1e3,
        "all_ms": [round(t * 1e3, 1) for t in ts],
        "checksum": cks,
    }), flush=True)


if __name__ == "__main__":
    main()
