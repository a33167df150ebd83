"""Benchmark harness. Prints ONE JSON line:
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Measures EXACT-octree SDF queries/s — the project's headline metric — on
the available accelerator (the reference's SdfError harness role,
src/tools/SdfError/main.cpp:44-97), with approximate-octree queries/s,
sphere-traced rays/s, and build times in "extra" (each perf rate with its
own labeled vs-target ratio).
Baseline target: 1e9 exact queries/s on a v5p-8 (4 chips) => 2.5e8 per chip;
vs_baseline = achieved per-chip exact rate / per-chip target.
"""
from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from sdflib_tpu.sdf.octree import OctreeSdf
    from sdflib_tpu.sdf.exact_octree import ExactOctreeSdf
    from sdflib_tpu.render.sphere_trace import trace_octree
    from sdflib_tpu.utils.primitives import make_torus

    # Deterministic benchmark mesh (no assets in the image): dense torus,
    # ~9k triangles. (An icosphere is pathological for EXACT octrees: all
    # triangles are equidistant from interior cells, so the true influence
    # sets there contain the whole mesh.)
    mesh = make_torus(R=0.3, r=0.12, nu=96, nv=48)
    box = mesh.bounding_box.add_margin(0.14)

    t0 = time.perf_counter()
    oct_ = OctreeSdf(
        mesh, box, max_depth=6, start_depth=2,
        termination_threshold=1e-3, init_algorithm="no_continuity",
    )
    build_s = time.perf_counter() - t0
    oct_.build_query_grid()  # O(1)-descent acceleration

    n = 1 << 22  # 4M query points
    rng = np.random.default_rng(0)
    lo = np.asarray(oct_.box.min) + 1e-4
    hi = np.asarray(oct_.box.max) - 1e-4
    pts = jnp.asarray(rng.uniform(lo, hi, (n, 3)).astype(np.float32))

    # ---- approximate octree queries/s --------------------------------------
    # timing fences are scalar readbacks: block_until_ready can return
    # before device completion through the remote transport (PERF.md)
    d = oct_.get_distance(pts)
    float(jnp.sum(d))
    iters = 8
    t0 = time.perf_counter()
    for _ in range(iters):
        d = oct_.get_distance(pts)
    float(jnp.sum(d))
    qps = n * iters / (time.perf_counter() - t0)

    # ---- sphere-traced rays/s ------------------------------------------------
    # image-shaped origins: the tracer tiles 2D beams (beam prepass)
    R = 1024
    u = (np.arange(R, dtype=np.float32) + 0.5) / R - 0.5
    gu, gv = np.meshgrid(u, u)
    origins = np.stack(
        [gu, gv, np.full_like(gu, -1.2)], -1
    ).astype(np.float32)
    dirs = np.broadcast_to(
        np.array([0.0, 0.0, 1.0], np.float32), origins.shape
    ).copy()
    res = trace_octree(oct_, origins, dirs, max_iters=1024)
    float(jnp.sum(res.depth))
    t0 = time.perf_counter()
    res = trace_octree(oct_, origins, dirs, max_iters=1024)
    float(jnp.sum(res.depth))
    rays_per_s = R * R / (time.perf_counter() - t0)

    # ---- exact octree queries/s ----------------------------------------------
    del res  # free trace buffers before the exact build
    octree_words = int(oct_.octree_data.shape[0])
    del oct_  # free approx structures (grid + tree) before the exact build
    t0 = time.perf_counter()
    ex = ExactOctreeSdf(
        mesh, box, max_depth=6, start_depth=2, min_triangles_per_node=32
    )
    exact_build_s = time.perf_counter() - t0
    ne = 1 << 21
    epts = pts[:ne]
    # Sweep the scan backends (ops/pallas_scan.py) and take the best as
    # the headline; each is checksum-validated against the XLA scan.
    impl_qps = {}
    cks_ref = None
    for impl in ("xla", "pallas", "pallas_window"):
        try:
            ex.set_scan_impl(impl)
            de = ex.get_distance(epts)
            cks = float(jnp.sum(de))
            if cks_ref is None:
                cks_ref = cks
            elif abs(cks - cks_ref) > 1e-3 * max(1.0, abs(cks_ref)):
                continue  # disagreeing backend: exclude from the headline
            best = np.inf
            for _ in range(3):
                t0 = time.perf_counter()
                de = ex.get_distance(epts)
                float(jnp.sum(de))
                best = min(best, time.perf_counter() - t0)
            impl_qps[impl] = ne / best
        except Exception:
            if impl == "xla":
                raise
    best_impl = max(impl_qps, key=impl_qps.get)
    exact_qps = impl_qps[best_impl]

    # ---- real-mesh scale: >=100k-triangle build + query ----------------------
    # (BASELINE configs name Armadillo/Thingi10K-scale meshes; no assets in
    # the image, so a dense torus at 100k+ triangles stands in.)
    del de, ex
    big_mesh = make_torus(R=0.3, r=0.12, nu=420, nv=120)
    big_box = big_mesh.bounding_box.add_margin(0.14)
    t0 = time.perf_counter()
    # Depth 7 via the streamed builder (node groups through fixed-size
    # device buffers, exact_octree.py entry_budget); depth 5 only as a
    # fallback if this chip cannot hold the result's bucket tables.
    try:
        big_depth = 7
        big_ex = ExactOctreeSdf(
            big_mesh, big_box, max_depth=7, start_depth=3,
            min_triangles_per_node=32,
        )
    except Exception:
        big_depth = 5
        big_ex = ExactOctreeSdf(
            big_mesh, big_box, max_depth=5, start_depth=3,
            min_triangles_per_node=32,
        )
    big_build_s = time.perf_counter() - t0
    try:
        big_ex.set_scan_impl(best_impl)
    except ValueError:
        pass
    nb = 1 << 20
    bpts = pts[:nb]
    db = big_ex.get_distance(bpts)
    float(jnp.sum(db))
    t0 = time.perf_counter()
    db = big_ex.get_distance(bpts)
    float(jnp.sum(db))
    big_exact_qps = nb / (time.perf_counter() - t0)
    big_tris = int(big_mesh.indices.size // 3)
    big_mean_leaf = float(np.mean(big_ex.build_stats["tris_per_leaf"]))

    per_chip_target = 2.5e8       # 1e9 exact q/s on v5p-8 (4 chips)
    rays_chip_target = 2.5e7      # 1e8 rays/s on v5p-8 (4 chips)
    dev = jax.devices()[0]
    print(json.dumps({
        "metric": "exact_octree_queries_per_s",
        "value": exact_qps,
        "unit": "queries/s/chip",
        "vs_baseline": exact_qps / per_chip_target,
        "extra": {
            "approx_octree_queries_per_s": qps,
            "approx_vs_target": qps / per_chip_target,
            "sphere_trace_rays_per_s": rays_per_s,
            "rays_vs_target": rays_per_s / rays_chip_target,
            "build_s": build_s,
            "exact_build_s": exact_build_s,
            "num_triangles": int(mesh.indices.size // 3),
            "octree_words_u32": octree_words,
            "exact_scan_impl": best_impl,
            "exact_qps_by_impl": impl_qps,
            "big_mesh_triangles": big_tris,
            "big_exact_depth": big_depth,
            "big_exact_build_s": big_build_s,
            "big_exact_queries_per_s": big_exact_qps,
            "big_mean_tris_per_leaf": big_mean_leaf,
            "device": str(getattr(dev, "device_kind", dev)),
            "query_points": n,
        },
    }))


if __name__ == "__main__":
    main()
