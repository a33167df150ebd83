"""Benchmark harness. Prints ONE JSON line:
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Measures approximate-octree SDF queries/s on the available accelerator
(the reference's SdfError harness role, src/tools/SdfError/main.cpp:44-97).
Baseline target: 1e9 exact queries/s on a v5p-8 (4 chips) => 2.5e8 per chip;
vs_baseline = achieved per-chip rate / per-chip target.
"""
from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from sdflib_tpu.sdf.octree import OctreeSdf
    from sdflib_tpu.utils.primitives import make_icosphere

    # Deterministic benchmark mesh (no assets in the image): dense icosphere,
    # ~20k triangles.
    mesh = make_icosphere(subdivisions=5, radius=0.35)
    box = mesh.bounding_box.add_margin(0.14)

    t0 = time.perf_counter()
    oct_ = OctreeSdf(
        mesh, box, max_depth=6, start_depth=2,
        termination_threshold=1e-3, init_algorithm="no_continuity",
    )
    build_s = time.perf_counter() - t0

    n = 1 << 22  # 4M query points
    rng = np.random.default_rng(0)
    lo = np.asarray(oct_.box.min) + 1e-4
    hi = np.asarray(oct_.box.max) - 1e-4
    pts = jnp.asarray(rng.uniform(lo, hi, (n, 3)).astype(np.float32))

    # Warmup/compile
    d = oct_.get_distance(pts)
    d.block_until_ready()

    iters = 8
    t0 = time.perf_counter()
    for _ in range(iters):
        d = oct_.get_distance(pts)
    d.block_until_ready()
    dt = time.perf_counter() - t0
    qps = iters * n / dt

    per_chip_target = 1e9 / 4.0  # v5p-8 = 4 chips
    print(
        json.dumps(
            {
                "metric": "octree_sdf_queries_per_s",
                "value": qps,
                "unit": "queries/s/chip",
                "vs_baseline": qps / per_chip_target,
                "extra": {
                    "build_s": build_s,
                    "num_triangles": int(mesh.num_triangles),
                    "octree_nodes_u32": int(np.asarray(oct_.octree_data).size),
                    "device": str(jax.devices()[0]),
                    "query_points": n,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
