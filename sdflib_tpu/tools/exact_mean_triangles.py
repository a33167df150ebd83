"""exact-mean-triangles: plane-cut heatmap of triangles per exact-octree
leaf.

Parity with the reference OctreeExactMeanOfTrianglesViewer debug app
(src/tools/OctreeExactMeanOfTrianglesViewer/main.cpp): renders an offline
PNG heatmap of the leaf triangle-list sizes over an axis-aligned plane,
plus the list-size distribution — the diagnostics used to judge culling
quality.
"""
from __future__ import annotations

import argparse
import json

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="exact-mean-triangles")
    p.add_argument("sdf_path", help="an exact-octree .npz container")
    p.add_argument("output_png")
    p.add_argument("-w", "--width", type=int, default=512)
    p.add_argument("--axis", type=int, default=2, choices=(0, 1, 2))
    p.add_argument("--offset", type=float, default=0.5)
    p.add_argument("--json", action="store_true")
    return p


def main(argv=None) -> int:
    import jax.numpy as jnp

    args = build_parser().parse_args(argv)

    from ..render.image import write_png
    from ..sdf import SdfFunction
    from ..sdf.exact_octree import ExactOctreeSdf, _exact_descent

    sdf = SdfFunction.load(args.sdf_path)
    if not isinstance(sdf, ExactOctreeSdf):
        raise SystemExit("exact-mean-triangles needs an EXACT_OCTREE container")

    R = args.width
    u = (np.arange(R, dtype=np.float32) + 0.5) / R
    gu, gv = np.meshgrid(u, u, indexing="xy")
    coords = [None, None, None]
    axes2d = [a for a in range(3) if a != args.axis]
    coords[axes2d[0]] = gu
    coords[axes2d[1]] = gv
    coords[args.axis] = np.full_like(gu, args.offset)
    unit = np.stack(coords, axis=-1)
    pts = (sdf.box.min + unit * sdf.box.size[None, None]).astype(np.float32)

    leaf_id, _ = _exact_descent(
        sdf.octree_data,
        jnp.asarray(pts.reshape(-1, 3)),
        jnp.asarray(sdf.box.min),
        jnp.float32(sdf.box.size[0]),
        sdf.start_grid_size,
        levels=sdf.max_depth - sdf.start_depth,
    )
    counts = np.asarray(sdf.leaf_count)[np.asarray(leaf_id)].reshape(R, R)

    cmax = max(int(counts.max()), 1)
    t = counts.astype(np.float32) / cmax
    # blue (few) -> yellow -> red (many) heatmap
    img = np.stack(
        [np.clip(2 * t, 0, 1), np.clip(2 - 2 * t, 0, 1) * (t > 0.02),
         np.clip(1 - 3 * t, 0, 1)],
        axis=-1,
    )
    write_png(args.output_png, img)

    all_counts = np.asarray(sdf.leaf_count)
    stats = {
        "leaves": int(all_counts.size),
        "mean_tris_per_leaf": float(all_counts.mean()),
        "p50": float(np.quantile(all_counts, 0.5)),
        "p95": float(np.quantile(all_counts, 0.95)),
        "max": int(all_counts.max()),
        "plane_max": int(counts.max()),
    }
    print(
        f"leaves: {stats['leaves']}  mean tris/leaf: "
        f"{stats['mean_tris_per_leaf']:.1f}  p95: {stats['p95']:.0f}  "
        f"max: {stats['max']}"
    )
    if args.json:
        print(json.dumps(stats))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
