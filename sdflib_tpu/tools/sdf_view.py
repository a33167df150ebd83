"""sdf-view: plane-cut inspection images of an octree SDF.

Offline parity with the reference SdfViewer (src/tools/SdfViewer/
main.cpp:35-1278): renders the plane-cut distance visualization (7-color
palette, isolines, node-grid overlay, sdfOctreePlane.frag semantics) to
PNG, optionally sweeping the plane along an axis, plus RMSE/MAE of the
octree vs brute force inside the view (the in-GUI metric at
SdfViewer/main.cpp:699-700).
"""
from __future__ import annotations

import argparse

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="sdf-view")
    p.add_argument("sdf_path")
    p.add_argument("output_path", help="Output .png (or prefix for sweeps)")
    p.add_argument("--resolution", type=int, default=512)
    p.add_argument("--axis", type=int, default=2, choices=[0, 1, 2],
                   help="Plane normal axis")
    p.add_argument("--offset", type=float, default=0.5,
                   help="Plane position in [0,1] along the axis")
    p.add_argument("--sweep", type=int, default=0,
                   help="Render N planes sweeping the axis")
    p.add_argument("--no_grid", action="store_true")
    p.add_argument("--no_isolines", action="store_true")
    p.add_argument("--error_vs", default=None,
                   help="Mesh file: print RMSE/MAE of the octree vs brute "
                        "force on the rendered plane")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    from ..sdf import RealSdf, SdfFunction
    from ..sdf.octree import OctreeSdf
    from ..io.sdflib_binary import load_sdflib_bin
    from ..mesh import load_mesh
    from ..render import render_plane_cut, write_png

    sdf = (load_sdflib_bin(args.sdf_path) if args.sdf_path.endswith(".bin")
           else SdfFunction.load(args.sdf_path))
    if not isinstance(sdf, OctreeSdf):
        raise SystemExit("sdf-view requires an octree SDF container")

    offsets = (
        [(i + 0.5) / args.sweep for i in range(args.sweep)]
        if args.sweep else [args.offset]
    )
    for i, off in enumerate(offsets):
        img = render_plane_cut(
            sdf, resolution=args.resolution, axis=args.axis, offset=off,
            print_grid=not args.no_grid, print_isolines=not args.no_isolines,
        )
        path = (args.output_path if len(offsets) == 1
                else args.output_path.replace(".png", f"_{i:03d}.png"))
        write_png(path, img)
        print(f"Wrote {path} (axis={args.axis}, offset={off:.3f})")

    if args.error_vs is not None:
        mesh = load_mesh(args.error_vs)
        real = RealSdf(mesh)
        rng = np.random.default_rng(0)
        u = rng.uniform(0, 1, (args.resolution**2 // 4, 3)).astype(np.float32)
        u[:, args.axis] = args.offset
        pts = (sdf.box.min + u * sdf.box.size).astype(np.float32)
        d_o = np.asarray(sdf.get_distance(pts))
        d_r = np.asarray(real.get_distance(pts))
        diff = d_o - d_r
        print(f"Plane RMSE: {float(np.sqrt(np.mean(diff**2)))}")
        print(f"Plane MAE: {float(np.mean(np.abs(diff)))}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
