"""Regenerate the cross-implementation golden files in tests/golden/data/.

Compiles gen_golden.cpp against the REFERENCE headers (/root/reference) and
runs it on deterministic procedural inputs. The outputs — reference-kernel
distances/gradients, TriangleData precompute, tricubic fits, octree-walk
results, and a C++-written .bin — are committed so the pytest parity suite
(tests/test_reference_parity.py) runs everywhere without a C++ toolchain or
the reference checkout.

Usage:  python tests/golden/make_goldens.py  [--reference /root/reference]
"""
from __future__ import annotations

import argparse
import os
import struct
import subprocess
import sys
import tempfile

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(os.path.dirname(HERE))
DATA = os.path.join(HERE, "data")
sys.path.insert(0, REPO)

# Golden generation is host-side work; the small octree build runs on CPU.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

N_POINTS = 100_000  # per mesh case ("on >=100k samples" per acceptance)


def build_generator(reference: str, out: str) -> None:
    cmd = [
        "g++", "-O2", "-std=c++17",
        "-I", os.path.join(HERE, "shim"),
        "-I", os.path.join(reference, "include"),
        os.path.join(HERE, "gen_golden.cpp"),
        os.path.join(reference, "src/utils/TriangleUtils.cpp"),
        os.path.join(reference, "src/utils/Mesh.cpp"),
        "-o", out,
    ]
    subprocess.run(cmd, check=True)


def build_builders_generator(reference: str, out: str) -> None:
    """Compile gen_builders.cpp with the reference's REAL builder translation
    units (BFS no-delay + DFS octree builders, the exact DFS builder, GJK,
    the ICG TriangleMeshDistance BVH) against the functional cereal shim."""
    cmd = [
        "g++", "-O1", "-std=c++17", "-fopenmp",
        "-I", os.path.join(HERE, "shim"),
        "-I", os.path.join(reference, "include"),
        "-I", os.path.join(reference, "src"),
        "-I", os.path.join(reference, "libs"),
        "-I", os.path.join(reference, "libs/InteractiveComputerGraphics"),
        os.path.join(HERE, "gen_builders.cpp"),
        os.path.join(reference, "src/sdf/OctreeSdf.cpp"),
        os.path.join(reference, "src/sdf/OctreeSdfUniform.cpp"),
        os.path.join(reference, "src/sdf/ExactOctreeSdf.cpp"),
        os.path.join(reference, "src/utils/TriangleUtils.cpp"),
        os.path.join(reference, "src/utils/Mesh.cpp"),
        os.path.join(reference, "src/utils/GJK.cpp"),
        os.path.join(reference, "src/utils/Timer.cpp"),
        "-o", out,
    ]
    subprocess.run(cmd, check=True)


def write_mesh_raw(path: str, mesh) -> None:
    v = np.ascontiguousarray(mesh.vertices, np.float32)
    idx = np.ascontiguousarray(mesh.indices, np.uint32).reshape(-1, 3)
    with open(path, "wb") as f:
        f.write(struct.pack("<II", v.shape[0], idx.shape[0]))
        f.write(v.tobytes())
        f.write(idx.tobytes())


def write_points_raw(path: str, pts: np.ndarray) -> None:
    pts = np.ascontiguousarray(pts, np.float32)
    with open(path, "wb") as f:
        f.write(struct.pack("<I", pts.shape[0]))
        f.write(pts.tobytes())


def sample_points(mesh, n: int, seed: int) -> np.ndarray:
    """Half uniform in a padded bbox, half near the surface (where sign and
    Voronoi-region classification are hardest)."""
    rng = np.random.default_rng(seed)
    bb = mesh.bounding_box
    lo = np.asarray(bb.min) - 0.1
    hi = np.asarray(bb.max) + 0.1
    uniform = rng.uniform(lo, hi, (n // 2, 3)).astype(np.float32)
    tri = rng.integers(0, mesh.indices.shape[0], n - n // 2)
    bary = rng.dirichlet((1.0, 1.0, 1.0), n - n // 2).astype(np.float32)
    tv = mesh.vertices[mesh.indices[tri]]  # (m, 3, 3)
    on_surf = np.einsum("mk,mkj->mj", bary, tv)
    near = on_surf + rng.normal(0.0, 0.02, on_surf.shape).astype(np.float32)
    return np.concatenate([uniform, near]).astype(np.float32)


def non_manifold_fin_mesh():
    """A torus whose u-seam ring is DUPLICATED (uv-seam style): every seam
    edge initially has unpaired half-edges, exercising the reference's
    non-manifold vertex merge (TriangleUtils.cpp:292-420). After the merge
    the mesh is a clean 2-manifold, so pseudonormals are well-defined in
    both implementations (a >2-faces-per-edge mesh would be left in
    implementation-defined partial state by the reference and is not a
    meaningful parity target)."""
    from sdflib_tpu.mesh import Mesh

    R, r, nu, nv = 0.3, 0.12, 24, 12
    u = np.arange(nu + 1) * (2 * np.pi / nu)   # column nu duplicates column 0
    v = np.arange(nv) * (2 * np.pi / nv)
    uu, vv = np.meshgrid(u, v, indexing="ij")  # (nu+1, nv)
    cx = (R + r * np.cos(vv)) * np.cos(uu)
    cy = (R + r * np.cos(vv)) * np.sin(uu)
    cz = r * np.sin(vv)
    verts = np.stack([cx, cy, cz], -1).reshape(-1, 3).astype(np.float32)
    # exact duplicate positions on the seam (cos/sin(2pi) != 1 at fp level)
    verts[nu * nv:] = verts[:nv]

    faces = []
    for i in range(nu):
        for j in range(nv):
            a = i * nv + j
            b = (i + 1) * nv + j
            c = (i + 1) * nv + (j + 1) % nv
            d = i * nv + (j + 1) % nv
            faces.append([a, b, c])
            faces.append([a, c, d])
    return Mesh(verts, np.asarray(faces, np.uint32))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reference", default="/root/reference")
    args = ap.parse_args()

    from sdflib_tpu.utils.primitives import make_icosphere, make_torus

    os.makedirs(DATA, exist_ok=True)
    tmp = tempfile.mkdtemp(prefix="golden_")
    gen = os.path.join(tmp, "gen_golden")
    build_generator(args.reference, gen)

    cases = {
        "icosphere": make_icosphere(subdivisions=3, radius=0.42),
        "torus": make_torus(R=0.3, r=0.12, nu=48, nv=24),
        "nonmanifold": non_manifold_fin_mesh(),
    }

    for seed, (name, mesh) in enumerate(cases.items()):
        mesh_raw = os.path.join(tmp, f"{name}.mesh")
        pts_raw = os.path.join(tmp, f"{name}.pts")
        write_mesh_raw(mesh_raw, mesh)
        pts = sample_points(mesh, N_POINTS, seed=100 + seed)
        write_points_raw(pts_raw, pts)
        prefix = os.path.join(tmp, name)
        subprocess.run([gen, "dist", mesh_raw, pts_raw, prefix], check=True)
        dist = np.fromfile(prefix + "_dist.raw", "<f4")
        grad = np.fromfile(prefix + "_grad.raw", "<f4").reshape(-1, 3)
        tridata = np.fromfile(prefix + "_tridata.raw", "<f4").reshape(-1, 37)
        np.savez_compressed(
            os.path.join(DATA, f"dist_{name}.npz"),
            points=pts, dist=dist, grad=grad, tridata=tridata,
        )
        print(f"dist_{name}: {len(dist)} samples, {len(tridata)} tris")

    # -- tricubic fit/eval ---------------------------------------------------
    rng = np.random.default_rng(7)
    n = 4096
    corners = rng.normal(0.0, 1.0, (n, 8, 8)).astype(np.float32)
    corners[:, :, 4:] = 0.0  # reference zeroes values 4..7 (calculatePointValues)
    node_sizes = rng.uniform(0.05, 1.0, n).astype(np.float32)
    fracs = rng.uniform(0.0, 1.0, (n, 3)).astype(np.float32)
    cpath = os.path.join(tmp, "corners.raw")
    with open(cpath, "wb") as f:
        f.write(struct.pack("<I", n))
        f.write(corners.tobytes())
        f.write(node_sizes.tobytes())
    fpath = os.path.join(tmp, "fracs.raw")
    write_points_raw(fpath, fracs)
    prefix = os.path.join(tmp, "tricubic")
    subprocess.run([gen, "tricubic", cpath, fpath, prefix], check=True)
    np.savez_compressed(
        os.path.join(DATA, "tricubic.npz"),
        corners=corners, node_sizes=node_sizes, fracs=fracs,
        coeffs=np.fromfile(prefix + "_coeffs.raw", "<f4").reshape(n, 64),
        value=np.fromfile(prefix + "_value.raw", "<f4"),
        grad=np.fromfile(prefix + "_grad.raw", "<f4").reshape(n, 3),
    )
    print(f"tricubic: {n} samples")

    # -- octree walk over a .bin --------------------------------------------
    from sdflib_tpu.io.sdflib_binary import save_sdflib_bin
    from sdflib_tpu.sdf.octree import OctreeSdf

    mesh = cases["torus"]
    box = mesh.bounding_box.add_margin(0.14)
    oct_ = OctreeSdf(
        mesh, box, max_depth=4, start_depth=1,
        termination_threshold=1e-3, init_algorithm="no_continuity",
    )
    bin_path = os.path.join(DATA, "octree_torus.bin")
    save_sdflib_bin(oct_, bin_path)
    opts = sample_points(mesh, 50_000, seed=42)
    optsp = os.path.join(tmp, "oct.pts")
    write_points_raw(optsp, opts)
    prefix = os.path.join(tmp, "oct")
    subprocess.run([gen, "octree", bin_path, optsp, prefix], check=True)
    np.savez_compressed(
        os.path.join(DATA, "octree_walk.npz"),
        points=opts,
        dist=np.fromfile(prefix + "_dist.raw", "<f4"),
        grad=np.fromfile(prefix + "_grad.raw", "<f4").reshape(-1, 3),
    )
    with open(prefix + "_rewrite.bin", "rb") as f:
        rewritten = f.read()
    with open(os.path.join(DATA, "octree_torus_cpp.bin"), "wb") as f:
        f.write(rewritten)
    print("octree goldens written")

    # -- REFERENCE-BUILT structures (gen_builders.cpp) -----------------------
    # The reference's own builders construct OctreeSdf (NO_CONTINUITY +
    # CONTINUITY no-delay) and ExactOctreeSdf on a small torus; the COMPILED
    # getDistance queries them; the .bins are written through the
    # reference's save() templates. Parity tests then require our loaders
    # to parse these and our queries to match the C++ outputs.
    genb = os.path.join(tmp, "gen_builders")
    build_builders_generator(args.reference, genb)

    bmesh = make_torus(R=0.3, r=0.12, nu=24, nv=12)
    bmesh_raw = os.path.join(tmp, "builders.mesh")
    write_mesh_raw(bmesh_raw, bmesh)
    rng = np.random.default_rng(3)
    bpts = rng.uniform(-0.55, 0.55, (20_000, 3)).astype(np.float32)
    bpts_raw = os.path.join(tmp, "builders.pts")
    write_points_raw(bpts_raw, bpts)
    prefix = os.path.join(tmp, "bld")
    subprocess.run(
        [genb, "build", bmesh_raw, bpts_raw, prefix, "5", "2", "32", "1e-3"],
        check=True,
    )
    import shutil

    for tag in ("octree_nc", "octree_cont", "exact"):
        shutil.copy(
            f"{prefix}_{tag}.bin",
            os.path.join(DATA, f"builders_{tag}.bin"),
        )
    np.savez_compressed(
        os.path.join(DATA, "builders_torus.npz"),
        points=bpts,
        **{
            f"{tag}_{kind}": np.fromfile(
                f"{prefix}_{tag}_{kind}.raw", "<f4"
            ).reshape((-1, 3) if kind == "grad" else (-1,))
            for tag in ("octree_nc", "octree_cont", "exact")
            for kind in ("dist", "grad")
        },
    )
    print("reference-built builder goldens written")

    # -- our exact .bin -> compiled C++ decoder round trip -------------------
    # _save_exact_bin writes the bit-packed EXACT_OCTREE container; the
    # compiled reference load() decodes it and queries. Its distances must
    # agree with the reference-built exact tree's (both are exact SDFs of
    # the same mesh, so values match regardless of tree shape).
    from sdflib_tpu.sdf.exact_octree import ExactOctreeSdf

    bbox = bmesh.bounding_box.add_margin(
        0.2 * float(np.max(bmesh.bounding_box.size))
    )
    ours = ExactOctreeSdf(
        bmesh, bbox, max_depth=5, start_depth=2, min_triangles_per_node=32
    )
    ours_bin = os.path.join(tmp, "ours_exact.bin")
    save_sdflib_bin(ours, ours_bin)
    prefix = os.path.join(tmp, "rt")
    subprocess.run([genb, "exactquery", ours_bin, bpts_raw, prefix], check=True)
    np.savez_compressed(
        os.path.join(DATA, "exact_bin_roundtrip.npz"),
        points=bpts,
        dist=np.fromfile(prefix + "_dist.raw", "<f4"),
        grad=np.fromfile(prefix + "_grad.raw", "<f4").reshape(-1, 3),
    )
    print("exact .bin C++ round-trip golden written")


if __name__ == "__main__":
    main()
