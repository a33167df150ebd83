"""CLI tool suite + .bin interop tests."""
import os
import struct

import numpy as np
import pytest

from sdflib_tpu.io import load_sdflib_bin, save_sdflib_bin
from sdflib_tpu.mesh import Mesh
from sdflib_tpu.sdf import OctreeSdf, UniformGridSdf
from sdflib_tpu.tools import sdf_error, sdf_export, sdf_render, sdf_view
from sdflib_tpu.utils.primitives import make_icosphere


@pytest.fixture(scope="module")
def mesh_file(tmp_path_factory):
    """A binary PLY on disk, exercising the full IO path."""
    path = tmp_path_factory.mktemp("assets") / "sphere.ply"
    mesh = make_icosphere(subdivisions=2, radius=0.4)
    with open(path, "wb") as f:
        hdr = (
            f"ply\nformat binary_little_endian 1.0\n"
            f"element vertex {mesh.num_vertices}\n"
            "property float x\nproperty float y\nproperty float z\n"
            f"element face {mesh.num_triangles}\n"
            "property list uchar int vertex_indices\nend_header\n"
        )
        f.write(hdr.encode())
        f.write(mesh.vertices.astype("<f4").tobytes())
        for tri in mesh.indices:
            f.write(struct.pack("<B3i", 3, *tri))
    return str(path)


def test_export_error_render_view_pipeline(tmp_path, mesh_file, capsys):
    oct_path = str(tmp_path / "sphere_oct.npz")
    rc = sdf_export.main(
        [mesh_file, oct_path, "-d", "4", "--start_depth", "2",
         "--termination_threshold", "1e-3"]
    )
    assert rc == 0 and os.path.exists(oct_path)

    rc = sdf_error.main([oct_path, mesh_file, "-m", "0.01"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "RMSE" in out and "us per query" in out
    rmse = float([l for l in out.splitlines() if l.startswith("RMSE")][0].split(":")[1])
    assert rmse < 5e-3

    png_path = str(tmp_path / "render.png")
    rc = sdf_render.main(
        [oct_path, png_path, "--width", "64", "--height", "64",
         "--max_iters", "128", "--mode", "normal"]
    )
    assert rc == 0
    assert open(png_path, "rb").read(8) == b"\x89PNG\r\n\x1a\n"

    view_path = str(tmp_path / "view.png")
    rc = sdf_view.main([oct_path, view_path, "--resolution", "64"])
    assert rc == 0 and os.path.exists(view_path)


def test_export_exact_and_grid(tmp_path, mesh_file):
    rc = sdf_export.main(
        [mesh_file, str(tmp_path / "e.npz"), "--sdf_format", "exact_octree",
         "-d", "4", "--min_triangles_per_node", "16"]
    )
    assert rc == 0
    rc = sdf_export.main(
        [mesh_file, str(tmp_path / "g.npz"), "--sdf_format", "grid", "-d", "3"]
    )
    assert rc == 0


def test_bin_roundtrip_octree(tmp_path):
    mesh = make_icosphere(subdivisions=2, radius=0.4)
    oct_ = OctreeSdf(mesh, mesh.bounding_box.add_margin(0.1),
                     max_depth=4, start_depth=2)
    path = str(tmp_path / "o.bin")
    save_sdflib_bin(oct_, path)
    loaded = load_sdflib_bin(path)
    rng = np.random.default_rng(0)
    pts = rng.uniform(-0.4, 0.4, (256, 3)).astype(np.float32)
    np.testing.assert_array_equal(
        np.asarray(loaded.get_distance(pts)), np.asarray(oct_.get_distance(pts))
    )
    assert loaded.max_depth == oct_.max_depth
    assert loaded.start_grid_size == oct_.start_grid_size


def test_bin_roundtrip_grid(tmp_path):
    mesh = make_icosphere(subdivisions=1, radius=0.4)
    grid = UniformGridSdf(mesh, mesh.bounding_box.add_margin(0.1), depth=3)
    path = str(tmp_path / "g.bin")
    save_sdflib_bin(grid, path)
    loaded = load_sdflib_bin(path)
    rng = np.random.default_rng(1)
    pts = rng.uniform(-0.3, 0.3, (128, 3)).astype(np.float32)
    np.testing.assert_array_equal(
        np.asarray(loaded.get_distance(pts)), np.asarray(grid.get_distance(pts))
    )


def test_bin_layout_bytes(tmp_path):
    """The .bin header must match the cereal layout byte-for-byte."""
    mesh = make_icosphere(subdivisions=1, radius=0.4)
    oct_ = OctreeSdf(mesh, mesh.bounding_box.add_margin(0.1),
                     max_depth=3, start_depth=1)
    path = str(tmp_path / "o.bin")
    save_sdflib_bin(oct_, path)
    raw = open(path, "rb").read()
    assert raw[0] == 1  # little-endian flag
    assert struct.unpack("<i", raw[1:5])[0] == 1  # SdfFormat::OCTREE
    box_min = np.frombuffer(raw[5:17], "<f4")
    np.testing.assert_array_equal(box_min, np.asarray(oct_.box.min))
    sgs = struct.unpack("<i", raw[29:33])[0]
    assert sgs == oct_.start_grid_size
    count = struct.unpack("<Q", raw[45:53])[0]
    assert count == np.asarray(oct_.octree_data).size
    assert len(raw) == 53 + 4 * count


def test_bad_rule_cli(mesh_file, tmp_path, capsys):
    rc = sdf_export.main(
        [mesh_file, str(tmp_path / "x.npz"), "--termination_rule", "bogus"]
    )
    assert rc == 1
    assert "unknown termination_rule" in capsys.readouterr().err


def test_exact_octree_bin_roundtrip(tmp_path):
    """EXACT_OCTREE .bin encode -> decode: the bit-encoded container
    (ExactOctreeSdf.h:138-165) must reproduce identical distances."""
    import numpy as np

    from sdflib_tpu.io.sdflib_binary import load_sdflib_bin, save_sdflib_bin
    from sdflib_tpu.sdf.exact_octree import ExactOctreeSdf
    from sdflib_tpu.utils.primitives import make_icosphere

    mesh = make_icosphere(subdivisions=2, radius=0.35)
    box = mesh.bounding_box.add_margin(0.14)
    ex = ExactOctreeSdf(mesh, box, max_depth=4, start_depth=1,
                        min_triangles_per_node=32)

    path = str(tmp_path / "exact.bin")
    save_sdflib_bin(ex, path)
    loaded = load_sdflib_bin(path)
    assert isinstance(loaded, ExactOctreeSdf)
    assert not loaded._sorted_lists  # early exit must be off on .bin lists

    # per-leaf triangle SETS must match (order differs: ours are
    # distance-sorted, the container index-sorted)
    rng = np.random.default_rng(0)
    pts = rng.uniform(ex.box.min + 1e-4, ex.box.max - 1e-4,
                      (4096, 3)).astype(np.float32)
    pts = np.concatenate([pts, np.array([[6.0, 0, 0]], np.float32)])
    d0 = np.asarray(ex.get_distance(pts))
    d1 = np.asarray(loaded.get_distance(pts))
    np.testing.assert_allclose(d0, d1, atol=1e-6)

    # triangle data reconstruction (v_world recovered via the transform)
    np.testing.assert_allclose(
        np.asarray(loaded.triangles.v_world),
        np.asarray(ex.triangles.v_world), atol=1e-5,
    )


def test_imported_exact_npz_roundtrip_keeps_early_exit_off(tmp_path):
    """A .bin-imported exact octree (index-ordered lists) saved to .npz and
    reloaded must NOT enable the sorted-list early exit."""
    import numpy as np

    from sdflib_tpu.io.sdflib_binary import load_sdflib_bin, save_sdflib_bin
    from sdflib_tpu.sdf import SdfFunction
    from sdflib_tpu.sdf.exact_octree import ExactOctreeSdf
    from sdflib_tpu.utils.primitives import make_torus

    mesh = make_torus(R=0.3, r=0.12, nu=24, nv=12)
    box = mesh.bounding_box.add_margin(0.1)
    ex = ExactOctreeSdf(mesh, box, max_depth=4, start_depth=1,
                        min_triangles_per_node=32)
    binp = str(tmp_path / "e.bin")
    save_sdflib_bin(ex, binp)
    imported = load_sdflib_bin(binp)
    assert not imported._sorted_lists

    npzp = str(tmp_path / "e.npz")
    imported.save(npzp)
    reloaded = SdfFunction.load(npzp)
    assert not reloaded._sorted_lists  # must stay off: lists are unsorted

    rng = np.random.default_rng(0)
    pts = rng.uniform(ex.box.min + 1e-4, ex.box.max - 1e-4,
                      (2048, 3)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(reloaded.get_distance(pts)),
        np.asarray(ex.get_distance(pts)),
        atol=1e-6,
    )


def test_trace_bin_imported_octree(tmp_path):
    """Sphere tracing a reference-layout (.bin) octree must take the
    layout-agnostic query path, not crash or fetch garbage coefficients."""
    import numpy as np

    from sdflib_tpu.io.sdflib_binary import load_sdflib_bin, save_sdflib_bin
    from sdflib_tpu.render.sphere_trace import trace_octree
    from sdflib_tpu.sdf.octree import OctreeSdf
    from sdflib_tpu.utils.primitives import make_icosphere

    mesh = make_icosphere(subdivisions=2, radius=0.35)
    box = mesh.bounding_box.add_margin(0.14)
    oct_ = OctreeSdf(mesh, box, max_depth=4, start_depth=1)
    binp = str(tmp_path / "o.bin")
    save_sdflib_bin(oct_, binp)
    imported = load_sdflib_bin(binp)
    # imported arrays keep our aligned layout, so force the foreign path
    imported._fast_layout = False

    n = 256
    origins = np.tile([[0.0, 0.0, -1.2]], (n, 1)).astype(np.float32)
    dirs = np.tile([[0.0, 0.0, 1.0]], (n, 1)).astype(np.float32)
    r0 = trace_octree(oct_, origins, dirs, max_iters=128)
    r1 = trace_octree(imported, origins, dirs, max_iters=128)
    np.testing.assert_array_equal(np.asarray(r0.hit), np.asarray(r1.hit))
    np.testing.assert_allclose(
        np.asarray(r0.depth), np.asarray(r1.depth), atol=1e-6
    )


def test_view_pick_prints_cell_stats(tmp_path, mesh_file, capsys):
    """--pick parity with SdfViewer node selection: triangle lists for
    exact octrees, per-cell RMSE/MAE, influence-region OBJ
    (reference src/tools/SdfViewer/main.cpp:699-700)."""
    from sdflib_tpu.mesh import load_mesh
    from sdflib_tpu.sdf.exact_octree import ExactOctreeSdf

    mesh = load_mesh(mesh_file)
    box = mesh.bounding_box.add_margin(0.14)
    ex = ExactOctreeSdf(
        mesh, box, max_depth=3, start_depth=1, min_triangles_per_node=16
    )
    sdf_path = str(tmp_path / "pick.npz")
    ex.save(sdf_path)

    surf = mesh.vertices[0] * 0.999
    obj_path = str(tmp_path / "region.obj")
    rc = sdf_view.main([
        sdf_path, f"--pick={surf[0]},{surf[1]},{surf[2]}",
        "--pick_region", obj_path,
        "--error_vs", mesh_file, "--pick_samples", "512",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "influence triangles" in out
    assert "Picked-cell RMSE" in out
    # the picked cell of an EXACT structure has zero error vs brute force
    rmse = float(out.split("Picked-cell RMSE:")[1].splitlines()[0])
    assert rmse < 1e-5
    with open(obj_path) as f:
        obj = f.read()
    assert obj.count("\nf ") > 0 and obj.count("\nl ") == 12
