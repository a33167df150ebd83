"""CLI tests for the debug-tool suite (SdfErrorCompare / ImageQueryTime /
CalculateInterpolationParameters / OctreeExactMeanOfTrianglesViewer parity).
"""
import os

import numpy as np
import pytest

from sdflib_tpu.sdf.exact_octree import ExactOctreeSdf
from sdflib_tpu.sdf.octree import OctreeSdf
from sdflib_tpu.tools import (
    exact_mean_triangles,
    image_query_time,
    interp_params,
    sdf_error_compare,
)
from sdflib_tpu.utils.primitives import make_icosphere


@pytest.fixture(scope="module")
def containers(tmp_path_factory):
    d = tmp_path_factory.mktemp("tools")
    mesh = make_icosphere(subdivisions=2, radius=0.35)
    box = mesh.bounding_box.add_margin(0.14)
    oct_ = OctreeSdf(mesh, box, max_depth=4, start_depth=1,
                     termination_threshold=1e-3)
    ex = ExactOctreeSdf(mesh, box, max_depth=4, start_depth=1,
                        min_triangles_per_node=32)
    oct_path = str(d / "oct.npz")
    ex_path = str(d / "ex.npz")
    oct_.save(oct_path)
    ex.save(ex_path)
    return d, oct_path, ex_path


def test_sdf_error_compare_runs(containers, capsys):
    d, oct_path, ex_path = containers
    rc = sdf_error_compare.main(
        [ex_path, oct_path, "-m", "0.01", "--histogram_bins", "5", "--json"]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "RMSE" in out and '"histogram"' in out


def test_image_query_time_writes_pngs(containers):
    d, oct_path, _ = containers
    prefix = str(d / "iqt")
    rc = image_query_time.main([oct_path, prefix, "-w", "64"])
    assert rc == 0
    for suffix in ("_value.png", "_cost.png"):
        p = prefix + suffix
        assert os.path.exists(p) and os.path.getsize(p) > 100


def test_interp_params_verifies(capsys):
    rc = interp_params.main([])
    assert rc == 0
    out = capsys.readouterr().out
    assert "OK" in out and "round-trip" in out


def test_interp_params_c_output(capsys):
    rc = interp_params.main(["--print_c"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "kTricubicMatrix[64][64]" in out


def test_exact_mean_triangles_heatmap(containers, capsys):
    d, _, ex_path = containers
    png = str(d / "heat.png")
    rc = exact_mean_triangles.main([ex_path, png, "-w", "64", "--json"])
    assert rc == 0
    assert os.path.exists(png) and os.path.getsize(png) > 100
    assert "mean_tris_per_leaf" in capsys.readouterr().out


def test_sdf_light_renders(containers):
    from sdflib_tpu.tools import sdf_light

    d, oct_path, _ = containers
    png = str(d / "lit.png")
    rc = sdf_light.main([oct_path, png, "--width", "64", "--height", "64",
                         "--max_iters", "96"])
    assert rc == 0
    assert os.path.exists(png) and os.path.getsize(png) > 400


def test_mesh_preview_renders(tmp_path):
    """Mesh-preview tool (the viewer's rasterized model pass,
    SdfViewer/main.cpp:221,308) draws a source mesh straight from disk."""
    from sdflib_tpu.tools import mesh_preview

    mesh = make_icosphere(subdivisions=1, radius=0.35)
    obj = tmp_path / "ico.obj"
    verts = np.asarray(mesh.vertices)
    faces = np.asarray(mesh.indices).reshape(-1, 3) + 1
    with open(obj, "w") as f:
        for v in verts:
            f.write(f"v {v[0]} {v[1]} {v[2]}\n")
        for a, b, c in faces:
            f.write(f"f {a} {b} {c}\n")

    for mode in ("normal", "lit"):
        png = str(tmp_path / f"prev_{mode}.png")
        rc = mesh_preview.main([
            str(obj), png, "--width", "48", "--height", "48",
            "--mode", mode, "--max_iters", "64",
        ])
        assert rc == 0
        assert os.path.exists(png) and os.path.getsize(png) > 100
