"""Pallas grouped-scan kernel (ops/pallas_scan.py) correctness.

Runs in interpret mode on the CPU mesh: the same traced kernel body XLA
compiles for TPU, minus the Mosaic lowering. Hardware-speed behavior is
measured by bench.py; parity here is against the XLA grouped scan, which
is itself golden-anchored to the compiled reference kernels.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from sdflib_tpu.ops.pallas_scan import exact_scan_grouped_pallas
from sdflib_tpu.ops.point_triangle import sq_dist_from_vertex_cols
from sdflib_tpu.sdf.exact_octree import ExactOctreeSdf
from sdflib_tpu.utils.primitives import make_torus


def _sq_to(tri9, p):
    v = lambda r: tri9[r][None, None]
    return float(
        np.asarray(
            sq_dist_from_vertex_cols(
                jnp.asarray(p[0:1, None]),
                jnp.asarray(p[1:2, None]),
                jnp.asarray(p[2:3, None]),
                v,
            )
        )[0, 0]
    )


def test_kernel_matches_bruteforce_synthetic():
    """Random CSR tables + random grouped points vs per-point brute force."""
    rng = np.random.default_rng(0)
    CH, L, T, NG, G, GB, H = 64, 23, 200, 256, 8, 128, 64

    tri = rng.normal(size=(T, 9)).astype(np.float32)
    counts = rng.integers(0, 150, size=L).astype(np.int32)
    counts[3] = 0  # an empty leaf
    nchunks = -(-counts // CH)
    offs = np.zeros(L, np.int32)
    acc = 0
    for l in range(L):
        offs[l] = acc * CH
        acc += int(nchunks[l])
    NB = -(-max(acc, 1) // H) * H
    bucket_ids = np.full((NB, CH), -1, np.int32)
    for l in range(L):
        ids = rng.integers(0, T, size=counts[l]).astype(np.int32)
        row0 = offs[l] // CH
        for k, t in enumerate(ids):
            bucket_ids[row0 + k // CH, k % CH] = t
    fields = np.zeros((NB, 9 * CH), np.float32)
    for r in range(NB):
        for c in range(CH):
            t = bucket_ids[r, c]
            if t >= 0:
                fields[r, 0 * CH + c : 9 * CH + c : CH] = tri[t]

    n_live = 180
    gleaf = np.zeros(NG, np.int32)
    gleaf[:n_live] = np.sort(rng.integers(0, L, size=n_live)).astype(np.int32)
    gpts = rng.normal(size=(NG, G, 3)).astype(np.float32)
    gpts[n_live:] = np.inf       # padding groups
    gpts[5, 3:] = np.inf         # partially-filled group

    win = np.asarray(
        exact_scan_grouped_pallas(
            jnp.asarray(bucket_ids), jnp.asarray(fields),
            jnp.asarray(gpts), jnp.asarray(gleaf),
            jnp.asarray(offs // CH), jnp.asarray(counts),
            GB=GB, H=H, interpret=True,
        )
    )

    for g in range(0, n_live, 7):
        l = gleaf[g]
        if counts[l] == 0:
            continue
        row0 = offs[l] // CH
        cand = [
            int(bucket_ids[row0 + k // CH, k % CH]) for k in range(counts[l])
        ]
        for lane in range(G):
            p = gpts[g, lane]
            if not np.isfinite(p[0]):
                continue
            ref = min(_sq_to(tri[t], p) for t in cand)
            got = _sq_to(tri[win[g, lane]], p)
            assert got == pytest.approx(ref, rel=1e-5, abs=1e-6)


@pytest.fixture(scope="module")
def torus_sdf():
    """One shared structure for the impl-parity tests (builds dominate
    their wall time; scan settings are restored by each test)."""
    mesh = make_torus(R=0.3, r=0.12, nu=20, nv=12)
    box = mesh.bounding_box.add_margin(0.1)
    return ExactOctreeSdf(
        mesh, box, max_depth=4, start_depth=1, min_triangles_per_node=16
    )


def test_fused_query_impls_match_xla(torus_sdf):
    """End-to-end: ExactOctreeSdf distances under every alternate scan
    backend equal the XLA grouped-scan distances on a real structure
    (pallas backends in interpret mode; xla_window compiled)."""
    sdf = torus_sdf
    rng = np.random.default_rng(1)
    pts = rng.uniform(-0.5, 0.5, size=(768, 3)).astype(np.float32)
    sdf.set_scan_impl("xla")
    d_xla = np.asarray(sdf.get_distance(pts))
    for impl in ("xla_window", "pallas", "pallas_window"):
        sdf.set_scan_impl(impl)
        d_imp = np.asarray(sdf.get_distance(pts))
        np.testing.assert_allclose(d_imp, d_xla, rtol=1e-5, atol=1e-6)

    # gradients route through the winner ids: cover every backend
    sdf.set_scan_impl("xla")
    _, g_ref = sdf.get_distance_and_gradient(pts[:128])
    g_ref = np.asarray(g_ref)
    for impl in ("xla_window", "pallas", "pallas_window"):
        sdf.set_scan_impl(impl)
        _, g_imp = sdf.get_distance_and_gradient(pts[:128])
        np.testing.assert_allclose(
            np.asarray(g_imp), g_ref, rtol=1e-5, atol=1e-6
        )
    sdf.set_scan_impl("xla")


def test_xla_window_widths_and_sparse_batches(torus_sdf):
    """The window scan must stay exact for every window width and for
    SPARSE batches whose windows straddle distant leaves (the gap-jump
    path: rows of non-member leaves are skipped, not truncated)."""
    sdf = torus_sdf
    rng = np.random.default_rng(7)
    pts = rng.uniform(-0.5, 0.5, size=(512, 3)).astype(np.float32)
    sdf.set_scan_impl("xla")
    d_xla = np.asarray(sdf.get_distance(pts))
    sdf.set_scan_impl("xla_window")
    for width in (4, 16, 64):
        sdf.window_width = width
        d_w = np.asarray(sdf.get_distance(pts))
        np.testing.assert_allclose(d_w, d_xla, rtol=1e-5, atol=1e-6)
    # a handful of points scattered over the whole domain: every window
    # spans many distant leaves
    sdf.window_width = 8
    few = rng.uniform(-0.5, 0.5, size=(17, 3)).astype(np.float32)
    sdf.set_scan_impl("xla")
    d_ref = np.asarray(sdf.get_distance(few))
    sdf.set_scan_impl("xla_window")
    d_few = np.asarray(sdf.get_distance(few))
    np.testing.assert_allclose(d_few, d_ref, rtol=1e-5, atol=1e-6)
    sdf.set_scan_impl("xla")
    sdf.window_width = 8


def test_wide_scan_chunk_repack(torus_sdf):
    """chunk=128 repacks the CSR into wider spans (full-vreg evals);
    distances must be unchanged under every scan backend."""
    sdf = torus_sdf
    rng = np.random.default_rng(2)
    pts = rng.uniform(-0.5, 0.5, size=(1024, 3)).astype(np.float32)
    sdf.set_scan_impl("xla")
    d64 = np.asarray(sdf.get_distance(pts))
    sdf.set_scan_chunk(128)
    try:
        d128 = np.asarray(sdf.get_distance(pts))
        np.testing.assert_allclose(d128, d64, rtol=1e-6, atol=1e-7)
        for impl in ("xla_window", "pallas", "pallas_window"):
            sdf.set_scan_impl(impl)
            d128i = np.asarray(sdf.get_distance(pts))
            np.testing.assert_allclose(d128i, d64, rtol=1e-6, atol=1e-7)
    finally:
        sdf.set_scan_impl("xla")
        sdf.set_scan_chunk(64)  # restore for other tests on the fixture
