"""Benchmark harness. Prints ONE JSON line:
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Measures EXACT-octree SDF queries/s — the project's headline metric — on
the available accelerator (the reference's SdfError harness role,
src/tools/SdfError/main.cpp:44-97), with approximate-octree queries/s,
sphere-traced rays/s, and build times in "extra" (each perf rate with its
own labeled vs-target ratio).
Baseline target: 1e9 exact queries/s on a v5p-8 (4 chips) => 2.5e8 per chip;
vs_baseline = achieved per-chip exact rate / per-chip target.

Stage order (round-5 lesson): the CHEAP stages run first — the approx
build (~15 s warm) plus its query sweep and the 1024^2 sphere trace ride
ahead of the exact build (minutes cold), so a cold cache can no longer
starve every metric but the headline (rounds 3 AND 4 both shipped with
approx/trace/big rows missing for exactly this reason). The exact
headline stage itself is NOT budget-gated — it always runs; the optional
stages are gated on remaining wall budget (SDFLIB_BENCH_BUDGET_S, default
420 s) and report "skipped"/"error" markers instead of timing out the
harness. Built structures are cached under ~/.cache/sdflib_tpu/bench so
repeat runs skip the d2h-bound builds entirely.
"""
from __future__ import annotations

import json
import os
import time

import numpy as np

BUDGET_S = float(os.environ.get("SDFLIB_BENCH_BUDGET_S", "420"))
CACHE_DIR = os.path.expanduser("~/.cache/sdflib_tpu/bench")
_T0 = time.perf_counter()


def _remaining() -> float:
    return BUDGET_S - (time.perf_counter() - _T0)


def _bench_mesh(big: bool = False):
    # Deterministic benchmark mesh (no assets in the image): dense torus,
    # ~9k triangles (100k+ for the big variant). (An icosphere is
    # pathological for EXACT octrees: all triangles are equidistant from
    # interior cells, so the true influence sets there contain the mesh.)
    from sdflib_tpu.utils.primitives import make_torus

    if big:
        mesh = make_torus(R=0.3, r=0.12, nu=420, nv=120)
    else:
        mesh = make_torus(R=0.3, r=0.12, nu=96, nv=48)
    return mesh, mesh.bounding_box.add_margin(0.14)


# Error signatures of the remote-compile/transfer tunnel's transient
# failures; anything else is a real bug and is NOT worth two full-cost
# rebuild attempts (advisor finding r4).
_TRANSPORT_MARKERS = (
    "response body", "deadline", "unavailable", "socket", "connection",
    "timed out", "timeout", "413", "transport",
)


def _is_transport_error(e: Exception) -> bool:
    s = repr(e).lower()
    return any(m in s for m in _TRANSPORT_MARKERS)


def _load_or_build(path: str, build_fn, extra: dict, key: str):
    """Returns (sdf, build_seconds_or_None); caches to ``path``."""
    from sdflib_tpu.sdf.sdf_function import SdfFunction

    full = os.path.join(CACHE_DIR, path)
    if os.path.exists(full):
        sdf = SdfFunction.load(full)
        extra[f"{key}_cache"] = "hit"
        return sdf, None
    # The remote-compile tunnel flakes transiently ("response body closed
    # before all bytes were read"); a retry resumes from the persistent
    # compile cache, so it is cheap — and one flake must not cost the
    # round its numbers (round-3 lesson). Deterministic errors re-raise
    # immediately, and the timer restarts per attempt so the recorded
    # build time covers only the successful one.
    for attempt in range(3):
        t0 = time.perf_counter()
        try:
            sdf = build_fn()
            break
        except Exception as e:  # pragma: no cover - transport-dependent
            extra[f"{key}_build_retry{attempt}"] = repr(e)[:120]
            if attempt == 2 or not _is_transport_error(e):
                raise
    dt = time.perf_counter() - t0
    os.makedirs(CACHE_DIR, exist_ok=True)
    sdf.save(full)
    extra[f"{key}_cache"] = "built"
    return sdf, dt


def main():
    import jax
    import jax.numpy as jnp

    from sdflib_tpu.sdf.octree import OctreeSdf
    from sdflib_tpu.sdf.exact_octree import ExactOctreeSdf

    extra: dict = {}
    per_chip_target = 2.5e8       # 1e9 exact q/s on v5p-8 (4 chips)
    rays_chip_target = 2.5e7      # 1e8 rays/s on v5p-8 (4 chips)

    mesh, box = _bench_mesh()
    lo = np.asarray(box.min) + 1e-4
    hi = np.asarray(box.max) - 1e-4

    # ---- approximate octree queries/s (cheap: runs FIRST) -------------------
    # ~15 s warm build vs the exact build's minutes; running it first means
    # a cold exact build can no longer starve this number (r3+r4 lesson).
    oct_ = None
    try:
        oct_, built_s = _load_or_build(
            "torus_approx_d6.npz",
            lambda: OctreeSdf(
                mesh, box, max_depth=6, start_depth=2,
                termination_threshold=1e-3,
                init_algorithm="no_continuity",
            ),
            extra, "approx",
        )
        if built_s is not None:
            extra["build_s"] = built_s
        oct_.build_query_grid()  # O(1)-descent acceleration
        na = 1 << 22
        pts = jnp.asarray(
            np.random.default_rng(1).uniform(lo, hi, (na, 3))
            .astype(np.float32)
        )
        d = oct_.get_distance(pts)
        float(jnp.sum(d))
        iters = 8
        t0 = time.perf_counter()
        for _ in range(iters):
            d = oct_.get_distance(pts)
        float(jnp.sum(d))
        qps = na * iters / (time.perf_counter() - t0)
        extra["approx_octree_queries_per_s"] = qps
        extra["approx_vs_target"] = qps / per_chip_target
        extra["octree_words_u32"] = int(oct_.octree_data.shape[0])
        del d, pts
    except Exception as e:
        extra["approx_error"] = repr(e)[:200]

    # ---- sphere-traced rays/s (cheap: rides the approx structure) -----------
    if oct_ is not None and _remaining() > 45:
        try:
            from sdflib_tpu.render.sphere_trace import trace_octree

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
            # rays staged ON DEVICE before timing: the metric is the
            # tracer, not the tunnel's ~35 MB/s h2d (a real TPU host
            # uploads at GB/s; and a fixed-camera re-render reuses rays)
            origins = jnp.asarray(origins)
            dirs = jnp.asarray(dirs)
            float(jnp.sum(origins) + jnp.sum(dirs))
            res = trace_octree(oct_, origins, dirs, max_iters=1024)
            float(jnp.sum(res.depth))
            best = np.inf
            for _ in range(3):
                t0 = time.perf_counter()
                res = trace_octree(oct_, origins, dirs, max_iters=1024)
                float(jnp.sum(res.depth))
                best = min(best, time.perf_counter() - t0)
            rays_per_s = R * R / best
            extra["sphere_trace_rays_per_s"] = rays_per_s
            extra["rays_vs_target"] = rays_per_s / rays_chip_target
            del res
        except Exception as e:
            extra["trace_error"] = repr(e)[:200]
    elif oct_ is not None:
        extra["skipped_trace"] = "budget"
    del oct_

    # ---- headline: exact octree queries/s (mandatory, never gated) ---------
    ex, built_s = _load_or_build(
        "torus_exact_d6.npz",
        lambda: ExactOctreeSdf(
            mesh, box, max_depth=6, start_depth=2, min_triangles_per_node=32
        ),
        extra, "exact",
    )
    if built_s is not None:
        extra["exact_build_s"] = built_s

    ne = 1 << 21
    rng = np.random.default_rng(0)
    epts = jnp.asarray(rng.uniform(lo, hi, (ne, 3)).astype(np.float32))

    # HARDWARE oracle check: the pytest suite runs on the CPU mesh only,
    # so a TPU-only wrongness (e.g. the round-2 denormal leaf-id carrier,
    # flushed to zero on v5e but bit-exact on CPU) is invisible to it.
    # 10k points against brute force cost ~1 s and make the headline
    # number un-fakeable.
    from sdflib_tpu.sdf.real import RealSdf

    oracle_pts = jnp.asarray(
        np.random.default_rng(7).uniform(
            np.asarray(box.min) + 1e-4, np.asarray(box.max) - 1e-4,
            (10000, 3),
        ).astype(np.float32)
    )
    d_oracle = RealSdf(mesh).get_distance(oracle_pts)
    err = float(
        jnp.max(jnp.abs(ex.get_distance(oracle_pts) - d_oracle))
    )
    extra["exact_oracle_max_err"] = err
    if err > 1e-4:
        extra["exact_oracle_FAILED"] = True

    # timing fences are scalar readbacks: block_until_ready can return
    # before device completion through the remote transport (PERF.md)
    impl_qps = {}
    de = ex.get_distance(epts)
    cks_ref = float(jnp.sum(de))
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        de = ex.get_distance(epts)
        float(jnp.sum(de))
        best = min(best, time.perf_counter() - t0)
    impl_qps[getattr(ex, "scan_impl", "xla")] = ne / best
    # Alternate scan backends: optional, gated — a fresh compile through
    # the tunnel costs real wall time. The Mosaic backends are known NOT
    # to compile on v5e (dynamic single-lane slices; ops/pallas_scan.py)
    # and each failed attempt burns ~3.5 min of budget, so they are
    # excluded unless SDFLIB_BENCH_PALLAS=1 asks for a recheck.
    impls = ["xla", "xla_window"]
    if os.environ.get("SDFLIB_BENCH_PALLAS", "0") == "1":
        impls += ["pallas", "pallas_window"]
    else:
        extra["skipped_impl_pallas"] = "mosaic-unsupported-v5e"
        extra["skipped_impl_pallas_window"] = "mosaic-unsupported-v5e"
    for impl in impls:
        if impl in impl_qps:
            continue
        if _remaining() < 120:
            extra[f"skipped_impl_{impl}"] = "budget"
            continue
        try:
            ex.set_scan_impl(impl)
            de = ex.get_distance(epts)
            cks = float(jnp.sum(de))
            if abs(cks - cks_ref) > 1e-3 * max(1.0, abs(cks_ref)):
                extra[f"impl_{impl}_checksum_mismatch"] = cks
                continue  # disagreeing backend: exclude from the headline
            best = np.inf
            for _ in range(2):
                t0 = time.perf_counter()
                de = ex.get_distance(epts)
                float(jnp.sum(de))
                best = min(best, time.perf_counter() - t0)
            impl_qps[impl] = ne / best
        except Exception as e:
            extra[f"impl_{impl}_error"] = repr(e)[:200]
    best_impl = max(impl_qps, key=impl_qps.get)
    exact_qps = impl_qps[best_impl]
    extra["exact_scan_impl"] = best_impl
    extra["exact_qps_by_impl"] = impl_qps
    extra["num_triangles"] = int(mesh.indices.size // 3)
    del de, ex

    # ---- real-mesh scale: >=100k-triangle build + query (optional) ----------
    # (BASELINE configs name Armadillo/Thingi10K-scale meshes; no assets in
    # the image, so a dense torus at 100k+ triangles stands in.) A cold
    # depth-7 build costs tens of minutes through the tunnel: only attempt
    # it when the disk cache is warm or the budget clearly covers it.
    big_cached = os.path.exists(os.path.join(CACHE_DIR, "torus100k_exact_d7.npz"))
    if (big_cached and _remaining() > 60) or _remaining() > 1800:
        try:
            big_mesh, big_box = _bench_mesh(big=True)
            big_ex, built_s = _load_or_build(
                "torus100k_exact_d7.npz",
                lambda: ExactOctreeSdf(
                    big_mesh, big_box, max_depth=7, start_depth=3,
                    min_triangles_per_node=32,
                ),
                extra, "big_exact",
            )
            if built_s is not None:
                extra["big_exact_build_s"] = built_s
            nb = 1 << 20
            bpts = jnp.asarray(
                rng.uniform(
                    np.asarray(big_box.min) + 1e-4,
                    np.asarray(big_box.max) - 1e-4,
                    (nb, 3),
                ).astype(np.float32)
            )
            # random points over a depth-7 domain land ~0.5/leaf: the
            # window scan (built for leaf-coherent batches) degrades
            # there while the grouped scan adapts its group width —
            # measure both and report the winner per structure
            big_qps = {}
            for impl in ("xla", "xla_window"):
                try:
                    big_ex.set_scan_impl(impl)
                except ValueError:
                    continue
                db = big_ex.get_distance(bpts)
                float(jnp.sum(db))
                t0 = time.perf_counter()
                db = big_ex.get_distance(bpts)
                float(jnp.sum(db))
                big_qps[impl] = nb / (time.perf_counter() - t0)
                if _remaining() < 60:
                    break
            extra["big_exact_queries_per_s"] = max(big_qps.values())
            extra["big_exact_qps_by_impl"] = big_qps
            extra["big_mesh_triangles"] = int(big_mesh.indices.size // 3)
            extra["big_exact_depth"] = int(big_ex.max_depth)
            tpl = big_ex.build_stats.get("tris_per_leaf")
            if tpl is not None:
                extra["big_mean_tris_per_leaf"] = float(np.mean(tpl))
            del db, big_ex
        except Exception as e:
            extra["big_exact_error"] = repr(e)[:200]
    else:
        extra["skipped_big_exact"] = (
            "budget" if big_cached else "no cache + budget"
        )

    dev = jax.devices()[0]
    extra["device"] = str(getattr(dev, "device_kind", dev))
    extra["bench_wall_s"] = round(time.perf_counter() - _T0, 1)
    print(json.dumps({
        "metric": "exact_octree_queries_per_s",
        "value": exact_qps,
        "unit": "queries/s/chip",
        "vs_baseline": exact_qps / per_chip_target,
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
