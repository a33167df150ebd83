"""sdflib_tpu — TPU-native differentiable signed-distance-field framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of
UPC-ViRVIG/SdfLib: exact triangle-list octrees, approximate
tricubic-polynomial octrees, brute-force oracles, uniform grids,
sphere-traced rendering, differentiable queries, serialization, and a CLI
tool suite — built for TPU meshes (pjit/shard_map) rather than ported from
the reference C++.
"""

import os as _os

import jax as _jax

# Persistent XLA compilation cache: octree builds compile one kernel per
# (chunk, candidate-width) bucket; re-runs must not pay the (remote) TPU
# compile latency again. Opt out with SDFLIB_TPU_NO_COMPILE_CACHE=1.
# Enabled only when the environment explicitly selects a non-CPU platform:
# XLA:CPU AOT cache entries embed machine features and can SIGILL when
# reloaded on a host with different feature detection, and an unset
# JAX_PLATFORMS may auto-select CPU.
_platform = _os.environ.get("JAX_PLATFORMS", "")
if not _os.environ.get("SDFLIB_TPU_NO_COMPILE_CACHE") and _platform not in (
    "", "cpu"
):
    try:
        if _jax.config.jax_compilation_cache_dir is None:
            _jax.config.update(
                "jax_compilation_cache_dir",
                _os.path.expanduser("~/.cache/sdflib_tpu/jax_cache"),
            )
            # Cache even sub-second compiles: on remote-compile setups every
            # new-shape eager op costs a ~0.5 s round trip otherwise.
            _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:  # cache is best-effort; never block import
        pass

from .mesh import BoundingBox, Mesh, load_mesh
from .triangle import TriangleDataSoA, calculate_mesh_triangle_data

__version__ = "0.1.0"

# The SDF structures re-export lazily: the reference exposes everything
# under one `sdflib::` namespace (include/SdfLib/*.h), so users expect
# `sdflib_tpu.ExactOctreeSdf` etc., but importing them eagerly would pull
# the full builder/render stack into every `import sdflib_tpu`.
_LAZY = {
    "SdfFunction": ("sdf.sdf_function", "SdfFunction"),
    "SdfFormat": ("sdf.sdf_function", "SdfFormat"),
    "OctreeSdf": ("sdf.octree", "OctreeSdf"),
    "ExactOctreeSdf": ("sdf.exact_octree", "ExactOctreeSdf"),
    "UniformGridSdf": ("sdf.grid", "UniformGridSdf"),
    "RealSdf": ("sdf.real", "RealSdf"),
}


def __getattr__(name):
    entry = _LAZY.get(name)
    if entry is None:
        raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
    import importlib

    mod = importlib.import_module(f".{entry[0]}", __name__)
    value = getattr(mod, entry[1])
    globals()[name] = value
    return value


__all__ = [
    "BoundingBox",
    "Mesh",
    "load_mesh",
    "TriangleDataSoA",
    "calculate_mesh_triangle_data",
    *_LAZY,
]
