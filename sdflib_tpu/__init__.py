"""sdflib_tpu — TPU-native differentiable signed-distance-field framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of
UPC-ViRVIG/SdfLib: exact triangle-list octrees, approximate
tricubic-polynomial octrees, brute-force oracles, uniform grids,
sphere-traced rendering, differentiable queries, serialization, and a CLI
tool suite — built for TPU meshes (pjit/shard_map) rather than ported from
the reference C++.
"""

from .mesh import BoundingBox, Mesh, load_mesh
from .triangle import TriangleDataSoA, calculate_mesh_triangle_data

__version__ = "0.1.0"

__all__ = [
    "BoundingBox",
    "Mesh",
    "load_mesh",
    "TriangleDataSoA",
    "calculate_mesh_triangle_data",
]
