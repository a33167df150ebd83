"""Sharded SDF queries: points data-parallel, structure replicated.

Works with any SdfFunction whose query path is jit-traceable (OctreeSdf,
ExactOctreeSdf, UniformGridSdf, RealSdf): the point batch is placed with a
"rays"-sharded NamedSharding and the structure arrays replicated; the jitted
query then runs SPMD with zero communication in the forward pass (the
mapping demanded by SURVEY.md S5.7 / BASELINE north star).
"""
from __future__ import annotations

import copy

import numpy as np
import jax
import jax.numpy as jnp

from .mesh import default_mesh, pad_to_shards, replicated, sharded_rays

__all__ = ["sharded_distance", "sharded_distance_and_gradient"]


def _device_put_structure(sdf, mesh):
    """Return a shallow copy of the SDF whose device arrays are replicated
    onto every chip of the mesh. The caller's object is never mutated —
    queries through this module leave single-chip placement intact."""
    rep = replicated(mesh)
    out = copy.copy(sdf)
    for name in (
        "octree_data",
        "leaf_offset",
        "bucket_row0",
        "leaf_count",
        "leaf_centers",
        "tri_flat",        # id-only structures' query fallback reads it
        "bucket_ids",
        "bucket_fields",
        "bucket_cmin",
        "packed_fields",
        "_leaf_grid",
        "grid_values",
    ):
        arr = getattr(out, name, None)
        if isinstance(arr, jax.Array):
            setattr(out, name, jax.device_put(arr, rep))
    tris = getattr(out, "triangles", None)
    if tris is not None:
        out.triangles = jax.tree.map(
            lambda a: jax.device_put(jnp.asarray(a), rep), tris
        )
    return out


def _shard_points(points, mesh):
    pts = jnp.asarray(points, jnp.float32)
    flat = pts.reshape(-1, 3)
    P_ = flat.shape[0]
    Pp = pad_to_shards(P_, mesh)
    flat = jnp.pad(flat, [(0, Pp - P_), (0, 0)])
    return jax.device_put(flat, sharded_rays(mesh)), pts.shape, P_


def sharded_distance(sdf, points, mesh=None):
    """Distances for a point batch sharded over the mesh's chips."""
    mesh = default_mesh() if mesh is None else mesh
    rep = _device_put_structure(sdf, mesh)
    flat, shape, P_ = _shard_points(points, mesh)
    d = rep.get_distance(flat)
    return d[:P_].reshape(shape[:-1])


def sharded_distance_and_gradient(sdf, points, mesh=None):
    """Distances + gradients, points sharded over the mesh's chips."""
    mesh = default_mesh() if mesh is None else mesh
    rep = _device_put_structure(sdf, mesh)
    flat, shape, P_ = _shard_points(points, mesh)
    d, g = rep.get_distance_and_gradient(flat)
    return d[:P_].reshape(shape[:-1]), g[:P_].reshape(shape)
