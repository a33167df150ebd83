"""Sharded sphere tracing: rays data-parallel over the mesh.

The reference dispatches one GL compute workgroup per 16x16 pixel tile on
a single GPU (reference: src/render_engine/RenderSdf.cpp:187); here the
ray batch is sharded over TPU chips and each chip marches its rays against
a replicated octree — no inter-chip traffic until the image is gathered.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..render.sphere_trace import TraceResult, trace_octree
from .mesh import default_mesh, pad_to_shards, replicated, sharded_rays
from .query import _device_put_structure

__all__ = ["sharded_trace"]


def sharded_trace(
    octree,
    origins,
    dirs,
    mesh=None,
    *,
    eps: float = 1e-5,
    far: float = 4.0,
    max_iters: int = 1024,
    beam: int | None = None,
) -> TraceResult:
    """trace_octree with rays sharded over the mesh's chips.

    The beam prepass defaults OFF here: its per-tile reductions
    (segment_sum/max over rays) change summation order under sharding,
    shifting beam start depths by last-ulp amounts and breaking the
    bit-equality this module guarantees vs the single-chip trace
    (the determinism test standing in for the reference's absent race
    detection, SURVEY.md S5.2). Pass beam=4 to trade that for the
    empty-space skip."""
    mesh = default_mesh() if mesh is None else mesh
    octree = _device_put_structure(octree, mesh)

    o = jnp.asarray(origins, jnp.float32).reshape(-1, 3)
    d = jnp.asarray(dirs, jnp.float32).reshape(-1, 3)
    R = o.shape[0]
    Rp = pad_to_shards(R, mesh)
    sh = sharded_rays(mesh)
    o = jax.device_put(jnp.pad(o, [(0, Rp - R), (0, 0)]), sh)
    # padded rays march a unit direction so step sizes stay finite
    d_pad = jnp.pad(d, [(0, Rp - R), (0, 0)])
    d_pad = jnp.where(
        (jnp.arange(Rp) < R)[:, None], d_pad, jnp.array([1.0, 0.0, 0.0])
    )
    d = jax.device_put(d_pad, sh)

    res = trace_octree(
        octree, o, d, eps=eps, far=far, max_iters=max_iters, beam=beam
    )
    shape = jnp.asarray(origins).shape[:-1]
    return TraceResult(
        res.hit[:R].reshape(shape),
        res.position[:R].reshape(shape + (3,)),
        res.depth[:R].reshape(shape),
        res.normal[:R].reshape(shape + (3,)),
        res.iterations[:R].reshape(shape),
    )
