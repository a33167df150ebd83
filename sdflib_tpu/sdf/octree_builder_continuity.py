"""CONTINUITY octree builder (C0 across leaf faces).

TPU-native equivalent of the reference's breadth-first no-delay continuity
algorithm (src/sdf/OctreeSdfBreadthFirstNoDelay.h:83-1226). Not yet
implemented — see octree_builder.py for the NO_CONTINUITY path.
"""
from __future__ import annotations

from .octree_builder import OctreeBuildResult


def build_octree_continuity(*args, **kwargs) -> OctreeBuildResult:
    raise NotImplementedError(
        "CONTINUITY builds land in a later milestone; use "
        "init_algorithm='no_continuity' for now."
    )
