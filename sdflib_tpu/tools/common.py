"""Shared CLI helpers for the tool suite."""
from __future__ import annotations

import numpy as np

from ..mesh import BoundingBox, Mesh, load_mesh

__all__ = ["load_model", "prepare_box", "TERMINATION_RULES"]

# CLI rule names mirror the reference's stringToTerminationRule
# (OctreeSdf.h:124-144) plus our internal names.
TERMINATION_RULES = {
    "trapezoidal_rule": "trapezoid",
    "trapezoid": "trapezoid",
    "simpsons_rule": "simpson",
    "simpson": "simpson",
    "by_distance_rule": "by_distance",
    "by_distance": "by_distance",
    "none": "none",
}


def load_model(path: str, normalize: bool = False) -> Mesh:
    """Load a mesh; optionally normalize coordinates to a 2-unit cube around
    the origin (SdfExporter/main.cpp:85-92)."""
    mesh = load_mesh(path)
    if normalize:
        bb = mesh.bounding_box
        scale = 2.0 / float(np.max(bb.size))
        v = (mesh.vertices - bb.center) * scale
        mesh = Mesh(v.astype(np.float32), mesh.indices)
    return mesh


def prepare_box(mesh: Mesh, bb_margin_percent: float = 20.0) -> BoundingBox:
    """Model box + margin as a percentage of the max extent
    (SdfExporter/main.cpp:96-98, default 20%)."""
    box = mesh.bounding_box
    margin = (bb_margin_percent / 100.0) * float(np.max(box.size))
    return box.add_margin(margin)
