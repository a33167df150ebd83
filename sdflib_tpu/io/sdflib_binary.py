"""Reference-format (.bin) serialization interop.

Reads and writes the reference's cereal PortableBinaryArchive containers
(reference: src/sdf/SdfFunction.cpp:9-79) so structures built by either
implementation are interchangeable:

  byte 0      : archive endianness flag (0x01 = little endian, cereal
                portable_binary.hpp writes a bool on construction)
  int32       : SdfFormat enum (GRID=0, OCTREE=1, EXACT_OCTREE=2;
                SdfFunction.h:16-22)
  GRID        : BoundingBox (6 f32) + ivec3 gridSize (3 i32)
                + vector<float> grid (u64 count + data)
                (UniformGridSdf.h:39-58)
  OCTREE      : BoundingBox + int32 startGridSize + u32 maxDepth
                + f32 valueRange + f32 minBorderValue
                + vector<OctreeNode> (u64 count + u32 data)
                (OctreeSdf.h:222-238)

EXACT_OCTREE uses the reference's bit-encoded leaf compression
(ExactOctreeSdf.h:138-165); import/export of that encoding is not yet
implemented — use the native .npz container for exact octrees.
"""
from __future__ import annotations

import struct

import numpy as np

__all__ = ["save_sdflib_bin", "load_sdflib_bin"]

_FMT_GRID, _FMT_OCTREE, _FMT_EXACT = 0, 1, 2


class _Reader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def take(self, n: int) -> bytes:
        out = self.data[self.pos : self.pos + n]
        if len(out) != n:
            raise ValueError("Truncated .bin container")
        self.pos += n
        return out

    def u8(self) -> int:
        return self.take(1)[0]

    def i32(self) -> int:
        return struct.unpack("<i", self.take(4))[0]

    def u32(self) -> int:
        return struct.unpack("<I", self.take(4))[0]

    def u64(self) -> int:
        return struct.unpack("<Q", self.take(8))[0]

    def f32(self) -> float:
        return struct.unpack("<f", self.take(4))[0]

    def f32v(self, n: int) -> np.ndarray:
        return np.frombuffer(self.take(4 * n), dtype="<f4").copy()

    def vec_u32(self) -> np.ndarray:
        n = self.u64()
        return np.frombuffer(self.take(4 * n), dtype="<u4").copy()

    def vec_f32(self) -> np.ndarray:
        n = self.u64()
        return np.frombuffer(self.take(4 * n), dtype="<f4").copy()


def load_sdflib_bin(path: str):
    """Load a reference .bin container into the native structures."""
    from ..mesh import BoundingBox
    from ..sdf.grid import UniformGridSdf
    from ..sdf.octree import OctreeSdf

    with open(path, "rb") as f:
        r = _Reader(f.read())

    endian = r.u8()
    if endian != 1:
        raise ValueError("Only little-endian .bin containers are supported")
    fmt = r.i32()

    if fmt == _FMT_OCTREE:
        box_min = r.f32v(3)
        box_max = r.f32v(3)
        start_grid_size = r.i32()
        max_depth = r.u32()
        value_range = r.f32()
        min_border = r.f32()
        octree_data = r.vec_u32()
        state = {
            "box_min": box_min,
            "box_max": box_max,
            "start_grid_size": np.int32(start_grid_size),
            "max_depth": np.int32(max_depth),
            "value_range": np.float32(value_range),
            "min_border_value": np.float32(min_border),
            "octree_data": octree_data,
            "interpolation": np.array("tricubic"),
            "leaf_depths": np.zeros(0, np.int32),
        }
        return OctreeSdf._from_state_arrays(state)

    if fmt == _FMT_GRID:
        box_min = r.f32v(3)
        box_max = r.f32v(3)
        gs = np.frombuffer(r.take(12), dtype="<i4").copy()
        grid = r.vec_f32()
        state = {
            "box_min": box_min,
            "box_max": box_max,
            "grid_size": gs,
            # reference stores z-major flat; native layout is (nz, ny, nx)
            "grid": grid.reshape(gs[2], gs[1], gs[0]),
        }
        return UniformGridSdf._from_state_arrays(state)

    if fmt == _FMT_EXACT:
        raise NotImplementedError(
            "EXACT_OCTREE .bin import (bit-encoded leaves) is not yet "
            "supported; use the native .npz container"
        )
    raise ValueError(f"Unknown SdfFormat {fmt} in {path!r}")


def save_sdflib_bin(sdf, path: str) -> None:
    """Write a reference-compatible .bin container."""
    from ..sdf.grid import UniformGridSdf
    from ..sdf.octree import OctreeSdf

    out = bytearray()
    out += b"\x01"  # little-endian archive flag

    if isinstance(sdf, OctreeSdf):
        if sdf.interpolation != "tricubic":
            raise ValueError(
                ".bin export requires tricubic octrees (the reference's "
                "compiled interpolation method, OctreeSdf.cpp:16)"
            )
        out += struct.pack("<i", _FMT_OCTREE)
        out += np.asarray(sdf.box.min, "<f4").tobytes()
        out += np.asarray(sdf.box.max, "<f4").tobytes()
        out += struct.pack("<i", sdf.start_grid_size)
        out += struct.pack("<I", sdf.max_depth)
        out += struct.pack("<f", sdf.value_range)
        out += struct.pack("<f", sdf.min_border_value)
        data = np.asarray(sdf.octree_data, "<u4")
        out += struct.pack("<Q", data.size)
        out += data.tobytes()
    elif isinstance(sdf, UniformGridSdf):
        out += struct.pack("<i", _FMT_GRID)
        out += np.asarray(sdf.box.min, "<f4").tobytes()
        out += np.asarray(sdf.box.max, "<f4").tobytes()
        nx, ny, nz = sdf.grid_size
        out += struct.pack("<3i", nx, ny, nz)
        grid = np.asarray(sdf.grid, "<f4")  # (nz, ny, nx) -> z-major flat
        out += struct.pack("<Q", grid.size)
        out += grid.tobytes()
    else:
        raise NotImplementedError(
            f".bin export not supported for {type(sdf).__name__}"
        )

    with open(path, "wb") as f:
        f.write(bytes(out))
