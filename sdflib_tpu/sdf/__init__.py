from .sdf_function import SdfFormat, SdfFunction  # noqa: F401
from .real import RealSdf  # noqa: F401
from .grid import UniformGridSdf  # noqa: F401
from .octree import OctreeSdf  # noqa: F401
from .exact_octree import ExactOctreeSdf  # noqa: F401
