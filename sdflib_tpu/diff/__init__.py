from .query import octree_query_diff, octree_coefficients  # noqa: F401
