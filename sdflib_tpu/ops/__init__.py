from .point_triangle import (  # noqa: F401
    nearest_triangle,
    signed_distance_batch,
    signed_distance_grad_batch,
    signed_dist_pair,
    sq_dist_pair,
    sq_dist_naive,
)
