from .intersect import (closest_hit, any_hit, Hit,
                        ray_triangle, ray_sphere)  # noqa: F401
