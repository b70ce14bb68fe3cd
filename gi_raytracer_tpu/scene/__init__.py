from .types import (Scene, Triangles, Spheres, Lights, Materials, Textures,
                    Fog, BVH)  # noqa: F401
from .build import SceneBuilder  # noqa: F401
from .scn import load_scene  # noqa: F401
from .objio import load_obj  # noqa: F401
