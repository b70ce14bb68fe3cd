from .camera import Camera  # noqa: F401
from .integrator import Renderer, render_image  # noqa: F401
