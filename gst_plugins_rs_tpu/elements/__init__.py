"""Element library. Importing this package registers all elements."""
from . import sinks, sources  # noqa: F401
from .audiofx import audioecho, ebur128level  # noqa: F401
from .generic import basic  # noqa: F401
from .video import colorlut, hsv  # noqa: F401
