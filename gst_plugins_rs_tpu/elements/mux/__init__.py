from . import isobmff  # noqa: F401
