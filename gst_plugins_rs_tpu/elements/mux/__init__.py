from . import flv, isobmff  # noqa: F401
