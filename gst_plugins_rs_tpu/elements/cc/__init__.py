from . import elements, files, overlay  # noqa: F401
