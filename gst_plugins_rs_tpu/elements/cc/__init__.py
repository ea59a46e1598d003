from . import elements, files, overlay, st2038  # noqa: F401
