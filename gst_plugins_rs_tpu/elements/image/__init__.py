from . import cdg, codecs, overlay  # noqa: F401
