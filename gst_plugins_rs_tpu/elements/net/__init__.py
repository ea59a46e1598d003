from . import codecs, rtppay, udp  # noqa: F401
