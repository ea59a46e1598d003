from . import codecs, rtpbin2, rtppay, udp  # noqa: F401
