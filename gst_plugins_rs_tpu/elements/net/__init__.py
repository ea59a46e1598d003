from . import codecs, hlssink, rtpbin2, rtppay, udp  # noqa: F401
