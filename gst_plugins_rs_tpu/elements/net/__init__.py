from . import codecs, gccbwe, hlssink, mp2t, rtpbin2, rtppay, udp  # noqa: F401
