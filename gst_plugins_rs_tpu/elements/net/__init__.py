from . import codecs, dashsink, gccbwe, hlssink, http, mp2t, rtpbin2, rtppay, udp  # noqa: F401
