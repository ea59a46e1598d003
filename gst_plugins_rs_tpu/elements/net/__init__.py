from . import codecs, dashsink, gccbwe, hlssink, http, mp2t, onvif, rtpbin2, rtppay, udp  # noqa: F401
