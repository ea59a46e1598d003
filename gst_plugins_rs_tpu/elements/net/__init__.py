from . import codecs, dashsink, gccbwe, hlssink, http, mp2t, onvif, rtpbin2, rtpcodecs, rtppay, rtpvideo, udp  # noqa: F401
