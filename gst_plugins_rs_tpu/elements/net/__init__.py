from . import codecs, dashsink, gccbwe, hlssink, http, mp2t, onvif, raptorq, rtpbin2, rtpcodecs, rtppay, rtsp, rtpvideo, udp, webrtc, webrtchttp  # noqa: F401
