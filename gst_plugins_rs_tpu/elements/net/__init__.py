from . import codecs, dashsink, gccbwe, hlssink, http, janusvr, mp2t, onvif, raptorq, rtpbin2, rtpcodecs, rtppay, rtsp, rtpvideo, udp, webrtc, webrtchttp, whipwhep  # noqa: F401
