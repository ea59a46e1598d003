from . import codecs, dashsink, gccbwe, hlssink, http, janusvr, kvs_ueps, mp2t, onvif, raptorq, rtpbin2, rtpcodecs, rtppay, rtsp, rtpvideo, udp, webrtc, webrtcbin2, webrtchttp, whipwhep  # noqa: F401
