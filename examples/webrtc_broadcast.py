"""WebRTC broadcast demo: producer -> signalling server -> two consumers.

Everything is in-repo: the gst-webrtc signalling relay, ICE (RFC 8445),
DTLS 1.2 (RFC 6347), SRTP (RFC 3711).  Run:

    python examples/webrtc_broadcast.py

A ticks-wave audio stream is payloaded as L16 RTP, published through
webrtcsink, and two webrtcsrc consumers each receive their own encrypted
media leg and depayload back to audio.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(globals().get("__file__", "examples/x.py")))))  # run from anywhere
import threading
import time


import gst_plugins_rs_tpu as fx
from gst_plugins_rs_tpu.net.webrtc_signalling import SignallingServer


def main():
    server = SignallingServer()
    print(f"signalling server on {server.uri}")

    send_pipe = fx.parse_launch(
        "audiotestsrc wave=ticks num-buffers=50 samplesperbuffer=480 "
        "! audio/x-raw,format=S16,rate=48000,channels=2 "
        "! rtpL16pay2 ssrc=7 seqnum-offset=0 timestamp-offset=0 "
        f"! webrtcsink name=sink signaller-uri={server.uri}"
    )
    sink = send_pipe.by_name("sink")

    recv_pipes = []
    for i in range(2):
        p = fx.parse_launch(
            f"webrtcsrc signaller-uri={server.uri} timeout=3000000000 "
            "! rtpL16depay2 ! appsink name=out"
        )
        recv_pipes.append(p)

    from gst_plugins_rs_tpu.core.element import State

    # register the producer and propagate caps (one priming iteration),
    # then hold media until both consumers' DTLS legs are up
    send_pipe.set_state(State.PLAYING)
    send_pipe.run(max_iterations=1)

    threads = []
    for p in recv_pipes:
        t = threading.Thread(target=p.play_until_eos, daemon=True)
        t.start()
        threads.append(t)

    deadline = time.monotonic() + 20
    while len(sink.connected_sessions()) < 2 and time.monotonic() < deadline:
        time.sleep(0.1)
    print(f"consumers connected: {len(sink.connected_sessions())}")

    send_pipe.run()
    send_pipe.set_state(State.NULL)
    for t in threads:
        t.join(30)
    for i, p in enumerate(recv_pipes):
        audio = p.by_name("out").concat_audio()
        print(f"consumer {i}: received {audio.shape[0]} samples over DTLS-SRTP")
    server.stop()


if __name__ == "__main__":
    main()
