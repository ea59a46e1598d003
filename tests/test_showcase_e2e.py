"""Cross-subsystem showcase pipelines — many layers in one run.

Each test chains subsystems that have so far only been integration-tested
pairwise, the way a production user would compose them (the reference's
equivalent confidence comes from whole-ecosystem gst-launch use):

  * analytics inference -> tensor decode -> colorspace convert -> AV1
    encode -> fMP4 mux, then demuxed by the SYSTEM libavformat and decoded
    by libdav1d — external oracles on the container AND the bitstream;
  * AV1 encode -> RTP payload (RFC 9185) -> depayload -> decode: the
    media-over-RTP transport loop.

Skipped when the native avshim can't build.
"""
import numpy as np
import pytest

import gst_plugins_rs_tpu as fx
from gst_plugins_rs_tpu.codecs import avlib

pytestmark = pytest.mark.skipif(
    not avlib.available(), reason="system libav shim unavailable")


def test_analytics_av1_fmp4_external_demux_and_decode(tmp_path):
    n = 8
    p = fx.parse_launch(
        f"videotestsrc num-buffers={n} pattern=smpte "
        "! video/x-raw,format=RGB,width=128,height=96,framerate=30/1 "
        "! yoloxinference model-type=nano num-classes=3 "
        "! yoloxtensordec box-confidence-threshold=0.0 "
        "  class-confidence-threshold=0.0 "
        "! videoconvert ! video/x-raw,format=I420 "
        "! rav1enc speed-preset=10 "
        "! isofmp4mux fragment-duration=100000000 ! appsink name=sink")
    p.play_until_eos()
    samples = p.by_name("sink").samples
    assert samples, "muxer produced nothing"
    f = tmp_path / "analytics.mp4"
    f.write_bytes(b"".join(np.asarray(s.buffer.data).tobytes() for s in samples))

    d = avlib.Demuxer(str(f))
    assert "mp4" in d.format_name
    info = d.stream_info(0)
    assert info["codec"] == "av1"
    assert (info["width"], info["height"]) == (128, 96)
    pkts = list(d.packets())
    assert len(pkts) == n, f"expected {n} AV1 samples, demuxed {len(pkts)}"
    # the bitstream itself must decode in libdav1d (via libavcodec)
    dec = avlib.VideoDecoder("libdav1d", width=128, height=96)
    frames = []
    for pkt in pkts:
        frames += dec.decode(pkt["data"], pkt["pts"])
    frames += dec.decode(None)
    assert len(frames) == n
    y, u, v, _ = frames[0]
    assert y.shape == (96, 128) and u.shape == (48, 64)
    # SMPTE bars: the luma plane must carry real structure, not a flat field
    assert np.ptp(y.astype(np.int32)) > 100


def test_av1_rtp_transport_roundtrip_decodes():
    n = 6
    p = fx.parse_launch(
        f"videotestsrc num-buffers={n} pattern=gradient "
        "! video/x-raw,format=RGB,width=64,height=64,framerate=30/1 "
        "! videoconvert ! video/x-raw,format=I420 "
        "! rav1enc speed-preset=10 low-latency=true "
        "! rtpav1pay2 pt=96 mtu=400 "
        "! rtpav1depay2 "
        "! dav1ddec ! appsink name=sink")
    p.play_until_eos()
    frames = p.by_name("sink").samples
    assert len(frames) == n
    y, u, v = (np.asarray(pl) for pl in frames[0].buffer.data)
    assert y.shape == (64, 64) and u.shape == (32, 32) and v.shape == (32, 32)
    assert np.ptp(y.astype(np.int32)) > 50  # the gradient survived transport
