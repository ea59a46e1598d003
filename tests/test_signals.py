"""Element signal surface (GObject action/request signal analog):
emit() dispatch, connect() request handlers, and the reference's 28
signals across 12 elements."""
import numpy as np
import pytest

import gst_plugins_rs_tpu as fx
from gst_plugins_rs_tpu.core.parse import parse_caps


class TestSignalMechanism:
    def test_unknown_signal_raises(self):
        el = fx.element_factory_make("ebur128level")
        with pytest.raises(KeyError):
            el.emit("does-not-exist")

    def test_action_signal_dispatches_to_method(self):
        el = fx.element_factory_make("ebur128level")
        el.emit("reset")
        assert el._reset_pending

    def test_request_signal_calls_connected_handler(self):
        demux = fx.element_factory_make("quinnroqdemux")
        seen = []

        def handler(element, flow_id):
            seen.append(flow_id)
            return parse_caps(
                "application/x-rtp,media=audio,clock-rate=48000")

        demux.connect("request-flow-id-map", handler)
        caps = demux.emit("request-flow-id-map", 7)
        assert seen == [7]
        assert caps.structure(0)["clock-rate"] == 48000


class TestElementSignals:
    def test_ts_udpsink_client_management(self):
        sink = fx.element_factory_make("ts-udpsink")
        sink.emit("clear")
        assert sink.get_property("clients") == ""
        sink.emit("add", "10.0.0.1", 5004)
        sink.emit("add", "10.0.0.2", 5006)
        assert sink.get_property("clients") == "10.0.0.1:5004,10.0.0.2:5006"
        sink.emit("remove", "10.0.0.1", 5004)
        assert sink.get_property("clients") == "10.0.0.2:5006"

    def test_fallbacksrc_update_uri(self):
        src = fx.element_factory_make("fallbacksrc")
        src.emit("update-uri", "file:///tmp/next.raw")
        assert src.get_property("uri") == "file:///tmp/next.raw"

    def test_rtpsend_get_session_pairs_with_recv(self):
        send = fx.element_factory_make("rtpsend")
        recv = fx.element_factory_make("rtprecv")
        send.set_property("rtp-id", "pair-x")
        recv.set_property("rtp-id", "pair-x")
        session = send.emit("get-session", 0)
        assert session.send is send and session.recv is recv

    def test_ts_appsrc_signals(self):
        src = fx.element_factory_make("ts-appsrc")
        src.set_property("caps", parse_caps("application/octet-stream"))
        sink = fx.element_factory_make("appsink")
        p = fx.Pipeline()
        p.add(src, sink)
        src.link(sink)
        src.emit("push-buffer", fx.Buffer(np.arange(4, dtype=np.uint8)))
        src.emit("end-of-stream")
        p.play_until_eos()
        assert len(sink.samples) == 1

    def test_jitterbuffer_pt_map(self):
        jb = fx.element_factory_make("ts-jitterbuffer")
        jb.connect("request-pt-map",
                   lambda el, pt: parse_caps(
                       f"application/x-rtp,payload={pt},clock-rate=90000"))
        caps = jb.pt_caps(96)
        assert caps.structure(0)["payload"] == 96
        jb.emit("clear-pt-map")
        assert jb._pt_map == {}

    def test_hls_stream_signals_capture_output(self, tmp_path):
        import io

        outputs = {}

        class Capture(io.BytesIO):
            def __init__(self, path):
                super().__init__()
                self.path = path

            def close(self):
                outputs[self.path] = self.getvalue()
                super().close()

        sink = fx.element_factory_make("hlssink3")
        sink.set_property("location", str(tmp_path / "seg%05d.ts"))
        sink.set_property("playlist-location", str(tmp_path / "pl.m3u8"))
        sink.set_property("target-duration", 1)
        sink.connect("get-fragment-stream", lambda el, path: Capture(path))
        sink.connect("get-playlist-stream", lambda el, path: Capture(path))
        src = fx.element_factory_make("appsrc")
        src.set_property("caps", parse_caps("application/octet-stream"))
        p = fx.Pipeline()
        p.add(src, sink)
        src.link(sink)
        src.push_buffer(fx.Buffer(np.arange(32, dtype=np.uint8), pts=0,
                                  duration=1_000_000_000))
        src.end_of_stream()
        p.play_until_eos()
        # fragments and playlists went through the handlers, not the fs
        assert any(k.endswith(".ts") for k in outputs)
        assert any(b"#EXTM3U" in v for v in outputs.values())
        assert not (tmp_path / "seg00000.ts").exists()

    def test_hlscmafsink_new_playlist_action(self, tmp_path):
        sink = fx.element_factory_make("hlscmafsink")
        sink.set_property("playlist-location", str(tmp_path / "pl.m3u8"))
        sink.on_ready_to_paused()
        sink._playlist.add_segment  # playlist exists
        first = sink._playlist
        sink.emit("new-playlist")
        assert sink._playlist is not first  # fresh playlist started
