"""fallbacksrc tests: primary flow, fallback on missing/failed primary,
restart-on-eos, dummy stream, status messages."""
import numpy as np

import gst_plugins_rs_tpu as fx


def run_src(tmp_path, **props):
    src = fx.element_factory_make("fallbacksrc")
    for k, v in props.items():
        src.set_property(k, v)
    sink = fx.element_factory_make("appsink")
    p = fx.Pipeline()
    p.add(src); p.add(sink)
    src.link(sink)
    p.play_until_eos()
    data = b"".join(np.asarray(s.buffer.data).tobytes() for s in sink.samples)
    msgs = [m.structure["status"] for m in p.bus.messages()
            if m.structure and m.structure.name == "fallbacksrc-status"]
    return data, msgs


class TestFallbackSrc:
    def test_primary_flows(self, tmp_path):
        f = tmp_path / "a.bin"
        f.write_bytes(b"PRIMARY" * 100)
        data, msgs = run_src(tmp_path, **{"uri": f"file://{f}"})
        assert data == b"PRIMARY" * 100
        assert msgs[0] == "running"

    def test_fallback_uri_on_missing_primary(self, tmp_path):
        fb = tmp_path / "fb.bin"
        fb.write_bytes(b"FALLBACK")
        data, msgs = run_src(
            tmp_path,
            **{"uri": f"file://{tmp_path}/missing.bin", "fallback-uri": f"file://{fb}"},
        )
        assert data == b"FALLBACK"
        assert "fallback" in msgs

    def test_dummy_when_nothing_works(self, tmp_path):
        data, msgs = run_src(tmp_path, **{"uri": f"file://{tmp_path}/missing.bin"})
        assert len(data) == 10 * 4096  # bounded dummy stream
        assert set(data) == {0}
        assert "fallback" in msgs

    def test_restart_on_eos(self, tmp_path):
        f = tmp_path / "loop.bin"
        f.write_bytes(b"XY")
        src = fx.element_factory_make("fallbacksrc")
        src.set_property("uri", f"file://{f}")
        src.set_property("restart-on-eos", True)
        sink = fx.element_factory_make("appsink")
        p = fx.Pipeline()
        p.add(src); p.add(sink)
        src.link(sink)
        p.set_state(fx.State.PLAYING)
        # drive a bounded number of iterations: restart-on-eos never ends
        for _ in range(5):
            src.iterate()
        p.set_state(fx.State.NULL)
        data = b"".join(np.asarray(s.buffer.data).tobytes() for s in sink.samples)
        assert data.startswith(b"XYXY")  # looped past EOS

    def test_immediate_fallback(self, tmp_path):
        f = tmp_path / "a.bin"; f.write_bytes(b"PRIMARY")
        fb = tmp_path / "b.bin"; fb.write_bytes(b"FB")
        data, msgs = run_src(
            tmp_path,
            **{"uri": f"file://{f}", "fallback-uri": f"file://{fb}",
               "immediate-fallback": True},
        )
        assert data == b"FB"
        assert msgs[0] == "fallback"


def test_source_element_property_feeds_primary():
    from gst_plugins_rs_tpu.core import element_factory_make

    import numpy as _np

    class _MiniSrc:
        def __init__(self):
            self.n = 0
        def start(self):
            pass
        def stop(self):
            pass
        def create(self):
            if self.n >= 2:
                return None
            self.n += 1
            return fx.Buffer(_np.full(64, 7, _np.uint8))

    src = element_factory_make("fallbacksrc")
    src.set_property("source", _MiniSrc())
    src.start()
    buf = src.create()
    assert buf is not None and np.asarray(buf.data).size > 0
    assert src.status == "running"
    src.stop()


def test_statistics_structure_counts_retries(tmp_path):
    from gst_plugins_rs_tpu.core import element_factory_make

    fb = tmp_path / "fb.bin"
    fb.write_bytes(b"F" * 64)
    src = element_factory_make("fallbacksrc")
    src.set_property("uri", "file:///nonexistent/definitely")
    src.set_property("fallback-uri", f"file://{fb}")
    src.set_property("retry-timeout", 3)
    src.start()
    buf = src.create()
    assert buf is not None
    stats = src.statistics
    assert stats.name == "application/x-fallbacksrc-stats"
    assert stats["num-fallback-retry"] >= 1
    assert stats["buffering-percent"] == 100
    assert src.status == "fallback"
    src.stop()


def test_caps_property_constrains_negotiation():
    from gst_plugins_rs_tpu.core import element_factory_make
    from gst_plugins_rs_tpu.core import Caps

    src = element_factory_make("fallbacksrc")
    src.set_property("video-caps", "video/x-raw,format=RGB,width=8,height=8")
    out = src.fixate(Caps.new_any())
    s = out.structure(0)
    assert s.name == "video/x-raw" and s["width"] == 8
