"""skiacompositor tests: placement, scaling, alpha, clipping."""
import numpy as np

import gst_plugins_rs_tpu as fx
from gst_plugins_rs_tpu.core.parse import parse_caps


def solid_src(p, color, w, h, n=2):
    src = fx.element_factory_make("videotestsrc")
    src.set_property("pattern", color)
    src.set_property("num-buffers", n)
    caps = fx.element_factory_make("capsfilter")
    caps.set_property("caps", parse_caps(f"video/x-raw,format=RGB,width={w},height={h},framerate=30/1"))
    p.add(src); p.add(caps)
    src.link(caps)
    return caps


class TestCompositor:
    def test_two_inputs_placement(self):
        p = fx.Pipeline()
        comp = fx.element_factory_make("skiacompositor")
        comp.set_property("background", "black")  # tests assert over a black canvas
        comp.set_property("width", 64)
        comp.set_property("height", 64)
        sink = fx.element_factory_make("appsink")
        p.add(comp); p.add(sink)
        comp.pad("src").link(sink.pad("sink"))
        red = solid_src(p, "red", 32, 32)
        blue = solid_src(p, "blue", 16, 16)
        pad_r = comp.request_sink_pad()
        pad_b = comp.request_sink_pad()
        pad_b.props.update(xpos=40, ypos=40)
        red.pad("src").link(pad_r)
        blue.pad("src").link(pad_b)
        p.play_until_eos()
        f = np.asarray(sink.samples[0].buffer.data)
        assert f.shape == (64, 64, 3)
        assert (f[0:32, 0:32, 0] == 255).all()  # red block
        assert (f[40:56, 40:56, 2] == 255).all()  # blue block
        assert (f[33:39, 33:39] == 0).all()  # background black

    def test_scaling_and_alpha(self):
        p = fx.Pipeline()
        comp = fx.element_factory_make("skiacompositor")
        comp.set_property("background", "black")  # tests assert over a black canvas
        comp.set_property("width", 32)
        comp.set_property("height", 32)
        sink = fx.element_factory_make("appsink")
        p.add(comp); p.add(sink)
        comp.pad("src").link(sink.pad("sink"))
        white = solid_src(p, "white", 8, 8)
        pad = comp.request_sink_pad()
        pad.props.update(width=32, height=32, alpha=0.5)  # upscale + half alpha
        white.pad("src").link(pad)
        p.play_until_eos()
        f = np.asarray(sink.samples[0].buffer.data)
        assert f.shape == (32, 32, 3)
        assert (np.abs(f.astype(int) - 127) <= 1).all()  # 50% white over black

    def test_out_of_bounds_clipping(self):
        p = fx.Pipeline()
        comp = fx.element_factory_make("skiacompositor")
        comp.set_property("background", "black")  # tests assert over a black canvas
        comp.set_property("width", 32)
        comp.set_property("height", 32)
        sink = fx.element_factory_make("appsink")
        p.add(comp); p.add(sink)
        comp.pad("src").link(sink.pad("sink"))
        green = solid_src(p, "green", 16, 16)
        pad = comp.request_sink_pad()
        pad.props.update(xpos=24, ypos=-8)  # spills right and top
        green.pad("src").link(pad)
        p.play_until_eos()
        f = np.asarray(sink.samples[0].buffer.data)
        assert (f[0:8, 24:32, 1] == 255).all()  # clipped region drawn
        assert (f[9:, :, :] == 0).all()

    def test_output_size_from_first_input(self):
        p = fx.Pipeline()
        comp = fx.element_factory_make("skiacompositor")
        comp.set_property("background", "black")  # tests assert over a black canvas
        sink = fx.element_factory_make("appsink")
        p.add(comp); p.add(sink)
        comp.pad("src").link(sink.pad("sink"))
        red = solid_src(p, "red", 48, 24)
        red.pad("src").link(comp.request_sink_pad())
        p.play_until_eos()
        f = np.asarray(sink.samples[0].buffer.data)
        assert f.shape == (24, 48, 3)
        assert sink.caps.structure(0)["width"] == 48
