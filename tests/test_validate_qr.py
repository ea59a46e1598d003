"""QR codec + the check-last-frame-qrcode validate action."""
import json

import numpy as np
import pytest

import gst_plugins_rs_tpu as fx
from gst_plugins_rs_tpu.codecs import qr
from gst_plugins_rs_tpu.utils import validate
from gst_plugins_rs_tpu.core.parse import parse_caps


class TestQrCodec:
    @pytest.mark.parametrize("text", [
        "hi", "hello world", "x" * 17,          # version 1 boundary
        "y" * 30,                                # version 2
        json.dumps({"frame": 42, "ok": True}),   # json payloads
        "z" * 70,                                # version 4
    ])
    def test_roundtrip(self, text):
        matrix = qr.encode(text)
        img = qr.rasterize(matrix, module_px=6)
        assert qr.decode(img) == text

    def test_rgb_frames_decode(self):
        matrix = qr.encode("rgb test")
        gray = qr.rasterize(matrix, module_px=5)
        rgb = np.repeat(gray[..., None], 3, axis=2)
        assert qr.decode(rgb) == "rgb test"

    def test_structure(self):
        m = qr.encode("abc")
        assert m.shape == (21, 21)
        # finder patterns: solid 3x3 centers at three corners
        for r, c in ((3, 3), (3, 17), (17, 3)):
            assert m[r, c] == 1
            assert m[r - 1:r + 2, c - 1:c + 2].all()
        # timing pattern alternates
        assert list(m[6, 8:13]) == [1, 0, 1, 0, 1]

    def test_too_long(self):
        with pytest.raises(ValueError):
            qr.encode("a" * 200)

    def test_no_qr_raises(self):
        with pytest.raises(ValueError):
            qr.decode(np.full((100, 100), 255, np.uint8))


class TestValidateAction:
    def _pipeline_with_qr_frame(self, payload):
        """videotestsrc-style pipeline whose last frame carries a QR."""
        matrix = qr.encode(payload)
        img = qr.rasterize(matrix, module_px=4)
        frame = np.full((240, 320, 3), 255, np.uint8)
        h, w = img.shape
        frame[10:10 + h, 10:10 + w] = img[..., None]

        src = fx.element_factory_make("appsrc")
        src.set_property("caps", parse_caps("video/x-raw,format=RGB,width=320,height=240"))
        sink = fx.element_factory_make("appsink")
        p = fx.Pipeline()
        p.add(src, sink)
        src.link(sink)
        # a plain frame first, the QR frame last
        src.push_buffer(fx.Buffer(np.zeros((240, 320, 3), np.uint8)))
        src.push_buffer(fx.Buffer(frame))
        src.end_of_stream()
        p.play_until_eos()
        return p

    def test_expected_text_passes(self):
        p = self._pipeline_with_qr_frame("frame-99")
        got = validate.run_action("check-last-frame-qrcode", p,
                                  expected_text="frame-99")
        assert got == "frame-99"

    def test_expected_json_fields(self):
        p = self._pipeline_with_qr_frame(json.dumps({"ts": 123, "id": "cam1"}))
        validate.check_last_frame_qrcode(p, expected_fields={"id": "cam1"})
        with pytest.raises(validate.ValidateError, match="field 'ts'"):
            validate.check_last_frame_qrcode(p, expected_fields={"ts": 999})

    def test_wrong_text_fails(self):
        p = self._pipeline_with_qr_frame("actual")
        with pytest.raises(validate.ValidateError, match="expected"):
            validate.check_last_frame_qrcode(p, expected_text="other")

    def test_no_qr_fails(self):
        src = fx.element_factory_make("appsrc")
        src.set_property("caps", parse_caps("video/x-raw,format=RGB,width=64,height=64"))
        sink = fx.element_factory_make("appsink")
        p = fx.Pipeline()
        p.add(src, sink)
        src.link(sink)
        src.push_buffer(fx.Buffer(np.full((64, 64, 3), 255, np.uint8)))
        src.end_of_stream()
        p.play_until_eos()
        with pytest.raises(validate.ValidateError, match="decode failed"):
            validate.check_last_frame_qrcode(p)
