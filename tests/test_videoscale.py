"""videoscale: separable MXU-matmul resampling (ops/resize.py)."""
import numpy as np
import pytest

from gst_plugins_rs_tpu import parse_launch
from gst_plugins_rs_tpu.ops.resize import resize_matrix, make_resizer


def test_matrices_are_partitions_of_unity():
    for method in ("bilinear", "nearest"):
        for n_out, n_in in ((720, 1080), (1080, 720), (33, 100), (7, 3)):
            m = resize_matrix(n_out, n_in, method)
            np.testing.assert_allclose(m.sum(axis=1), 1.0, atol=1e-6)


def test_identity_is_exact():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (24, 32, 3), np.uint8)
    out = np.asarray(make_resizer(24, 32, 24, 32)(img))
    np.testing.assert_array_equal(out, img)


def test_nearest_2x_is_pixel_repeat():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (8, 12, 3), np.uint8)
    out = np.asarray(make_resizer(8, 12, 16, 24, "nearest")(img))
    np.testing.assert_array_equal(out, np.repeat(np.repeat(img, 2, 0), 2, 1))


def _numpy_bilinear(img, h2, w2):
    h1, w1 = img.shape[:2]
    out = np.zeros((h2, w2) + img.shape[2:], np.float64)
    sy = (np.arange(h2) + 0.5) * h1 / h2 - 0.5
    sx = (np.arange(w2) + 0.5) * w1 / w2 - 0.5
    for i, y in enumerate(sy):
        y0 = int(np.floor(y)); fy = y - y0
        y0c, y1c = np.clip([y0, y0 + 1], 0, h1 - 1)
        for j, x in enumerate(sx):
            x0 = int(np.floor(x)); fx = x - x0
            x0c, x1c = np.clip([x0, x0 + 1], 0, w1 - 1)
            out[i, j] = ((1-fy)*(1-fx)*img[y0c, x0c] + (1-fy)*fx*img[y0c, x1c]
                         + fy*(1-fx)*img[y1c, x0c] + fy*fx*img[y1c, x1c])
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


@pytest.mark.parametrize("h2,w2", [(15, 23), (40, 64)])
def test_bilinear_matches_scalar_oracle(h2, w2):
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (20, 30, 3), np.uint8)
    got = np.asarray(make_resizer(20, 30, h2, w2, "bilinear")(img))
    want = _numpy_bilinear(img.astype(np.float64), h2, w2)
    assert np.max(np.abs(got.astype(int) - want.astype(int))) <= 1


def test_flat_field_is_invariant():
    img = np.full((30, 40, 3), 137, np.uint8)
    out = np.asarray(make_resizer(30, 40, 17, 29)(img))
    np.testing.assert_array_equal(out, np.full((17, 29, 3), 137, np.uint8))


def test_pipeline_rgb_downscale():
    p = parse_launch(
        "videotestsrc pattern=gradient num-buffers=2 "
        "! video/x-raw,format=RGB,width=64,height=48 "
        "! videoscale ! video/x-raw,format=RGB,width=32,height=24 "
        "! appsink name=sink")
    p.play_until_eos()
    frames = p.by_name("sink").samples
    assert len(frames) == 2
    assert np.asarray(frames[0].buffer.data).shape == (24, 32, 3)


def test_pipeline_i420_upscale():
    p = parse_launch(
        "videotestsrc pattern=smpte num-buffers=1 "
        "! video/x-raw,format=RGB,width=64,height=48 "
        "! videoconvert ! video/x-raw,format=I420 "
        "! videoscale method=nearest ! video/x-raw,format=I420,width=128,height=96 "
        "! appsink name=sink")
    p.play_until_eos()
    y, u, v = (np.asarray(pl) for pl in p.by_name("sink").samples[0].buffer.data)
    assert y.shape == (96, 128) and u.shape == (48, 64) and v.shape == (48, 64)


def test_videoconvertscale_fused_rgb_to_i420_downscale():
    p = parse_launch(
        "videotestsrc pattern=red num-buffers=1 "
        "! video/x-raw,format=RGB,width=64,height=48 "
        "! videoconvertscale ! video/x-raw,format=I420,width=32,height=24 "
        "! appsink name=sink")
    p.play_until_eos()
    y, u, v = (np.asarray(pl) for pl in p.by_name("sink").samples[0].buffer.data)
    assert y.shape == (24, 32) and u.shape == (12, 16)
    # flat red field: scaling cannot change the BT.601 anchor values
    assert (int(y[5, 5]), int(u[5, 5]), int(v[5, 5])) == (81, 90, 240)


def test_videoconvertscale_i420_to_packed_upscale():
    p = parse_launch(
        "videotestsrc pattern=smpte num-buffers=1 "
        "! video/x-raw,format=RGB,width=32,height=24 "
        "! videoconvert ! video/x-raw,format=I420 "
        "! videoconvertscale ! video/x-raw,format=BGRx,width=64,height=48 "
        "! appsink name=sink")
    p.play_until_eos()
    assert np.asarray(p.by_name("sink").samples[0].buffer.data).shape == (48, 64, 4)


def test_videoconvertscale_passthrough():
    p = parse_launch(
        "videotestsrc pattern=gradient num-buffers=1 "
        "! video/x-raw,format=RGB,width=16,height=16 "
        "! videoconvertscale ! video/x-raw,format=RGB,width=16,height=16 "
        "! appsink name=sink")
    p.play_until_eos()
    assert np.asarray(p.by_name("sink").samples[0].buffer.data).shape == (16, 16, 3)


def test_convertscale_planar_to_odd_packed_dims():
    """I420 (even) -> RGB at odd output dims is legal: scaling runs in the
    packed domain after conversion."""
    p = parse_launch(
        "videotestsrc pattern=smpte num-buffers=1 "
        "! video/x-raw,format=RGB,width=64,height=48 "
        "! videoconvert ! video/x-raw,format=I420 "
        "! videoconvertscale ! video/x-raw,format=RGB,width=33,height=25 "
        "! appsink name=sink")
    p.play_until_eos()
    assert np.asarray(p.by_name("sink").samples[0].buffer.data).shape == (25, 33, 3)


def test_convertscale_odd_packed_to_planar_dims():
    """RGB at odd input dims -> I420 (even out) is legal: scaling runs in
    the packed domain before conversion."""
    p = parse_launch(
        "videotestsrc pattern=smpte num-buffers=1 "
        "! video/x-raw,format=RGB,width=33,height=25 "
        "! videoconvertscale ! video/x-raw,format=I420,width=64,height=48 "
        "! appsink name=sink")
    p.play_until_eos()
    y, u, v = (np.asarray(pl) for pl in p.by_name("sink").samples[0].buffer.data)
    assert y.shape == (48, 64) and u.shape == (24, 32)
