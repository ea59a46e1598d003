"""hsvfilter / hsvdetector tests vs a NumPy oracle implementing the exact
reference math (video/hsv/src/hsvutils.rs:40-198, hsvfilter/imp.rs:96-119,
hsvdetector/imp.rs:100-160)."""
import numpy as np

from gst_plugins_rs_tpu.core import Buffer, Caps, Fraction, Harness, element_factory_make
from gst_plugins_rs_tpu.ops.hsv import EPSILON

f32 = np.float32


def oracle_rgb_to_hsv(rgb_u8):
    r = rgb_u8[..., 0].astype(f32) / f32(255.0)
    g = rgb_u8[..., 1].astype(f32) / f32(255.0)
    b = rgb_u8[..., 2].astype(f32) / f32(255.0)
    value = np.max(rgb_u8, axis=-1).astype(f32) / f32(255.0)
    chroma = value - np.min(rgb_u8, axis=-1).astype(f32) / f32(255.0)
    csafe = np.where(chroma == 0, f32(1), chroma)
    hue = np.where(
        chroma == 0,
        f32(0),
        np.where(
            np.abs(value - r) < EPSILON,
            f32(60) * (g - b) / csafe,
            np.where(
                np.abs(value - g) < EPSILON,
                f32(60) * (f32(2) + (b - r) / csafe),
                np.where(np.abs(value - b) < EPSILON, f32(60) * (f32(4) + (r - g) / csafe), f32(0)),
            ),
        ),
    )
    hue = np.where(hue < 0, hue + f32(360), hue)
    hue = np.mod(hue, f32(360))
    sat = np.where(value == 0, f32(0), chroma / np.where(value == 0, f32(1), value))
    return hue, np.clip(sat, 0, 1), np.clip(value, 0, 1)


def oracle_hsv_to_rgb_u8(h, s, v):
    c = v * s
    hp = h / f32(60)
    x = c * (f32(1) - np.abs(np.mod(hp, f32(2)) - f32(1)))
    zero = np.zeros_like(c)
    sextant = np.select(
        [hp < 0, hp <= 1, hp <= 2, hp <= 3, hp <= 4, hp <= 5, hp <= 6],
        np.arange(7)[:, None, None] * np.ones_like(c, dtype=int)[None] if c.ndim == 2 else np.arange(7),
        default=0,
    )
    rp = np.select([hp < 0, hp <= 1, hp <= 2, hp <= 3, hp <= 4, hp <= 5, hp <= 6],
                   [zero, c, x, zero, zero, x, c], default=zero)
    gp = np.select([hp < 0, hp <= 1, hp <= 2, hp <= 3, hp <= 4, hp <= 5, hp <= 6],
                   [zero, x, c, c, x, zero, zero], default=zero)
    bp = np.select([hp < 0, hp <= 1, hp <= 2, hp <= 3, hp <= 4, hp <= 5, hp <= 6],
                   [zero, zero, zero, x, c, c, x], default=zero)
    m = v - c
    out = np.stack(
        [np.clip((rp + m) * 255, 0, 255), np.clip((gp + m) * 255, 0, 255), np.clip((bp + m) * 255, 0, 255)],
        axis=-1,
    )
    return out.astype(np.uint8)  # truncation like Rust `as u8`


def oracle_filter(rgb_u8, shift, smul, soff, vmul, voff):
    h, s, v = oracle_rgb_to_hsv(rgb_u8)
    h = np.mod(h + f32(shift), f32(360))
    s = np.clip(f32(smul) * s + f32(soff), 0, 1)
    v = np.clip(f32(vmul) * v + f32(voff), 0, 1)
    return oracle_hsv_to_rgb_u8(h, s, v)


def run_filter(frame, fmt="RGB", **props):
    elem = element_factory_make("hsvfilter")
    for k, v in props.items():
        elem.set_property(k.replace("_", "-"), v)
    h = Harness(elem)
    hh, ww = frame.shape[:2]
    h.set_src_caps(Caps.builder("video/x-raw", format=fmt, width=ww, height=hh, framerate=Fraction(30, 1)))
    h.push(Buffer(frame, pts=0))
    return np.asarray(h.pull().data)


def _random_rgb(shape, seed=7):
    return np.random.RandomState(seed).randint(0, 256, shape, dtype=np.uint8)


def test_identity_params_roundtrip():
    frame = _random_rgb((31, 17, 3))
    out = run_filter(frame)
    ref = oracle_filter(frame, 0, 1, 0, 1, 0)
    # u8 truncation boundaries are FP-op-order dependent (see ops/hsv.py);
    # everything else must match the strict-order oracle exactly
    diff = np.abs(out.astype(int) - ref.astype(int))
    assert diff.max() <= 1
    # and the result must stay within 1 LSB of the original frame
    assert np.abs(out.astype(int) - frame.astype(int)).max() <= 1


def test_hue_shift_matches_oracle():
    frame = _random_rgb((23, 19, 3), seed=1)
    out = run_filter(frame, hue_shift=90.0)
    ref = oracle_filter(frame, 90, 1, 0, 1, 0)
    diff = np.abs(out.astype(int) - ref.astype(int))
    # off-by-one only at u8 truncation boundaries (XLA constant-divisor
    # strength reduction vs strict IEEE order); never more than 1 LSB
    assert diff.max() <= 1


def test_sat_value_transform_matches_oracle():
    frame = _random_rgb((16, 16, 3), seed=2)
    out = run_filter(frame, saturation_mul=0.5, saturation_off=0.2, value_mul=1.2, value_off=-0.1)
    ref = oracle_filter(frame, 0, 0.5, 0.2, 1.2, -0.1)
    assert np.abs(out.astype(int) - ref.astype(int)).max() <= 1


def test_pure_colors_hue_shift_exact():
    # red shifted +120 deg -> green; green -> blue; blue -> red
    frame = np.array([[[255, 0, 0], [0, 255, 0], [0, 0, 255]]], np.uint8)
    out = run_filter(frame, hue_shift=120.0)
    np.testing.assert_array_equal(out[0, 0], [0, 255, 0])
    np.testing.assert_array_equal(out[0, 1], [0, 0, 255])
    np.testing.assert_array_equal(out[0, 2], [255, 0, 0])


def test_bgra_format_offsets():
    frame = np.zeros((2, 2, 4), np.uint8)
    frame[..., 2] = 255  # red in BGRA layout
    frame[..., 3] = 200  # alpha
    out = run_filter(frame, fmt="BGRA", hue_shift=120.0)
    assert tuple(out[0, 0]) == (0, 255, 0, 200)  # green in BGRA, alpha preserved


def test_alpha_channel_untouched():
    frame = _random_rgb((8, 8, 4), seed=3)
    out = run_filter(frame, fmt="RGBA", hue_shift=45.0, value_mul=0.7)
    np.testing.assert_array_equal(out[..., 3], frame[..., 3])


# --- detector ---------------------------------------------------------------

def run_detector(frame, in_fmt="RGB", out_fmt=None, **props):
    elem = element_factory_make("hsvdetector")
    for k, v in props.items():
        elem.set_property(k.replace("_", "-"), v)
    h = Harness(elem)
    hh, ww = frame.shape[:2]
    h.set_src_caps(Caps.builder("video/x-raw", format=in_fmt, width=ww, height=hh, framerate=Fraction(30, 1)))
    h.push(Buffer(frame, pts=0))
    out = h.pull()
    return np.asarray(out.data), h.out_caps()


def test_detector_red_reference():
    frame = np.array(
        [[[255, 0, 0], [250, 10, 5], [0, 255, 0], [128, 128, 128]]], np.uint8
    )
    out, caps = run_detector(
        frame, hue_ref=0.0, hue_var=10.0,
        saturation_ref=1.0, saturation_var=0.2, value_ref=1.0, value_var=0.2,
    )
    assert caps.structure(0)["format"] == "RGBA"
    assert out.shape == (1, 4, 4)
    assert out[0, 0, 3] == 255  # pure red matches
    assert out[0, 1, 3] == 255  # near-red matches
    assert out[0, 2, 3] == 0  # green does not
    assert out[0, 3, 3] == 0  # grey fails sat/val window
    np.testing.assert_array_equal(out[0, :, :3], frame[0])  # rgb copied


def test_detector_hue_wraparound():
    # hue 350 is within +-15 deg of hue_ref 0 across the wrap
    frame = np.zeros((1, 1, 3), np.uint8)
    frame[0, 0] = [255, 0, 42]  # hue ~350
    out, _ = run_detector(
        frame, hue_ref=0.0, hue_var=15.0,
        saturation_ref=1.0, saturation_var=0.1, value_ref=1.0, value_var=0.1,
    )
    assert out[0, 0, 3] == 255


def test_detector_caps_transform():
    elem = element_factory_make("hsvdetector")
    from gst_plugins_rs_tpu.core import PadDirection, ValueList

    sink_caps = Caps.builder("video/x-raw", format="RGB", width=4, height=4)
    out = elem.transform_caps(PadDirection.SINK, sink_caps, None)
    assert out.structure(0)["format"] == ValueList(("RGBA", "ARGB", "BGRA", "ABGR"))
    assert out.structure(0)["width"] == 4
