"""roundedcorners tests (video/videofx/src/border/imp.rs scenarios: alpha
plane generation, mask regeneration only on radius change, I420 passthrough
at radius 0)."""
import numpy as np

from gst_plugins_rs_tpu.core import Buffer, Caps, Fraction, Harness, element_factory_make


def make_i420(h=32, w=64):
    y = np.full((h, w), 128, np.uint8)
    u = np.full((h // 2, w // 2), 64, np.uint8)
    v = np.full((h // 2, w // 2), 192, np.uint8)
    return (y, u, v)


def build(radius):
    elem = element_factory_make("roundedcorners")
    elem.set_property("border-radius-px", radius)
    h = Harness(elem)
    h.set_src_caps(Caps.builder("video/x-raw", format="I420", width=64, height=32, framerate=Fraction(30, 1)))
    return h, elem


def test_radius_zero_outputs_i420():
    h, _ = build(0)
    h.push(Buffer(make_i420(), pts=0))
    out = h.pull()
    assert h.out_caps().structure(0)["format"] in ("I420", "A420")
    # radius 0 negotiates I420 first (no alpha plane needed)
    assert len(out.data) == 3


def test_radius_adds_alpha_plane():
    h, _ = build(8)
    h.push(Buffer(make_i420(), pts=0))
    out = h.pull()
    assert h.out_caps().structure(0)["format"] == "A420"
    assert len(out.data) == 4
    alpha = np.asarray(out.data[3])
    assert alpha.shape == (32, 64)
    assert alpha[0, 0] == 0  # corner transparent
    assert alpha[16, 32] == 255  # center opaque
    assert alpha[0, 32] == 255  # top edge middle opaque
    # luma untouched
    np.testing.assert_array_equal(np.asarray(out.data[0]), make_i420()[0])


def test_mask_cached_until_radius_changes():
    h, elem = build(8)
    h.push(Buffer(make_i420(), pts=0))
    m1 = elem._mask
    h.push(Buffer(make_i420(), pts=1))
    assert elem._mask is m1  # cached
    elem.set_property("border-radius-px", 12)
    h.push(Buffer(make_i420(), pts=2))
    assert elem._mask is not m1
    out = h.pull_all()[-1]
    alpha = np.asarray(out.data[3])
    assert alpha[2, 2] == 0  # larger radius -> more transparent corner


def test_antialiased_edge():
    h, _ = build(10)
    h.push(Buffer(make_i420(), pts=0))
    alpha = np.asarray(h.pull().data[3])
    # the corner arc must contain intermediate (antialiased) alpha values
    corner = alpha[:10, :10].astype(int)
    assert ((corner > 0) & (corner < 255)).any()
