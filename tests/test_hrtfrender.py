"""hrtfrender tests — port of the reference scenarios
(audio/hrtf/tests/hrtfrender.rs: block size math, EOS residue PTS/offset,
implicit spatial objects from channel positions) plus audio-level checks
(panning energy, overlap-add continuity) against a synthetic HRIR sphere."""
import struct

import numpy as np

from gst_plugins_rs_tpu.core import (
    Buffer,
    Caps,
    Event,
    Harness,
    SECOND,
    element_factory_make,
)
from gst_plugins_rs_tpu.ops.hrtf import HrirSphere

RATE = 44_100


def make_sphere_bytes(rate=RATE, length=8):
    """Synthetic HRIR sphere: icosahedron; left/right IRs encode simple
    lateral panning (gain from x) with an impulse at tap 0."""
    phi = (1 + 5**0.5) / 2
    verts = []
    for a in (-1, 1):
        for b in (-phi, phi):
            verts += [(0, a, b), (a, b, 0), (b, 0, a)]
    v = np.asarray(verts, np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    # faces: use convex hull for correctness
    from scipy.spatial import ConvexHull

    hull = ConvexHull(v)
    faces = hull.simplices.astype(np.uint32)
    V = len(v)
    left = np.zeros((V, length), np.float32)
    right = np.zeros((V, length), np.float32)
    for i, (x, y, z) in enumerate(v):
        left[i, 0] = 0.5 * (1.0 - x)  # x>0 = right side -> less left energy
        right[i, 0] = 0.5 * (1.0 + x)
    out = b"HRIR" + struct.pack("<IIII", rate, length, V, faces.size)
    out += faces.tobytes()
    for i in range(V):
        out += struct.pack("<fff", *v[i]) + left[i].tobytes() + right[i].tobytes()
    return out


SPHERE = make_sphere_bytes()


def build_harness(channels=1, **props):
    elem = element_factory_make("hrtfrender")
    elem.set_property("hrir-raw", SPHERE)
    for k, val in props.items():
        elem.set_property(k.replace("_", "-"), val)
    h = Harness(elem)
    h.set_src_caps(
        Caps.builder("audio/x-raw", format="F32", rate=RATE, channels=channels, layout="interleaved")
    )
    return h, elem


def test_sphere_parser_roundtrip():
    s = HrirSphere.parse(SPHERE, RATE)
    assert s.length == 8
    assert s.vertices.shape[0] == 12
    l, r = s.sample_bilinear((1.0, 0.0, 0.0))
    assert r[0] > 0.9 and l[0] < 0.1  # hard right


def test_samples_in_samples_out():
    h, _ = build_harness(channels=1)
    full_block = 512 * 8
    n = full_block + 20
    sig = np.zeros((n, 1), np.float32)
    full_block_time = round(full_block * SECOND / RATE)
    h.push(Buffer(sig, pts=0, duration=round(n * SECOND / RATE), offset=0))
    buf = h.pull()
    assert buf.data.shape == (full_block, 2)
    assert buf.pts == 0
    h.push_eos()
    buf = h.pull()
    assert buf.data.shape == (20, 2)
    assert buf.offset == full_block
    assert buf.pts == full_block * SECOND // RATE
    assert buf.duration == 20 * SECOND // RATE


def test_implicit_spatial_objects():
    h, elem = build_harness(channels=8)
    objs = elem.get_property("spatial-objects")
    assert len(objs) == 8


def test_output_caps_forced_stereo():
    h, _ = build_harness(channels=4)
    h.push(Buffer(np.zeros((4096, 4), np.float32), pts=0))
    caps = h.out_caps()
    assert caps.structure(0)["channels"] == 2


def test_panning_energy():
    # a source hard right must produce more right-channel energy
    h, elem = build_harness(channels=1)
    elem.set_property(
        "spatial-objects",
        [{"x": 2.5, "y": 0.0, "z": 0.0, "distance-gain": 1.0, "coordinate-system": "left-handed"}],
    )
    rng = np.random.RandomState(0)
    sig = rng.uniform(-0.5, 0.5, (4096, 1)).astype(np.float32)
    h.push(Buffer(sig, pts=0))
    out = np.asarray(h.pull().data)
    e_l = np.sum(out[:, 0] ** 2)
    e_r = np.sum(out[:, 1] ** 2)
    assert e_r > 10 * e_l


def test_distance_gain_scales_output():
    h1, e1 = build_harness(channels=1)
    e1.set_property("spatial-objects", [{"x": 0.0, "y": 0.0, "z": 2.5, "distance-gain": 1.0}])
    h2, e2 = build_harness(channels=1)
    e2.set_property("spatial-objects", [{"x": 0.0, "y": 0.0, "z": 2.5, "distance-gain": 0.5}])
    sig = np.random.RandomState(1).uniform(-0.5, 0.5, (4096, 1)).astype(np.float32)
    h1.push(Buffer(sig.copy(), pts=0))
    h2.push(Buffer(sig.copy(), pts=0))
    o1 = np.asarray(h1.pull().data)
    o2 = np.asarray(h2.pull().data)
    np.testing.assert_allclose(o2, 0.5 * o1, atol=1e-6)


def test_overlap_add_continuity():
    # one big push vs two half pushes must give identical output
    sig = np.random.RandomState(2).uniform(-0.5, 0.5, (8192, 1)).astype(np.float32)
    h1, _ = build_harness(channels=1)
    h1.push(Buffer(sig, pts=0))
    o1 = np.concatenate([np.asarray(b.data) for b in h1.pull_all()])
    h2, _ = build_harness(channels=1)
    h2.push(Buffer(sig[:4096], pts=0))
    h2.push(Buffer(sig[4096:], pts=round(4096 * SECOND / RATE)))
    o2 = np.concatenate([np.asarray(b.data) for b in h2.pull_all()])
    np.testing.assert_allclose(o1, o2, atol=1e-6)


def test_flush_stop_clears_adapter():
    h, _ = build_harness(channels=1)
    h.push(Buffer(np.zeros((1000, 1), np.float32), pts=0))
    h.push_event(Event.new_flush_stop())
    h.push_eos()
    # adapter cleared -> no residue buffer at EOS
    assert all(b.data.shape[0] == 0 or b.data.shape[0] >= 4096 for b in h.pull_all())


def test_channels_mix():
    # two channels at opposite sides -> both ears get energy
    h, elem = build_harness(channels=2)
    elem.set_property(
        "spatial-objects",
        [
            {"x": -2.5, "y": 0.0, "z": 0.0, "distance-gain": 1.0},
            {"x": 2.5, "y": 0.0, "z": 0.0, "distance-gain": 1.0},
        ],
    )
    sig = np.random.RandomState(3).uniform(-0.5, 0.5, (4096, 2)).astype(np.float32)
    h.push(Buffer(sig, pts=0))
    out = np.asarray(h.pull().data)
    assert np.sum(out[:, 0] ** 2) > 0.1 and np.sum(out[:, 1] ** 2) > 0.1
