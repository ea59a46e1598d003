"""sofalizer tests: SOFA loading, UPOLS convolution correctness, LFE drop,
update-threshold filter re-selection (audio/hrtf/src/sofa/imp.rs scenarios)."""
import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

from gst_plugins_rs_tpu.core import Buffer, Caps, Harness, element_factory_make
from gst_plugins_rs_tpu.ops.sofa import SofaFile, partition_filter, upols_block

RATE = 48000


def make_sofa(path, taps=96):
    """Tiny synthetic SOFA: 4 measurements on the horizontal plane."""
    az = np.array([0.0, 90.0, 180.0, 270.0])
    M = len(az)
    ir = np.zeros((M, 2, taps), np.float32)
    for m in range(M):
        # distinguishable filters: impulse with position-dependent gain/delay
        ir[m, 0, m] = 1.0 - 0.1 * m  # left
        ir[m, 1, m + 1] = 0.5 + 0.1 * m  # right
    pos = np.stack([az, np.zeros(M), np.full(M, 1.0)], axis=1)
    with h5py.File(path, "w") as f:
        f.create_dataset("Data.IR", data=ir)
        f.create_dataset("Data.SamplingRate", data=np.array([RATE], np.float64))
        f.create_dataset("SourcePosition", data=pos)
    return ir, pos


def test_sofa_loader(tmp_path):
    p = tmp_path / "t.sofa"
    ir, pos = make_sofa(str(p))
    s = SofaFile.from_file(str(p))
    assert s.rate == RATE
    assert s.ir.shape == (4, 2, 96)
    # nearest: front (az=0) is +x in SOFA spherical convention
    assert s.nearest((1.0, 0.0, 0.0)) == 0
    assert s.nearest((0.0, 1.0, 0.0)) == 1  # az=90 -> +y
    assert s.nearest((-1.0, 0.0, 0.0)) == 2


def test_upols_matches_direct_convolution():
    rng = np.random.RandomState(0)
    L = 16
    h = rng.uniform(-1, 1, (2, 50)).astype(np.float32)
    Hr, Hi = partition_filter(h, L)
    import jax.numpy as jnp

    x = rng.uniform(-1, 1, 96).astype(np.float32)
    fdl_re = jnp.zeros((Hr.shape[0], L + 1), jnp.float32)
    fdl_im = jnp.zeros_like(fdl_re)
    prev = jnp.zeros((L,), jnp.float32)
    outs = []
    for i in range(0, len(x), L):
        fdl_re, fdl_im, prev, y = upols_block(
            fdl_re, fdl_im, prev, jnp.asarray(x[i : i + L]), jnp.asarray(Hr), jnp.asarray(Hi)
        )
        outs.append(np.asarray(y))
    got = np.concatenate(outs, axis=0)  # [96, 2]
    ref = np.stack([np.convolve(x, h[e])[:96] for e in range(2)], axis=1)
    np.testing.assert_allclose(got, ref, atol=1e-4)


def build(tmp_path, channels=1, **props):
    sofa_path = tmp_path / "t.sofa"
    make_sofa(str(sofa_path))
    elem = element_factory_make("sofalizer")
    elem.set_property("sofa", str(sofa_path))
    for k, v in props.items():
        elem.set_property(k.replace("_", "-"), v)
    h = Harness(elem)
    h.set_src_caps(
        Caps.builder("audio/x-raw", format="F32", rate=RATE, channels=channels, layout="interleaved")
    )
    return h, elem


def test_sofalizer_renders_stereo(tmp_path):
    h, elem = build(tmp_path, channels=1)
    # front position in sofa cartesian = +x
    elem.set_property("spatial-objects", [{"x": 1.0, "y": 0.0, "z": 0.0,
                                           "distance-gain": 1.0, "coordinate-system": "cartesian"}])
    sig = np.zeros((256, 1), np.float32)
    sig[0, 0] = 1.0
    h.push(Buffer(sig, pts=0))
    out = np.asarray(h.pull().data)
    assert out.shape == (256, 2)
    # measurement 0: left IR = delta at tap 0 gain 1.0; right delta at tap 1 gain 0.5
    assert out[0, 0] == pytest.approx(1.0, abs=1e-4)
    assert out[1, 1] == pytest.approx(0.5, abs=1e-4)


def test_lfe_channel_dropped(tmp_path):
    # 6 channels default positions include LFE at index 3
    h, elem = build(tmp_path, channels=6)
    sig = np.zeros((256, 6), np.float32)
    sig[0, 3] = 1.0  # impulse only on LFE
    h.push(Buffer(sig, pts=0))
    out = np.asarray(h.pull().data)
    np.testing.assert_allclose(out, 0.0, atol=1e-7)


def test_update_threshold(tmp_path):
    h, elem = build(tmp_path, channels=1)
    elem.set_property("spatial-objects", [{"x": 1.0, "y": 0.0, "z": 0.0, "coordinate-system": "cartesian"}])
    applied_before = list(elem._applied)
    # tiny move below threshold: no re-selection
    elem.set_property("update-threshold", 0.5)
    elem.set_property("spatial-objects", [{"x": 1.0, "y": 0.01, "z": 0.0, "coordinate-system": "cartesian"}])
    assert elem._applied == applied_before
    # big move: filter re-selected (az=90 -> +y)
    elem.set_property("spatial-objects", [{"x": 0.0, "y": 1.0, "z": 0.0, "coordinate-system": "cartesian"}])
    assert elem._applied != applied_before
    sig = np.zeros((256, 1), np.float32)
    sig[0, 0] = 1.0
    h.push(Buffer(sig, pts=0))
    out = np.asarray(h.pull().data)
    # measurement 1: left delta at tap 1 gain 0.9
    assert out[1, 0] == pytest.approx(0.9, abs=1e-4)


def test_eos_drain_residue(tmp_path):
    h, elem = build(tmp_path, channels=1)
    from gst_plugins_rs_tpu.core import SECOND

    h.push(Buffer(np.zeros((300, 1), np.float32), pts=0, offset=0))
    b = h.pull()
    assert b.data.shape[0] == 256
    h.push_eos()
    residue = h.pull()
    assert residue.data.shape[0] == 44
    assert residue.pts == 256 * SECOND // RATE
