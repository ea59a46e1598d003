"""colorlut element + .cube parser tests.

Parser accept/reject cases mirror video/colorlut/src/parser.rs:377-474;
sampling oracle mirrors imp.rs:399-543 (domain normalize, trilinear lerp,
round-to-nearest quantization)."""
import numpy as np
import pytest

from gst_plugins_rs_tpu.core import Buffer, Caps, Fraction, Harness, element_factory_make
from gst_plugins_rs_tpu.ops.colorlut import CubeLut, CubeParseError


# --- parser -----------------------------------------------------------------

def test_parse_3d_lut():
    text = """
        LUT_3D_SIZE 2

        0.0 0.0 0.0
        1.0 0.0 0.0
        0.0 1.0 0.0
        1.0 1.0 0.0
        0.0 0.0 1.0
        1.0 0.0 1.0
        0.0 1.0 1.0
        1.0 1.0 1.0
    """
    lut = CubeLut.parse(text)
    assert lut.is_3d and lut.size == 2
    assert lut.table.shape == (8, 3)
    np.testing.assert_array_equal(lut.table[0], [0, 0, 0])
    np.testing.assert_array_equal(lut.table[7], [1, 1, 1])


def test_parse_1d_with_header_after_size():
    text = """
        LUT_1D_SIZE 2

        TITLE "test"
        DOMAIN_MIN 0.0 0.0 0.0
        DOMAIN_MAX 1.0 1.0 1.0

        0.0 0.0 0.0
        1.0 0.5 0.7
    """
    lut = CubeLut.parse(text)
    assert not lut.is_3d and lut.size == 2
    np.testing.assert_allclose(lut.table[:, 1], [0.0, 0.5])


@pytest.mark.parametrize(
    "text",
    [
        "LUT_1D_SIZE 2\n0.0 0.0 0.0\n1.0 0.0 0.0\nTITLE \"invalid\"\n",  # header after data
        "LUT_1D_SIZE 2\n0.0 0.0 0.0\nTITLE \"x\"\n1.0 0.0 0.0\n",  # header between data
        "LUT_1D_SIZE 2\nLUT_3D_SIZE 2\n0.0 0.0 0.0\n1.0 1.0 1.0\n",  # two sizes
        "0.0 0.0 0.0\n",  # data before size
        "LUT_3D_SIZE 1\n0.0 0.0 0.0\n",  # size out of range
        "LUT_3D_SIZE 300\n",  # size out of range
        "LUT_1D_SIZE 2\n0.0 0.0 0.0\n",  # wrong count
        "LUT_1D_SIZE 2\nDOMAIN_MIN 1.0 1.0 1.0\n0.0 0.0 0.0\n1.0 1.0 1.0\n",  # min >= max
        "TITLE \"empty\"\n",  # no size
    ],
)
def test_parse_rejects(text):
    with pytest.raises(CubeParseError):
        CubeLut.parse(text)


# --- sampling oracle --------------------------------------------------------

def oracle_3d(frame, lut: CubeLut, maxval=255.0):
    size = lut.size
    rgb = frame[..., :3].astype(np.float64) / maxval
    coord = np.clip(rgb * lut.domain_scale + lut.domain_offset, 0, 1) * (size - 1)
    out = np.empty_like(rgb)
    i0 = np.minimum(np.floor(coord).astype(int), size - 1)
    i1 = np.minimum(i0 + 1, size - 1)
    t = coord - i0
    tbl = lut.table.reshape(size, size, size, 3)  # [z, y, x, rgb]

    def at(xi, yi, zi):
        return tbl[zi, yi, xi]

    x0, y0, z0 = i0[..., 0], i0[..., 1], i0[..., 2]
    x1, y1, z1 = i1[..., 0], i1[..., 1], i1[..., 2]
    tx, ty, tz = t[..., 0:1], t[..., 1:2], t[..., 2:3]
    c00 = at(x0, y0, z0) * (1 - tx) + at(x1, y0, z0) * tx
    c10 = at(x0, y1, z0) * (1 - tx) + at(x1, y1, z0) * tx
    c01 = at(x0, y0, z1) * (1 - tx) + at(x1, y0, z1) * tx
    c11 = at(x0, y1, z1) * (1 - tx) + at(x1, y1, z1) * tx
    c0 = c00 * (1 - ty) + c10 * ty
    c1 = c01 * (1 - ty) + c11 * ty
    c = c0 * (1 - tz) + c1 * tz
    return np.round(np.clip(c, 0, 1) * maxval)


def _write_lut(tmp_path, text):
    p = tmp_path / "test.cube"
    p.write_text(text)
    return str(p)


def run_colorlut(frame, location, fmt="RGBA"):
    elem = element_factory_make("colorlut")
    elem.set_property("location", location)
    h = Harness(elem)
    hh, ww = frame.shape[:2]
    h.set_src_caps(Caps.builder("video/x-raw", format=fmt, width=ww, height=hh, framerate=Fraction(30, 1)))
    h.push(Buffer(frame, pts=0))
    return np.asarray(h.pull().data)


IDENTITY_2 = """LUT_3D_SIZE 2
0.0 0.0 0.0
1.0 0.0 0.0
0.0 1.0 0.0
1.0 1.0 0.0
0.0 0.0 1.0
1.0 0.0 1.0
0.0 1.0 1.0
1.0 1.0 1.0
"""

SWAP_RB_2 = """LUT_3D_SIZE 2
0.0 0.0 0.0
0.0 0.0 1.0
0.0 1.0 0.0
0.0 1.0 1.0
1.0 0.0 0.0
1.0 0.0 1.0
1.0 1.0 0.0
1.0 1.0 1.0
"""


def test_identity_lut_is_exact(tmp_path):
    loc = _write_lut(tmp_path, IDENTITY_2)
    frame = np.random.RandomState(3).randint(0, 256, (9, 13, 4), np.uint8)
    out = run_colorlut(frame, loc)
    np.testing.assert_array_equal(out[..., :3], frame[..., :3])
    np.testing.assert_array_equal(out[..., 3], frame[..., 3])  # alpha preserved


def test_swap_rb_lut(tmp_path):
    loc = _write_lut(tmp_path, SWAP_RB_2)
    frame = np.zeros((1, 2, 4), np.uint8)
    frame[0, 0] = [200, 30, 60, 255]
    frame[0, 1] = [0, 255, 10, 128]
    out = run_colorlut(frame, loc)
    np.testing.assert_array_equal(out[0, 0], [60, 30, 200, 255])
    np.testing.assert_array_equal(out[0, 1], [10, 255, 0, 128])


def test_random_3d_lut_matches_oracle(tmp_path):
    rng = np.random.RandomState(11)
    size = 5
    vals = rng.uniform(0, 1, (size**3, 3))
    text = f"LUT_3D_SIZE {size}\n" + "\n".join(" ".join(f"{v:.6f}" for v in row) for row in vals)
    loc = _write_lut(tmp_path, text)
    lut = CubeLut.parse_file(loc)
    frame = rng.randint(0, 256, (17, 7, 4), np.uint8)
    out = run_colorlut(frame, loc)
    ref = oracle_3d(frame, lut)
    assert np.abs(out[..., :3].astype(int) - ref.astype(int)).max() <= 1


def test_domain_min_max(tmp_path):
    text = "DOMAIN_MIN 0.0 0.0 0.0\nDOMAIN_MAX 0.5 0.5 0.5\n" + IDENTITY_2
    loc = _write_lut(tmp_path, text)
    lut = CubeLut.parse_file(loc)
    frame = np.random.RandomState(5).randint(0, 256, (4, 4, 4), np.uint8)
    out = run_colorlut(frame, loc)
    ref = oracle_3d(frame, lut)
    assert np.abs(out[..., :3].astype(int) - ref.astype(int)).max() <= 1


def test_1d_lut(tmp_path):
    # 1D inversion lut per component
    text = "LUT_1D_SIZE 2\n1.0 1.0 1.0\n0.0 0.0 0.0\n"
    loc = _write_lut(tmp_path, text)
    frame = np.zeros((1, 1, 4), np.uint8)
    frame[0, 0] = [255, 0, 100, 77]
    out = run_colorlut(frame, loc)
    np.testing.assert_array_equal(out[0, 0], [0, 255, 155, 77])


def test_rgba64(tmp_path):
    loc = _write_lut(tmp_path, SWAP_RB_2)
    frame = np.zeros((2, 2, 4), np.uint16)
    frame[..., 0] = 65535
    frame[..., 3] = 40000
    out = run_colorlut(frame, loc, fmt="RGBA64LE")
    assert out.dtype == np.uint16
    np.testing.assert_array_equal(out[0, 0], [0, 0, 65535, 40000])


def test_missing_location_errors(tmp_path):
    elem = element_factory_make("colorlut")
    from gst_plugins_rs_tpu.core import State

    with pytest.raises(RuntimeError):
        elem.set_state(State.PLAYING)


# ---------------------------------------------------------------------------
# precision=approx: low-rank CP factorization (gather-free MXU path)


def _smooth_grade_lut_text(size=17):
    """A realistic non-separable grade: saturation boost + shadow tint."""
    g = np.linspace(0, 1, size)
    Bz, Gy, Rx = np.meshgrid(g, g, g, indexing="ij")
    Y = 0.299 * Rx + 0.587 * Gy + 0.114 * Bz
    r = np.clip(Y + 1.25 * (Rx - Y) + 0.04 * (1 - Y) ** 2, 0, 1)
    gg = np.clip(Y + 1.25 * (Gy - Y) + 0.01, 0, 1)
    b = np.clip(Y + 1.25 * (Bz - Y) + 0.05 * (1 - Y) ** 2, 0, 1)
    vals = np.stack([r, gg, b], -1).reshape(-1, 3)
    return f"LUT_3D_SIZE {size}\n" + "\n".join(
        " ".join(f"{v:.6f}" for v in row) for row in vals)


class TestColorLutApprox:
    def test_fit_identity_is_near_exact(self):
        from gst_plugins_rs_tpu.ops.colorlut_lowrank import fit_lowrank

        size = 17
        g = np.linspace(0, 1, size)
        Bz, Gy, Rx = np.meshgrid(g, g, g, indexing="ij")
        table = np.stack([Rx, Gy, Bz], -1).reshape(-1, 3).astype(np.float32)
        fit = fit_lowrank(table, size, tolerance=0.25 / 255.0)
        assert fit is not None
        assert fit.max_node_err <= 0.25 / 255.0

    def test_convexity_bound_holds_offgrid(self):
        """Max continuous-domain error == max node error (hat weights are a
        convex combination): check empirically on random off-grid points."""
        from gst_plugins_rs_tpu.ops.colorlut import lut3d_apply
        from gst_plugins_rs_tpu.ops.colorlut_lowrank import (
            fit_lowrank, lut3d_apply_lowrank)

        rng = np.random.RandomState(7)
        size = 9
        g = np.linspace(0, 1, size)
        Bz, Gy, Rx = np.meshgrid(g, g, g, indexing="ij")
        table = np.stack([
            np.clip(Rx**1.2 + 0.05 * Gy, 0, 1),
            np.clip(Gy * 0.9 + 0.05 * Bz, 0, 1),
            np.clip(Bz**0.8, 0, 1)], -1).reshape(-1, 3).astype(np.float32)
        fit = fit_lowrank(table, size, tolerance=1.0 / 255.0)
        assert fit is not None
        frame = rng.randint(0, 256, (32, 32, 4), np.uint8)
        import jax.numpy as jnp

        scale, offset = jnp.ones(3), jnp.zeros(3)
        exact = np.asarray(lut3d_apply(
            jnp.asarray(frame), jnp.asarray(table), scale, offset,
            size=size, offsets=(0, 1, 2), bits=8))
        approx = np.asarray(lut3d_apply_lowrank(
            jnp.asarray(frame), jnp.asarray(fit.U), jnp.asarray(fit.V),
            jnp.asarray(fit.W), jnp.asarray(fit.C), scale, offset,
            size=size, offsets=(0, 1, 2), bits=8, compute_dtype="float32"))
        # node tolerance 1 LSB + 1 LSB rounding boundary
        assert np.abs(exact[..., :3].astype(int)
                      - approx[..., :3].astype(int)).max() <= 2

    def test_element_approx_matches_exact_within_tolerance(self, tmp_path):
        loc = _write_lut(tmp_path, _smooth_grade_lut_text())
        frame = np.random.RandomState(3).randint(0, 256, (24, 32, 4), np.uint8)
        exact = run_colorlut(frame, loc)

        elem = element_factory_make("colorlut")
        elem.set_property("location", loc)
        elem.set_property("precision", "approx")
        h = Harness(elem)
        h.set_src_caps(Caps.builder("video/x-raw", format="RGBA", width=32,
                                    height=24, framerate=Fraction(30, 1)))
        assert elem._cp is not None, "grade LUT must factor within tolerance"
        h.push(Buffer(frame, pts=0))
        out = np.asarray(h.pull().data)
        # APPROX_TOLERANCE_LSB node error + 1 LSB rounding
        assert np.abs(out[..., :3].astype(int)
                      - exact[..., :3].astype(int)).max() <= 3
        np.testing.assert_array_equal(out[..., 3], frame[..., 3])

    def test_element_falls_back_when_unfittable(self, tmp_path):
        # pure random noise LUT: CP rank <= 128 cannot reach 2 LSB
        rng = np.random.RandomState(0)
        size = 9
        vals = rng.uniform(0, 1, (size**3, 3))
        text = f"LUT_3D_SIZE {size}\n" + "\n".join(
            " ".join(f"{v:.6f}" for v in row) for row in vals)
        loc = _write_lut(tmp_path, text)
        exact = run_colorlut(
            np.random.RandomState(3).randint(0, 256, (8, 8, 4), np.uint8), loc)

        elem = element_factory_make("colorlut")
        elem.set_property("location", loc)
        elem.set_property("precision", "approx")
        h = Harness(elem)
        h.set_src_caps(Caps.builder("video/x-raw", format="RGBA", width=8,
                                    height=8, framerate=Fraction(30, 1)))
        assert elem._cp is None, "noise LUT must NOT pass the approx gate"
        frame = np.random.RandomState(3).randint(0, 256, (8, 8, 4), np.uint8)
        h.push(Buffer(frame, pts=0))
        out = np.asarray(h.pull().data)
        np.testing.assert_array_equal(out, exact)  # ran the exact path

    def test_packed_kernel_matches_fused(self):
        """The fully-packed u32 kernel (RGBA in-kernel unpack/repack) is
        bit-equal to the f32-wrapper fused kernel, alpha riding through."""
        from gst_plugins_rs_tpu.ops.colorlut_lowrank import fit_lowrank
        from gst_plugins_rs_tpu.ops.pallas_colorlut_lowrank import (
            lut3d_apply_lowrank_fused, lut3d_apply_lowrank_packed,
            pack_factors)
        import jax.numpy as jnp

        size = 17
        g = np.linspace(0, 1, size)
        Bz, Gy, Rx = np.meshgrid(g, g, g, indexing="ij")
        Y = 0.299 * Rx + 0.587 * Gy + 0.114 * Bz
        table = np.stack([
            np.clip(Y + 1.2 * (Rx - Y), 0, 1),
            np.clip(Y + 1.2 * (Gy - Y), 0, 1),
            np.clip(Y + 1.2 * (Bz - Y) + 0.03, 0, 1)], -1
        ).reshape(-1, 3).astype(np.float32)
        fit = fit_lowrank(table, size, tolerance=2.0 / 255.0)
        assert fit is not None
        ut, vt, wt, c = (jnp.asarray(a) for a in
                         pack_factors(fit.U, fit.V, fit.W, fit.C))
        frame = jnp.asarray(np.random.RandomState(5).randint(
            0, 256, (48, 64, 4), np.uint8))
        kw = dict(size=size, offsets=(0, 1, 2), bits=8, interpret=True)
        scale = [1.05, 1.0, 0.95]
        offset = [0.01, 0.0, -0.02]
        a = np.asarray(lut3d_apply_lowrank_fused(
            frame, ut, vt, wt, c, scale, offset, **kw))
        b = np.asarray(lut3d_apply_lowrank_packed(
            frame, ut, vt, wt, c, scale, offset, **kw))
        np.testing.assert_array_equal(a, b)
