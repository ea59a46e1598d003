"""handdetectiontensordec tests (reference semantics:
analytics/analytics/src/handdetectiontensordec/imp.rs)."""
import math

import numpy as np
import pytest

from gst_plugins_rs_tpu.core import Buffer, Caps, Fraction, Harness, element_factory_make
from gst_plugins_rs_tpu.elements.analytics.handdetection import OrientedOdMtd
from gst_plugins_rs_tpu.elements.analytics.meta import (
    AnalyticsRelationMeta,
    Tensor,
    TensorDataType,
    TensorDimOrder,
    TensorMeta,
)


def make_row(score, cx, cy, size, rot_deg=0.0):
    """Build a detection row whose keypoints encode the desired rotation.
    rotation = pi/2 + atan2(dy, dx); rot=0 -> kp2 below kp0 (dy<0... solve)."""
    # choose kp span = 0.5*size (within the allowed ratio window);
    # od rotation = atan2(dy, dx), so aim the kp vector at rot_deg directly
    ang = math.radians(rot_deg)
    dx, dy = 0.5 * size * math.cos(ang), 0.5 * size * math.sin(ang)
    kp0 = (cx, cy)
    kp2 = (cx + dx, cy + dy)
    return [score, cx, cy, size, kp0[0], kp0[1], kp2[0], kp2[1]]


def run(rows, width=640, height=480, **props):
    elem = element_factory_make("handdetectiontensordec")
    for k, v in props.items():
        elem.set_property(k.replace("_", "-"), v)
    h = Harness(elem)
    h.set_src_caps(Caps.builder("video/x-raw", format="RGB", width=width, height=height, framerate=Fraction(30, 1)))
    buf = Buffer(np.zeros((height, width, 3), np.uint8), pts=0)
    arr = np.asarray(rows, np.float32)
    buf.add_meta(
        TensorMeta([Tensor("palm-detection-out", TensorDataType.FLOAT32, arr.shape,
                           TensorDimOrder.ROW_MAJOR, arr)])
    )
    h.push(buf)
    return h.pull().get_meta(AnalyticsRelationMeta)


def test_basic_detection():
    m = run([make_row(0.9, 0.5, 0.5, 0.1)])
    assert m is not None and len(m.od) == 1
    od = m.od[0]
    assert od.object_type == "hand"
    # rr = 0.29 normalized, scaled by max(640,480) = 185.6 px -> ~186 wide
    assert 180 <= od.w <= 190
    assert isinstance(od, OrientedOdMtd)
    assert od.loc_conf_lvl == pytest.approx(0.9)
    assert len(m.cls) == 1 and m.relations[0][0].name == "RELATE_TO"


def test_confidence_threshold():
    m = run([make_row(0.1, 0.5, 0.5, 0.1)])
    assert len(m.od) == 0


def test_size_window_rejects():
    # rr = 2.9*size must be within [0.06, 1.40]
    assert len(run([make_row(0.9, 0.5, 0.5, 0.01)]).od) == 0  # too small
    assert len(run([make_row(0.9, 0.5, 0.5, 0.6)]).od) == 0  # too large


def test_nms_and_max_hands():
    rows = [
        make_row(0.9, 0.5, 0.5, 0.1),
        make_row(0.8, 0.51, 0.5, 0.1),  # overlapping -> suppressed
        make_row(0.7, 0.15, 0.2, 0.1),
        make_row(0.6, 0.8, 0.8, 0.1),  # third hand: beyond max-hands=2
    ]
    m = run(rows, max_hands=2)
    assert len(m.od) == 2
    assert m.od[0].loc_conf_lvl == pytest.approx(0.9)
    assert m.od[1].loc_conf_lvl == pytest.approx(0.7)


def test_rotation_reported():
    m = run([make_row(0.9, 0.5, 0.5, 0.1, rot_deg=30.0)])
    assert len(m.od) == 1
    # od rotation = palm rotation - pi/2
    assert m.od[0].rotation == pytest.approx(math.radians(30.0) - 0.0, abs=0.05)


def test_no_tensor_is_passthrough():
    elem = element_factory_make("handdetectiontensordec")
    h = Harness(elem)
    h.set_src_caps(Caps.builder("video/x-raw", format="RGB", width=64, height=64, framerate=Fraction(30, 1)))
    h.push(Buffer(np.zeros((64, 64, 3), np.uint8), pts=0))
    assert h.pull().get_meta(AnalyticsRelationMeta) is None
