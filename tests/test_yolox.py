"""YOLOX model + inference/decode element tests.

Decode parity scenarios mirror analytics/analytics/src/yoloxtensordec/imp.rs
(threshold filtering, argmax class, per-class greedy NMS with +1 IoU, label
quarks); model structure checks anchor counts and grid/stride decode
(head.rs:89-122).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gst_plugins_rs_tpu import parse_launch
from gst_plugins_rs_tpu.core import Buffer, Caps, Fraction, Harness, element_factory_make
from gst_plugins_rs_tpu.elements.analytics.meta import (
    AnalyticsRelationMeta,
    Tensor,
    TensorDataType,
    TensorDimOrder,
    TensorMeta,
)
from gst_plugins_rs_tpu.models.yolox import Yolox, _remap_key


@pytest.fixture(scope="module")
def tiny_model():
    model = Yolox.from_variant("tiny", num_classes=3)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    return model, variables


def test_forward_shape_and_anchors(tiny_model):
    model, variables = tiny_model
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    out = model.apply(variables, x)
    # anchors: (64/8)^2 + (64/16)^2 + (64/32)^2 = 64 + 16 + 4 = 84
    assert out.shape == (1, 84, 8)  # 5 + 3 classes


def test_decode_scales_with_stride(tiny_model):
    model, variables = tiny_model
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    out = np.asarray(model.apply(variables, x))
    # for zero input everything is spatially constant per level; centers of the
    # stride-8 level form the 8x8 grid scaled by 8
    xy = out[0, :64, 0:2]
    gx = xy[:, 0].reshape(8, 8)
    # column spacing must be exactly 8 pixels
    assert np.allclose(np.diff(gx, axis=1), 8.0, atol=1e-4)
    # obj/cls are sigmoids -> in (0, 1)
    assert np.all(out[0, :, 4:] > 0) and np.all(out[0, :, 4:] < 1)


def test_variant_param_scaling():
    nano = Yolox.from_variant("nano")
    s = Yolox.from_variant("s")
    assert nano.depthwise and not s.depthwise
    assert nano.width == 0.25 and s.width == 0.50


def test_torch_key_remapping():
    cases = {
        "backbone.C3_p4.conv1.bn.weight": "backbone.c3_p4.conv1.bn.weight",
        "backbone.backbone.dark2.0.conv.weight": "backbone.backbone.dark2.conv.conv.weight",
        "backbone.backbone.dark3.1.conv1.conv.weight": "backbone.backbone.dark3.c3.conv1.conv.weight",
        "backbone.backbone.dark5.1.conv1.conv.weight": "backbone.backbone.dark5.spp.conv1.conv.weight",
        "backbone.backbone.dark5.2.conv3.bn.bias": "backbone.backbone.dark5.c3.conv3.bn.bias",
        "head.cls_convs.0.1.conv.weight": "head.cls_convs.0.conv1.conv.weight",
        "head.reg_convs.2.0.bn.running_mean": "head.reg_convs.2.conv0.bn.running_mean",
    }
    for src, want in cases.items():
        assert _remap_key(src) == want


def _mk_tensor(rows):
    """rows: list of [cx, cy, w, h, obj, cls0, cls1, ...]"""
    arr = jnp.asarray(np.asarray(rows, np.float32))
    return TensorMeta(
        [Tensor("yolox-out", TensorDataType.FLOAT32, (1, arr.shape[0], arr.shape[1]),
                TensorDimOrder.ROW_MAJOR, arr)]
    )


def run_dec(rows, **props):
    elem = element_factory_make("yoloxtensordec")
    for k, v in props.items():
        elem.set_property(k.replace("_", "-"), v)
    h = Harness(elem)
    h.set_src_caps(Caps.builder("video/x-raw", format="RGB", width=64, height=64, framerate=Fraction(30, 1)))
    buf = Buffer(np.zeros((64, 64, 3), np.uint8), pts=0)
    buf.add_meta(_mk_tensor(rows))
    h.push(buf)
    out = h.pull()
    return out.get_meta(AnalyticsRelationMeta)


def test_decode_thresholds():
    rows = [
        [32, 32, 10, 10, 0.9, 0.1, 0.95],  # passes: combined 0.855, class 1
        [10, 10, 4, 4, 0.2, 0.99, 0.0],  # box conf too low
        [50, 50, 4, 4, 0.9, 0.3, 0.2],  # class conf too low
    ]
    m = run_dec(rows)
    assert m is not None and len(m.od) == 1
    od = m.od[0]
    assert od.object_type == "CLASS-1"
    assert (od.x, od.y, od.w, od.h) == (27, 27, 10, 10)
    assert od.loc_conf_lvl == pytest.approx(0.9 * 0.95, abs=1e-6)
    assert len(m.cls) == 1 and m.relations[0][0].name == "RELATE_TO"


def test_decode_nms_same_class():
    rows = [
        [32, 32, 20, 20, 0.9, 0.0, 0.9],  # kept (highest combined)
        [33, 33, 20, 20, 0.8, 0.0, 0.9],  # overlaps heavily -> dropped
        [10, 10, 6, 6, 0.8, 0.0, 0.9],  # far away -> kept
    ]
    m = run_dec(rows, iou_threshold=0.5)
    assert len(m.od) == 2
    confs = sorted(o.loc_conf_lvl for o in m.od)
    assert confs[1] == pytest.approx(0.81, abs=1e-6)


def test_decode_nms_different_classes_kept():
    rows = [
        [32, 32, 20, 20, 0.9, 0.0, 0.9],
        [33, 33, 20, 20, 0.8, 0.9, 0.0],  # overlapping but other class
    ]
    m = run_dec(rows, iou_threshold=0.5)
    assert len(m.od) == 2


def test_decode_label_file(tmp_path):
    p = tmp_path / "labels.txt"
    p.write_text("person\ncar\n")
    rows = [[32, 32, 10, 10, 0.9, 0.1, 0.95]]
    m = run_dec(rows, label_file=str(p))
    assert m.od[0].object_type == "car"


def test_no_tensor_meta_passthrough():
    elem = element_factory_make("yoloxtensordec")
    h = Harness(elem)
    h.set_src_caps(Caps.builder("video/x-raw", format="RGB", width=32, height=32, framerate=Fraction(30, 1)))
    h.push(Buffer(np.zeros((32, 32, 3), np.uint8), pts=0))
    out = h.pull()
    assert out.get_meta(AnalyticsRelationMeta) is None


def test_inference_pipeline_attaches_tensor():
    p = parse_launch(
        "videotestsrc num-buffers=1 ! video/x-raw,format=RGB,width=64,height=64 "
        "! yoloxinference model-type=tiny num-classes=3 ! yoloxtensordec "
        "box-confidence-threshold=0.0 class-confidence-threshold=0.0 ! appsink name=sink"
    )
    sink = p.by_name("sink")
    p.play_until_eos()
    buf = sink.samples[0].buffer
    tm = buf.get_meta(TensorMeta)
    assert tm is not None
    assert tm.tensors[0].dims == (1, 84, 8)
    rm = buf.get_meta(AnalyticsRelationMeta)
    assert rm is not None  # thresholds 0 -> random-weight boxes decoded
    assert len(rm.od) >= 1
