"""gopbuffer tests (generic/gopbuffer semantics)."""
import numpy as np

from gst_plugins_rs_tpu.core import (
    Buffer,
    BufferFlags,
    Caps,
    Harness,
    SECOND,
    element_factory_make,
)

MS = SECOND // 1000


def mk(pts_ms, key):
    b = Buffer(np.zeros((4, 1), np.float32), pts=pts_ms * MS, duration=100 * MS)
    if not key:
        b.set_flag(BufferFlags.DELTA_UNIT)
    return b


def build(min_ms=300):
    elem = element_factory_make("gopbuffer")
    elem.set_property("minimum-duration", min_ms * MS)
    h = Harness(elem)
    h.set_src_caps(Caps.builder("video/x-raw", format="RGB", width=4, height=4))
    return h


def test_holds_until_minimum_duration():
    h = build(min_ms=300)
    h.push(mk(0, True))
    h.push(mk(100, False))
    assert h.buffers_received() == 0  # GOP still open
    h.push(mk(200, True))  # closes GOP 1; buffered 300 ms
    assert h.buffers_received() == 2
    assert [b.pts for b in h.pull_all()] == [0, 100 * MS]


def test_eos_flushes_everything():
    h = build(min_ms=10_000)
    h.push(mk(0, True))
    h.push(mk(100, False))
    h.push(mk(200, True))
    assert h.buffers_received() == 0
    h.push_eos()
    assert [b.pts for b in h.pull_all()] == [0, 100 * MS, 200 * MS]


def test_order_preserved_across_gops():
    h = build(min_ms=0)
    for i, key in enumerate([True, False, True, False, True]):
        h.push(mk(i * 100, key))
    h.push_eos()
    assert [b.pts // MS for b in h.pull_all()] == [0, 100, 200, 300, 400]
