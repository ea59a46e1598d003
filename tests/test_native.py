"""Native host-ops tests (C++ via ctypes, with NumPy fallback parity)."""
import numpy as np
import pytest

from gst_plugins_rs_tpu.utils import native


def test_native_builds_and_loads():
    # the toolchain is present in this environment; the lib must build
    assert native.native_available()


def test_repack_strided():
    h, row, stride = 5, 12, 16
    src = np.arange(h * stride, dtype=np.uint8)
    out = native.repack_strided(src, h, row, stride)
    ref = src.reshape(h, stride)[:, :row].reshape(-1)
    np.testing.assert_array_equal(out, ref)


def test_unpack_strided_roundtrip():
    h, row, stride = 4, 10, 16
    packed = np.arange(h * row, dtype=np.uint8)
    strided = native.unpack_strided(packed, h, row, stride)
    back = native.repack_strided(strided, h, row, stride)
    np.testing.assert_array_equal(back, packed)


def test_interleave_roundtrip():
    rng = np.random.RandomState(0)
    x = rng.uniform(-1, 1, (100, 3)).astype(np.float32)
    planes = native.deinterleave_f32(x)
    assert planes.shape == (3, 100)
    np.testing.assert_array_equal(planes[1], x[:, 1])
    back = native.interleave_f32(planes)
    np.testing.assert_array_equal(back, x)


def test_spsc_ring():
    r = native.SpscRing(1 << 10)
    assert r.write(b"hello")
    assert r.write(b"world")
    assert r.readable() == 10
    assert r.read(5) == b"hello"
    assert r.read(5) == b"world"
    assert r.read(1) is None
    # wrap-around
    big = bytes(range(200)) * 5
    for _ in range(4):
        assert r.write(big)
        assert r.read(len(big)) == big
    # all-or-nothing on overflow
    assert not r.write(b"x" * 2048)


class TestNetIo:
    """Native epoll+recvmmsg batch receiver (native/netio.cpp)."""

    def test_batch_receive_many_sockets(self):
        import socket
        from gst_plugins_rs_tpu.net import netio

        if not netio.available():
            pytest.skip("netio shim unavailable")
        rx = netio.BatchReceiver()
        socks = []
        try:
            for tag in range(8):
                s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
                s.bind(("127.0.0.1", 0))
                s.setblocking(False)
                rx.add_socket(s, tag)
                socks.append(s)
            tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
            sent = {}
            for tag, s in enumerate(socks):
                port = s.getsockname()[1]
                for k in range(5):
                    payload = bytes([tag, k]) * 10
                    tx.sendto(payload, ("127.0.0.1", port))
                    sent.setdefault(tag, []).append(payload)
            got = {}
            import time as _t
            deadline = _t.monotonic() + 3
            while sum(len(v) for v in got.values()) < 40 and _t.monotonic() < deadline:
                for tag, payload in rx.poll(timeout_ms=100):
                    got.setdefault(tag, []).append(payload)
            assert sum(len(v) for v in got.values()) == 40
            for tag in range(8):
                assert got[tag] == sent[tag]  # per-socket ordering preserved
            tx.close()
        finally:
            for s in socks:
                s.close()
            rx.close()

    def test_arena_and_timeout(self):
        from gst_plugins_rs_tpu.net import netio

        if not netio.available():
            pytest.skip("netio shim unavailable")
        rx = netio.BatchReceiver()
        assert rx.poll(timeout_ms=10) == []  # clean timeout, no sockets
        rx.close()
