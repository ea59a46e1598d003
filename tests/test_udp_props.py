"""Full reference property surface of udpsrc2/ts-udpsrc/ts-udpsink
(net/udp/src/udpsrc/imp.rs, generic/threadshare/src/udpsink/imp.rs)."""
import socket

import numpy as np

import gst_plugins_rs_tpu as fx
from gst_plugins_rs_tpu.core import FlowReturn, element_factory_make


def _recv_sock():
    s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    s.bind(("127.0.0.1", 0))
    s.settimeout(2.0)
    return s, s.getsockname()[1]


def test_udpsink_clients_fan_out():
    r1, p1 = _recv_sock()
    r2, p2 = _recv_sock()
    sink = element_factory_make("ts-udpsink")
    sink.set_property("clients", f"127.0.0.1:{p1}, 127.0.0.1:{p2}")
    sink.set_property("qos-dscp", 46)  # EF marking accepted + applied
    sink.set_state(fx.State.PLAYING)
    sink.render(fx.Buffer(np.frombuffer(b"fanout", np.uint8)))
    assert r1.recvfrom(64)[0] == b"fanout"
    assert r2.recvfrom(64)[0] == b"fanout"
    assert sink.get_property("used-socket") is not None
    sink.set_state(fx.State.NULL)
    r1.close()
    r2.close()


def test_udpsink_host_port_sync_with_clients():
    sink = element_factory_make("ts-udpsink")
    sink.set_property("host", "10.1.2.3")
    sink.set_property("port", 9999)
    assert sink.get_property("clients") == "10.1.2.3:9999"


def test_udpsrc_skip_first_bytes_and_uri():
    src = element_factory_make("udpsrc2")
    src.set_property("uri", "udp://127.0.0.1:0")
    src.set_property("skip-first-bytes", 4)
    src.set_property("timeout", 2_000_000_000)
    src.start()
    port = src.bound_port
    tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    tx.sendto(b"HDR!payload", ("127.0.0.1", port))
    buf = src.create()
    assert bytes(np.asarray(buf.data)) == b"payload"
    assert src.get_property("used-socket") is not None
    src.stop()
    tx.close()


def test_udpsrc_source_filter_exclusive_drops():
    src = element_factory_make("udpsrc2")
    src.set_property("address", "127.0.0.1")
    src.set_property("port", 0)
    src.set_property("source-filter", "10.9.9.9")  # nobody
    src.set_property("source-filter-exclusive", True)
    src.set_property("timeout", 300_000_000)
    src.start()
    port = src.bound_port
    tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    tx.sendto(b"spoof", ("127.0.0.1", port))
    assert src.create() is None  # filtered out, then idle EOS
    src.stop()
    tx.close()


def test_udpsrc_external_socket_kept_open():
    ext = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    ext.bind(("127.0.0.1", 0))
    port = ext.getsockname()[1]
    src = element_factory_make("udpsrc2")
    src.set_property("socket", ext)
    src.set_property("close-socket", False)
    src.set_property("timeout", 2_000_000_000)
    src.start()
    tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    tx.sendto(b"ext", ("127.0.0.1", port))
    assert bytes(np.asarray(src.create().data)) == b"ext"
    src.stop()
    ext.sendto(b"alive", ("127.0.0.1", port))  # still usable after stop
    ext.close()
    tx.close()


def test_udpsrc_batch_drains_queued_datagrams():
    src = element_factory_make("udpsrc2")
    src.set_property("address", "127.0.0.1")
    src.set_property("port", 0)
    src.set_property("batch-size", 4)
    src.set_property("timeout", 2_000_000_000)
    got = []
    src.start()
    port = src.bound_port
    tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    for i in range(4):
        tx.sendto(bytes([i]) * 3, ("127.0.0.1", port))
    import time
    time.sleep(0.1)  # let the kernel queue them
    src.srcpad.push = lambda b: got.append(b) or FlowReturn.OK
    first = src.create()
    assert first is not None
    total = 1 + len(got)
    assert total == 4, f"batch drained {total} datagrams"
    src.stop()
    tx.close()
