"""QUIC v1 transport tests: RFC 9000/9001 vectors, handshake, streams,
datagrams, loss recovery."""
import os
import socket
import struct
import threading
import time

import pytest

from gst_plugins_rs_tpu.net.quic import (
    QuicConnection,
    decode_varint,
    encode_varint,
    initial_keys,
)


class TestVarint:
    def test_rfc9000_a1_vectors(self):
        cases = {
            0xC2197C5EFF14E88C: 151288809941952652,
            0x9D7F3E7D: 494878333,
            0x7BBD: 15293,
            0x25: 37,
        }
        for wire, value in cases.items():
            raw = wire.to_bytes((wire.bit_length() + 7) // 8, "big")
            got, off = decode_varint(raw, 0)
            assert got == value
            assert off == len(raw)
        assert encode_varint(37) == b"\x25"
        assert encode_varint(15293) == b"\x7b\xbd"
        v, _ = decode_varint(encode_varint(151288809941952652), 0)
        assert v == 151288809941952652

    def test_roundtrip_boundaries(self):
        for v in (0, 63, 64, 16383, 16384, (1 << 30) - 1, 1 << 30, (1 << 62) - 1):
            got, off = decode_varint(encode_varint(v), 0)
            assert got == v


class TestInitialKeys:
    def test_rfc9001_appendix_a(self):
        """RFC 9001 A.1: keys for DCID 0x8394c8f03e515708."""
        client, server = initial_keys(bytes.fromhex("8394c8f03e515708"))
        assert client.key.hex() == "1f369613dd76d5467730efcbe3b1a22d"
        assert client.iv.hex() == "fa044b2f42a3fd3b46fb255c"
        assert client.hp.hex() == "9f50449e04a0e810283a1e9933adedd2"
        assert server.key.hex() == "cf3a5331653c364c88f0f379b6067e37"
        assert server.iv.hex() == "0ac1493ca1905853b0bba03e"
        assert server.hp.hex() == "c206b8d9b9f0f37644430b490eeaa314"


def _pair(**kwargs):
    """Client/server QuicConnection pair over an in-memory lossless wire."""
    to_server, to_client = [], []
    client = QuicConnection(True, to_server.append, **kwargs)
    server = QuicConnection(False, to_client.append, **kwargs)

    def pump(rounds=40):
        for _ in range(rounds):
            moved = False
            while to_server:
                server.handle_datagram(to_server.pop(0))
                moved = True
            while to_client:
                client.handle_datagram(to_client.pop(0))
                moved = True
            if not moved:
                break

    return client, server, pump, to_server, to_client


class TestHandshake:
    def test_memory_handshake(self):
        client, server, pump, *_ = _pair()
        client.connect()
        pump()
        assert client.handshake_done.is_set()
        assert server.handshake_done.is_set()
        assert client.tls.negotiated_alpn == "gstpu"
        assert server.tls.negotiated_alpn == "gstpu"
        # transport params exchanged; datagram support negotiated
        assert client.peer_max_datagram > 0
        assert server.peer_max_datagram > 0

    def test_alpn_mismatch_fails(self):
        to_server, to_client = [], []
        client = QuicConnection(True, to_server.append, alpn=["foo"])
        server = QuicConnection(False, to_client.append, alpn=["bar"])
        client.connect()
        with pytest.raises(Exception):
            for _ in range(10):
                while to_server:
                    server.handle_datagram(to_server.pop(0))
                while to_client:
                    client.handle_datagram(to_client.pop(0))
            raise AssertionError("handshake should not complete")


class TestStreams:
    def test_uni_stream_data(self):
        client, server, pump, *_ = _pair()
        got = []
        server.on_stream_data = lambda sid, data, fin: got.append((sid, data, fin))
        client.connect()
        pump()
        sid = client.open_uni_stream()
        client.send_stream(sid, b"hello quic", fin=True)
        pump()
        assert got and got[-1][0] == sid
        data = b"".join(d for _, d, _ in got)
        assert data == b"hello quic"
        assert got[-1][2] is True

    def test_large_transfer_chunked(self):
        client, server, pump, *_ = _pair()
        received = {}
        def on_data(sid, data, fin):
            received.setdefault(sid, bytearray()).extend(data)
        server.on_stream_data = on_data
        client.connect()
        pump()
        payload = os.urandom(50_000)
        sid = client.open_uni_stream()
        client.send_stream(sid, payload, fin=True)
        pump(rounds=200)
        assert bytes(received[sid]) == payload

    def test_bidi_echo(self):
        client, server, pump, *_ = _pair()

        def echo(sid, data, fin):
            if data or fin:
                server.send_stream(sid, data.upper(), fin=fin)
        server.on_stream_data = echo
        got = []
        client.on_stream_data = lambda sid, data, fin: got.append(data)
        client.connect()
        pump()
        sid = client.open_bidi_stream()
        client.send_stream(sid, b"abc", fin=True)
        pump()
        assert b"".join(got) == b"ABC"


class TestDatagrams:
    def test_datagram_roundtrip(self):
        client, server, pump, *_ = _pair()
        got_s, got_c = [], []
        server.on_datagram = got_s.append
        client.on_datagram = got_c.append
        client.connect()
        pump()
        client.send_datagram(b"unreliable 1")
        client.send_datagram(b"unreliable 2")
        pump()
        server.send_datagram(b"pong")
        pump()
        assert got_s == [b"unreliable 1", b"unreliable 2"]
        assert got_c == [b"pong"]


class TestLoss:
    def test_retransmit_after_loss(self):
        client, server, pump, to_server, to_client = _pair()
        got = {}
        server.on_stream_data = lambda sid, d, f: got.setdefault(sid, bytearray()).extend(d)
        client.connect()
        pump()
        sid = client.open_uni_stream()
        client.send_stream(sid, b"will be lost", fin=True)
        # drop everything the client just sent
        to_server.clear()
        time.sleep(0.4)
        client.tick()  # PTO fires -> retransmit
        pump()
        assert bytes(got[sid]) == b"will be lost"


class TestUdpLoopback:
    def test_handshake_and_stream_over_udp(self):
        sc = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        ss = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        sc.bind(("127.0.0.1", 0)); ss.bind(("127.0.0.1", 0))
        caddr, saddr = sc.getsockname(), ss.getsockname()
        client = QuicConnection(True, lambda d: sc.sendto(d, saddr))
        server = QuicConnection(False, lambda d: ss.sendto(d, caddr))
        got = []
        done = threading.Event()

        def on_data(sid, data, fin):
            got.append(data)
            if fin:
                done.set()
        server.on_stream_data = on_data
        stop = threading.Event()

        def pump(sock, conn):
            sock.settimeout(0.1)
            while not stop.is_set():
                try:
                    d, _ = sock.recvfrom(65536)
                except socket.timeout:
                    conn.tick()
                    continue
                except OSError:
                    return
                conn.handle_datagram(d)

        threads = [threading.Thread(target=pump, args=(sc, client), daemon=True),
                   threading.Thread(target=pump, args=(ss, server), daemon=True)]
        for t in threads:
            t.start()
        try:
            client.connect()
            assert client.wait_handshake(5.0)
            sid = client.open_uni_stream()
            client.send_stream(sid, b"over real udp", fin=True)
            assert done.wait(5.0)
            assert b"".join(got) == b"over real udp"
        finally:
            stop.set()
            for t in threads:
                t.join(1.0)
            sc.close(); ss.close()


class TestSecurity:
    def test_recvstream_overlapping_retransmission(self):
        """Peers like quinn may retransmit overlapping ranges; the
        un-delivered suffix must still be delivered (no stream stall)."""
        from gst_plugins_rs_tpu.net.quic import RecvStream

        rs = RecvStream()
        assert rs.push(0, b"a" * 100, False) == b"a" * 100
        # retransmission of 50..150 overlaps the 0..100 already delivered
        assert rs.push(50, b"a" * 50 + b"b" * 50, False) == b"b" * 50
        assert rs.delivered == 150
        # fully duplicate chunk: silently dropped
        assert rs.push(0, b"a" * 100, False) == b""
        assert rs.push(150, b"c" * 10, True) == b"c" * 10
        assert rs.finished

    def test_recvstream_overlap_bridges_gap(self):
        from gst_plugins_rs_tpu.net.quic import RecvStream

        rs = RecvStream()
        assert rs.push(0, b"x" * 10, False) == b"x" * 10
        rs.push(20, b"z" * 10, False)  # gap 10..20
        # overlapping chunk 5..25 fills the gap and unlocks the stored chunk
        assert rs.push(5, b"x" * 5 + b"y" * 15, False) == b"y" * 15 + b"z" * 5
        assert rs.delivered == 30

    def test_verify_peer_rejects_handshake(self):
        to_server, to_client = [], []
        client = QuicConnection(True, to_server.append,
                                verify_peer=lambda der: False)
        server = QuicConnection(False, to_client.append)
        client.connect()
        for _ in range(10):
            while to_server:
                server.handle_datagram(to_server.pop(0))
            while to_client:
                client.handle_datagram(to_client.pop(0))
        # a TLS failure closes the connection (RFC 9001 §4.8 alert ->
        # connection error) rather than crashing the datagram handler
        assert client.closed.is_set()
        assert "verify_peer" in (client.close_reason or "") or \
            "certificate" in (client.close_reason or "")
        assert not client.handshake_done.is_set()

    def test_verify_peer_pinning_accepts(self):
        from gst_plugins_rs_tpu.net.dtls import generate_certificate

        cert = generate_certificate()
        to_server, to_client = [], []
        client = QuicConnection(True, to_server.append,
                                verify_peer=lambda der: der == cert[0])
        server = QuicConnection(False, to_client.append, certificate=cert)
        client.connect()
        for _ in range(40):
            moved = False
            while to_server:
                server.handle_datagram(to_server.pop(0)); moved = True
            while to_client:
                client.handle_datagram(to_client.pop(0)); moved = True
            if not moved:
                break
        assert client.handshake_done.is_set()
        assert client.tls.peer_cert_der == cert[0]


class TestFlowControl:
    def test_sender_respects_peer_window_then_credit_releases(self):
        """RFC 9000 §4.1: the sender may not exceed the peer's advertised
        MAX_STREAM_DATA; delivery-driven credit (MAX_STREAM_DATA frames)
        releases the blocked tail."""
        client, server, pump, *_ = _pair(max_stream_data=1000,
                                         max_data=100_000)
        got = []
        server.on_stream_data = lambda sid, data, fin: got.append(data)
        client.connect()
        pump()
        assert client.handshake_done.is_set()
        sid = client.open_uni_stream()
        client.send_stream(sid, b"x" * 2500, fin=True)
        pump(rounds=200)
        # everything arrives: first 1000 within the initial window, the
        # rest after MAX_STREAM_DATA credit extensions
        assert sum(len(d) for d in got) == 2500
        assert server.recv_streams[sid].finished

    def test_conn_level_window_blocks_then_releases(self):
        client, server, pump, *_ = _pair(max_data=1500,
                                         max_stream_data=100_000)
        got = []
        server.on_stream_data = lambda sid, data, fin: got.append(data)
        client.connect()
        pump()
        sid = client.open_uni_stream()
        client.send_stream(sid, b"y" * 4000, fin=True)
        pump(rounds=300)
        assert sum(len(d) for d in got) == 4000

    def test_receiver_rejects_stream_limit_violation(self):
        """A peer writing past the advertised MAX_STREAM_DATA must be
        rejected with FLOW_CONTROL_ERROR (RFC 9000 §4.1)."""
        from gst_plugins_rs_tpu.net.quic import (
            FRAME_STREAM_BASE, LEVEL_APP, encode_varint)

        client, server, pump, *_ = _pair(max_stream_data=1000)
        client.connect()
        pump()
        # craft a STREAM frame far past the limit and inject it directly
        # (the send path would clamp it, which is exactly what an attacker
        # would not do)
        frame = (bytes([FRAME_STREAM_BASE | 0x04 | 0x02])
                 + encode_varint(2) + encode_varint(5000)
                 + encode_varint(4) + b"evil")
        server._process_frames(LEVEL_APP, frame)
        assert server.closed.is_set()
        assert "MAX_STREAM_DATA" in (server.close_reason or "")

    def test_receiver_rejects_conn_limit_violation(self):
        from gst_plugins_rs_tpu.net.quic import (
            FRAME_STREAM_BASE, LEVEL_APP, encode_varint)

        client, server, pump, *_ = _pair(max_data=1000,
                                         max_stream_data=100_000)
        client.connect()
        pump()
        frame = (bytes([FRAME_STREAM_BASE | 0x04 | 0x02])
                 + encode_varint(2) + encode_varint(1500)
                 + encode_varint(4) + b"evil")
        server._process_frames(LEVEL_APP, frame)
        assert server.closed.is_set()
        assert "MAX_DATA" in (server.close_reason or "")


class TestKeyUpdate:
    def test_key_update_roundtrip(self):
        """RFC 9001 §6: client rolls its 1-RTT keys; data keeps flowing both
        ways and the server follows onto the new generation."""
        client, server, pump, *_ = _pair()
        got_s, got_c = [], []
        server.on_stream_data = lambda sid, data, fin: got_s.append(data)
        client.on_stream_data = lambda sid, data, fin: got_c.append(data)
        client.connect()
        pump()
        sid = client.open_uni_stream()
        client.send_stream(sid, b"before-update")
        pump()
        assert b"".join(got_s) == b"before-update"

        client.initiate_key_update()
        assert client._key_phase == 1
        client.send_stream(sid, b"after-update")
        pump()
        assert b"".join(got_s) == b"before-updateafter-update"
        # server followed: its receive phase AND send phase flipped
        assert server._rx_phase == 1
        assert server._key_phase == 1
        # server -> client under the new generation
        sid2 = server.open_uni_stream()
        server.send_stream(sid2, b"reply-newgen")
        pump()
        assert b"".join(got_c) == b"reply-newgen"
        assert client._rx_phase == 1

    def test_second_key_update(self):
        client, server, pump, *_ = _pair()
        got = []
        server.on_stream_data = lambda sid, data, fin: got.append(data)
        client.connect()
        pump()
        sid = client.open_uni_stream()
        for i in range(2):
            client.initiate_key_update()
            client.send_stream(sid, b"gen%d" % (i + 1))
            pump()
        assert b"".join(got) == b"gen1gen2"
        assert client._key_phase == 0  # two flips wrap to phase 0
        assert server._rx_phase == 0


class TestAckLossDetection:
    """RFC 9002 ACK-driven loss detection (packet + time thresholds)."""

    def test_packet_threshold_retransmits_without_pto(self):
        """A dropped packet trailing >=3 acked pns retransmits on the ACK
        alone — no tick(), no PTO wait."""
        client, server, pump, to_server, to_client = _pair()
        got = {}
        server.on_stream_data = (
            lambda sid, d, f: got.setdefault(sid, bytearray()).extend(d))
        client.connect()
        pump()
        sid = client.open_uni_stream()
        client.send_stream(sid, b"AAAA")
        to_server.clear()  # drop it
        for chunk in (b"BBBB", b"CCCC", b"DDDD"):
            client.send_stream(sid, chunk)
        t0 = time.monotonic()
        pump()  # acks for B..D reach the client -> A declared lost -> resent
        assert bytes(got[sid]) == b"AAAABBBBCCCCDDDD"
        assert time.monotonic() - t0 < client._pto  # beat the PTO backstop

    def test_time_threshold_retransmits(self):
        """One trailing packet (below the pn threshold) is still declared
        lost once it is older than 9/8 RTT when a later ack arrives."""
        client, server, pump, to_server, to_client = _pair()
        got = {}
        server.on_stream_data = (
            lambda sid, d, f: got.setdefault(sid, bytearray()).extend(d))
        client.connect()
        pump()
        sid = client.open_uni_stream()
        client.send_stream(sid, b"lostlost")
        to_server.clear()  # drop it
        time.sleep(0.05)  # >> 9/8 x in-memory RTT
        client.send_stream(sid, b"laterpkt")  # only +1 pn: below threshold
        pump()
        assert bytes(got[sid]) == b"lostlostlaterpkt"

    def test_rtt_estimate_feeds_pto(self):
        client, server, pump, *_ = _pair()
        client.connect()
        pump()
        sid = client.open_uni_stream()
        client.send_stream(sid, b"ping")
        pump()
        assert client._srtt is not None
        # in-memory RTT is sub-millisecond: the PTO collapses from the
        # 350 ms pre-handshake default toward the 50 ms floor
        assert client._pto <= 0.1


def _unknown_version_initial(dcid=b"\x11" * 8, scid=b"\x22" * 8,
                             version=0x1A2A3A4A, size=1200):
    pkt = bytearray([0xC0])
    pkt += version.to_bytes(4, "big")
    pkt += bytes([len(dcid)]) + dcid
    pkt += bytes([len(scid)]) + scid
    pkt += b"\x00" * (size - len(pkt))
    return bytes(pkt)


def _vn_packet(dcid, scid, versions):
    pkt = bytearray([0x80 | 0x40])
    pkt += b"\x00\x00\x00\x00"
    pkt += bytes([len(dcid)]) + dcid
    pkt += bytes([len(scid)]) + scid
    for v in versions:
        pkt += v.to_bytes(4, "big")
    return bytes(pkt)


class TestVersionNegotiation:
    def test_server_answers_unknown_version(self):
        out = []
        server = QuicConnection(False, out.append)
        server.handle_datagram(_unknown_version_initial())
        assert len(out) == 1
        vn = out[0]
        assert vn[0] & 0x80
        assert vn[1:5] == b"\x00\x00\x00\x00"
        # CIDs echoed swapped: our dcid = peer scid, our scid = peer dcid
        assert vn[5] == 8 and vn[6:14] == b"\x22" * 8
        assert vn[14] == 8 and vn[15:23] == b"\x11" * 8
        assert (1).to_bytes(4, "big") in [vn[23 + i:27 + i]
                                          for i in range(0, len(vn) - 26, 4)]

    def test_server_ignores_short_unknown_version(self):
        """< 1200 bytes: answering would be an amplification vector."""
        out = []
        server = QuicConnection(False, out.append)
        server.handle_datagram(_unknown_version_initial(size=100))
        assert out == []

    def test_client_aborts_on_valid_vn(self):
        to_server = []
        client = QuicConnection(True, to_server.append)
        client.connect()
        client.handle_datagram(_vn_packet(client.scid, b"\x33" * 8, [0x2]))
        assert client.closed.is_set()
        assert "version negotiation" in client.close_reason

    def test_client_ignores_vn_listing_own_version(self):
        """RFC 9000 §6.2: a VN listing the version in use MUST be ignored."""
        to_server = []
        client = QuicConnection(True, to_server.append)
        client.connect()
        client.handle_datagram(_vn_packet(client.scid, b"\x33" * 8, [0x1, 0x2]))
        assert not client.closed.is_set()

    def test_client_ignores_vn_with_wrong_dcid(self):
        """The dcid echo is the only off-path defense VN has."""
        to_server = []
        client = QuicConnection(True, to_server.append)
        client.connect()
        client.handle_datagram(_vn_packet(b"\x99" * 8, b"\x33" * 8, [0x2]))
        assert not client.closed.is_set()

    def test_client_ignores_vn_after_server_packet(self):
        client, server, pump, to_server, to_client = _pair()
        client.connect()
        pump()
        assert client.handshake_done.is_set()
        client.handle_datagram(_vn_packet(client.scid, b"\x33" * 8, [0x2]))
        assert not client.closed.is_set()


class TestMigration:
    """Connection migration (RFC 9000 §9) over an address-aware wire.

    Reference analog: quinn handles migration below the quinn elements
    (net/quinn/src/quinnquicsink/imp.rs assumes the transport survives a
    client NAT rebind)."""

    @staticmethod
    def _addr_pair(unroutable=()):
        to_server, to_client = [], []   # (datagram, src_addr)
        client_addr = ["c1"]            # mutable: simulates a NAT rebind
        server_sent_to = []

        client = QuicConnection(True, lambda d: to_server.append((d, client_addr[0])))

        def server_sendto(d, addr):
            server_sent_to.append(addr)
            if addr in unroutable:      # off-path address: black hole
                return
            to_client.append((d, "s"))  # NAT still routes to the client

        server = QuicConnection(False, lambda d: to_client.append((d, "s")),
                                sendto_cb=server_sendto)

        def pump(rounds=40):
            for _ in range(rounds):
                moved = False
                while to_server:
                    d, a = to_server.pop(0)
                    server.handle_datagram(d, a)
                    moved = True
                while to_client:
                    d, a = to_client.pop(0)
                    client.handle_datagram(d, a)
                    moved = True
                if not moved:
                    break

        return client, server, pump, client_addr, server_sent_to

    def test_server_follows_client_rebind(self):
        client, server, pump, client_addr, sent_to = self._addr_pair()
        got = []
        server.on_stream_data = lambda sid, data, fin: got.append(data)
        client.connect()
        pump()
        assert server.peer_addr == "c1"

        sid = client.open_uni_stream()
        client.send_stream(sid, b"before")
        pump()

        # NAT rebind: same client, new apparent source address
        client_addr[0] = "c2"
        client.send_stream(sid, b"after")
        pump()

        # the server validated the new path (challenge went to c2) and
        # migrated: everything it now sends goes to c2
        assert "c2" in sent_to
        assert server.peer_addr == "c2"
        assert b"".join(got) == b"beforeafter"
        idx = sent_to.index("c2")
        assert all(a == "c2" for a in sent_to[idx + 1:] if a != "c1"), sent_to
        # new path's RTT estimator restarted (§9.4)
        assert server._srtt is None

        # data keeps flowing after migration
        client.send_stream(sid, b"more", fin=True)
        pump()
        assert b"".join(got) == b"beforeaftermore"

    def test_unvalidated_response_does_not_migrate(self):
        """An off-path spoof (authenticated packet with a forged source
        address, volunteering a PATH_RESPONSE the server never challenged
        for) must not move the path: the server probes the new address,
        the probe black-holes, and sending stays on the validated path."""
        client, server, pump, client_addr, sent_to = self._addr_pair(
            unroutable={"evil"})
        client.connect()
        pump()
        assert server.peer_addr == "c1"
        server.handle_datagram(
            client._build_packet("app", bytes([0x1B]) + b"\x00" * 8), "evil")
        pump()
        assert server.peer_addr == "c1"
        # the probe went out to the claimed address and nowhere else new
        assert "evil" in sent_to

    def test_client_probe_path_migrates_explicitly(self):
        to_server, to_client = [], []
        client_sent_to = []

        def client_sendto(d, addr):
            client_sent_to.append(addr)
            to_server.append((d, "c"))

        client = QuicConnection(True, lambda d: to_server.append((d, "c")),
                                sendto_cb=client_sendto)
        server = QuicConnection(False, lambda d: to_client.append((d, "s")))

        def pump(rounds=40):
            for _ in range(rounds):
                moved = False
                while to_server:
                    d, a = to_server.pop(0)
                    server.handle_datagram(d, a)
                    moved = True
                while to_client:
                    d, a = to_client.pop(0)
                    client.handle_datagram(d, a)
                    moved = True
                if not moved:
                    break

        client.connect()
        pump()
        assert client.peer_addr == "s"
        client.probe_path("s2")  # e.g. the server's preferred address
        pump()
        assert client.peer_addr == "s2"
        assert "s2" in client_sent_to


class TestResumptionAnd0Rtt:
    """Session tickets -> PSK resumption -> 0-RTT (RFC 9001 §4.5/§4.6).

    The TLS-level binder/PSK math is ALSO validated against openssl
    s_server in tests/test_tls13_openssl_interop.py — this class covers
    the QUIC plumbing (ticket surfacing, 0-RTT packets, rejection)."""

    @staticmethod
    def _pair_with(client_kwargs=None, server_kwargs=None):
        to_server, to_client = [], []
        client = QuicConnection(True, to_server.append, **(client_kwargs or {}))
        server = QuicConnection(False, to_client.append, **(server_kwargs or {}))

        def pump(rounds=40):
            for _ in range(rounds):
                moved = False
                while to_server:
                    server.handle_datagram(to_server.pop(0))
                    moved = True
                while to_client:
                    client.handle_datagram(to_client.pop(0))
                    moved = True
                if not moved:
                    break

        return client, server, pump

    def _ticket(self):
        tkey = b"k" * 16
        client, server, pump = self._pair_with(server_kwargs={"ticket_key": tkey})
        client.connect()
        pump()
        assert client.handshake_done.is_set()
        assert client.session_ticket is not None, "no session ticket surfaced"
        return client.session_ticket, tkey

    def test_session_ticket_resumption(self):
        session, tkey = self._ticket()
        c2, s2, pump = self._pair_with(
            client_kwargs={"session": session},
            server_kwargs={"ticket_key": tkey})
        c2.connect()
        pump()
        assert c2.handshake_done.is_set() and s2.handshake_done.is_set()
        assert c2.tls.psk_accepted and s2.tls.psk_accepted
        assert c2.tls.negotiated_alpn == "gstpu"

    def test_0rtt_data_arrives_before_handshake_completes(self):
        session, tkey = self._ticket()
        got = []
        c2, s2, pump = self._pair_with(
            client_kwargs={"session": session},
            server_kwargs={"ticket_key": tkey})
        s2.on_stream_data = lambda sid, data, fin: got.append((bytes(data),
                                                               s2.handshake_done.is_set()))
        c2.connect()
        sid = c2.open_uni_stream()
        c2.send_stream(sid, b"zero rtt payload")  # before ANY server flight
        # deliver ONLY the client's first flight: the server must produce the
        # stream data from the 0-RTT packets alone
        for _ in range(4):
            pump(rounds=1)
            if got:
                break
        assert got and got[0][0] == b"zero rtt payload"
        pump()
        assert c2.handshake_done.is_set() and s2.handshake_done.is_set()
        assert s2.tls.early_data_accepted

    def test_0rtt_rejected_falls_back_to_1rtt(self):
        """Server without the ticket key rejects the PSK; the 0-RTT data
        must still arrive, retransmitted under 1-RTT keys."""
        session, _ = self._ticket()
        got = []
        c2, s2, pump = self._pair_with(
            client_kwargs={"session": session},
            server_kwargs={"ticket_key": b"wrong-key-16byte"})
        s2.on_stream_data = lambda sid, data, fin: got.append(bytes(data))
        c2.connect()
        sid = c2.open_uni_stream()
        c2.send_stream(sid, b"early hopeful data")
        pump()
        assert c2.handshake_done.is_set() and s2.handshake_done.is_set()
        assert not s2.tls.psk_accepted
        for _ in range(6):
            if got:
                break
            time.sleep(0.4)  # let the PTO elapse
            c2.tick()  # PTO retransmission under 1-RTT keys
            pump()
        assert b"".join(got) == b"early hopeful data"


class TestRetry:
    def test_retry_roundtrip(self):
        to_server, to_client = [], []
        client = QuicConnection(True, to_server.append)
        server = QuicConnection(False, to_client.append, retry=True)
        got = []
        server.on_stream_data = lambda sid, data, fin: got.append(bytes(data))
        client.connect()
        for _ in range(40):
            moved = False
            while to_server:
                server.handle_datagram(to_server.pop(0)); moved = True
            while to_client:
                client.handle_datagram(to_client.pop(0)); moved = True
            if not moved:
                break
        assert client.handshake_done.is_set() and server.handshake_done.is_set()
        assert client._retry_done, "client never honored the Retry"
        sid = client.open_uni_stream()
        client.send_stream(sid, b"post-retry data", fin=True)
        for _ in range(10):
            while to_server:
                server.handle_datagram(to_server.pop(0))
            while to_client:
                client.handle_datagram(to_client.pop(0))
        assert b"".join(got) == b"post-retry data"

    def test_bad_retry_tag_ignored(self):
        """A spoofed Retry (wrong integrity tag) must not redirect the
        client (RFC 9001 §5.8)."""
        to_server = []
        client = QuicConnection(True, to_server.append)
        client.connect()
        scid = b"\x11" * 8
        pkt = bytearray([0xC0 | (3 << 4)])
        pkt += struct.pack("!I", 1)
        pkt += bytes([len(client.scid)]) + client.scid
        pkt += bytes([len(scid)]) + scid
        pkt += b"sometoken" + b"\x00" * 16  # garbage tag
        client.handle_datagram(bytes(pkt))
        assert not client._retry_done
        assert client._token == b""


class TestCongestionControl:
    """RFC 9002 §7 NewReno: cwnd-limited sending, slow start, recovery."""

    def _handshaken(self):
        client, server, pump, to_server, to_client = _pair()
        got = []
        server.on_stream_data = lambda sid, data, fin: got.append(data)
        client.connect()
        pump()
        assert client.handshake_done.is_set()
        to_server.clear()
        to_client.clear()
        return client, server, pump, to_server, to_client, got

    def test_initial_burst_is_cwnd_limited(self):
        client, server, pump, to_server, to_client, got = self._handshaken()
        sid = client.open_uni_stream()
        client.send_stream(sid, b"x" * 300_000, fin=True)
        burst = sum(len(d) for d in to_server)
        # the first flight must stay near the initial window, not 300 kB
        assert burst <= client._cwnd + 2 * client.MTU, burst
        assert burst > 0

    def test_all_data_delivered_and_window_grows(self):
        client, server, pump, to_server, to_client, got = self._handshaken()
        initial_cwnd = client._cwnd
        sid = client.open_uni_stream()
        client.send_stream(sid, b"y" * 300_000, fin=True)
        for _ in range(200):
            pump()
            client.tick()
            if sum(len(d) for d in got) >= 300_000:
                break
        assert sum(len(d) for d in got) == 300_000
        assert client._cwnd > initial_cwnd  # slow start grew the window
        assert client._in_flight == 0      # everything acked

    def test_loss_event_halves_the_window_once(self):
        client, server, pump, to_server, to_client, got = self._handshaken()
        sid = client.open_uni_stream()
        client.send_stream(sid, b"z" * 100_000, fin=True)
        pump()
        client.tick()
        pump()
        grown = client._cwnd
        # drop a full in-flight burst, then let ACK-driven detection fire
        client.send_stream(sid, b"z" * 50_000)
        to_server.clear()
        client.send_stream(sid, b"t" * 2_000)
        for _ in range(200):
            pump()
            client.tick()
            if client._recovery_start is not None:
                break
        assert client._recovery_start is not None
        # the window was halved from whatever it had grown to by the loss
        # (a little more growth can land between the snapshot and the event)
        assert client._ssthresh < grown * 0.75
        # post-recovery growth is congestion-avoidance from ssthresh
        assert client._ssthresh >= 2 * client.MTU
        assert client._cwnd >= client._ssthresh
        # and the stream still completes after recovery
        total_target = 100_000 + 50_000 + 2_000
        for _ in range(300):
            pump()
            client.tick()
            if sum(len(d) for d in got) >= total_target:
                break
        assert sum(len(d) for d in got) == total_target


class TestIdleTimeout:
    def test_idle_connection_closes_silently(self):
        client, server, pump, to_server, to_client = _pair()
        client.connect()
        pump()
        assert client.handshake_done.is_set()
        client.tick()
        assert not client.closed.is_set()
        # simulate silence past the effective idle timeout
        client._last_rx -= 31.0
        to_server.clear()
        client.tick()
        assert client.closed.is_set()
        assert client.close_reason == "idle timeout"
        assert not to_server, "idle close is silent (RFC 9000 §10.1)"

    def test_active_connection_stays_open(self):
        client, server, pump, *_ = _pair()
        client.connect()
        pump()
        sid = client.open_uni_stream()
        client.send_stream(sid, b"ping")
        pump()
        client.tick()
        assert not client.closed.is_set()


class TestClosedConnectionIsSilent:
    def test_no_transmission_after_idle_close(self):
        client, server, pump, to_server, to_client = _pair()
        client.connect()
        pump()
        sid = client.open_uni_stream()
        client.send_stream(sid, b"q")  # leave an unacked packet around
        client._last_rx -= 9999.0
        client.tick()
        assert client.closed.is_set()
        to_server.clear()
        to_client.clear()
        for _ in range(5):
            client.tick()  # must not resume PTO retransmission
        assert not to_server
        # inbound packets are dropped, not acked
        server.send_stream(server.open_uni_stream(), b"late")
        while to_client:
            client.handle_datagram(to_client.pop(0))
        assert not to_server
        with pytest.raises(Exception):
            client.send_stream(sid, b"more")

    def test_black_holed_client_times_out_without_any_rx(self):
        to_server = []
        client = QuicConnection(True, to_server.append, idle_timeout_ms=100)
        client.connect()  # server never answers
        client._last_rx -= 10.0
        client._pto = 0.01  # keep the 3x PTO floor below the elapsed time
        client.tick()
        assert client.closed.is_set()
        assert client.close_reason == "idle timeout"


def test_persistent_congestion_collapses_window():
    """RFC 9002 §7.6: a lost span longer than 3x the PTO duration with no
    ack inside it collapses cwnd to the minimum window (2 MTU)."""
    from gst_plugins_rs_tpu.net.tls13 import LEVEL_APP

    client, server, pump, to_server, to_client = _pair()
    client.connect()
    pump()
    assert client.handshake_done.is_set()
    space = client.spaces[LEVEL_APP]

    # establish an RTT sample, then fabricate an old lost span: two
    # ack-eliciting packets whose send times straddle > 3x the PTO
    # duration, all unacked since before the span began
    client._srtt = 0.05
    client._rttvar = 0.01
    client._last_acked_sent = None
    now = __import__("time").monotonic()
    duration = (client._srtt + max(4 * client._rttvar, client.K_GRANULARITY)
                + 0.025)
    span = client.K_PERSISTENT_CONGESTION * duration + 1.0
    base_pn = 900
    space.unacked[base_pn] = ([(0x01, b"")], True, now - span - 0.5, 1200)
    space.unacked[base_pn + 1] = ([(0x01, b"")], True, now - 0.5, 1200)
    client._in_flight += 2400
    grown = client._cwnd
    assert grown > 2 * client.MTU
    client._detect_lost(LEVEL_APP, space, base_pn + 100, now)
    assert client._cwnd == 2 * client.MTU, (client._cwnd, grown)


def test_no_persistent_congestion_when_ack_lands_inside_span():
    from gst_plugins_rs_tpu.net.tls13 import LEVEL_APP

    client, server, pump, to_server, to_client = _pair()
    client.connect()
    pump()
    space = client.spaces[LEVEL_APP]
    client._srtt = 0.05
    client._rttvar = 0.01
    now = __import__("time").monotonic()
    duration = (client._srtt + max(4 * client._rttvar, client.K_GRANULARITY)
                + 0.025)
    span = client.K_PERSISTENT_CONGESTION * duration + 1.0
    # an ack-eliciting packet sent INSIDE the span was acked
    client._last_acked_sent = now - span / 2
    base_pn = 900
    space.unacked[base_pn] = ([(0x01, b"")], True, now - span - 0.5, 1200)
    space.unacked[base_pn + 1] = ([(0x01, b"")], True, now - 0.5, 1200)
    client._in_flight += 2400
    client._detect_lost(LEVEL_APP, space, base_pn + 100, now)
    assert client._cwnd > 2 * client.MTU  # epoch halving only, no collapse


def test_path_probe_does_not_leak_in_flight():
    """ADVICE r3 (high): _send_path_frames popped the probe packet off the
    PTO ledger without giving back its congestion accounting, so every
    PATH_CHALLENGE/RESPONSE permanently leaked ~1200 bytes of cwnd and
    drain() could never observe _in_flight == 0."""
    from gst_plugins_rs_tpu.net.quic import FRAME_PATH_CHALLENGE

    sent = []
    client, server, pump, to_server, to_client = _pair()
    client.connect()
    pump()
    client.sendto_cb = lambda pkt, addr: sent.append((pkt, addr))
    base = client._in_flight
    for i in range(20):
        client._send_path_frames(("10.0.0.9", 4242),
                                 bytes([FRAME_PATH_CHALLENGE]) + bytes(8))
    assert client._in_flight == base, (client._in_flight, base)
    assert len(sent) == 20


def test_retry_resend_does_not_leak_in_flight():
    """ADVICE r3 (high, same leak): _handle_retry pops the pre-Retry
    Initial flight off the ledger; those bytes must come back before the
    resend re-accounts for itself."""
    client = QuicConnection(True, (lambda pkt: None))
    client.connect()
    from gst_plugins_rs_tpu.net.tls13 import LEVEL_INITIAL

    space = client.spaces[LEVEL_INITIAL]
    inflight_before = client._in_flight
    assert inflight_before > 0  # the Initial flight is ack-eliciting
    # forge a well-tagged Retry for this connection
    from cryptography.hazmat.primitives.ciphers.aead import AESGCM

    from gst_plugins_rs_tpu.net.quic import (
        QUIC_VERSION, RETRY_INTEGRITY_KEY, RETRY_INTEGRITY_NONCE)

    new_scid = b"\x11" * 8
    hdr = bytearray([0xF0])
    hdr += struct.pack("!I", QUIC_VERSION)
    hdr += bytes([len(client.scid)]) + client.scid
    hdr += bytes([len(new_scid)]) + new_scid
    token = b"tok"
    pseudo = bytes([len(client.dcid)]) + client.dcid + bytes(hdr) + token
    tag = AESGCM(RETRY_INTEGRITY_KEY).encrypt(RETRY_INTEGRITY_NONCE, b"", pseudo)
    client._handle_retry(new_scid, bytes(hdr) + token + tag, len(hdr))
    assert client._retry_done
    # the resent flight accounts for exactly itself: total in-flight equals
    # the sum of ledger entry sizes (no leaked residue from popped packets)
    ledger = sum(e[3] for sp in client.spaces.values()
                 for e in sp.unacked.values() if e[1])
    assert client._in_flight == ledger, (client._in_flight, ledger)


def test_idle_timeout_zero_means_disabled():
    """ADVICE r3 (low): RFC 9000 §10.1 — max_idle_timeout 0 disables the
    idle timeout; the 3*PTO floor must not resurrect it."""
    client, server, pump, to_server, to_client = _pair(idle_timeout_ms=0)
    client.connect()
    pump()
    assert client.handshake_done.is_set()
    client._last_rx -= 1e6  # 11 days of silence
    client.tick()
    assert not client.closed.is_set()


class Test0RttHardening:
    """ADVICE r3 (low): RFC 8446 §4.2.11.2 binder abort, §4.2.10 ALPN
    gate, §8.1 single-use-ticket anti-replay."""

    @staticmethod
    def _pair_with(client_kwargs=None, server_kwargs=None):
        return TestResumptionAnd0Rtt._pair_with(client_kwargs, server_kwargs)

    def _ticket(self):
        tkey = b"k" * 16
        client, server, pump = self._pair_with(server_kwargs={"ticket_key": tkey})
        client.connect()
        pump()
        assert client.session_ticket is not None
        return client.session_ticket, tkey

    def test_binder_mismatch_aborts_handshake(self):
        session, tkey = self._ticket()
        bad = dict(session)
        bad["psk"] = bytes(32)  # ticket opens fine; binder computed wrong
        c2, s2, pump = self._pair_with(
            client_kwargs={"session": bad},
            server_kwargs={"ticket_key": tkey})
        c2.connect()
        pump()
        # server MUST abort (no silent full-handshake fallback)
        assert not s2.handshake_done.is_set()
        assert not s2.tls.psk_accepted

    def test_0rtt_replay_rejected_second_time(self):
        session, tkey = self._ticket()
        for attempt in range(2):
            got = []
            c2, s2, pump = self._pair_with(
                client_kwargs={"session": dict(session)},
                server_kwargs={"ticket_key": tkey})
            s2.on_stream_data = lambda sid, data, fin: got.append(bytes(data))
            c2.connect()
            sid = c2.open_uni_stream()
            c2.send_stream(sid, b"replayable")
            pump()
            assert s2.tls.psk_accepted  # resumption itself still works
            if attempt == 0:
                assert s2.tls.early_data_accepted
            else:
                # the redeemed ticket must not accept early data again
                assert not s2.tls.early_data_accepted
                # data still arrives via 1-RTT retransmission
                for _ in range(6):
                    if got:
                        break
                    time.sleep(0.4)
                    c2.tick()
                    pump()
                assert b"".join(got) == b"replayable"

    def test_early_data_requires_matching_alpn(self):
        # ticket stores ALPN "gstpu" (from the original connection); the
        # resumption server prefers "proto2", so the negotiated ALPN
        # differs from the ticket's -> early data MUST be refused
        # (RFC 8446 §4.2.10) though PSK resumption itself proceeds.
        session, tkey = self._ticket()
        c2, s2, pump = self._pair_with(
            client_kwargs={"session": dict(session),
                           "alpn": ["proto2", "gstpu"]},
            server_kwargs={"ticket_key": tkey, "alpn": ["proto2", "gstpu"]})
        c2.connect()
        pump()
        assert s2.tls.psk_accepted
        assert s2.tls.negotiated_alpn == "proto2"
        assert not s2.tls.early_data_accepted
