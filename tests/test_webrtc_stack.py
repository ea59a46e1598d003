"""STUN / ICE / DTLS / SRTP protocol stack tests.

Oracles: RFC 5769 STUN test vectors, RFC 3711 B.3 key-derivation vectors,
self-interop handshakes over in-memory and UDP-loopback transports.
"""
import os
import socket
import struct
import threading

import pytest

from gst_plugins_rs_tpu.net.stun import (
    BINDING_REQUEST,
    BINDING_SUCCESS,
    StunMessage,
    is_stun,
)
from gst_plugins_rs_tpu.net.ice import Candidate, IceAgent, demux_packet
from gst_plugins_rs_tpu.net.dtls import (
    DtlsConnection,
    certificate_fingerprint,
    generate_certificate,
    prf,
)
from gst_plugins_rs_tpu.net.srtp import (
    SrtpError,
    SrtpSession,
    derive_session_keys,
    sessions_from_dtls,
)


# ---------------------------------------------------------------------------
# STUN


class TestStun:
    def test_roundtrip_basic(self):
        msg = StunMessage(BINDING_REQUEST)
        msg.add_username("alice:bob").add_priority(12345)
        wire = msg.encode(integrity_key=b"secret")
        assert is_stun(wire)
        dec = StunMessage.decode(wire)
        assert dec.msg_type == BINDING_REQUEST
        assert dec.username == "alice:bob"
        assert dec.priority == 12345
        assert dec.verify_integrity(wire, b"secret")
        assert not dec.verify_integrity(wire, b"wrong")

    def test_xor_mapped_address(self):
        msg = StunMessage(BINDING_SUCCESS)
        msg.add_xor_mapped_address("192.168.1.42", 54321)
        dec = StunMessage.decode(msg.encode())
        assert dec.xor_mapped_address == ("192.168.1.42", 54321)

    def test_rfc5769_request_vector(self):
        """RFC 5769 §2.1 sample request: parse + integrity with its password."""
        wire = bytes.fromhex(
            "000100582112a442b7e7a701bc34d686fa87dfae"
            "802200105354554e207465737420636c69656e74"
            "002400046e0001ff"
            "80290008932ff9b151263b36"
            "000600096576746a3a68367659202020"
            "00080014"
            "9aeaa70cbfd8cb56781ef2b5b2d3f249c1b571a2"
            "80280004e57a3bcf"
        )
        assert is_stun(wire)
        msg = StunMessage.decode(wire)
        assert msg.msg_type == BINDING_REQUEST
        assert msg.username == "evtj:h6vY"
        assert msg.verify_integrity(wire, b"VOkJxbRl1RmTxUk/WvJxBt")

    def test_rfc5769_response_vector(self):
        """RFC 5769 §2.2 sample IPv4 response: XOR-MAPPED-ADDRESS decode."""
        wire = bytes.fromhex(
            "0101003c2112a442b7e7a701bc34d686fa87dfae"
            "8022000b7465737420766563746f7220"
            "002000080001a147e112a643"
            "00080014"
            "2b91f599fd9e90c38c7489f92af9ba53f06be7d7"
            "80280004c07d4c96"
        )
        msg = StunMessage.decode(wire)
        assert msg.xor_mapped_address == ("192.0.2.1", 32853)
        assert msg.verify_integrity(wire, b"VOkJxbRl1RmTxUk/WvJxBt")

    def test_demux(self):
        stun_wire = StunMessage(BINDING_REQUEST).encode()
        assert demux_packet(stun_wire) == "stun"
        assert demux_packet(bytes([22, 0xFE, 0xFD]) + b"\x00" * 11) == "dtls"
        assert demux_packet(b"\x80\x60" + b"\x00" * 10) == "rtp"


# ---------------------------------------------------------------------------
# ICE


class TestIce:
    def test_candidate_sdp_roundtrip(self):
        c = Candidate("1", 1, "udp", 2130706431, "127.0.0.1", 9000)
        line = c.to_sdp()
        assert line.startswith("candidate:1 1 udp")
        c2 = Candidate.from_sdp("a=" + line)
        assert (c2.host, c2.port, c2.priority, c2.typ) == ("127.0.0.1", 9000, 2130706431, "host")

    def test_loopback_connectivity(self):
        left = IceAgent(controlling=True)
        right = IceAgent(controlling=False)
        try:
            for a, b in ((left, right), (right, left)):
                a.set_remote_credentials(b.local_ufrag, b.local_pwd)
                for cand in b.local_candidates():
                    a.add_remote_candidate(cand)

            stop = threading.Event()

            def pump(agent):
                agent.sock.settimeout(0.1)
                while not stop.is_set():
                    try:
                        data, addr = agent.sock.recvfrom(2048)
                    except socket.timeout:
                        continue
                    except OSError:
                        return
                    if demux_packet(data) == "stun":
                        agent.handle_stun(data, addr)

            threads = [threading.Thread(target=pump, args=(a,), daemon=True) for a in (left, right)]
            for t in threads:
                t.start()
            left.send_checks()
            assert left.wait_connected(5.0)
            assert right.wait_connected(5.0)
            assert left.selected == ("127.0.0.1", right.local_candidate.port)
            assert right.selected == ("127.0.0.1", left.local_candidate.port)
            stop.set()
            for t in threads:
                t.join(1.0)
        finally:
            left.close()
            right.close()


# ---------------------------------------------------------------------------
# DTLS


def _memory_pair():
    """Client/server DtlsConnection pair over a lossless in-memory wire."""
    to_server, to_client = [], []
    client = DtlsConnection(True, to_server.append)
    server = DtlsConnection(False, to_client.append)

    def pump():
        moved = True
        while moved:
            moved = False
            while to_server:
                server.handle_packet(to_server.pop(0)); moved = True
            while to_client:
                client.handle_packet(to_client.pop(0)); moved = True

    return client, server, pump


class TestDtls:
    def test_prf_sha256_vector(self):
        """Published TLS 1.2 PRF test vector (SHA-256)."""
        out = prf(
            bytes.fromhex("9bbe436ba940f017b17652849a71db35"),
            b"test label",
            bytes.fromhex("a0ba9f936cda311827a6f796ffd5198c"),
            100,
        )
        assert out.hex().startswith("e3f229ba727be17b8d122620557cd453")
        assert len(out) == 100

    def test_fingerprint_format(self):
        der, _ = generate_certificate()
        fp = certificate_fingerprint(der)
        parts = fp.split(":")
        assert len(parts) == 32 and all(len(p) == 2 for p in parts)

    def test_handshake_memory(self):
        client, server, pump = _memory_pair()
        client.start_handshake()
        pump()
        assert client._handshake_done.is_set()
        assert server._handshake_done.is_set()
        assert client.master_secret == server.master_secret
        assert client.srtp_profile == 0x0001
        assert server.srtp_profile == 0x0001
        # mutual certs visible for fingerprint checks
        assert client.peer_cert_der == server.cert_der
        assert server.peer_cert_der == client.cert_der
        # exporter agrees
        assert client.export_srtp_keys() == server.export_srtp_keys()

    def test_application_data(self):
        client, server, pump = _memory_pair()
        got_c, got_s = [], []
        client.on_data = got_c.append
        server.on_data = got_s.append
        client.start_handshake()
        pump()
        client.send(b"ping")
        pump()
        server.send(b"pong")
        pump()
        assert got_s == [b"ping"]
        assert got_c == [b"pong"]

    def test_tampered_record_rejected(self):
        client, server, pump = _memory_pair()
        client.start_handshake()
        pump()
        got = []
        server.on_data = got.append
        # capture, corrupt, deliver
        captured = []
        client.send_cb = captured.append
        client.send(b"secret")
        bad = bytearray(captured[0])
        bad[-1] ^= 0xFF
        server.handle_packet(bytes(bad))
        assert got == []

    def test_garbage_datagram_not_fatal(self):
        """RFC 6347 §4.1.2.7: a record failing AEAD is silently discarded;
        the association must survive and keep delivering valid data."""
        client, server, pump = _memory_pair()
        client.start_handshake()
        pump()
        got = []
        server.on_data = got.append
        captured = []
        real_cb = client.send_cb
        client.send_cb = captured.append
        client.send(b"first")
        bad = bytearray(captured[0])
        bad[-1] ^= 0xFF
        server.handle_packet(bytes(bad))  # spoofed/corrupt — must be dropped
        assert server._failed is None
        server.handle_packet(bytes(captured[0]))  # the genuine record
        assert got == [b"first"]
        client.send_cb = real_cb
        client.send(b"second")
        pump()
        assert got == [b"first", b"second"]

    def test_replayed_record_dropped(self):
        """RFC 3711-style anti-replay on the DTLS record layer: a captured
        record delivered twice is processed once."""
        client, server, pump = _memory_pair()
        client.start_handshake()
        pump()
        got = []
        server.on_data = got.append
        captured = []
        client.send_cb = captured.append
        client.send(b"once")
        server.handle_packet(captured[0])
        server.handle_packet(captured[0])  # replay
        assert got == [b"once"]
        assert server._failed is None

    def test_spoofed_epoch0_record_does_not_wedge_handshake(self):
        """An off-path attacker sends a cleartext epoch-0 record with a huge
        seq48 before the handshake: it must NOT advance the anti-replay
        window (unauthenticated), or every legitimate handshake record would
        be dropped as 'replayed' and the association permanently wedged."""
        client, server, pump = _memory_pair()
        # spoofed epoch-0 handshake-typed record, seq48 near the top
        spoof_seq = 1 << 40
        hdr = struct.pack("!BHHHIH", 22, 0xFEFD, 0,
                          (spoof_seq >> 32) & 0xFFFF,
                          spoof_seq & 0xFFFFFFFF, 4)
        server.handle_packet(hdr + b"\x00\x00\x00\x00")
        assert server._failed is None
        client.start_handshake()
        pump()
        assert client._handshake_done.is_set()
        assert server._handshake_done.is_set()

    def test_spoofed_cleartext_alert_ignored(self):
        """A spoofed unauthenticated (epoch-0) fatal alert must not abort the
        association (RFC 6347 §4.1.2.7 spirit)."""
        client, server, pump = _memory_pair()
        client.start_handshake()
        pump()
        # epoch-0 CT_ALERT, level fatal(2)/close-ish desc, cleartext
        hdr = struct.pack("!BHHHIH", 21, 0xFEFD, 0, 0, 99, 2)
        server.handle_packet(hdr + bytes([2, 40]))
        assert server._failed is None
        got = []
        server.on_data = got.append
        client.send(b"still-alive")
        pump()
        assert got == [b"still-alive"]

    def test_client_cert_without_certificateverify_rejected(self):
        """A client replaying a victim's public cert DER without proving key
        possession (no CertificateVerify) must not complete the handshake."""
        from gst_plugins_rs_tpu.net.dtls import HT_CERTIFICATE_VERIFY

        client, server, pump = _memory_pair()
        orig = client._queue_hs

        def no_cv(msg_type, body, flight, epoch=0):
            if msg_type == HT_CERTIFICATE_VERIFY:
                return  # attacker omits CV (cannot sign with victim's key)
            orig(msg_type, body, flight, epoch)

        client._queue_hs = no_cv
        client.start_handshake()
        pump()
        assert not server._handshake_done.is_set()
        assert server._failed is not None and "CertificateVerify" in server._failed

    def test_handshake_udp_loopback(self):
        sc = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        ss = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        sc.bind(("127.0.0.1", 0)); ss.bind(("127.0.0.1", 0))
        caddr, saddr = sc.getsockname(), ss.getsockname()
        client = DtlsConnection(True, lambda d: sc.sendto(d, saddr))
        server = DtlsConnection(False, lambda d: ss.sendto(d, caddr))
        stop = threading.Event()

        def pump(sock, conn):
            sock.settimeout(0.1)
            while not stop.is_set():
                try:
                    data, _ = sock.recvfrom(4096)
                except socket.timeout:
                    continue
                except OSError:
                    return
                conn.handle_packet(data)

        threads = [
            threading.Thread(target=pump, args=(sc, client), daemon=True),
            threading.Thread(target=pump, args=(ss, server), daemon=True),
        ]
        for t in threads:
            t.start()
        client.start_handshake()
        try:
            assert client.wait_handshake(5.0)
            assert server.wait_handshake(5.0)
            assert client.export_srtp_keys() == server.export_srtp_keys()
        finally:
            stop.set()
            for t in threads:
                t.join(1.0)
            sc.close(); ss.close()


# ---------------------------------------------------------------------------
# SRTP


def _rtp(seq, ssrc=0xCAFEBABE, payload=b"\xab" * 32, ts=0):
    return struct.pack("!BBHII", 0x80, 96, seq & 0xFFFF, ts, ssrc) + payload


class TestSrtp:
    def test_rfc3711_b3_key_derivation(self):
        """RFC 3711 Appendix B.3 key derivation test vectors."""
        master_key = bytes.fromhex("E1F97A0D3E018BE0D64FA32C06DE4139")
        master_salt = bytes.fromhex("0EC675AD498AFEEBB6960B3AABE6")
        k = derive_session_keys(master_key, master_salt)
        assert k["rtp_key"].hex().upper() == "C61E7A93744F39EE10734AFE3FF7A087"
        assert k["rtp_salt"].hex().upper() == "30CBBC08863D8C85D49DB34A9AE1"
        assert k["rtp_auth"].hex().upper() == (
            "CEBE321F6FF7716B6FD4AB49AF256A156D38BAA4"
        )

    def test_protect_unprotect_roundtrip(self):
        key, salt = os.urandom(16), os.urandom(14)
        tx = SrtpSession(key, salt)
        rx = SrtpSession(key, salt)
        for seq in range(0, 5):
            pkt = _rtp(seq, payload=bytes([seq]) * 40)
            prot = tx.protect(pkt)
            assert prot != pkt and len(prot) == len(pkt) + 10
            assert rx.unprotect(prot) == pkt

    def test_auth_failure(self):
        key, salt = os.urandom(16), os.urandom(14)
        tx, rx = SrtpSession(key, salt), SrtpSession(key, salt)
        prot = bytearray(tx.protect(_rtp(1)))
        prot[20] ^= 0x01
        with pytest.raises(SrtpError):
            rx.unprotect(bytes(prot))

    def test_roc_rollover(self):
        key, salt = os.urandom(16), os.urandom(14)
        tx, rx = SrtpSession(key, salt), SrtpSession(key, salt)
        # walk the sequence number across the 16-bit wrap
        for seq in [65533, 65534, 65535, 0, 1, 2]:
            pkt = _rtp(seq)
            assert rx.unprotect(tx.protect(pkt)) == pkt
        assert tx._tx_roc[0xCAFEBABE] == 1
        assert rx._rx[0xCAFEBABE][0] == 1

    def test_rtcp_roundtrip(self):
        key, salt = os.urandom(16), os.urandom(14)
        tx, rx = SrtpSession(key, salt), SrtpSession(key, salt)
        rtcp = struct.pack("!BBH", 0x80, 200, 6) + struct.pack("!I", 0x1234) + os.urandom(20)
        prot = tx.protect_rtcp(rtcp)
        assert rx.unprotect_rtcp(prot) == rtcp

    def test_replay_rejected(self):
        """RFC 3711 §3.3.2: a captured SRTP packet delivered twice MUST be
        rejected the second time (per-SSRC sliding window on the index)."""
        key, salt = os.urandom(16), os.urandom(14)
        tx, rx = SrtpSession(key, salt), SrtpSession(key, salt)
        prot = tx.protect(_rtp(5))
        assert rx.unprotect(prot) == _rtp(5)
        with pytest.raises(SrtpError, match="replay"):
            rx.unprotect(prot)
        # out-of-order (not replayed) packets inside the window still pass
        p7 = tx.protect(_rtp(7))
        p6 = tx.protect(_rtp(6))
        assert rx.unprotect(p7) == _rtp(7)
        assert rx.unprotect(p6) == _rtp(6)
        with pytest.raises(SrtpError, match="replay"):
            rx.unprotect(p6)

    def test_rtcp_replay_rejected(self):
        key, salt = os.urandom(16), os.urandom(14)
        tx, rx = SrtpSession(key, salt), SrtpSession(key, salt)
        rtcp = struct.pack("!BBH", 0x80, 200, 6) + struct.pack("!I", 0x1234) + os.urandom(20)
        prot = tx.protect_rtcp(rtcp)
        assert rx.unprotect_rtcp(prot) == rtcp
        with pytest.raises(SrtpError, match="replay"):
            rx.unprotect_rtcp(prot)

    def test_dtls_to_srtp_wiring(self):
        client, server, pump = _memory_pair()
        client.start_handshake()
        pump()
        c_send, c_recv = sessions_from_dtls(client)
        s_send, s_recv = sessions_from_dtls(server)
        pkt = _rtp(7)
        assert s_recv.unprotect(c_send.protect(pkt)) == pkt
        pkt2 = _rtp(9, ssrc=0x1111)
        assert c_recv.unprotect(s_send.protect(pkt2)) == pkt2
