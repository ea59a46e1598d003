"""rtspsrc2 tests against an in-process fake RTSP server (the reference
tests rtspsrc2 the same way: loopback server + RTP sender)."""
import re
import socket
import threading

import numpy as np
import pytest

import gst_plugins_rs_tpu as fx
from gst_plugins_rs_tpu.net.rtp import RtpPacket
from gst_plugins_rs_tpu.net.sdp import parse_sdp


SDP_TEMPLATE = """v=0
o=- 0 0 IN IP4 127.0.0.1
s=Test Session
t=0 0
m=audio 0 RTP/AVP 8
a=rtpmap:8 PCMA/8000/1
a=control:stream=0
"""


class FakeRtspServer(threading.Thread):
    """OPTIONS/DESCRIBE/SETUP/PLAY/TEARDOWN; on PLAY sends RTP via UDP."""

    def __init__(self, n_packets=5):
        super().__init__(daemon=True)
        self.sock = socket.socket()
        self.sock.bind(("127.0.0.1", 0))
        self.sock.listen(1)
        self.port = self.sock.getsockname()[1]
        self.n_packets = n_packets
        self.methods = []
        self.client_rtp_port = None

    def run(self):
        conn, _ = self.sock.accept()
        conn.settimeout(5)
        session = "12345678"
        buf = b""
        while True:
            try:
                while b"\r\n\r\n" not in buf:
                    chunk = conn.recv(4096)
                    if not chunk:
                        return
                    buf += chunk
            except socket.timeout:
                return
            head, _, buf = buf.partition(b"\r\n\r\n")
            lines = head.decode().split("\r\n")
            method, url, _ = lines[0].split(" ", 2)
            self.methods.append(method)
            cseq = next(l.split(":")[1].strip() for l in lines if l.lower().startswith("cseq"))
            extra = ""
            body = b""
            if method == "DESCRIBE":
                body = SDP_TEMPLATE.replace("\n", "\r\n").encode()
                extra = (f"Content-Base: rtsp://127.0.0.1:{self.port}/test/\r\n"
                         f"Content-Type: application/sdp\r\n"
                         f"Content-Length: {len(body)}\r\n")
            elif method == "SETUP":
                transport = next(l for l in lines if l.startswith("Transport"))
                m = re.search(r"client_port=(\d+)-(\d+)", transport)
                self.client_rtp_port = int(m.group(1))
                extra = (f"Session: {session}\r\n"
                         f"Transport: RTP/AVP;unicast;client_port={m.group(1)}-{m.group(2)};"
                         f"server_port=50000-50001\r\n")
            elif method == "PLAY":
                extra = f"Session: {session}\r\nRange: npt=0-\r\n"
            resp = f"RTSP/1.0 200 OK\r\nCSeq: {cseq}\r\n{extra}\r\n".encode() + body
            conn.sendall(resp)
            if method == "PLAY":
                udp = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
                for i in range(self.n_packets):
                    pkt = RtpPacket(8, i, i * 160, 0xABCD, bytes([i]) * 160)
                    udp.sendto(pkt.to_bytes(), ("127.0.0.1", self.client_rtp_port))
                udp.close()
            if method == "TEARDOWN":
                conn.close()
                return


class TestSdp:
    def test_parse(self):
        sdp = parse_sdp(SDP_TEMPLATE)
        assert sdp.session_name == "Test Session"
        assert len(sdp.medias) == 1
        m = sdp.medias[0]
        assert (m.media, m.payload_type, m.encoding_name, m.clock_rate) == (
            "audio", 8, "PCMA", 8000)
        assert m.encoding_params == "1"
        assert m.control == "stream=0"


class TestRtspSrc:
    def test_full_session(self):
        srv = FakeRtspServer(n_packets=6)
        srv.start()
        p = fx.parse_launch(
            f"rtspsrc2 location=rtsp://127.0.0.1:{srv.port}/test "
            "timeout=2000000000 num-buffers=6 "
            "! rtppcmadepay2 ! alawdec ! appsink name=sink"
        )
        p.play_until_eos()
        srv.join(timeout=3)
        assert srv.methods[:4] == ["OPTIONS", "DESCRIBE", "SETUP", "PLAY"]
        assert "TEARDOWN" in srv.methods
        out = p.by_name("sink").concat_audio()
        assert out.shape == (6 * 160, 1)
        assert out.dtype == np.int16
        sink = p.by_name("sink")
        assert sink.caps.structure(0).name == "audio/x-raw"  # after alawdec
        assert sink.caps.structure(0)["format"] == "S16"
        assert sink.caps.structure(0)["rate"] == 8000


class FakeTcpRtspServer(threading.Thread):
    """Interleaved-TCP variant: RTP flows as '$' records on the control
    connection (RFC 2326 §10.12); optionally requires digest auth."""

    def __init__(self, n_packets=5, auth=None):
        super().__init__(daemon=True)
        self.sock = socket.socket()
        self.sock.bind(("127.0.0.1", 0))
        self.sock.listen(1)
        self.port = self.sock.getsockname()[1]
        self.n_packets = n_packets
        self.auth = auth  # (user, pw) -> digest required
        self.methods = []
        self.auth_seen = []

    def _digest_ok(self, lines, method):
        import hashlib
        import re as _re

        authz = next((l for l in lines if l.lower().startswith("authorization")), None)
        if authz is None:
            return False
        self.auth_seen.append(authz)
        params = dict(_re.findall(r'(\w+)="?([^",]*)"?', authz))
        user, pw = self.auth
        ha1 = hashlib.md5(f"{user}:testrealm:{pw}".encode()).hexdigest()
        ha2 = hashlib.md5(f"{method}:{params.get('uri')}".encode()).hexdigest()
        if "qop" in params:
            expect = hashlib.md5(
                f"{ha1}:abcnonce:{params['nc']}:{params['cnonce']}:auth:{ha2}".encode()
            ).hexdigest()
        else:
            expect = hashlib.md5(f"{ha1}:abcnonce:{ha2}".encode()).hexdigest()
        return params.get("response") == expect

    def run(self):
        conn, _ = self.sock.accept()
        conn.settimeout(5)
        session = "87654321"
        buf = b""
        channel = None
        while True:
            try:
                while b"\r\n\r\n" not in buf:
                    chunk = conn.recv(4096)
                    if not chunk:
                        return
                    buf += chunk
            except socket.timeout:
                return
            head, _, buf = buf.partition(b"\r\n\r\n")
            lines = head.decode().split("\r\n")
            method, url, _ = lines[0].split(" ", 2)
            self.methods.append(method)
            cseq = next(l.split(":")[1].strip() for l in lines if l.lower().startswith("cseq"))
            if self.auth and not self._digest_ok(lines, method):
                resp = (f"RTSP/1.0 401 Unauthorized\r\nCSeq: {cseq}\r\n"
                        'WWW-Authenticate: Digest realm="testrealm", '
                        'nonce="abcnonce", qop="auth"\r\n\r\n').encode()
                conn.sendall(resp)
                continue
            extra = ""
            body = b""
            if method == "DESCRIBE":
                body = SDP_TEMPLATE.replace("\n", "\r\n").encode()
                extra = (f"Content-Base: rtsp://127.0.0.1:{self.port}/test/\r\n"
                         f"Content-Type: application/sdp\r\n"
                         f"Content-Length: {len(body)}\r\n")
            elif method == "SETUP":
                transport = next(l for l in lines if l.startswith("Transport"))
                m = re.search(r"interleaved=(\d+)-(\d+)", transport)
                assert m, transport
                channel = int(m.group(1))
                extra = (f"Session: {session}\r\n"
                         f"Transport: RTP/AVP/TCP;unicast;"
                         f"interleaved={m.group(1)}-{m.group(2)}\r\n")
            elif method == "PLAY":
                extra = f"Session: {session}\r\nRange: npt=0-\r\n"
            resp = f"RTSP/1.0 200 OK\r\nCSeq: {cseq}\r\n{extra}\r\n".encode() + body
            conn.sendall(resp)
            if method == "PLAY":
                import struct as _struct
                for i in range(self.n_packets):
                    pkt = RtpPacket(8, i, i * 160, 0xABCD, bytes([i]) * 160).to_bytes()
                    conn.sendall(b"$" + bytes([channel])
                                 + _struct.pack("!H", len(pkt)) + pkt)
            if method == "TEARDOWN":
                conn.close()
                return


class TestRtspTcpInterleaved:
    def test_interleaved_session(self):
        srv = FakeTcpRtspServer(n_packets=6)
        srv.start()
        p = fx.parse_launch(
            f"rtspsrc2 location=rtsp://127.0.0.1:{srv.port}/test protocols=tcp "
            "timeout=2000000000 num-buffers=6 "
            "! rtppcmadepay2 ! alawdec ! appsink name=sink"
        )
        p.play_until_eos()
        srv.join(timeout=3)
        assert srv.methods[:4] == ["OPTIONS", "DESCRIBE", "SETUP", "PLAY"]
        out = p.by_name("sink").concat_audio()
        assert out.shape == (6 * 160, 1)

    def test_digest_auth(self):
        srv = FakeTcpRtspServer(n_packets=4, auth=("alice", "s3cret"))
        srv.start()
        p = fx.parse_launch(
            f"rtspsrc2 location=rtsp://127.0.0.1:{srv.port}/test protocols=tcp "
            "user-id=alice user-pw=s3cret timeout=2000000000 num-buffers=4 "
            "! rtppcmadepay2 ! alawdec ! appsink name=sink"
        )
        p.play_until_eos()
        srv.join(timeout=3)
        # the 401 challenge was answered with a digest Authorization
        assert srv.auth_seen and "Digest" in srv.auth_seen[0]
        assert 'username="alice"' in srv.auth_seen[0]
        out = p.by_name("sink").concat_audio()
        assert out.shape == (4 * 160, 1)

    def test_wrong_password_fails(self):
        srv = FakeTcpRtspServer(n_packets=1, auth=("alice", "right"))
        srv.start()
        with pytest.raises(RuntimeError, match="OPTIONS failed|401"):
            p = fx.parse_launch(
                f"rtspsrc2 location=rtsp://127.0.0.1:{srv.port}/test protocols=tcp "
                "user-id=alice user-pw=wrong timeout=1000000000 num-buffers=1 "
                "! appsink name=sink")
            p.play_until_eos()
