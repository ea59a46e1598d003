"""TLS 1.3 interop against the system OpenSSL over TCP.

The QUIC-TLS engine (net/tls13.py) normally rides in CRYPTO frames; this
test wraps it in a minimal RFC 8446 record layer (plaintext hello
records + AES-128-GCM application records with inner content types) and
completes handshakes against `openssl s_server -tls1_3` and
`openssl s_client -tls1_3` — real-world validation of the key schedule,
transcript, CertificateVerify and Finished computations.
"""
import shutil
import socket
import struct
import subprocess
import threading
import time

import pytest

from cryptography.hazmat.primitives.ciphers.aead import AESGCM

from gst_plugins_rs_tpu.net.tls13 import (
    LEVEL_APP,
    LEVEL_HANDSHAKE,
    LEVEL_INITIAL,
    QuicTlsClient,
    QuicTlsServer,
    hkdf_expand_label,
)

pytestmark = pytest.mark.skipif(shutil.which("openssl") is None,
                                reason="openssl binary not available")

CT_CCS = 20
CT_ALERT = 21
CT_HANDSHAKE = 22
CT_APPDATA = 23


class _RecordKeys:
    def __init__(self, secret: bytes):
        self.key = hkdf_expand_label(secret, "key", b"", 16)
        self.iv = hkdf_expand_label(secret, "iv", b"", 12)
        self.seq = 0

    def _nonce(self) -> bytes:
        n = bytes(a ^ b for a, b in zip(self.iv, self.seq.to_bytes(12, "big")))
        self.seq += 1
        return n

    def seal(self, inner_type: int, payload: bytes) -> bytes:
        plaintext = payload + bytes([inner_type])
        header = struct.pack("!BHH", CT_APPDATA, 0x0303, len(plaintext) + 16)
        return header + AESGCM(self.key).encrypt(self._nonce(), plaintext, header)

    def open(self, header: bytes, ciphertext: bytes):
        plain = AESGCM(self.key).decrypt(self._nonce(), ciphertext, header)
        # strip padding, last nonzero byte = inner content type
        i = len(plain) - 1
        while i >= 0 and plain[i] == 0:
            i -= 1
        return plain[i], plain[:i]


class TcpTls13:
    """Drives a QuicTls engine over a TCP socket with TLS records."""

    def __init__(self, engine, sock: socket.socket):
        self.engine = engine
        self.sock = sock
        self.tx: _RecordKeys = None
        self.rx: _RecordKeys = None
        self._tx_level = LEVEL_INITIAL
        engine.on_secrets = self._on_secrets
        self._secrets = {}
        self._buf = bytearray()

    def _on_secrets(self, level, client_secret, server_secret):
        self._secrets[level] = (client_secret, server_secret)

    def _use_keys(self, level, direction):
        cs, ss = self._secrets[level]
        mine, theirs = (cs, ss) if self.engine.is_client else (ss, cs)
        if direction == "tx":
            self.tx = _RecordKeys(mine)
        else:
            self.rx = _RecordKeys(theirs)

    def _send_engine_output(self):
        for level, data in self.engine.take_output():
            if level == LEVEL_INITIAL:
                rec = struct.pack("!BHH", CT_HANDSHAKE, 0x0301, len(data)) + data
                self.sock.sendall(rec)
            else:
                if self.tx is None or self._tx_level != level:
                    self._use_keys(level, "tx")
                    self._tx_level = level
                self.sock.sendall(self.tx.seal(CT_HANDSHAKE, data))

    def pump_once(self, timeout=0.2) -> bool:
        self._send_engine_output()
        self.sock.settimeout(timeout)
        try:
            chunk = self.sock.recv(65536)
        except socket.timeout:
            return False
        if not chunk:
            return False
        self._buf += chunk
        while len(self._buf) >= 5:
            ctype, ver, ln = struct.unpack("!BHH", bytes(self._buf[:5]))
            if len(self._buf) < 5 + ln:
                break
            header = bytes(self._buf[:5])
            payload = bytes(self._buf[5:5 + ln])
            del self._buf[:5 + ln]
            if ctype == CT_CCS:
                continue
            if ctype == CT_HANDSHAKE:  # plaintext (ServerHello / ClientHello)
                self.engine.handle(LEVEL_INITIAL, payload)
                if LEVEL_HANDSHAKE in self._secrets and self.rx is None:
                    self._use_keys(LEVEL_HANDSHAKE, "rx")
            elif ctype == CT_APPDATA:
                inner_type, plain = self.rx.open(header, payload)
                if inner_type == CT_HANDSHAKE:
                    was_complete = self.engine.handshake_complete
                    self.engine.handle(LEVEL_HANDSHAKE, plain)
                    if self.engine.handshake_complete and not was_complete:
                        self._send_engine_output()  # client Finished under hs keys
                        self._use_keys(LEVEL_APP, "tx")
                        self._tx_level = LEVEL_APP
                        self._use_keys(LEVEL_APP, "rx")
                elif inner_type == CT_ALERT and plain[1:2] != b"\x00":
                    raise AssertionError(f"peer alert {plain.hex()}")
            elif ctype == CT_ALERT:
                raise AssertionError(f"plaintext alert {payload.hex()}")
        self._send_engine_output()
        return True

    def run_until_complete(self, timeout=8.0) -> bool:
        deadline = time.monotonic() + timeout
        while time.monotonic() < deadline:
            if self.engine.handshake_complete and LEVEL_APP in self._secrets:
                # make sure tx/rx are switched to app keys
                if self._tx_level != LEVEL_APP:
                    self._send_engine_output()
                    self._use_keys(LEVEL_APP, "tx")
                    self._tx_level = LEVEL_APP
                    self._use_keys(LEVEL_APP, "rx")
                return True
            self.pump_once()
        return self.engine.handshake_complete


class TestClientAgainstOpensslServer:
    def test_tls13_handshake_and_appdata(self, tmp_path):
        key = tmp_path / "key.pem"
        cert = tmp_path / "cert.pem"
        subprocess.run(
            ["openssl", "req", "-x509", "-newkey", "ec", "-pkeyopt",
             "ec_paramgen_curve:P-256", "-keyout", str(key), "-out", str(cert),
             "-days", "2", "-nodes", "-subj", "/CN=tls13"],
            check=True, capture_output=True)
        srv = socket.socket()
        srv.bind(("127.0.0.1", 0))
        port = srv.getsockname()[1]
        srv.close()
        proc = subprocess.Popen(
            ["openssl", "s_server", "-tls1_3", "-accept", str(port),
             "-cert", str(cert), "-key", str(key),
             "-ciphersuites", "TLS_AES_128_GCM_SHA256",
             "-alpn", "gstpu-interop", "-quiet", "-naccept", "1"],
            stdin=subprocess.PIPE, stdout=subprocess.PIPE, stderr=subprocess.PIPE)
        try:
            time.sleep(0.6)
            sock = socket.create_connection(("127.0.0.1", port), timeout=5)
            engine = QuicTlsClient(["gstpu-interop"], b"", server_name="tls13")
            driver = TcpTls13(engine, sock)
            engine.start()
            assert driver.run_until_complete(10.0), \
                "TLS 1.3 handshake with openssl s_server failed"
            assert engine.negotiated_alpn == "gstpu-interop"
            assert engine.peer_cert_der is not None
            # application data: s_server echoes stdin->socket and socket->stdout
            sock.sendall(driver.tx.seal(CT_APPDATA, b"tls13 app ping\n"))
            import os as _os
            import select
            out = b""
            deadline = time.monotonic() + 5
            while time.monotonic() < deadline and b"tls13 app ping" not in out:
                r, _, _ = select.select([proc.stdout], [], [], 0.2)
                if r:
                    out += _os.read(proc.stdout.fileno(), 4096)
            assert b"tls13 app ping" in out
            sock.close()
        finally:
            proc.kill()
            proc.wait(5)


class TestServerAgainstOpensslClient:
    def test_tls13_handshake(self):
        lsock = socket.socket()
        lsock.bind(("127.0.0.1", 0))
        lsock.listen(1)
        port = lsock.getsockname()[1]

        engine = QuicTlsServer(["gstpu-interop"], b"")
        result = {}

        def serve():
            conn, _ = lsock.accept()
            driver = TcpTls13(engine, conn)
            result["ok"] = driver.run_until_complete(10.0)
            result["driver"] = driver
            # receive one app record from the client
            deadline = time.monotonic() + 5
            got = bytearray()
            conn.settimeout(0.2)
            while time.monotonic() < deadline and b"hello" not in got:
                try:
                    chunk = conn.recv(65536)
                except socket.timeout:
                    continue
                if not chunk:
                    break
                buf = bytearray(chunk)
                while len(buf) >= 5:
                    ctype, _, ln = struct.unpack("!BHH", bytes(buf[:5]))
                    header, payload = bytes(buf[:5]), bytes(buf[5:5 + ln])
                    del buf[:5 + ln]
                    if ctype == 23 and driver.rx is not None:
                        try:
                            it, plain = driver.rx.open(header, payload)
                            if it == CT_APPDATA:
                                got += plain
                        except Exception:
                            pass
            result["data"] = bytes(got)
            conn.close()

        t = threading.Thread(target=serve, daemon=True)
        t.start()
        proc = subprocess.Popen(
            ["openssl", "s_client", "-tls1_3", "-connect", f"127.0.0.1:{port}",
             "-ciphersuites", "TLS_AES_128_GCM_SHA256",
             "-alpn", "gstpu-interop", "-quiet"],
            stdin=subprocess.PIPE, stdout=subprocess.PIPE, stderr=subprocess.PIPE)
        try:
            deadline = time.monotonic() + 10
            while time.monotonic() < deadline and "ok" not in result:
                time.sleep(0.1)
            assert result.get("ok"), "TLS 1.3 handshake with openssl s_client failed"
            proc.stdin.write(b"hello from openssl client\n")
            proc.stdin.flush()
            t.join(8)
            assert b"hello" in result.get("data", b"")
        finally:
            proc.kill()
            proc.wait(5)
            lsock.close()


class TestResumptionAgainstOpensslServer:
    def test_psk_resumption_binder_accepted(self, tmp_path):
        """The PSK binder math is validated by a REAL peer: openssl
        s_server processes our ticket offer and aborts the handshake on a
        bad binder (RFC 8446 §4.2.11.2), so a completed resumed handshake
        with a selected PSK is external proof of the §7.1 early-secret /
        binder-key derivations (net/tls13.py)."""
        key = tmp_path / "key.pem"
        cert = tmp_path / "cert.pem"
        subprocess.run(
            ["openssl", "req", "-x509", "-newkey", "ec", "-pkeyopt",
             "ec_paramgen_curve:P-256", "-keyout", str(key), "-out", str(cert),
             "-days", "2", "-nodes", "-subj", "/CN=tls13"],
            check=True, capture_output=True)
        srv = socket.socket()
        srv.bind(("127.0.0.1", 0))
        port = srv.getsockname()[1]
        srv.close()
        proc = subprocess.Popen(
            ["openssl", "s_server", "-tls1_3", "-accept", str(port),
             "-cert", str(cert), "-key", str(key),
             "-ciphersuites", "TLS_AES_128_GCM_SHA256",
             "-alpn", "gstpu-interop", "-quiet", "-naccept", "2"],
            stdin=subprocess.PIPE, stdout=subprocess.PIPE, stderr=subprocess.PIPE)
        try:
            time.sleep(0.6)
            # --- connection 1: full handshake, collect the session ticket
            sock = socket.create_connection(("127.0.0.1", port), timeout=5)
            engine = QuicTlsClient(["gstpu-interop"], b"", server_name="tls13")
            driver = TcpTls13(engine, sock)
            engine.start()
            assert driver.run_until_complete(10.0)
            deadline = time.monotonic() + 5
            while time.monotonic() < deadline and engine.new_session is None:
                driver.pump_once()  # drain NewSessionTicket records
            assert engine.new_session is not None, "no NewSessionTicket"
            sock.close()

            # --- connection 2: resume with the PSK
            time.sleep(0.3)
            sock2 = socket.create_connection(("127.0.0.1", port), timeout=5)
            engine2 = QuicTlsClient(["gstpu-interop"], b"", server_name="tls13",
                                    session=engine.new_session)
            # TCP TLS has no 0-RTT here: offer the PSK without early_data
            engine2.session = dict(engine.new_session, max_early_data=0)
            driver2 = TcpTls13(engine2, sock2)
            engine2.start()
            assert driver2.run_until_complete(10.0), \
                "resumed handshake failed (binder rejected?)"
            assert engine2.psk_accepted, "server did not select our PSK"
            assert engine2.negotiated_alpn == "gstpu-interop"
            sock2.close()
        finally:
            proc.kill()
            proc.wait(5)
