"""DTLS interop against the system OpenSSL — real-world validation of the
from-scratch DTLS 1.2 implementation (net/dtls.py).

Both directions:
- our client  <-> `openssl s_server -dtls1_2`
- our server  <-> `openssl s_client -dtls1_2`
"""
import os
import shutil
import socket
import subprocess
import threading
import time

import pytest

from gst_plugins_rs_tpu.net.dtls import DtlsConnection

pytestmark = pytest.mark.skipif(shutil.which("openssl") is None,
                                reason="openssl binary not available")


@pytest.fixture()
def ec_cert(tmp_path):
    key = tmp_path / "key.pem"
    cert = tmp_path / "cert.pem"
    subprocess.run(
        ["openssl", "req", "-x509", "-newkey", "ec", "-pkeyopt",
         "ec_paramgen_curve:P-256", "-keyout", str(key), "-out", str(cert),
         "-days", "2", "-nodes", "-subj", "/CN=interop"],
        check=True, capture_output=True)
    return str(cert), str(key)


def _free_udp_port():
    s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _pump(sock, conn, stop):
    sock.settimeout(0.1)
    while not stop.is_set():
        try:
            data, _ = sock.recvfrom(8192)
        except socket.timeout:
            continue
        except OSError:
            return
        conn.handle_packet(data)


class TestClientAgainstOpensslServer:
    def test_handshake_and_echo(self, ec_cert):
        cert, key = ec_cert
        port = _free_udp_port()
        proc = subprocess.Popen(
            ["openssl", "s_server", "-dtls1_2", "-accept", str(port),
             "-cert", cert, "-key", key,
             "-cipher", "ECDHE-ECDSA-AES128-GCM-SHA256", "-quiet", "-naccept", "1"],
            stdin=subprocess.PIPE, stdout=subprocess.PIPE, stderr=subprocess.PIPE)
        try:
            time.sleep(0.5)  # let it bind
            sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
            sock.bind(("127.0.0.1", 0))
            client = DtlsConnection(
                True, lambda d: sock.sendto(d, ("127.0.0.1", port)))
            got = []
            client.on_data = got.append
            stop = threading.Event()
            t = threading.Thread(target=_pump, args=(sock, client, stop), daemon=True)
            t.start()
            client.start_handshake()
            assert client.wait_handshake(10.0), "handshake with openssl s_server failed"
            assert client.peer_cert_der is not None

            client.send(b"hello from gstpu\n")
            # s_server echoes received application data to stdout
            deadline = time.monotonic() + 5
            out = b""
            proc.stdout.flush()
            import select
            while time.monotonic() < deadline and b"hello from gstpu" not in out:
                r, _, _ = select.select([proc.stdout], [], [], 0.2)
                if r:
                    out += os.read(proc.stdout.fileno(), 4096)
            assert b"hello from gstpu" in out

            # and data from openssl reaches our on_data
            proc.stdin.write(b"pong from openssl\n")
            proc.stdin.flush()
            deadline = time.monotonic() + 5
            while time.monotonic() < deadline and not any(b"pong" in d for d in got):
                time.sleep(0.05)
            assert any(b"pong" in d for d in got)
            stop.set()
            t.join(1.0)
            sock.close()
        finally:
            proc.kill()
            proc.wait(5)


class TestServerAgainstOpensslClient:
    def test_handshake_and_data(self):
        sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        sock.bind(("127.0.0.1", 0))
        port = sock.getsockname()[1]
        peer_holder = {}

        server = DtlsConnection(False, lambda d: sock.sendto(d, peer_holder["addr"]))
        got = []
        server.on_data = got.append
        stop = threading.Event()

        def pump():
            sock.settimeout(0.1)
            while not stop.is_set():
                try:
                    data, addr = sock.recvfrom(8192)
                except socket.timeout:
                    continue
                except OSError:
                    return
                peer_holder["addr"] = addr
                server.handle_packet(data)

        t = threading.Thread(target=pump, daemon=True)
        t.start()
        proc = subprocess.Popen(
            ["openssl", "s_client", "-dtls1_2", "-connect", f"127.0.0.1:{port}",
             "-cipher", "ECDHE-ECDSA-AES128-GCM-SHA256", "-quiet"],
            stdin=subprocess.PIPE, stdout=subprocess.PIPE, stderr=subprocess.PIPE)
        try:
            assert server.wait_handshake(10.0), "handshake with openssl s_client failed"
            proc.stdin.write(b"client says hi\n")
            proc.stdin.flush()
            deadline = time.monotonic() + 5
            while time.monotonic() < deadline and not got:
                time.sleep(0.05)
            assert got and b"client says hi" in got[0]

            server.send(b"server says hi\n")
            import select
            out = b""
            deadline = time.monotonic() + 5
            while time.monotonic() < deadline and b"server says hi" not in out:
                r, _, _ = select.select([proc.stdout], [], [], 0.2)
                if r:
                    out += os.read(proc.stdout.fileno(), 4096)
            assert b"server says hi" in out
        finally:
            proc.kill()
            proc.wait(5)
            stop.set()
            t.join(1.0)
            sock.close()
