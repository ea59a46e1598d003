"""sodiumencrypter/sodiumdecrypter tests: round trip, tamper detection,
streaming block boundaries."""
import numpy as np
import pytest

import gst_plugins_rs_tpu as fx
from gst_plugins_rs_tpu.elements.generic.sodium import generate_keypair


def keys():
    s_priv, s_pub = generate_keypair()
    r_priv, r_pub = generate_keypair()
    return s_priv, s_pub, r_priv, r_pub


def run_chain(payloads, block_size=4096, tamper=None):
    from gst_plugins_rs_tpu.core.parse import parse_caps

    s_priv, s_pub, r_priv, r_pub = keys()
    src = fx.element_factory_make("appsrc")
    src.set_property("caps", parse_caps("application/octet-stream"))
    enc = fx.element_factory_make("sodiumencrypter")
    enc.set_property("sender-key", s_priv)
    enc.set_property("receiver-key", r_pub)
    enc.set_property("block-size", block_size)
    dec = fx.element_factory_make("sodiumdecrypter")
    dec.set_property("sender-key", s_pub)
    dec.set_property("receiver-key", r_priv)
    sink = fx.element_factory_make("appsink")
    p = fx.Pipeline()
    mid = fx.element_factory_make("identity") if tamper is None else tamper
    for e in (src, enc, mid, dec, sink):
        p.add(e)
    src.link(enc); enc.link(mid); mid.link(dec); dec.link(sink)
    for b in payloads:
        src.push_buffer(fx.Buffer(np.frombuffer(b, np.uint8)))
    src.end_of_stream()
    p.play_until_eos()
    return b"".join(np.asarray(s.buffer.data).tobytes() for s in sink.samples)


class TestSodium:
    def test_roundtrip_multiblock(self):
        data = bytes(range(256)) * 100  # 25600 bytes over 4096 blocks
        out = run_chain([data[:10000], data[10000:]], block_size=4096)
        assert out == data

    def test_partial_final_block(self):
        data = b"x" * 5000
        assert run_chain([data], block_size=4096) == data

    def test_stream_header_magic(self):
        from gst_plugins_rs_tpu.core.parse import parse_caps

        s_priv, s_pub, r_priv, r_pub = keys()
        src = fx.element_factory_make("appsrc")
        src.set_property("caps", parse_caps("application/octet-stream"))
        enc = fx.element_factory_make("sodiumencrypter")
        enc.set_property("sender-key", s_priv)
        enc.set_property("receiver-key", r_pub)
        sink = fx.element_factory_make("appsink")
        p = fx.Pipeline()
        for e in (src, enc, sink):
            p.add(e)
        src.link(enc); enc.link(sink)
        src.push_buffer(fx.Buffer(np.frombuffer(b"secret", np.uint8)))
        src.end_of_stream()
        p.play_until_eos()
        out = b"".join(np.asarray(s.buffer.data).tobytes() for s in sink.samples)
        assert out.startswith(b"gst-sodium10")  # reference magic (lib.rs:31)
        assert b"secret" not in out

    def test_tamper_detection(self):
        from gst_plugins_rs_tpu.core import BaseTransform, TransformMode

        class Corrupt(BaseTransform):
            ELEMENT_NAME = "corrupt-test"
            MODE = TransformMode.NEVER_IN_PLACE

            def transform(self, inbuf):
                arr = np.asarray(inbuf.data, np.uint8).copy()
                arr[-1] ^= 0xFF  # flip a ciphertext bit
                out = fx.Buffer(arr)
                out.copy_metadata_from(inbuf)
                return out

        with pytest.raises(Exception):
            run_chain([b"y" * 3000], block_size=1024, tamper=Corrupt())

    def test_decrypts_reference_fixture(self):
        """Wire parity: decrypt the reference's own encrypted fixture
        (generic/sodium/tests/encrypted_sample.enc, keys from
        tests/decrypter.rs:35-49) and compare with sample.mp3."""
        import os

        ref = "/root/reference/generic/sodium/tests"
        if not os.path.exists(f"{ref}/encrypted_sample.enc"):
            pytest.skip("reference fixture unavailable")
        sender_public = bytes([
            66, 248, 199, 74, 216, 55, 228, 116, 52, 17, 147, 56, 65, 130,
            134, 148, 157, 153, 235, 171, 179, 147, 120, 71, 100, 243, 133,
            120, 160, 14, 111, 65])
        receiver_private = bytes([
            54, 221, 217, 54, 94, 235, 167, 2, 187, 249, 71, 31, 59, 27, 19,
            166, 78, 236, 102, 48, 29, 142, 41, 189, 22, 146, 218, 69, 147,
            165, 240, 235])
        with open(f"{ref}/encrypted_sample.enc", "rb") as f:
            enc_data = f.read()
        with open(f"{ref}/sample.mp3", "rb") as f:
            expected = f.read()

        from gst_plugins_rs_tpu.core.parse import parse_caps

        src = fx.element_factory_make("appsrc")
        src.set_property("caps", parse_caps("application/x-sodium-encrypted"))
        dec = fx.element_factory_make("sodiumdecrypter")
        dec.set_property("sender-key", sender_public.hex())
        dec.set_property("receiver-key", receiver_private.hex())
        sink = fx.element_factory_make("appsink")
        p = fx.Pipeline()
        for e in (src, dec, sink):
            p.add(e)
        src.link(dec); dec.link(sink)
        # push in uneven chunks to exercise streaming reassembly
        for i in range(0, len(enc_data), 1777):
            src.push_buffer(fx.Buffer(np.frombuffer(enc_data[i:i + 1777], np.uint8)))
        src.end_of_stream()
        p.play_until_eos()
        out = b"".join(np.asarray(s.buffer.data).tobytes() for s in sink.samples)
        assert out == expected

    def test_matches_libsodium_oracle(self):
        """Full-stream parity against the system libsodium (ctypes)."""
        import ctypes

        try:
            lib = ctypes.CDLL("libsodium.so.23")
        except OSError:
            pytest.skip("libsodium unavailable")
        lib.sodium_init()
        s_priv, s_pub, r_priv, r_pub = keys()
        import os as _os
        nonce = _os.urandom(24)
        data = _os.urandom(3000)

        from gst_plugins_rs_tpu.core.parse import parse_caps

        src = fx.element_factory_make("appsrc")
        src.set_property("caps", parse_caps("application/octet-stream"))
        enc = fx.element_factory_make("sodiumencrypter")
        enc.set_property("sender-key", s_priv)
        enc.set_property("receiver-key", r_pub)
        enc.set_property("block-size", 1024)
        enc.set_property("nonce", nonce.hex())
        sink = fx.element_factory_make("appsink")
        p = fx.Pipeline()
        for e in (src, enc, sink):
            p.add(e)
        src.link(enc); enc.link(sink)
        src.push_buffer(fx.Buffer(np.frombuffer(data, np.uint8)))
        src.end_of_stream()
        p.play_until_eos()
        out = b"".join(np.asarray(s.buffer.data).tobytes() for s in sink.samples)
        # parse header
        assert out[:12] == b"gst-sodium10"
        got_nonce = out[12:36]
        assert got_nonce == nonce
        import struct as _struct
        (bs,) = _struct.unpack_from("<I", out, 36)
        assert bs == 1024
        # decrypt each block with libsodium crypto_box_open_easy
        blocks, off, pt, n = [], 40, b"", nonce
        while off < len(out):
            blk = out[off:off + bs + 16]
            m = ctypes.create_string_buffer(max(len(blk) - 16, 1))
            rc = lib.crypto_box_open_easy(
                m, blk, ctypes.c_ulonglong(len(blk)), n,
                bytes.fromhex(s_pub), bytes.fromhex(r_priv))
            assert rc == 0, "libsodium failed to open our block"
            pt += m.raw[:len(blk) - 16]
            # increment nonce little-endian
            ni = int.from_bytes(n, "little") + 1
            n = ni.to_bytes(24, "little")
            off += len(blk)
        assert pt == data

    def test_wrong_key_fails(self):
        from gst_plugins_rs_tpu.core.parse import parse_caps

        s_priv, s_pub, r_priv, r_pub = keys()
        _, other_pub = generate_keypair()
        src = fx.element_factory_make("appsrc")
        src.set_property("caps", parse_caps("application/octet-stream"))
        enc = fx.element_factory_make("sodiumencrypter")
        enc.set_property("sender-key", s_priv)
        enc.set_property("receiver-key", r_pub)
        dec = fx.element_factory_make("sodiumdecrypter")
        dec.set_property("sender-key", other_pub)  # wrong sender
        dec.set_property("receiver-key", r_priv)
        sink = fx.element_factory_make("appsink")
        p = fx.Pipeline()
        for e in (src, enc, dec, sink):
            p.add(e)
        src.link(enc); enc.link(dec); dec.link(sink)
        src.push_buffer(fx.Buffer(np.frombuffer(b"z" * 2000, np.uint8)))
        src.end_of_stream()
        with pytest.raises(Exception):
            p.play_until_eos()
