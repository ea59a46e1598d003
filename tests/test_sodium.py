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
        assert out.startswith(b"gstpu-sodium1")
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
