"""raptorqenc/raptorqdec FEC tests: GF(256) fountain math and end-to-end
loss recovery through the elements."""
import numpy as np

import gst_plugins_rs_tpu as fx
from gst_plugins_rs_tpu.core.parse import parse_caps
from gst_plugins_rs_tpu.net import fountain
from gst_plugins_rs_tpu.net.rtp import RtpPacket


class TestFountain:
    def test_recover_any_k(self):
        rng = np.random.default_rng(2)
        K, L = 8, 120
        src = [rng.integers(0, 256, L, dtype=np.uint8).tobytes() for _ in range(K)]
        rep = fountain.encode_repair(src, 4, seed=5)
        # drop 4 sources, use all 4 repairs
        have = {i: s for i, s in enumerate(src) if i % 2 == 0}
        out = fountain.decode_block(K, L, have, dict(enumerate(rep)), seed=5)
        assert out == src

    def test_underdetermined(self):
        src = [bytes(range(10))] * 4
        rep = fountain.encode_repair(src, 1, seed=1)
        assert fountain.decode_block(4, 10, {0: src[0]}, {0: rep[0]}, seed=1) is None

    def test_gf_identities(self):
        v = np.arange(256, dtype=np.uint8)
        assert (fountain.gf_mul_vec(1, v) == v).all()
        assert (fountain.gf_mul_vec(0, v) == 0).all()
        # a*(b*v) == (ab)*v spot check via log tables
        a, b = 7, 33
        ab = fountain._EXP[(fountain._LOG[a] + fountain._LOG[b]) % 255]
        assert (fountain.gf_mul_vec(a, fountain.gf_mul_vec(b, v))
                == fountain.gf_mul_vec(int(ab), v)).all()


def make_rtp(seq, payload):
    return RtpPacket(96, seq, seq * 100, 7, payload).to_bytes()


class TestElements:
    def _run(self, drop_seqs, n=10, k=5, r=2):
        from gst_plugins_rs_tpu.core import BaseTransform, TransformMode

        class DropSeqs(BaseTransform):
            ELEMENT_NAME = "drop-test"
            MODE = TransformMode.NEVER_IN_PLACE

            def transform(self, inbuf):
                seq = RtpPacket.parse(np.asarray(inbuf.data).tobytes()).sequence_number
                if seq in drop_seqs:
                    return None
                out = fx.Buffer(inbuf.data)
                out.copy_metadata_from(inbuf)
                return out

        src = fx.element_factory_make("appsrc")
        src.set_property("caps", parse_caps("application/x-rtp"))
        enc = fx.element_factory_make("raptorqenc")
        enc.set_property("protected-packets", k)
        enc.set_property("repair-packets", r)
        dropper = DropSeqs()
        dec = fx.element_factory_make("raptorqdec")
        sink = fx.element_factory_make("appsink")
        p = fx.Pipeline()
        for e in (src, enc, dropper, dec, sink):
            p.add(e)
        src.pad("src").link(enc.pad("sink"))
        enc.pad("src").link(dropper.pad("sink"))
        dropper.pad("src").link(dec.pad("sink"))
        enc.pad("fec_0").link(dec.pad("fec_0"))
        dec.pad("src").link(sink.pad("sink"))
        payloads = [bytes([i]) * (40 + 7 * (i % 3)) for i in range(n)]
        for i, pl in enumerate(payloads):
            src.push_buffer(fx.Buffer(np.frombuffer(make_rtp(i, pl), np.uint8),
                                      pts=i * 10**7))
        src.end_of_stream()
        p.play_until_eos()
        got = {}
        for s in sink.samples:
            pkt = RtpPacket.parse(np.asarray(s.buffer.data).tobytes())
            got[pkt.sequence_number] = pkt.payload
        return got, payloads, dec

    def test_no_loss_passthrough(self):
        got, payloads, dec = self._run(set())
        assert got == {i: p for i, p in enumerate(payloads)}
        assert dec.num_recovered == 0

    def test_recovers_dropped_packets(self):
        got, payloads, dec = self._run({2, 7})
        assert dec.num_recovered == 2
        assert got == {i: p for i, p in enumerate(payloads)}  # 2 and 7 rebuilt

    def test_too_much_loss(self):
        # 3 losses in one k=5 block with r=2 repairs: unrecoverable
        got, payloads, dec = self._run({0, 1, 2})
        assert dec.num_recovered == 0
        assert 0 not in got and 3 in got
