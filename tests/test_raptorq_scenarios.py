"""raptorq scenario matrix — 1:1 by name with the reference suite
/root/reference/net/raptorq/tests/raptorq.rs:297-621 (RaptorqTest builder
+ 17 scenarios: default, out-of-sequence, 10%/5% overhead, symbol sizes,
mtu<symbol, heavy loss, repair windows, wrapping seqnums, flush cancels
timers, repair-window tolerance).

Mapping notes (documented divergences):
- The repair PAYLOAD wire format is this framework's own fountain code
  (net/fountain.py docstring + docs/MIGRATION.md gate) — the RTP framing,
  pacing, pts/dts/rtp-timestamp arithmetic, caps contract and loss
  behavior mirror the reference exactly.
- The reference decoder recovers lazily (it needs one extra media push to
  run its sink chain, raptorq.rs:253-257); this decoder recovers eagerly
  when enough symbols arrive, so no duplicate trigger push is needed (and
  none is sent — the output count assertions are identical).
"""
import struct

import numpy as np

from gst_plugins_rs_tpu.core import (
    Buffer,
    Caps,
    Event,
    EventType,
    Pad,
    PadDirection,
    Segment,
    State,
    TestClock,
    element_factory_make,
)
from gst_plugins_rs_tpu.net.rtp import RtpPacket

SECOND = 10**9
MS = 10**6


class _Capture:
    """Capture sink for one src pad (one gst_check::Harness role)."""

    def __init__(self, srcpad):
        self.buffers = []
        self.events = []
        pad = Pad("cap-sink", PadDirection.SINK)
        pad.chain_function = lambda p, b: self.buffers.append(b)
        pad.event_function = lambda p, e: self.events.append(e) or True
        srcpad.link(pad)

    def pull(self):
        assert self.buffers, "no buffer queued"
        return self.buffers.pop(0)

    def caps(self):
        for e in self.events:
            if e.type == EventType.CAPS:
                return e.get("caps")
        return None


def _media_src(element, caps_fields="clock-rate=8000"):
    src = Pad("h-src", PadDirection.SRC)
    src.link(element.pad("sink"))
    src.push_event(Event.new_stream_start("h"))
    caps = Caps.builder("application/x-rtp",
                        **dict(f.split("=") for f in caps_fields.split(",")))
    src.push_event(Event.new_caps(caps))
    src.push_event(Event.new_segment(Segment()))
    return src


def _fec_src(element, caps):
    src = Pad("h-fec-src", PadDirection.SRC)
    src.link(element.pad("fec_0"))
    src.push_event(Event.new_stream_start("h-fec"))
    src.push_event(Event.new_caps(caps))
    src.push_event(Event.new_segment(Segment()))
    return src


def _rtp(seq, payload, pts=0, ts=0, pt=96):
    buf = Buffer(np.frombuffer(
        RtpPacket(pt, seq & 0xFFFF, ts, 0, payload).to_bytes(), np.uint8),
        pts=pts, dts=pts)
    return buf


class RaptorqTest:
    """The reference RaptorqTest builder (raptorq.rs:40-294)."""

    __test__ = False

    def __init__(self):
        enc = element_factory_make("raptorqenc")
        self.protected_packets = enc.get_property("protected-packets")
        self.repair_packets = enc.get_property("repair-packets")
        self.repair_window = enc.get_property("repair-window")
        self.symbol_size = enc.get_property("symbol-size")
        self.mtu = enc.get_property("mtu")
        self.initial_seq = 42
        self.lost_buffers = [0]
        self.swapped_buffers = []
        self.input_buffers = self.protected_packets
        self.expect_output_buffers = self.protected_packets

    def run(self):
        assert self.input_buffers >= self.protected_packets
        rng = np.random.default_rng(
            self.initial_seq + self.input_buffers + self.symbol_size)

        # 1./3. Encoder setup + operations (raptorq.rs:119-232)
        tc = TestClock()
        enc = element_factory_make("raptorqenc")
        enc.set_property("protected-packets", self.protected_packets)
        enc.set_property("repair-packets", self.repair_packets)
        enc.set_property("repair-window", self.repair_window)
        enc.set_property("symbol-size", self.symbol_size)
        enc.set_property("mtu", self.mtu)
        enc.clock = tc
        enc.set_state(State.PLAYING)
        enc_media = _Capture(enc.pad("src"))
        enc_fec = _Capture(enc.pad("fec_0"))
        src = _media_src(enc)

        inputs = []
        for i in range(self.input_buffers):
            size = int(rng.integers(1, self.mtu - 12 - 3))
            payload = rng.integers(0, 256, size, dtype=np.uint8).tobytes()
            inputs.append(_rtp(self.initial_seq + i, payload))
        for buf in inputs:
            src.push(buf)
        assert len(enc_media.buffers) == self.input_buffers

        media_packets = enc_media.pull_all() if hasattr(enc_media, "pull_all") \
            else list(enc_media.buffers)
        for a, b in zip(self.swapped_buffers[::2], self.swapped_buffers[1::2]):
            media_packets[a], media_packets[b] = media_packets[b], media_packets[a]

        # repair packets are delayed across the repair window; just before
        # each deadline nothing is queued, at the deadline exactly one
        # repair appears with adjusted pts/dts/rtp-timestamp
        # (raptorq.rs:195-232)
        delay_step = (self.repair_window // self.repair_packets) * MS
        delay = delay_step
        repair_packets = []
        for _ in range(self.repair_packets):
            tc.set_time(delay - 1)
            assert not enc_fec.buffers
            tc.set_time(delay)
            buf = enc_fec.pull()
            assert buf.pts == delay and buf.dts == delay
            pkt = RtpPacket.parse(np.asarray(buf.data).tobytes())
            assert pkt.timestamp == (delay // MS) * 8000 // 1000
            repair_packets.append(buf)
            delay += delay_step

        # 2./4. Decoder setup + operations (raptorq.rs:136-257)
        dec = element_factory_make("raptorqdec")
        dec.set_state(State.PLAYING)
        dec_out = _Capture(dec.pad("src"))
        dec_media = _media_src(dec, "x=0")
        dec_fec = _fec_src(dec, Caps.builder(
            "application/x-rtp",
            **{"raptor-scheme-id": "6", "repair-window": "1000000",
               "t": str(self.symbol_size)}))

        for i, buf in enumerate(media_packets):
            if i not in self.lost_buffers:
                dec_media.push(buf)
        for buf in repair_packets:
            dec_fec.push(buf)

        outputs = list(dec_out.buffers)
        assert len(outputs) == self.expect_output_buffers, \
            (len(outputs), self.expect_output_buffers)

        # sort wrap-aware by seqnum and compare with inputs (raptorq.rs:259-294)
        def key(buf):
            pkt = RtpPacket.parse(np.asarray(buf.data).tobytes())
            return (pkt.sequence_number - self.initial_seq) & 0xFFFF

        outputs.sort(key=key)
        if self.input_buffers == self.expect_output_buffers:
            for inbuf, outbuf in zip(inputs, outputs):
                p1 = RtpPacket.parse(np.asarray(inbuf.data).tobytes())
                p2 = RtpPacket.parse(np.asarray(outbuf.data).tobytes())
                assert p1.sequence_number == p2.sequence_number
                assert p1.payload == p2.payload


def test_raptorq_all_default():
    RaptorqTest().run()


def test_raptorq_decoder_media_packets_out_of_sequence():
    t = RaptorqTest()
    t.swapped_buffers = [5, 10, 12, 15]
    t.run()


def test_raptorq_10_percent_overhead():
    t = RaptorqTest()
    t.protected_packets = 100
    t.repair_packets = 10
    t.lost_buffers = [4, 42, 43, 44, 45]
    t.input_buffers = 100
    t.expect_output_buffers = 100
    t.run()


def test_raptorq_5_percent_overhead():
    t = RaptorqTest()
    t.protected_packets = 100
    t.repair_packets = 5
    t.input_buffers = 100
    t.lost_buffers = [8, 11]
    t.expect_output_buffers = 100
    t.run()


def test_raptorq_symbol_size_128():
    t = RaptorqTest()
    t.protected_packets = 20
    t.repair_packets = 4
    t.symbol_size = 128
    t.mtu = 400
    t.input_buffers = 20
    t.lost_buffers = [9]
    t.expect_output_buffers = 20
    t.run()


def test_raptorq_symbol_size_192():
    t = RaptorqTest()
    t.protected_packets = 20
    t.repair_packets = 4
    t.symbol_size = 192
    t.mtu = 999
    t.input_buffers = 20
    t.lost_buffers = [16, 19]
    t.expect_output_buffers = 20
    t.run()


def test_raptorq_symbol_size_1024():
    t = RaptorqTest()
    t.protected_packets = 20
    t.repair_packets = 8
    t.symbol_size = 192
    t.mtu = 100
    t.input_buffers = 20
    t.lost_buffers = [0, 1, 2, 3, 4, 5]
    t.expect_output_buffers = 20
    t.run()


def test_raptorq_mtu_lt_symbol_size():
    t = RaptorqTest()
    t.protected_packets = 20
    t.repair_packets = 8
    t.symbol_size = 1400
    t.mtu = 100
    t.input_buffers = 20
    t.lost_buffers = [14, 15, 16, 17, 18, 19]
    t.expect_output_buffers = 20
    t.run()


def test_raptorq_heavy_loss():
    # 10 losses with only 8 repairs: unrecoverable, the 30 received
    # packets still flow through (raptorq.rs:383-392)
    t = RaptorqTest()
    t.protected_packets = 40
    t.repair_packets = 8
    t.input_buffers = 40
    t.lost_buffers = list(range(10))
    t.expect_output_buffers = 30
    t.run()


def test_raptorq_repair_window_100ms():
    t = RaptorqTest()
    t.protected_packets = 10
    t.repair_packets = 10
    t.repair_window = 100
    t.input_buffers = 10
    t.lost_buffers = [2, 6]
    t.expect_output_buffers = 10
    t.run()


def test_raptorq_repair_window_500ms():
    t = RaptorqTest()
    t.protected_packets = 8
    t.repair_packets = 2
    t.repair_window = 500
    t.input_buffers = 8
    t.lost_buffers = []
    t.expect_output_buffers = 8
    t.run()


def test_raptorq_wrapping_sequence_number_1():
    t = RaptorqTest()
    t.initial_seq = 0xFFFF - 5
    t.run()


def test_raptorq_wrapping_sequence_number_2():
    t = RaptorqTest()
    t.initial_seq = 0xFFFF - 5
    t.swapped_buffers = [4, 5]
    t.run()


def test_raptorq_wrapping_sequence_number_3():
    t = RaptorqTest()
    t.initial_seq = 0xFFFF - 3
    t.lost_buffers = [0, 1, 2, 8]
    t.run()


def test_raptorq_encoder_flush_cancels_pending_timers():
    """raptorq.rs:439-503: 5 s window x 5 repairs = 1 s per repair; crank
    one out, flush, advance time — no further repairs, no pending ids."""
    tc = TestClock()
    enc = element_factory_make("raptorqenc")
    enc.set_property("repair-window", 5000)
    enc.set_property("protected-packets", 5)
    enc.set_property("repair-packets", 5)
    enc.clock = tc
    enc.set_state(State.PLAYING)
    enc_media = _Capture(enc.pad("src"))
    enc_fec = _Capture(enc.pad("fec_0"))
    src = _media_src(enc)

    for i in range(5):
        src.push(_rtp(i, b"\x2a" * 42, pts=i * SECOND))
    assert len(enc_media.buffers) == 5

    # block end at pts 4 s; repairs armed at 5..9 s — crank the first
    assert tc.crank()
    assert len(enc_fec.buffers) == 1
    enc_fec.pull()

    src.push_event(Event.new_flush_start())
    src.push_event(Event.new_flush_stop())
    flush_types = [e.type for e in enc_media.events
                   if e.type in (EventType.FLUSH_START, EventType.FLUSH_STOP)]
    assert flush_types == [EventType.FLUSH_START, EventType.FLUSH_STOP]

    tc.set_time(10 * SECOND)
    assert not enc_fec.buffers
    assert tc.pending_count() == 0


def test_raptorq_repair_window_tolerance():
    """raptorq.rs:506-621: 2 repairs buffered (not enough to recover); a
    media buffer far past repair-window+tolerance drops all buffered
    packets; stats track both counts."""
    tc = TestClock()
    enc = element_factory_make("raptorqenc")
    enc.set_property("repair-window", 1000)
    enc.set_property("protected-packets", 5)
    enc.set_property("repair-packets", 5)
    enc.clock = tc
    enc.set_state(State.PLAYING)
    enc_media = _Capture(enc.pad("src"))
    enc_fec = _Capture(enc.pad("fec_0"))
    src = _media_src(enc)

    for i in range(5):
        src.push(_rtp(i, b"\x2a" * 42, pts=i * SECOND))

    dec = element_factory_make("raptorqdec")
    dec.set_property("repair-window-tolerance", 1000)
    dec.set_state(State.PLAYING)
    _Capture(dec.pad("src"))
    dec_media = _media_src(dec, "x=0")
    fec_caps = enc_fec.caps()
    assert fec_caps is not None
    st = fec_caps.structure(0)
    assert st["raptor-scheme-id"] == "6"
    assert st["repair-window"] == "1000000"  # 1000 ms -> us
    dec_fec = _fec_src(dec, fec_caps)

    # first media packet into the decoder
    dec_media.push(enc_media.pull())

    # two repairs — not enough to recover the 4 missing packets
    for _ in range(2):
        assert tc.crank()
        dec_fec.push(enc_fec.pull())

    stats = dec.get_property("stats")
    assert stats["buffered-media-packets"] == 1
    assert stats["buffered-repair-packets"] == 2

    # media way beyond repair-window (1 s) + tolerance (1 s): buffered
    # packets were kept too long and are dropped
    dec_media.push(_rtp(0, b"\x2a" * 42, pts=10 * SECOND))
    stats = dec.get_property("stats")
    assert stats["buffered-media-packets"] == 0
    assert stats["buffered-repair-packets"] == 0
