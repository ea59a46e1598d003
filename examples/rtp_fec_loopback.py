"""RTP with fountain-code FEC: drop packets, watch them come back."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(globals().get("__file__", "examples/x.py")))))  # run from anywhere
import numpy as np

import gst_plugins_rs_tpu as fx
from gst_plugins_rs_tpu.core import BaseTransform, TransformMode
from gst_plugins_rs_tpu.net.rtp import RtpPacket

DROP = {3, 11}


class Dropper(BaseTransform):
    ELEMENT_NAME = "example-dropper"
    MODE = TransformMode.NEVER_IN_PLACE

    def transform(self, buf):
        seq = RtpPacket.parse(np.asarray(buf.data).tobytes()).sequence_number
        if seq in DROP:
            print(f"  dropped seq {seq}")
            return None
        out = fx.Buffer(buf.data)
        out.copy_metadata_from(buf)
        return out


p = fx.parse_launch(
    "audiotestsrc wave=ticks num-buffers=20 samplesperbuffer=800 "
    "! audio/x-raw,format=S16,rate=8000,channels=1 "
    "! alawenc ! rtppcmapay2 ssrc=1 seqnum-offset=0 timestamp-offset=0 "
    "! raptorqenc name=enc protected-packets=5 repair-packets=2"
)
enc = p.by_name("enc")
drop = Dropper()
dec = fx.element_factory_make("raptorqdec")
jb = fx.element_factory_make("ts-jitterbuffer")
jb.set_property("latency", 10 ** 12)
depay = fx.element_factory_make("rtppcmadepay2")
adec = fx.element_factory_make("alawdec")
sink = fx.element_factory_make("appsink")
for e in (drop, dec, jb, depay, adec, sink):
    p.add(e)
enc.pad("src").link(drop.pad("sink"))
drop.pad("src").link(dec.pad("sink"))
enc.pad("fec_0").link(dec.pad("fec_0"))
dec.pad("src").link(jb.pad("sink"))
jb.link(depay)
depay.link(adec)
adec.link(sink)
p.play_until_eos()
out = sink.concat_audio()
print(f"recovered packets: {dec.num_recovered}; output samples: {out.shape[0]} "
      f"(= {20 * 800} sent, nothing lost)")
