"""TPU effect chain into CMAF HLS segments on disk."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(globals().get("__file__", "examples/x.py")))))  # run from anywhere
import os
import tempfile

import gst_plugins_rs_tpu as fx

out = tempfile.mkdtemp(prefix="hls_")
p = fx.parse_launch(
    "audiotestsrc wave=sine num-buffers=60 samplesperbuffer=4800 "
    "! audio/x-raw,format=F32,rate=48000,channels=2 "
    "! rsaudioecho delay=150000000 intensity=0.35 "
    f"! hlscmafsink target-duration=2 playlist-location={out}/live.m3u8 "
    f"init-location={out}/init%05d.mp4 location={out}/seg%05d.m4s"
)
p.play_until_eos()
print("wrote:", sorted(os.listdir(out)))
print(open(f"{out}/live.m3u8").read())
