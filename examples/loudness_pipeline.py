"""EBU R-128 loudness normalization with live level messages."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(globals().get("__file__", "examples/x.py")))))  # run from anywhere
import gst_plugins_rs_tpu as fx

p = fx.parse_launch(
    "audiotestsrc wave=sine volume=0.05 num-buffers=40 samplesperbuffer=19200 "
    "! audio/x-raw,format=F64,rate=192000,channels=2 "
    "! audioloudnorm loudness-target=-24 "
    "! ebur128level interval=500000000 ! fakesink"
)
p.play_until_eos()
for msg in p.bus.messages():
    if msg.structure and msg.structure.name == "ebur128-level":
        s = msg.structure
        print(f"t={s.get('timestamp', 0) / 1e9:5.2f}s  "
              f"M={s.get('momentary-loudness', float('nan')):7.2f} LUFS  "
              f"I={s.get('global-loudness', float('nan')):7.2f} LUFS")
