"""Many streams, one device dispatch: the threadshare analog."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(globals().get("__file__", "examples/x.py")))))  # run from anywhere
import numpy as np

from gst_plugins_rs_tpu.parallel.streams import echo_bank

STREAMS, SECONDS, RATE = 32, 1, 48000
bank = echo_bank(STREAMS, channels=2, rate=RATE, delay_ns=250_000_000, intensity=0.5)
# payloads are flat interleaved samples per stream: [streams, frames*channels]
block = np.random.default_rng(0).normal(0, 0.1, (STREAMS, RATE * 2)).astype(np.float32)
out = bank.process(block)  # ONE dispatch for all 32 streams
print(f"processed {STREAMS} streams x {SECONDS}s in one dispatch -> {out.shape}")
