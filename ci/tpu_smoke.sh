#!/bin/sh
# TPU smoke: one real-chip pipeline drive + the bench harness.
# Run from a machine with the TPU attached (default JAX platform).
set -e
cd "$(dirname "$0")/.."

echo "== pipeline drive on the default (TPU) platform =="
python - <<'PY'
import numpy as np, gst_plugins_rs_tpu as fx
p = fx.parse_launch(
    "audiotestsrc wave=ticks num-buffers=20 samplesperbuffer=4800 "
    "! audio/x-raw,format=F32,rate=48000,channels=2 "
    "! rsaudioecho delay=250000000 intensity=0.6 ! appsink name=sink")
p.play_until_eos()
a = np.abs(p.by_name("sink").concat_audio()[:, 0])
assert a[:100].max() > 0.1 and a[11950:12050].max() > 0.05
print("drive OK")
PY

echo "== bench =="
python bench.py
