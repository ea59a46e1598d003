"""Element-chain fusion tests (parallel/fuse.py — the one-dispatch chain win
of SURVEY.md §7.4)."""
import numpy as np

from gst_plugins_rs_tpu import parse_launch
from gst_plugins_rs_tpu.parallel.fuse import fusable_runs, fuse_pipeline

LUT = """LUT_3D_SIZE 2
0 0 0
0 0 1
0 1 0
0 1 1
1 0 0
1 0 1
1 1 0
1 1 1
"""


def _pipeline(tmp_path):
    loc = tmp_path / "swap.cube"
    loc.write_text(LUT)
    return parse_launch(
        "videotestsrc pattern=smpte num-buffers=3 "
        "! video/x-raw,format=RGBA,width=320,height=180 "
        f"! hsvfilter hue-shift=120 ! colorlut location={loc} ! appsink name=sink"
    )


def test_fused_matches_unfused(tmp_path):
    p1 = _pipeline(tmp_path)
    p1.play_until_eos()
    ref = np.asarray(p1.by_name("sink").samples[0].buffer.data)

    p2 = _pipeline(tmp_path)
    n = fuse_pipeline(p2)
    assert n == 1
    p2.play_until_eos()
    got = np.asarray(p2.by_name("sink").samples[0].buffer.data)
    np.testing.assert_array_equal(got, ref)
    assert len(p2.by_name("sink").samples) == 3


def test_fusable_run_detection(tmp_path):
    p = _pipeline(tmp_path)
    runs = fusable_runs(p)
    assert len(runs) == 1
    assert [e.ELEMENT_NAME for e in runs[0]] == ["hsvfilter", "colorlut"]


def test_no_fuse_single_element():
    p = parse_launch(
        "videotestsrc num-buffers=1 ! video/x-raw,format=RGB,width=64,height=64 "
        "! hsvfilter ! appsink name=sink"
    )
    assert fuse_pipeline(p) == 0
    p.play_until_eos()
    assert len(p.by_name("sink").samples) == 1


def test_mixed_chain_with_scaler_and_flip_fuses(tmp_path):
    """hsvfilter + videoscale + videoflip compose into ONE dispatch and
    match the unfused pipeline bit-exactly (late-round-3 elements join
    the fusion protocol)."""
    desc = (
        "videotestsrc pattern=smpte num-buffers=2 "
        "! video/x-raw,format=RGB,width=128,height=64 "
        "! hsvfilter hue-shift=90 "
        "! videoscale method=nearest ! video/x-raw,format=RGB,width=64,height=32 "
        "! videoflip method=rotate-180 ! appsink name=sink")
    p1 = parse_launch(desc)
    p1.play_until_eos()
    ref = np.asarray(p1.by_name("sink").samples[0].buffer.data)

    p2 = parse_launch(desc)
    runs = fusable_runs(p2)
    # the interior capsfilter rides along as an identity kernel
    assert [e.ELEMENT_NAME for e in runs[0]] == [
        "hsvfilter", "videoscale", "capsfilter", "videoflip"]
    assert fuse_pipeline(p2) == 1
    p2.play_until_eos()
    got = np.asarray(p2.by_name("sink").samples[0].buffer.data)
    assert got.shape == (32, 64, 3)
    np.testing.assert_array_equal(got, ref)
