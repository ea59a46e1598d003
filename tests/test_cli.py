"""CLI surface: the gst-launch-1.0 / gst-inspect-1.0 analogs (launch.py)."""
from gst_plugins_rs_tpu.launch import main


def test_list_elements(capsys):
    assert main(["--list-elements"]) == 0
    out = capsys.readouterr().out
    assert "rsaudioecho" in out and "audioloudnorm" in out
    assert len(out.splitlines()) > 200  # the full registry prints


def test_inspect_element(capsys):
    assert main(["--inspect", "rsaudioecho"]) == 0
    out = capsys.readouterr().out
    assert "Factory: rsaudioecho" in out
    assert "SINK template" in out and "SRC template" in out
    assert "audio/x-raw" in out and "{F32, F64}" in out
    assert "max-delay" in out and "mutable in ready" in out
    assert "intensity" in out and "range 0.0..1.0" in out


def test_inspect_unknown_suggests(capsys):
    assert main(["--inspect", "audioecho"]) == 1
    err = capsys.readouterr().err
    assert "no such element factory" in err
    assert "rsaudioecho" in err  # substring suggestion


def test_run_pipeline_via_cli():
    assert main(["audiotestsrc num-buffers=3 samplesperbuffer=256",
                 "! fakesink"]) == 0
