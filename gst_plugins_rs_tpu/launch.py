"""gst-launch-style CLI: run a textual pipeline description.

The reference's user-facing surface is the same textual language driven
through gst-launch-1.0 (SURVEY.md §1 CLI row); this is that entry point:

    python -m gst_plugins_rs_tpu "audiotestsrc num-buffers=100 ! \\
        audioloudnorm ! fakesink"

Flags: -v prints caps negotiations and bus messages, --dot FILE writes the
pipeline graph (pipeline-snapshot tracer), --list-elements prints the
registry like gst-inspect-1.0.
"""
from __future__ import annotations

import argparse
import sys
import time


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        prog="gst_plugins_rs_tpu", description="Run a pipeline description"
    )
    ap.add_argument("pipeline", nargs="*", help="pipeline description (gst-launch grammar)")
    ap.add_argument("-v", "--verbose", action="store_true")
    ap.add_argument("--dot", metavar="FILE", help="write the pipeline graph as graphviz dot")
    ap.add_argument("--list-elements", action="store_true",
                    help="print all element factories (gst-inspect analog)")
    args = ap.parse_args(argv)

    from .core.registry import factory_class, list_factories

    if args.list_elements:
        for name in list_factories():
            cls = factory_class(name)
            print(f"{name:28s} {cls.ELEMENT_CLASS:32s} {cls.ELEMENT_DESCRIPTION}")
        return 0
    if not args.pipeline:
        ap.error("a pipeline description is required")

    from .core.parse import parse_launch

    desc = " ".join(args.pipeline)
    pipeline = parse_launch(desc)
    if args.dot:
        from .utils.tracers import PipelineSnapshotTracer

        snap = PipelineSnapshotTracer()
        snap.attach(pipeline)
        snap.snapshot(args.dot)
        print(f"wrote {args.dot}", file=sys.stderr)

    t0 = time.perf_counter()
    pipeline.play_until_eos()
    dt = time.perf_counter() - t0
    for msg in pipeline.bus.messages():
        if args.verbose or msg.type.value in ("error", "warning"):
            src = getattr(msg.src, "name", "?")
            print(f"[{msg.type.value}] {src}: {msg.structure!r}", file=sys.stderr)
    if args.verbose:
        print(f"pipeline finished in {dt:.3f}s", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
