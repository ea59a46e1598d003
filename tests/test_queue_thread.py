"""Threaded queue tests: decoupling, ordering, backpressure, EOS drain."""
import threading


import gst_plugins_rs_tpu as fx


class TestThreadedQueue:
    def test_order_and_completeness(self):
        p = fx.parse_launch(
            "audiotestsrc wave=sine num-buffers=50 samplesperbuffer=480 "
            "! audio/x-raw,format=F32,rate=48000,channels=2 "
            "! queue ! rsaudioecho intensity=0.3 ! appsink name=sink"
        )
        p.play_until_eos()
        sink = p.by_name("sink")
        out = sink.concat_audio()
        assert out.shape == (50 * 480, 2)
        pts = [s.buffer.pts for s in sink.samples]
        assert pts == sorted(pts)  # in-order through the thread boundary

    def test_downstream_runs_on_worker_thread(self):
        from gst_plugins_rs_tpu.core import BaseTransform, TransformMode

        seen_threads = set()

        class ThreadSpy(BaseTransform):
            ELEMENT_NAME = "thread-spy"
            MODE = TransformMode.ALWAYS_IN_PLACE

            def transform_ip(self, buf):
                seen_threads.add(threading.current_thread().name)
                return buf

        src = fx.element_factory_make("audiotestsrc")
        src.set_property("num-buffers", 5)
        src.set_property("samplesperbuffer", 480)
        q = fx.element_factory_make("queue")
        spy = ThreadSpy()
        sink = fx.element_factory_make("fakesink")
        p = fx.Pipeline()
        for e in (src, q, spy, sink):
            p.add(e)
        src.link(q); q.link(spy); spy.link(sink)
        p.play_until_eos()
        assert seen_threads and all("-worker" in t for t in seen_threads)

    def test_eos_drains_everything(self):
        # tiny queue forces backpressure while still delivering every buffer
        p = fx.parse_launch(
            "audiotestsrc wave=ticks num-buffers=100 samplesperbuffer=100 "
            "! audio/x-raw,format=F32,rate=48000,channels=1 "
            "! queue max-size-buffers=2 ! appsink name=sink"
        )
        p.play_until_eos()
        assert p.by_name("sink").concat_audio().shape == (100 * 100, 1)

    def test_two_stage_overlap(self):
        """Two queues create three pipeline stages; everything still flows."""
        p = fx.parse_launch(
            "videotestsrc pattern=gradient num-buffers=8 "
            "! video/x-raw,format=RGB,width=64,height=48,framerate=30/1 "
            "! queue ! hsvfilter hue-shift=60 ! queue ! appsink name=sink"
        )
        p.play_until_eos()
        assert len(p.by_name("sink").samples) == 8
