"""audioloudnorm: EBU R-128 streaming loudness normalizer element.

Parity target: audio/audiofx/src/audioloudnorm/imp.rs (1914 LoC).  Custom
element (not BaseTransform) with its own sink chain (imp.rs:1545-1586):
adapter + 3 s first frame then 100 ms frames, drain on DISCONT / caps change /
EOS / segment, full reset on flush-stop, latency += 3 s (imp.rs:1672-1693),
output PTS = input PTS + 100 ms - 3 s for inner frames (imp.rs:644-646).

Caps: F64 or F32 interleaved @ 192 kHz (the reference is F64-only; F32 is
accepted for the TPU compute path).  All per-frame math runs on device
(ops/loudnorm.py).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ...core import (
    Adapter,
    AudioInfo,
    Buffer,
    BufferFlags,
    Element,
    Event,
    EventType,
    FlowReturn,
    Pad,
    PadDirection,
    PadPresence,
    PadTemplate,
    Prop,
    Query,
    QueryType,
    SECOND,
    audio_caps_template,
    register,
)
from ...ops import loudnorm as LN

_CAPS = audio_caps_template(formats=("F64", "F32"), rate=192_000)


class _State:
    def __init__(self, element: "AudioLoudNorm", info: AudioInfo):
        self.info = info
        self.adapter = Adapter()
        self.dtype = jnp.float64 if (info.format == "F64" and jax.config.jax_enable_x64) else jnp.float32
        self.params = LN.loudnorm_params(
            element.get_property("loudness-target"),
            element.get_property("loudness-range-target"),
            element.get_property("max-true-peak"),
            info.channels,
            self.dtype,
        )
        self.dev = LN.loudnorm_init(self.params, info.channels, element.get_property("offset"), self.dtype)
        self.frame_type = "first"  # first | inner
        self.samples_per_frame = LN.GAIN_LOOKAHEAD


@register
class AudioLoudNorm(Element):
    ELEMENT_NAME = "audioloudnorm"
    ELEMENT_CLASS = "Filter/Effect/Audio"
    ELEMENT_DESCRIPTION = "Normalizes perceived loudness of an audio stream"
    PROPERTIES = [
        Prop("loudness-target", -24.0, minimum=-70.0, maximum=-5.0, mutable="ready",
             doc="Loudness target in LUFS"),
        Prop("loudness-range-target", 7.0, minimum=1.0, maximum=20.0, mutable="ready",
             doc="Loudness range target in LU"),
        Prop("max-true-peak", -2.0, minimum=-9.0, maximum=0.0, mutable="ready",
             doc="Maximum True Peak in dbTP"),
        Prop("offset", 0.0, minimum=-99.0, maximum=99.0, mutable="ready",
             doc="Offset Gain in LU"),
        Prop("time-shard", False, type="bool", mutable="ready",
             doc="SP mode (SURVEY §2.3): shard the time axis across every "
                 "visible device.  See time-shard-mode for semantics."),
        Prop("time-shard-mode", "streaming", type="enum",
             choices=["streaming", "linear"], mutable="ready",
             doc="streaming (default): SAME OUTPUT as time-shard=false — "
                 "input is processed in bounded chunks; each chunk's "
                 "K-weighting/energy/peak analysis runs parallel across "
                 "the mesh (parallel/timeshard."
                 "sharded_kweight_frame_analysis: exact blocked-IIR with "
                 "all_gather state handoff) and the sequential gain/"
                 "limiter chain scans the precomputed results "
                 "(ops/loudnorm.inner_frames_scan_pre).  The chain itself "
                 "cannot be sharded without changing output: frame i's "
                 "limiter output feeds r128_out which feeds frame i+1's "
                 "delta (imp.rs:526-608).  Sample-parity on >=6 s streams "
                 "is test-gated (tests/test_timeshard_streaming.py).  "
                 "linear: buffer the WHOLE stream and normalize with ONE "
                 "linear gain (parallel/timeshard.sharded_loudnorm_linear "
                 "— ppermute halo for the 400 ms gating overlap, psum'd "
                 "gating histogram).  Semantics = the reference's LINEAR "
                 "frame type (imp.rs:323-366,781-816) applied to the "
                 "whole stream: for streams >= 3 s the output DIFFERS "
                 "from the streaming algorithm and memory grows with "
                 "stream length — a WARNING bus message is posted when "
                 "that threshold is crossed."),
    ]

    # streaming time-shard: frames per device per chunk (the memory bound:
    # a chunk is mesh_size * this * 100 ms of audio)
    _TS_FRAMES_PER_DEV = 4

    def __init__(self, name: Optional[str] = None):
        super().__init__(name)
        self.sinkpad = self.add_pad(
            Pad("sink", PadDirection.SINK, PadTemplate("sink", PadDirection.SINK, PadPresence.ALWAYS, _CAPS))
        )
        self.srcpad = self.add_pad(
            Pad("src", PadDirection.SRC, PadTemplate("src", PadDirection.SRC, PadPresence.ALWAYS, _CAPS))
        )
        self.sinkpad.chain_function = self._sink_chain
        self.sinkpad.event_function = self._sink_event
        self.srcpad.query_function = self._src_query
        self._state: Optional[_State] = None
        self._ts_linear_warned = False

    # ------------------------------------------------------------------
    # Processing
    # ------------------------------------------------------------------
    def _push_out(self, data, pts: Optional[int]) -> None:
        s = self._state
        n = int(data.shape[0])
        if n == 0:
            return
        dur = n * SECOND // s.info.rate
        self.srcpad.push(Buffer(data, pts=pts, duration=dur))

    def _adapter_pts(self) -> Optional[int]:
        s = self._state
        pts, dist = s.adapter.prev_pts()
        if pts is None:
            return None
        return pts + dist * SECOND // s.info.rate

    # inner frames are batched per dispatch (lax.scan over K frames) with
    # power-of-4 bucket sizes to bound the number of compiled programs
    _FRAME_BUCKETS = (64, 16, 4, 1)

    def _drain_full_frames(self) -> None:
        s = self._state
        if s.frame_type == "first" and s.adapter.available() >= s.samples_per_frame:
            pts = self._adapter_pts()
            src = jnp.asarray(s.adapter.take(s.samples_per_frame), s.dtype)
            s.dev, out = LN.first_frame_step_jit(s.dev, s.params, src)
            s.frame_type = "inner"
            s.samples_per_frame = LN.FRAME
            self._push_out(out, pts)
        if s.frame_type != "inner":
            return
        for k in self._FRAME_BUCKETS:
            while s.adapter.available() >= k * LN.FRAME:
                pts = self._adapter_pts()
                src = jnp.asarray(s.adapter.take(k * LN.FRAME), s.dtype)
                srcs = src.reshape(k, LN.FRAME, -1)
                s.dev, outs = LN.inner_frames_scan_jit(s.dev, s.params, srcs)
                out = outs.reshape(k * LN.FRAME, -1)
                out_pts = None if pts is None else pts + 100 * SECOND // 1000 - 3 * SECOND
                self._push_out(out, out_pts)

    def _drain_chunks_streaming_sharded(self) -> None:
        """Streaming time-shard: process whole chunks of M = devices * K
        frames as they accumulate.  Phase A (input K-weighting, subblock
        energies, frame peaks) runs parallel across the mesh; phase B (the
        sequential gain/limiter chain) scans the precomputed results.
        Output is sample-parity with the default path; memory is bounded
        by one chunk + the 3 s backlog in the state."""
        from ...parallel.streams import make_stream_mesh
        from ...parallel.timeshard import sharded_kweight_frame_analysis

        s = self._state
        # the 3 s first frame stays on the default path (one-off)
        if s.frame_type == "first" and s.adapter.available() >= s.samples_per_frame:
            pts = self._adapter_pts()
            src = jnp.asarray(s.adapter.take(s.samples_per_frame), s.dtype)
            s.dev, out = LN.first_frame_step_jit(s.dev, s.params, src)
            s.frame_type = "inner"
            s.samples_per_frame = LN.FRAME
            self._push_out(out, pts)
        if s.frame_type != "inner":
            return
        mesh = make_stream_mesh(axis="time")
        m_frames = mesh.shape["time"] * self._TS_FRAMES_PER_DEV
        chunk = m_frames * LN.FRAME
        while s.adapter.available() >= chunk:
            pts = self._adapter_pts()
            src = jnp.asarray(s.adapter.take(chunk), s.dtype)
            energies, peaks, filt_z = sharded_kweight_frame_analysis(
                src, s.dev.r128_in.filt_z, s.params, mesh, m_frames,
                axis="time")
            # tiny per-frame scalars; phase B runs as a plain (replicated)
            # jit on fully-addressable arrays
            energies = jnp.asarray(jax.device_get(energies), s.dtype)
            peaks = jnp.asarray(jax.device_get(peaks), s.dtype)
            filt_z = jnp.asarray(jax.device_get(filt_z), s.dtype)
            srcs = src.reshape(m_frames, LN.FRAME, -1)
            s.dev, outs = LN.inner_frames_scan_pre_jit(
                s.dev, s.params, srcs, energies, peaks)
            # hand the sharded filter's exit state back so the default
            # path (EOS drain, leftover frames) continues exactly
            s.dev = s.dev._replace(
                r128_in=s.dev.r128_in._replace(filt_z=filt_z))
            out = outs.reshape(m_frames * LN.FRAME, -1)
            out_pts = None if pts is None else pts + 100 * SECOND // 1000 - 3 * SECOND
            self._push_out(out, out_pts)

    def _drain_sharded(self, src, pts: Optional[int]) -> None:
        """Whole-stream linear normalization on a time-sharded mesh."""
        from ...parallel.streams import make_stream_mesh
        from ...parallel.timeshard import sharded_loudnorm_linear

        s = self._state
        n100 = s.params.r128.n100
        mesh = make_stream_mesh(axis="time")
        stride = mesh.shape["time"] * n100
        n = int(src.shape[0])
        nfull = (n // n100) * n100
        npad = -(-max(n, 1) // stride) * stride
        xp = jnp.zeros((npad, s.info.channels), s.dtype).at[:n].set(
            jnp.asarray(src, s.dtype))
        y, _gain, _gl = sharded_loudnorm_linear(
            xp, s.params, mesh, n_valid_sb=nfull // n100)
        self._push_out(y[:n], pts)

    def _drain(self) -> None:
        """Flush everything buffered (EOS / caps change / discont / segment)."""
        s = self._state
        if s is None:
            return
        time_shard = self.get_property("time-shard")
        linear = time_shard and self.get_property("time-shard-mode") == "linear"
        if time_shard and not linear:
            # streaming shard mode: the sub-chunk leftover continues on the
            # default sequential path (bit-identical), then falls through
            # to the normal final drain below
            self._drain_full_frames()
        pts = self._adapter_pts()
        avail = s.adapter.available()
        src = s.adapter.take(avail) if avail else None

        if linear:
            if src is not None and src.shape[0] > 0:
                self._drain_sharded(src, pts)
            return

        if s.frame_type == "inner":
            # final-frame processing (imp.rs:697-779): drain tail+backlog
            num = 0 if src is None else int(src.shape[0])
            padded = jnp.zeros((LN.FRAME, s.info.channels), s.dtype)
            if num:
                padded = padded.at[:num].set(jnp.asarray(src, s.dtype))
            # r128_in sees no complete subblock from a partial frame, so its
            # add is skipped (equivalent to libebur128 internal buffering);
            # the whole 30-frame drain runs as one device dispatch
            s.dev, outs = LN.drain_scan_jit(s.dev, s.params, padded)
            total = 29 * LN.FRAME + num
            data = outs.reshape(30 * LN.FRAME, -1)[:total]
            out_pts = None if pts is None else pts + 100 * SECOND // 1000 - 3 * SECOND
            self._push_out(data, out_pts)
        elif src is not None and src.shape[0] > 0:
            # sub-3s stream: single linear gain (imp.rs:323-366,781-816)
            src = jnp.asarray(src, s.dtype)
            nfull = (src.shape[0] // s.params.r128.n100) * s.params.r128.n100
            dev = s.dev
            if nfull:
                from ...ops.ebur128 import r128_add_full_subblocks

                dev = dev._replace(
                    r128_in=r128_add_full_subblocks(dev.r128_in, s.params.r128, src[:nfull])
                )
            gain = LN.linear_gain_from_global(dev, s.params)
            self._push_out(src * gain, pts)
        # else: nothing buffered at all

    def _reset_state(self) -> None:
        self._ts_linear_warned = False
        if self._state is not None:
            self._state = _State(self, self._state.info)

    # ------------------------------------------------------------------
    # Pads
    # ------------------------------------------------------------------
    def _sink_chain(self, pad: Pad, buf: Buffer) -> FlowReturn:
        s = self._state
        if s is None:
            return FlowReturn.NOT_NEGOTIATED
        if buf.has_flag(BufferFlags.DISCONT):
            self._drain()
            self._reset_state()
            s = self._state
        s.adapter.push(buf)
        if not self.get_property("time-shard"):
            self._drain_full_frames()
        elif self.get_property("time-shard-mode") == "streaming":
            self._drain_chunks_streaming_sharded()
        elif (not self._ts_linear_warned
              and s.adapter.available() >= LN.GAIN_LOOKAHEAD):
            # linear whole-stream mode past 3 s: output will diverge from
            # the streaming algorithm and memory grows with stream length
            # (VERDICT r4 #8)
            self._ts_linear_warned = True
            from ...core import Message, MessageType, Structure

            self.post_message(Message(
                MessageType.WARNING, src=self,
                structure=Structure(
                    "audioloudnorm-time-shard-linear",
                    text="time-shard-mode=linear received >= 3 s of input: "
                         "output diverges from the streaming algorithm "
                         "(reference LINEAR frame type applies one whole-"
                         "stream gain, imp.rs:323-366) and the element "
                         "buffers the entire stream until EOS",
                )))
        return FlowReturn.OK

    def _sink_event(self, pad: Pad, event: Event) -> bool:
        if event.type == EventType.CAPS:
            caps = event.get("caps")
            info = AudioInfo.from_caps(caps)
            if self._state is not None:
                self._drain()
            self._state = _State(self, info)
            self.srcpad.current_caps = caps
            return self.srcpad.push_event(event)
        if event.type in (EventType.EOS, EventType.SEGMENT):
            if self._state is not None:
                self._drain()
                self._reset_state()
            return self.srcpad.push_event(event)
        if event.type == EventType.FLUSH_STOP:
            self._reset_state()
            return self.srcpad.push_event(event)
        return self.srcpad.push_event(event)

    def _src_query(self, pad: Pad, query: Query) -> bool:
        if query.type == QueryType.LATENCY:
            ok = self.sinkpad.peer_query(query) if self.sinkpad.peer else True
            query.result["min_latency"] = query.result.get("min_latency", 0) + 3 * SECOND
            if query.result.get("max_latency") is not None:
                query.result["max_latency"] += 3 * SECOND
            return ok
        if query.type == QueryType.CAPS:
            filter_ = query.fields.get("filter")
            caps = _CAPS if filter_ is None else filter_.intersect(_CAPS)
            query.result["caps"] = caps
            return True
        return self._default_query(pad, query)

    def on_paused_to_ready(self) -> None:
        self._state = None


__all__ = ["AudioLoudNorm"]
