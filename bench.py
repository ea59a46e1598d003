"""Benchmark harness — prints ONE JSON line with the headline metric.

Headline: the MINIMUM ratio across every tracked BASELINE.md config (hsv /
colorlut / chains at 2000 fps 1080p; echo / loudnorm / rnnoise single and
16-stream bank at 100x realtime) — the worst metric, not the best one.
Per-config values and ratios are in the JSON detail/ratios fields.

Runs device-resident batched dispatches (frames stay on device across the
fused chain, as in a real pipeline); host<->device transfers are excluded —
the tunnel in this environment caps transfers at ~22 MB/s which no real
deployment has.
"""
from __future__ import annotations

import json
import time

import numpy as np


def _checksum(out):
    """Tiny host readback that forces full device completion (on the axon
    relay, block_until_ready acknowledges before execution finishes)."""
    import jax.numpy as jnp

    import jax

    leaf = jax.tree_util.tree_leaves(out)[0]
    return np.asarray(jnp.sum(leaf.astype(jnp.int32) if leaf.dtype.kind == "u" else leaf))


def _progress(msg):
    import sys
    print(msg, file=sys.stderr, flush=True)


def _bench(step, state, iters=200, repeats=3):
    """Time a dependency-chained step: state = step(state) repeated.

    Chaining prevents the runtime from overlapping/eliding dispatches; a
    scalar checksum readback at the end forces completion.  Differential
    timing (t(3n) - t(n)) cancels the readback/dispatch fixed costs, which
    vary too much on this relay for subtract-a-zero-run to be reliable.

    The differential measurement is repeated `repeats` times and the MEDIAN
    per-step time is returned (VERDICT r4 #7: single-run numbers drift ±17%
    across relay days; median-of-3 inside one run removes the within-run
    tail, the `relay_drift_factor` in the JSON normalizes across days)."""
    state1 = step(state)  # compile
    _checksum(state1)

    def run(n):
        s = state
        t0 = time.perf_counter()
        for _ in range(n):
            s = step(s)
        _checksum(s)
        return time.perf_counter() - t0

    samples = []
    for _ in range(repeats):
        t1 = run(iters)
        t3 = run(3 * iters)  # differential cancels fixed costs
        dt_diff = (t3 - t1) / (2 * iters)
        dt_abs = t3 / (3 * iters)  # conservative: includes fixed costs
        # relay timing variance can make t1 >= t3/3 (differential ~ 0 or
        # negative); fall back to the absolute rate rather than reporting a
        # physically impossible number
        samples.append(dt_abs if dt_diff < 0.2 * dt_abs else dt_diff)
    samples.sort()
    return samples[len(samples) // 2]


# Nominal per-step seconds for the pinned drift-reference kernel below,
# recorded on the round-4 capture day (BENCH_r04's relay state).  The
# drift factor = measured / nominal lets cross-round comparisons divide
# out day-to-day relay speed (PERF_NOTES: identical code measured 0.494
# vs 0.577 ms/frame on different days).  The kernel is pure MXU work at a
# fixed shape so its runtime tracks the device+relay state, not the code
# under test.
_DRIFT_NOMINAL_S = 1.274e-4  # median-of-5, 2026-08-19 evening relay


def _measure_drift(jax, jnp):
    """Time the pinned reference matmul; returns (dt, drift_factor).

    The constant operand is PSEUDO-RANDOM, not ones: `x @ ones` is
    algebraically a broadcast row-sum and XLA may simplify it away from
    the MXU entirely (the bench-form audit in PERF_NOTES; an all-ones
    kernel measured anywhere from 41 to 170 "TFLOP/s" across runs)."""
    a = ((jnp.arange(2048 * 2048, dtype=jnp.uint32)
          * jnp.uint32(2654435761) % jnp.uint32(1024))
         .reshape(2048, 2048).astype(jnp.float32) * 1e-3)

    @jax.jit
    def ref_step(x):
        return jnp.tanh(x @ a * 1e-4)

    # median-of-5: post-outage relay timing swings 2x between runs
    vals = sorted(_bench(ref_step, a, iters=50, repeats=3)
                  for _ in range(5))
    dt = vals[2]
    return dt, dt / _DRIFT_NOMINAL_S


def _init_backend(max_wait_s: float = 600.0):
    """Initialize the TPU backend with bounded retry + exponential backoff.

    BENCH_r03 failed rc=1 on a transient 'Unable to initialize backend
    axon: UNAVAILABLE' (relay wedge / second-client collision) and lost the
    whole round's perf record.  Backend init is retried here because the
    wedge clears on the relay side; everything after a successful
    jax.devices() uses the same live backend."""
    import jax

    deadline = time.monotonic() + max_wait_s
    delay = 5.0
    attempt = 0
    while True:
        attempt += 1
        try:
            devs = jax.devices()
            _progress(f"bench: backend up after {attempt} attempt(s): {devs[0]}")
            return devs
        except RuntimeError as e:
            if "UNAVAILABLE" not in str(e) and "initialize backend" not in str(e):
                raise
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                raise
            # jax caches the failed-backend error; clear it so the retry
            # actually re-attempts initialization
            try:
                jax.extend.backend.clear_backends()
            except Exception:
                try:
                    jax._src.xla_bridge.backends.cache_clear()  # noqa: SLF001
                except Exception:
                    pass
            _progress(f"bench: backend UNAVAILABLE (attempt {attempt}), "
                      f"retrying in {delay:.0f}s ({remaining:.0f}s left)")
            time.sleep(min(delay, remaining))
            delay = min(delay * 2, 60.0)


def main():
    import jax
    import jax.numpy as jnp

    _init_backend()

    from gst_plugins_rs_tpu.ops.colorlut import lut3d_apply_packed, pack_corner_table
    from gst_plugins_rs_tpu.ops.echo import echo_apply_batched
    from gst_plugins_rs_tpu.ops.hsv import hsv_filter_frame

    results = {}
    rng = np.random.RandomState(0)

    # --- 1080p hsvfilter (batch of 8 frames per dispatch, chained) ----------
    BATCH = 8
    frames = jnp.asarray(rng.randint(0, 256, (BATCH, 1080, 1920, 3), np.uint8))
    params = jnp.asarray([120.0, 1.1, -0.05, 0.95, 0.02], jnp.float32)
    step = jax.jit(lambda f: hsv_filter_frame(f, params, offsets=(0, 1, 2)))
    dt = _bench(step, frames, iters=100)
    _progress("bench: hsv done")
    results["hsv_1080p_fps"] = BATCH / dt

    # --- 1080p colorlut 33^3 trilinear grade --------------------------------
    size = 33
    packed = jnp.asarray(pack_corner_table(rng.uniform(0, 1, (size**3, 3)).astype(np.float32), size))
    frames_rgba = jnp.asarray(rng.randint(0, 256, (BATCH, 1080, 1920, 4), np.uint8))
    scale = [1.0, 1.0, 1.0]
    offset = [0.0, 0.0, 0.0]
    step = jax.jit(
        lambda f: lut3d_apply_packed(f, packed, scale, offset, size=size, offsets=(0, 1, 2), bits=8)
    )
    dt = _bench(step, frames_rgba, iters=10)  # gather-bound: ~80 ms/dispatch
    results["colorlut_1080p_fps"] = BATCH / dt
    _progress("bench: colorlut done")

    # --- colorlut precision=approx (low-rank CP, gather-free MXU path) ------
    # Realistic non-separable grade (teal-orange style): fits at rank 64
    # with <=2 u8 LSB guaranteed over the whole domain (PERF_NOTES.md
    # "colorlut low-rank breakthrough").
    from gst_plugins_rs_tpu.ops.colorlut_lowrank import fit_lowrank
    from gst_plugins_rs_tpu.ops.pallas_colorlut_lowrank import (
        lut3d_apply_lowrank_packed, pack_factors)

    gg = np.linspace(0, 1, size)
    Bz, Gy, Rx = np.meshgrid(gg, gg, gg, indexing="ij")
    Y = 0.299 * Rx + 0.587 * Gy + 0.114 * Bz
    grade = np.stack([
        np.clip(Y + 1.3 * (Rx - Y) + 0.04 * (1 - Y) ** 2, 0, 1),
        np.clip(Y + 1.3 * (Gy - Y) + 0.01, 0, 1),
        np.clip(Y + 1.3 * (Bz - Y) + 0.06 * (1 - Y) ** 2 - 0.03 * Y, 0, 1),
    ], -1).reshape(-1, 3).astype(np.float32)
    fit = fit_lowrank(grade, size, tolerance=2.0 / 255.0)
    assert fit is not None, "grade LUT must factor within tolerance"
    ut, vt, wt, cf = (jnp.asarray(a) for a in
                      pack_factors(fit.U, fit.V, fit.W, fit.C))
    step = jax.jit(lambda f: lut3d_apply_lowrank_packed(
        f, ut, vt, wt, cf, scale, offset, size=size, offsets=(0, 1, 2),
        bits=8))
    dt = _bench(step, frames_rgba, iters=20)
    results["colorlut_approx_1080p_fps"] = BATCH / dt
    _progress(f"bench: colorlut approx done (rank {fit.U.shape[1]})")

    # --- echo audio realtime-x (64 streams x 1 s stereo 48 kHz) -------------
    STREAMS, RATE, CH = 64, 48000, 2
    N = RATE * CH  # 1 s interleaved
    x0 = jnp.asarray(rng.uniform(-1, 1, (STREAMS, N)).astype(np.float32))
    hist0 = jnp.zeros((STREAMS, N), jnp.float32)
    inten = jnp.full((STREAMS,), 0.5, jnp.float32)
    fb = jnp.full((STREAMS,), 0.4, jnp.float32)
    lag = (250_000_000 * CH * RATE) // 1_000_000_000

    @jax.jit
    def echo_step(state):
        x, hist = state
        out, hist = echo_apply_batched(x, hist, inten, fb, lag=lag)
        return out, hist

    dt = _bench(echo_step, (x0, hist0), iters=50)
    results["echo_realtime_x"] = STREAMS * 1.0 / dt  # seconds of audio per second
    _progress("bench: echo done")

    # --- hrtfrender binaural FIR realtime-x (BASELINE config 5) -------------
    # Reference contract: block = interpolation-steps(8) x block-length(512)
    # = 4096 samples (audio/hrtf/src/hrtf/imp.rs:36-38); 8 input channels
    # to stereo, 256-tap HRIRs, FFT overlap-add (ops/hrtf.py).
    from gst_plugins_rs_tpu.ops.hrtf import hrtf_convolve_blocks

    HC, HSTEPS, HBLK, HL, HRATE = 8, 8, 512, 256, 44100
    HK = 16  # queued blocks per dispatch (hrtf_convolve_blocks scan), the
    # same dispatch amortization as loudnorm's 16-frame inner scan
    hx = jnp.asarray(rng.uniform(
        -1, 1, (HC, HK, HSTEPS * HBLK)).astype(np.float32))
    hirs = jnp.asarray(rng.uniform(-0.1, 0.1,
                                   (HC, HSTEPS, 2, HL)).astype(np.float32))
    hgains = jnp.ones((HC, HSTEPS), jnp.float32)
    htails0 = jnp.zeros((HC, 2, HL - 1), jnp.float32)

    @jax.jit
    def hrtf_step(state):
        x, tails = state
        outs, tails = hrtf_convolve_blocks(x, hirs, hgains, tails,
                                           block_len=HBLK, steps=HSTEPS)
        # chain: feed the stereo mixes back into all input channels
        return jnp.broadcast_to(outs[None, :, :, 0], x.shape) * 0.5 + x * 0.5, tails

    dt = _bench(hrtf_step, (hx, htails0), iters=30)
    results["hrtf_realtime_x"] = (HK * HSTEPS * HBLK / HRATE) / dt
    _progress("bench: hrtf done")

    # --- agingradio realtime-x (64-stream bank, 1 s stereo 48 kHz) ----------
    from gst_plugins_rs_tpu.ops.agingradio import agingradio_process

    ag_x = jnp.asarray(rng.uniform(-1, 1, (STREAMS, RATE, CH)).astype(np.float32))
    ag_state = jnp.zeros((STREAMS, CH), jnp.float32)
    ag_keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(STREAMS))
    ag_fn = jax.vmap(
        lambda x, k, st: agingradio_process(
            x, k, st, 0.02, 0.001, 0.1, 6.0, 0.05, passes=3,
            use_lowpass=True))

    @jax.jit
    def ag_step(state):
        x, st = state
        out, st = ag_fn(x, ag_keys, st)
        return out, st

    dt = _bench(ag_step, (ag_x, ag_state), iters=20)
    results["agingradio_realtime_x"] = STREAMS * 1.0 / dt
    _progress("bench: agingradio done")

    # --- compositor: 4x 540p pads blended onto one 1080p canvas -------------
    # (examples-tier coverage: the element's fused resize->blend->paste jit,
    # gst_plugins_rs_tpu/elements/video/compositor.py::_composite)
    from gst_plugins_rs_tpu.elements.video.compositor import _composite

    pads = tuple(
        jnp.asarray(rng.randint(0, 256, (540, 960, 3), np.uint8))
        for _ in range(4))
    placements = ((0, 0, 960, 540), (960, 0, 960, 540),
                  (0, 540, 960, 540), (960, 540, 960, 540))
    alphas = jnp.asarray([1.0, 0.8, 0.6, 0.4], jnp.float32)

    def comp_step(frames):
        canvas = _composite(frames, alphas, placements=placements,
                            out_h=1080, out_w=1920, channels=3)
        # chain: feed a slice of the canvas back as the first pad
        return (canvas[:540, :960],) + frames[1:]

    dt = _bench(comp_step, pads, iters=40)
    results["compositor_4pad_1080p_fps"] = 1.0 / dt
    _progress("bench: compositor done")

    # --- audioloudnorm realtime-x (single stream, 16 frames per dispatch) ---
    from gst_plugins_rs_tpu.ops import loudnorm as LN

    ln_params = LN.loudnorm_params(-24.0, 7.0, -2.0, 2, jnp.float32)
    ln_state = LN.loudnorm_init(ln_params, 2, 0.0, jnp.float32)
    sig3 = jnp.asarray(rng.uniform(-0.5, 0.5, (LN.GAIN_LOOKAHEAD, 2)).astype(np.float32))
    ln_state, _ = LN.first_frame_step_jit(ln_state, ln_params, sig3)
    K = 16
    srcs = jnp.asarray(rng.uniform(-0.5, 0.5, (K, LN.FRAME, 2)).astype(np.float32))

    def ln_step(state):
        s, outs = LN.inner_frames_scan_jit(state, ln_params, srcs)
        return s

    dt = _bench(ln_step, ln_state, iters=20)
    results["loudnorm_realtime_x"] = (K * 0.1) / dt
    _progress("bench: loudnorm done")

    # --- loudnorm 16-stream bank aggregate (element-layer batch path) -------
    # The loudnormbank element's device path: one vmapped dispatch advances
    # 16 streams' R-128 + limiter state by one 100 ms frame (VERDICT r2 #4).
    from gst_plugins_rs_tpu.parallel.streams import loudnorm_bank

    LNS = 16
    lbank = loudnorm_bank(LNS, channels=2, dtype=jnp.float32)
    first3 = jnp.asarray(
        rng.uniform(-0.5, 0.5, (LNS, LN.GAIN_LOOKAHEAD, 2)).astype(np.float32))
    lbank.first_frame(first3)
    # steady state: one 100 ms frame per stream per dispatch.  The batched
    # limiter's REAL cond fast path (ops/loudnorm._limiter_scan_batched)
    # makes this 1.3 ms/dispatch; the old vmapped bank always ran the
    # 19200-step limiter scan (34 ms, 26x slower — PERF_NOTES.md).
    lframe = jnp.asarray(
        rng.uniform(-0.5, 0.5, (LNS, LN.FRAME, 2)).astype(np.float32))

    def lbank_step(states):
        lbank.states = states
        lbank.process(lframe)
        return lbank.states

    dt = _bench(lbank_step, lbank.states, iters=50)
    results["loudnorm_bank16_realtime_x"] = LNS * 0.1 / dt
    _progress("bench: loudnorm bank done")

    # --- audiornnoise realtime-x (stereo, 16 frames per dispatch) -----------
    from gst_plugins_rs_tpu.ops import rnnoise as RN

    rn_state = RN.denoise_init(channels=2)
    rn_weights = {k: jnp.asarray(v) for k, v in RN.default_weights().items()}
    K_RN = 16
    rn_frames = jnp.asarray(
        rng.uniform(-0.3, 0.3, (K_RN, 2, RN.FRAME_SIZE)).astype(np.float32) * 32767)

    def rn_step(state):
        s, outs, vads = RN.denoise_frames_fast_jit(state, rn_weights, rn_frames)
        return s

    dt = _bench(rn_step, rn_state, iters=20)
    results["rnnoise_realtime_x"] = (K_RN * RN.FRAME_SIZE / 48000) / dt
    _progress("bench: rnnoise done")

    # --- audiornnoise 16-stream vmapped bank (aggregate realtime-x) ---------
    # the batch-across-streams design point (SURVEY §2.3): 16 mono streams
    # share one dispatch via parallel.StreamBank-style vmap
    BANK = 16
    bank_scan = jax.jit(jax.vmap(
        lambda s, fr: RN.denoise_frames_fast(s, rn_weights, fr),
        in_axes=(0, 0)))
    bank_state = jax.vmap(lambda _: RN.denoise_init(1))(jnp.arange(BANK))
    bank_frames = jnp.asarray(
        rng.uniform(-0.3, 0.3, (BANK, K_RN, 1, RN.FRAME_SIZE)).astype(np.float32) * 32767)

    def bank_step(state):
        s, outs, vads = bank_scan(state, bank_frames)
        return s

    dt = _bench(bank_step, bank_state, iters=10)
    results["rnnoise_bank16_realtime_x"] = BANK * (K_RN * RN.FRAME_SIZE / 48000) / dt
    _progress("bench: rnnoise bank done")

    # --- chained pipelines (frames stay device-resident across elements) ----
    chain_step = jax.jit(lambda f: lut3d_apply_packed(
        jnp.concatenate([
            hsv_filter_frame(f[..., :3], params, offsets=(0, 1, 2)),
            f[..., 3:],
        ], axis=-1),
        packed, scale, offset, size=size, offsets=(0, 1, 2), bits=8))
    dt = _bench(chain_step, frames_rgba, iters=10)
    results["chain_hsv_colorlut_1080p_fps"] = BATCH / dt
    _progress("bench: hsv+colorlut chain done")

    echo_single = jnp.asarray(rng.uniform(-0.5, 0.5, (1, LN.FRAME * 2)).astype(np.float32))

    def chain_audio_step(state):
        ln_s, hist = state
        out, hist = echo_apply_batched(
            jnp.tile(echo_single, (1, K)), hist, inten[:1], fb[:1], lag=lag)
        frames = out.reshape(K, LN.FRAME, 2)
        ln_s, _ = LN.inner_frames_scan_jit(ln_s, ln_params, frames)
        return ln_s, hist

    hist_e = jnp.zeros((1, K * LN.FRAME * 2), jnp.float32)
    dt = _bench(chain_audio_step, (ln_state, hist_e), iters=10)
    results["chain_echo_loudnorm_realtime_x"] = (K * 0.1) / dt
    _progress("bench: echo+loudnorm chain done")

    # --- YOLOX-tiny 640x640 inference fps -----------------------------------
    # the element's default engine: s2d-domain stem/dark2 + folded BN
    # (models/yolox_fast.py — numerically equivalent to the flax graph,
    # 1.65x measured same-run; PERF_NOTES.md "YOLOX s2d engine")
    from gst_plugins_rs_tpu.models.yolox import Yolox
    from gst_plugins_rs_tpu.models.yolox_fast import apply_fast

    model = Yolox.from_variant("tiny")
    YB = 8  # measured saturation point: 850 fps at batch 8, 857 at 16
    # u8 frames, cast in-jit (round 3: the f32 [H,W,3] input layout was
    # 60% of the model's time via 3->128 lane padding)
    img = jnp.asarray(rng.randint(0, 256, (YB, 640, 640, 3), np.uint8))
    variables = model.init(jax.random.PRNGKey(0), img)
    # the WHOLE step is one jitted graph: the chain dependency is a
    # scalar folded back into the u8 image in-jit (the previous form did
    # the chain arithmetic un-jitted: +3 relay dispatches per step, ~3%).
    # The image MUST be the traced chained state: a closure-constant image
    # lets XLA hoist the input transform (+20%), and a `*0` chain lets it
    # dead-code half the model (+80%) — both measured, both invalid
    # (PERF_NOTES round 5 "bench-form audit").
    @jax.jit
    def yolox_step(im):
        out = apply_fast(model, variables, im)
        return im + (0 * jnp.mean(out)).astype(jnp.uint8)

    dt = _bench(yolox_step, img, iters=20)
    results["yolox_tiny_640_fps"] = YB / dt
    _progress("bench: yolox tiny done")

    # engine=fast-bf16: bf16 stem+dark2 activations (detection-parity
    # gated in tests/test_yolox_fast.py::test_fast_bf16_stem_detection_parity)
    @jax.jit
    def yolox_bf16_step(im):
        out = apply_fast(model, variables, im, s2d_dtype=jnp.bfloat16)
        return im + (0 * jnp.mean(out)).astype(jnp.uint8)

    dt = _bench(yolox_bf16_step, img, iters=20)
    results["yolox_tiny_640_bf16_fps"] = YB / dt
    _progress("bench: yolox tiny bf16 done")

    # YOLOX-s (the next zoo size up — bigger channels use the MXU better;
    # VERDICT r3 #5 asked for it alongside tiny)
    model_s = Yolox.from_variant("s")
    variables_s = model_s.init(jax.random.PRNGKey(0), img[:1])
    @jax.jit
    def yolox_s_step(im):
        out = apply_fast(model_s, variables_s, im)
        return im + (0 * jnp.mean(out)).astype(jnp.uint8)

    dt = _bench(yolox_s_step, img, iters=10)
    results["yolox_s_640_fps"] = YB / dt
    _progress("bench: yolox s done")

    drift_dt, drift = _measure_drift(jax, jnp)
    _progress(f"bench: drift reference done ({drift_dt*1e3:.3f} ms/step, "
              f"factor {drift:.3f})")

    # Honest headline: the WORST tracked metric vs its BASELINE.md target
    # (VERDICT r1: a cherry-picked best-metric headline hides misses).
    #
    # colorlut targets follow the BASELINE.md re-baseline (proposed r3,
    # applied r5 per VERDICT r4 #2 after two rounds unadjudicated): exact
    # per-pixel 3D-LUT sampling is gather-rate-bound on this hardware
    # (9 kernel families measured, PERF_NOTES "colorlut gather analysis")
    # at ~100 fps/chip; the 1000 fps tier is carried by precision=approx
    # (rank-64 CP, <=2 u8 LSB guaranteed).  The hsv+colorlut chain embeds
    # the exact colorlut so inherits its target.
    targets = {
        "hsv_1080p_fps": 2000.0,
        "colorlut_1080p_fps": 100.0,
        "colorlut_approx_1080p_fps": 1000.0,
        "chain_hsv_colorlut_1080p_fps": 100.0,
        "echo_realtime_x": 100.0,
        "hrtf_realtime_x": 100.0,
        "agingradio_realtime_x": 100.0,
        "loudnorm_realtime_x": 100.0,
        "loudnorm_bank16_realtime_x": 100.0,
        "chain_echo_loudnorm_realtime_x": 100.0,
        "rnnoise_realtime_x": 100.0,
        "rnnoise_bank16_realtime_x": 100.0,
    }
    ratios = {k: results[k] / t for k, t in targets.items() if k in results}
    worst = min(ratios, key=ratios.get)
    print(
        json.dumps(
            {
                "metric": f"min_ratio_vs_targets ({worst})",
                "value": round(results[worst], 1),
                "unit": "frames/s" if "fps" in worst else "realtime-x",
                "vs_baseline": round(ratios[worst], 3),
                "detail": {k: round(v, 1) for k, v in results.items()},
                # drift-normalized rates: rate * drift = what the same code
                # would measure on the nominal (round-4 capture) relay day
                "detail_normalized": {
                    k: round(v * drift, 1) for k, v in results.items()},
                "ratios": {k: round(v, 3) for k, v in ratios.items()},
                "relay_drift_factor": round(drift, 4),
                "device": str(jax.devices()[0]),
            }
        )
    )


if __name__ == "__main__":
    main()
