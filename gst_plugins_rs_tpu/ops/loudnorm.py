"""audioloudnorm compute engine: EBU R-128 streaming loudness normalizer.

Behavioral port of the reference's ffmpeg-af_loudnorm-derived algorithm
(audio/audiofx/src/audioloudnorm/imp.rs, 1914 LoC — see file:line citations
inline).  Fixed 192 kHz operation: FRAME=19200 (100 ms), 3 s gain lookahead,
limiter attack 10 ms / release 100 ms / lookahead 10 ms (imp.rs:207-214).

TPU-native design decisions:
- The ring buffers (3 s analysis ring + 210 ms limiter ring, imp.rs:89-118)
  become a functional FIFO backlog [2.79 s] plus a 110 ms scaled tail; every
  100 ms frame is one jitted device step.
- Both EbuR128 analyzers ride in the device state (ops/ebur128.py pure
  functions) so the whole frame loop — loudness queries, gaussian-smoothed
  delta ring, gain interpolation, limiter — runs on device with no host
  round-trips.
- The true-peak limiter FSM (Out/Attack/Sustain/Release, imp.rs:1377-1430)
  runs as a per-sample lax.scan with vectorized peak precomputation
  (local-max + 12-sample confirmation, imp.rs:1438-1527); frames with no
  peaks and an idle limiter take a vectorized fast path via lax.cond.
  Divergences from the reference's run-based scanning (documented): peak
  detection uses the true previous sample rather than the cross-call
  prev_smp cache; release-state peak handling evaluates the envelope at the
  attack point; the first-frame pre-peak max uses |x| (the reference
  compares abs against a signed running max, imp.rs:1335-1341).  The
  acceptance bar matches the reference's own tests: +-1 LU of target and
  true peak <= max-true-peak.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .ebur128 import (
    R128Params,
    R128State,
    loudness_global,
    loudness_shortterm,
    r128_add_full_subblocks,
    r128_ingest_frame,
    r128_init,
    r128_params,
    relative_threshold_energy,
    energy_to_loudness,
)

RATE = 192_000
FRAME = 19_200  # 100 ms
GAIN_LOOKAHEAD = 3 * RATE  # 3 s
LIMITER_ATTACK = 1920  # 10 ms
LIMITER_RELEASE = 19_200  # 100 ms
LIMITER_LOOKAHEAD = 1920  # 10 ms
TAIL = FRAME + LIMITER_LOOKAHEAD  # 110 ms scaled-but-unoutput samples
BACKLOG = GAIN_LOOKAHEAD - TAIL - FRAME  # 2.79 s of raw not-yet-scaled input

ST_OUT, ST_ATTACK, ST_SUSTAIN, ST_RELEASE = 0, 1, 2, 3


def gaussian_weights(dtype=np.float64) -> np.ndarray:
    """21-tap sigma=3.5 normalized gaussian (imp.rs:1893-1913)."""
    sigma = 3.5
    x = np.arange(21) - 10.0
    w = (1.0 / (sigma * np.sqrt(2.0 * np.pi))) * np.exp(-(x**2) / (2.0 * sigma**2))
    return (w / w.sum()).astype(dtype)


class LoudnormState(NamedTuple):
    backlog: jnp.ndarray  # [BACKLOG, ch] raw input awaiting gain scaling
    tail: jnp.ndarray  # [TAIL, ch] scaled samples not yet output
    delta: jnp.ndarray  # [30] gain delta ring
    index: jnp.ndarray  # i32 ring index
    prev_delta: jnp.ndarray  # f
    above_threshold: jnp.ndarray  # bool
    offset: jnp.ndarray  # linear offset gain (from `offset` property / linear mode)
    # limiter FSM
    lim_state: jnp.ndarray  # i32
    env_cnt: jnp.ndarray  # i32
    sustain_cnt: jnp.ndarray  # i32 (-1 = None)
    gr0: jnp.ndarray
    gr1: jnp.ndarray
    # analyzers
    r128_in: R128State
    r128_out: R128State


class LoudnormParams(NamedTuple):
    target_i: jnp.ndarray
    target_lra: jnp.ndarray
    target_tp: jnp.ndarray  # linear
    weights: jnp.ndarray  # [21]
    r128: R128Params


def loudnorm_params(
    loudness_target: float,
    loudness_range_target: float,
    max_true_peak_db: float,
    channels: int,
    dtype=jnp.float64,
) -> LoudnormParams:
    from ..core.audio import default_channel_positions

    rp = r128_params(RATE, default_channel_positions(channels), dtype)
    return LoudnormParams(
        target_i=jnp.asarray(loudness_target, dtype),
        target_lra=jnp.asarray(loudness_range_target, dtype),
        target_tp=jnp.asarray(10.0 ** (max_true_peak_db / 20.0), dtype),
        weights=jnp.asarray(gaussian_weights(), dtype),
        r128=rp,
    )


def loudnorm_init(params: LoudnormParams, channels: int, offset_db: float, dtype=jnp.float64) -> LoudnormState:
    return LoudnormState(
        backlog=jnp.zeros((BACKLOG, channels), dtype),
        tail=jnp.zeros((TAIL, channels), dtype),
        delta=jnp.zeros((30,), dtype),
        index=jnp.asarray(1, jnp.int32),  # imp.rs:165 starts at 1
        prev_delta=jnp.asarray(0.0, dtype),
        above_threshold=jnp.asarray(False),
        offset=jnp.asarray(10.0 ** (offset_db / 20.0), dtype),
        lim_state=jnp.asarray(ST_OUT, jnp.int32),
        env_cnt=jnp.asarray(0, jnp.int32),
        sustain_cnt=jnp.asarray(-1, jnp.int32),
        gr0=jnp.asarray(0.0, dtype),
        gr1=jnp.asarray(0.0, dtype),
        r128_in=r128_init(params.r128, channels, dtype),
        r128_out=r128_init(params.r128, channels, dtype),
    )


# ---------------------------------------------------------------------------
# Gaussian-smoothed gain from the delta ring (imp.rs:1529-1541)
# ---------------------------------------------------------------------------
def _gaussian_gain(delta, weights, i):
    shifted = jnp.where(i > 10, i - 10, i + 20)
    idx = jnp.mod(shifted + jnp.arange(21), 30)
    return jnp.sum(weights * delta[idx])


# ---------------------------------------------------------------------------
# Limiter
# ---------------------------------------------------------------------------
def _precompute_peaks(window, target_tp):
    """Vectorized detect_peak (imp.rs:1438-1527) over the whole 210 ms window.

    Returns pk[FRAME] (peak confirmed LIMITER_LOOKAHEAD ahead of output
    position n), pv[FRAME] (max |sample| across channels at the peak), and
    future[FRAME] (any peak at position >= n)."""
    a = jnp.abs(window)  # [W, ch]
    W = a.shape[0]
    # local maxima above threshold, per channel, at positions 1..W-2
    prev = a[:-2]
    this = a[1:-1]
    nxt = a[2:]
    local = (prev <= this) & (this >= nxt) & (this > target_tp)
    # 12-sample confirmation: none of the next 2..11 samples higher (same ch)
    confirm = jnp.ones_like(local)
    for i in range(2, 12):
        follow = jax.lax.dynamic_slice_in_dim(
            jnp.concatenate([a, jnp.zeros((12, a.shape[1]), a.dtype)], axis=0), 1 + i, W - 2
        )
        confirm = confirm & (follow <= this)
    peak_ch = local & confirm  # position m corresponds to window index m+1
    pk_full = jnp.zeros((W,), bool).at[1 : W - 1].set(jnp.any(peak_ch, axis=1))
    pv_full = jnp.max(a, axis=1)
    pk = pk_full[LIMITER_LOOKAHEAD : LIMITER_LOOKAHEAD + FRAME]
    pv = pv_full[LIMITER_LOOKAHEAD : LIMITER_LOOKAHEAD + FRAME]
    future = jnp.flip(jnp.cumsum(jnp.flip(pk.astype(jnp.int32)))) > 0
    return pk, pv, future


def _make_limiter_step(target_tp, dtype):
    """The per-sample limiter FSM step, shape-polymorphic: every carry leaf
    and input is either scalar (single stream) or [N] (batched bank) — all
    ops are elementwise, so the same step serves both `_limiter_scan` and
    `_limiter_scan_batched` bit-identically."""
    att_den = jnp.asarray(LIMITER_ATTACK - 1.0, dtype)
    rel_den = jnp.asarray(LIMITER_RELEASE - 1.0, dtype)

    def step(c, inp):
        st, env, sus, gr0, gr1 = c
        x, pk_n, pv_n, fut_n = inp
        envf = env.astype(dtype)

        # attack window complete -> sustain (imp.rs:1082-1092)
        done_att = (st == ST_ATTACK) & (env >= LIMITER_ATTACK)
        st = jnp.where(done_att, ST_SUSTAIN, st)
        # release window complete -> out (imp.rs:1320-1330)
        done_rel = (st == ST_RELEASE) & (env >= LIMITER_RELEASE)
        st = jnp.where(done_rel, ST_OUT, st)

        new_gr = target_tp / jnp.where(pv_n > 0, pv_n, 1.0)

        cur_att = gr0 - (envf / att_den) * (gr0 - gr1)
        cur_rel = gr0 - (envf / rel_den) * (gr1 - gr0)

        c_out = pk_n & (st == ST_OUT)
        c_att = pk_n & (st == ST_ATTACK)
        c_sus = pk_n & (st == ST_SUSTAIN)
        c_rel = pk_n & (st == ST_RELEASE)

        # attack-state new-peak handling (imp.rs:981-1064)
        old_slope = -(gr0 - gr1)
        new_slope = -(cur_att - new_gr)
        higher = new_gr < gr1
        restart = c_att & higher & (new_slope <= old_slope)
        adjust = c_att & higher & (new_slope > old_slope)
        lowpeak = c_att & ~higher
        safe_slope = jnp.where(old_slope != 0, old_slope, -1e-30)
        new_end = jnp.maximum((new_gr - gr0) / safe_slope, 1.0)
        adj_gr0 = gr0 + (new_end - 1.0) * old_slope
        cur_pos = jnp.clip((cur_att - adj_gr0) / safe_slope, 0.0, 1.0)
        adj_env = (att_den * cur_pos).astype(jnp.int32)

        sus_attack = c_sus & (new_gr < gr1)
        sus_extend = c_sus & ~(new_gr < gr1)
        rel_attack = c_rel & (new_gr < cur_rel)
        rel_sustain = c_rel & ~(new_gr < cur_rel)

        to_attack = c_out | restart | adjust | sus_attack | rel_attack
        gr0n = jnp.where(c_out, 1.0,
               jnp.where(restart, cur_att,
               jnp.where(adjust, adj_gr0,
               jnp.where(sus_attack, gr1,
               jnp.where(rel_attack, cur_rel, gr0)))))
        gr1n = jnp.where(to_attack, new_gr, jnp.where(rel_sustain, cur_rel, gr1))
        envn = jnp.where(adjust, adj_env, jnp.where(to_attack, 0, env))
        susn = jnp.where(adjust, adj_env,
               jnp.where(to_attack, -1,
               jnp.where(lowpeak & (env < LIMITER_ATTACK), env,
               jnp.where(sus_extend, LIMITER_LOOKAHEAD, sus))))
        stn = jnp.where(to_attack, ST_ATTACK,
              jnp.where(sus_extend | rel_sustain, ST_SUSTAIN, st))
        st, env, sus, gr0, gr1 = stn, envn, susn, gr0n, gr1n

        # sustain exhausted with no upcoming peak -> release (imp.rs:1190-1205)
        sustain_exit = (st == ST_SUSTAIN) & ~pk_n & (sus <= 0) & ~fut_n
        gr0 = jnp.where(sustain_exit, gr1, gr0)
        gr1 = jnp.where(sustain_exit, 1.0, gr1)
        env = jnp.where(sustain_exit, 0, env)
        st = jnp.where(sustain_exit, ST_RELEASE, st)

        envf = env.astype(dtype)
        env_att = gr0 - (envf / att_den) * (gr0 - gr1)
        env_rel = gr0 - (envf / rel_den) * (gr1 - gr0)
        mult = jnp.where(st == ST_OUT, 1.0,
               jnp.where(st == ST_ATTACK, env_att,
               jnp.where(st == ST_SUSTAIN, gr1, env_rel)))
        y = x * mult[..., None]  # mult broadcasts over channels ([] or [N])

        env = jnp.where((st == ST_ATTACK) | (st == ST_RELEASE), env + 1, env)
        sus = jnp.where((st == ST_SUSTAIN) & (sus > 0) & ~pk_n, sus - 1, sus)
        return (st, env, sus, gr0, gr1), y

    return step


def _limiter_scan(window, carry, target_tp):
    """Run the per-sample limiter FSM over the first FRAME samples of window.

    carry = (lim_state, env_cnt, sustain_cnt, gr0, gr1).
    Returns (out [FRAME, ch], new_carry)."""
    dtype = window.dtype
    pk, pv, future = _precompute_peaks(window, target_tp)
    xs = window[:FRAME]
    step = _make_limiter_step(target_tp, dtype)

    def run_scan(_):
        return jax.lax.scan(step, carry, (xs, pk, pv, future))

    def fast_path(_):
        # no peaks anywhere and the limiter is idle: pure passthrough
        return carry, xs

    idle = (carry[0] == ST_OUT) & ~jnp.any(pk)
    new_carry, out = jax.lax.cond(idle, fast_path, run_scan, None)

    # final clamp for rounding (imp.rs:1417-1423)
    out = jnp.clip(out, -target_tp, target_tp)
    return out, new_carry


def _limiter_scan_batched(windows, carry, target_tp, block: int = LIMITER_ATTACK):
    """Batched (N-stream) limiter: bit-equal to vmapping `_limiter_scan`,
    but the idle fast path survives batching.  `jax.vmap` lowers `lax.cond`
    to a select that executes BOTH branches, so a vmapped bank always pays
    the 19 200-step per-sample scan (~34 ms/frame measured on v5e) even for
    silence.  Here the conds run OUTSIDE any vmap: one frame-level cond
    skips peak-free frames entirely, and a blocked scan (10 ms blocks) conds
    per block so a single peaky stream only drags the bank through the
    blocks that actually contain peaks.

    windows: [N, W, ch]; carry leaves [N].  Returns (out [N, FRAME, ch],
    carry).  The FSM step itself is `_make_limiter_step` — the same
    elementwise code the single-stream path scans — so slow-path results
    are bit-identical to sequential per-stream processing."""
    dtype = windows.dtype
    n, _, ch = windows.shape
    pk, pv, future = jax.vmap(lambda w: _precompute_peaks(w, target_tp))(windows)
    xs = windows[:, :FRAME]
    step = _make_limiter_step(target_tp, dtype)

    nb = FRAME // block
    assert nb * block == FRAME
    # [nb, block, N(, ch)] so the block axis scans and N rides the lanes
    xsb = jnp.moveaxis(xs, 0, 1).reshape(nb, block, n, ch)
    pkb = jnp.moveaxis(pk, 0, 1).reshape(nb, block, n)
    pvb = jnp.moveaxis(pv, 0, 1).reshape(nb, block, n)
    futb = jnp.moveaxis(future, 0, 1).reshape(nb, block, n)

    def blk(c, inp):
        xb, pb, vb, fb = inp
        idle = jnp.all(c[0] == ST_OUT) & ~jnp.any(pb)

        def fast(c):
            return c, xb

        def slow(c):
            return jax.lax.scan(step, c, (xb, pb, vb, fb))

        return jax.lax.cond(idle, fast, slow, c)

    def run_blocked(c):
        c, outb = jax.lax.scan(blk, c, (xsb, pkb, pvb, futb))
        return c, outb.reshape(FRAME, n, ch)

    def frame_fast(c):
        return c, jnp.moveaxis(xs, 0, 1)

    idle_frame = jnp.all(carry[0] == ST_OUT) & ~jnp.any(pk)
    new_carry, out = jax.lax.cond(idle_frame, frame_fast, run_blocked, carry)
    out = jnp.moveaxis(out, 0, 1)
    out = jnp.clip(out, -target_tp, target_tp)
    return out, new_carry


# ---------------------------------------------------------------------------
# Gain update per inner frame (imp.rs:526-608)
# ---------------------------------------------------------------------------
def _update_gain(state: LoudnormState, params: LoudnormParams) -> LoudnormState:
    rp = params.r128
    global_ = loudness_global(state.r128_in, rp)
    shortterm = loudness_shortterm(state.r128_in, rp)
    rel = energy_to_loudness(relative_threshold_energy(state.r128_in, rp))

    prev_delta = state.prev_delta
    above = state.above_threshold
    ramp = (~above) & (shortterm > -70.0)
    prev_delta = jnp.where(ramp, prev_delta * 1.0058, prev_delta)
    st_out = loudness_shortterm(state.r128_out, rp)
    above = above | ((~state.above_threshold) & (st_out >= params.target_i))

    env_diff = shortterm - global_
    env_global = jnp.where(
        jnp.abs(env_diff) < params.target_lra / 2.0,
        env_diff,
        jnp.where(env_diff < 0.0, -1.0, 1.0),
    )
    env_shortterm = params.target_i - shortterm
    new_delta = 10.0 ** ((env_global + env_shortterm) / 20.0)
    keep_prev = (shortterm < rel) | (shortterm <= -70.0) | (~above)
    d = jnp.where(keep_prev, prev_delta, new_delta)
    delta = state.delta.at[state.index].set(d)
    return state._replace(
        delta=delta,
        prev_delta=d,
        above_threshold=above,
        index=jnp.mod(state.index + 1, 30),
    )


# ---------------------------------------------------------------------------
# Frame steps
# ---------------------------------------------------------------------------
def _interp_gains(gain, gain_next, offset, n_total, dtype):
    n = jnp.arange(n_total, dtype=dtype)
    return (gain + (n / n_total) * (gain_next - gain)) * offset


def first_frame_step(state: LoudnormState, params: LoudnormParams, src):
    """Process the initial 3 s frame (imp.rs:368-442). src: [3 s, ch]."""
    dtype = src.dtype
    rp = params.r128
    r128_in = r128_add_full_subblocks(state.r128_in, rp, src)
    shortterm = loudness_shortterm(r128_in, rp)

    above = shortterm >= -70.0
    env_shortterm = jnp.where(above, params.target_i - shortterm, 0.0)
    d0 = 10.0 ** (env_shortterm / 20.0)
    delta = jnp.full((30,), d0, dtype)
    prev_delta = d0

    # scale the first 210 ms with the initial gain into the limiter window
    window = src[: FRAME + TAIL] * (prev_delta * state.offset)

    # first-frame limiter init (imp.rs:1335-1375): if the first 10 ms already
    # exceed the target, jump straight to sustain with the needed reduction
    mx = jnp.max(jnp.abs(window[: LIMITER_LOOKAHEAD + 1]))
    over = mx > params.target_tp
    lim_state = jnp.where(over, ST_SUSTAIN, ST_OUT).astype(jnp.int32)
    sustain_cnt = jnp.where(over, LIMITER_LOOKAHEAD, -1).astype(jnp.int32)
    gr1 = jnp.where(over, params.target_tp / jnp.where(mx > 0, mx, 1.0), 0.0)

    carry = (lim_state, jnp.asarray(0, jnp.int32), sustain_cnt, jnp.asarray(0.0, dtype), gr1)
    out, carry = _limiter_scan(window, carry, params.target_tp)

    r128_out = r128_add_full_subblocks(state.r128_out, rp, out)
    new_state = state._replace(
        backlog=src[FRAME + TAIL :],
        tail=window[FRAME:],
        delta=delta,
        prev_delta=prev_delta,
        above_threshold=above,
        lim_state=carry[0],
        env_cnt=carry[1],
        sustain_cnt=carry[2],
        gr0=carry[3],
        gr1=carry[4],
        r128_in=r128_in,
        r128_out=r128_out,
    )
    return new_state, out


def _scale_and_limit(state: LoudnormState, params: LoudnormParams, scale_src):
    """Common inner machinery: gain-interp scale_src (FRAME samples from the
    backlog), run the limiter over tail+scaled, return (state', out)."""
    dtype = scale_src.dtype
    gain = _gaussian_gain(state.delta, params.weights, jnp.mod(state.index + 10, 30))
    gain_next = _gaussian_gain(state.delta, params.weights, jnp.mod(state.index + 11, 30))
    gains = _interp_gains(gain, gain_next, state.offset, FRAME, dtype)
    scaled = scale_src * gains[:, None]
    window = jnp.concatenate([state.tail, scaled], axis=0)  # [FRAME+TAIL, ch]
    carry = (state.lim_state, state.env_cnt, state.sustain_cnt, state.gr0, state.gr1)
    out, carry = _limiter_scan(window, carry, params.target_tp)
    state = state._replace(
        tail=window[FRAME:],
        lim_state=carry[0],
        env_cnt=carry[1],
        sustain_cnt=carry[2],
        gr0=carry[3],
        gr1=carry[4],
    )
    return state, out


def _inner_frame_after_ingest(state: LoudnormState, params: LoudnormParams, src):
    """Inner-frame machinery after the r128_in input analysis: backlog
    shift, gain-interp + limiter, r128_out add, gain update.  This is the
    part of the frame chain that is SEQUENTIAL BY CONSTRUCTION: frame i's
    limiter output feeds r128_out, whose global loudness feeds frame i+1's
    delta (imp.rs:526-608) — a feedback loop through full-rate sample data
    that no time-sharding can cut without changing the output."""
    state, out = _scale_and_limit(state, params, src)
    state = state._replace(
        r128_out=r128_add_full_subblocks(state.r128_out, params.r128, out))
    state = _update_gain(state, params)
    return state, out


def inner_frame_step(state: LoudnormState, params: LoudnormParams, src):
    """Process one 100 ms inner frame (imp.rs:609-647). src: [FRAME, ch]."""
    rp = params.r128
    state = state._replace(r128_in=r128_add_full_subblocks(state.r128_in, rp, src))
    scale_src = state.backlog[:FRAME]
    state = state._replace(backlog=jnp.concatenate([state.backlog[FRAME:], src], axis=0))
    return _inner_frame_after_ingest(state, params, scale_src)


def first_frame_step_batched(state: LoudnormState, params: LoudnormParams, src):
    """N-stream first_frame_step: state leaves carry a leading [N] axis,
    src is [N, 3 s, ch].  Identical math to vmapping `first_frame_step`
    except the limiter goes through `_limiter_scan_batched`, whose idle
    fast path survives batching (see its docstring)."""
    dtype = src.dtype
    rp = params.r128
    vm = jax.vmap
    r128_in = vm(lambda r, s: r128_add_full_subblocks(r, rp, s))(state.r128_in, src)
    shortterm = vm(lambda r: loudness_shortterm(r, rp))(r128_in)

    above = shortterm >= -70.0
    env_shortterm = jnp.where(above, params.target_i - shortterm, 0.0)
    d0 = (10.0 ** (env_shortterm / 20.0)).astype(dtype)
    delta = jnp.broadcast_to(d0[:, None], (d0.shape[0], 30))
    prev_delta = d0

    window = src[:, : FRAME + TAIL] * (prev_delta * state.offset)[:, None, None]

    mx = jnp.max(jnp.abs(window[:, : LIMITER_LOOKAHEAD + 1]), axis=(1, 2))
    over = mx > params.target_tp
    lim_state = jnp.where(over, ST_SUSTAIN, ST_OUT).astype(jnp.int32)
    sustain_cnt = jnp.where(over, LIMITER_LOOKAHEAD, -1).astype(jnp.int32)
    gr1 = jnp.where(over, params.target_tp / jnp.where(mx > 0, mx, 1.0), 0.0).astype(dtype)

    n = src.shape[0]
    carry = (lim_state, jnp.zeros((n,), jnp.int32), sustain_cnt,
             jnp.zeros((n,), dtype), gr1)
    out, carry = _limiter_scan_batched(window, carry, params.target_tp)

    r128_out = vm(lambda r, o: r128_add_full_subblocks(r, rp, o))(state.r128_out, out)
    new_state = state._replace(
        backlog=src[:, FRAME + TAIL :],
        tail=window[:, FRAME:],
        delta=delta,
        prev_delta=prev_delta,
        above_threshold=above,
        lim_state=carry[0],
        env_cnt=carry[1],
        sustain_cnt=carry[2],
        gr0=carry[3],
        gr1=carry[4],
        r128_in=r128_in,
        r128_out=r128_out,
    )
    return new_state, out


def inner_frame_step_batched(state: LoudnormState, params: LoudnormParams, src):
    """N-stream inner_frame_step: state leaves carry a leading [N] axis,
    src is [N, FRAME, ch].  Bit-equal per stream to `inner_frame_step`
    (same elementwise ops; the only restructured part is the limiter, via
    `_limiter_scan_batched`)."""
    rp = params.r128
    vm = jax.vmap
    dtype = src.dtype
    state = state._replace(
        r128_in=vm(lambda r, s: r128_add_full_subblocks(r, rp, s))(state.r128_in, src))
    scale_src = state.backlog[:, :FRAME]
    state = state._replace(
        backlog=jnp.concatenate([state.backlog[:, FRAME:], src], axis=1))

    gain = vm(lambda d, i: _gaussian_gain(d, params.weights, jnp.mod(i + 10, 30)))(
        state.delta, state.index)
    gain_next = vm(lambda d, i: _gaussian_gain(d, params.weights, jnp.mod(i + 11, 30)))(
        state.delta, state.index)
    ns = jnp.arange(FRAME, dtype=dtype)
    gains = (gain[:, None] + (ns[None, :] / FRAME) * (gain_next - gain)[:, None]) \
        * state.offset[:, None]
    scaled = scale_src * gains[:, :, None]
    window = jnp.concatenate([state.tail, scaled], axis=1)

    carry = (state.lim_state, state.env_cnt, state.sustain_cnt, state.gr0, state.gr1)
    out, carry = _limiter_scan_batched(window, carry, params.target_tp)
    state = state._replace(
        tail=window[:, FRAME:],
        lim_state=carry[0],
        env_cnt=carry[1],
        sustain_cnt=carry[2],
        gr0=carry[3],
        gr1=carry[4],
    )
    state = state._replace(
        r128_out=vm(lambda r, o: r128_add_full_subblocks(r, rp, o))(state.r128_out, out))
    state = vm(lambda s: _update_gain(s, params))(state)
    return state, out


def final_append_step(state: LoudnormState, params: LoudnormParams, src):
    """One 100 ms drain step: scale the next backlog frame, append `src`
    (zero-padded partial input, or zeros) to the backlog, limit and output
    (imp.rs:697-779 loop body).  r128_in is NOT updated: a partial final
    frame never completes a 100 ms subblock (libebur128-equivalent)."""
    scale_src = state.backlog[:FRAME]
    state = state._replace(backlog=jnp.concatenate([state.backlog[FRAME:], src], axis=0))
    state, out = _scale_and_limit(state, params, scale_src)
    state = state._replace(r128_out=r128_add_full_subblocks(state.r128_out, params.r128, out))
    state = _update_gain(state, params)
    return state, out


def final_frame_step(state: LoudnormState, params: LoudnormParams):
    zeros = jnp.zeros((FRAME,) + state.backlog.shape[1:], state.backlog.dtype)
    return final_append_step(state, params, zeros)


def linear_gain_from_global(state: LoudnormState, params: LoudnormParams):
    """Gain for sub-3s streams (imp.rs:323-366): reach target unless the
    scaled peak would exceed max-true-peak."""
    rp = params.r128
    global_ = loudness_global(state.r128_in, rp)
    peak = jnp.max(state.r128_in.sample_peak)
    offset = 10.0 ** ((params.target_i - global_) / 20.0)
    offset_tp = peak * offset
    safe_peak = jnp.where(peak > 0, peak, 1.0)
    return jnp.where(offset_tp < params.target_tp, offset, params.target_tp / safe_peak)


def inner_frames_scan(state: LoudnormState, params: LoudnormParams, srcs):
    """Process K consecutive 100 ms frames in ONE device dispatch.

    srcs: [K, FRAME, ch].  The per-frame recurrence rides a lax.scan so the
    (multi-MB) state round-trips the dispatch boundary once per batch — the
    many-buffers-per-dispatch design SURVEY.md §7 calls for (and a hard
    requirement on relay-attached devices where chained dispatches are
    latency-bound)."""

    def step(s, src):
        return inner_frame_step(s, params, src)

    state, outs = jax.lax.scan(step, state, srcs)
    return state, outs


def inner_frames_scan_pre(state: LoudnormState, params: LoudnormParams,
                          srcs, energies, peaks):
    """`inner_frames_scan` with the r128_in input analysis PRECOMPUTED.

    The time-sharded streaming mode (parallel/timeshard.py
    sharded_kweight_frame_analysis) computes the K-weighted subblock
    energies and per-frame sample peaks of a whole chunk in parallel
    across the mesh; this scan then runs the sequential remainder of the
    frame chain (see _inner_frame_after_ingest) bit-comparably to the
    default path.  srcs: [K, FRAME, ch]; energies: [K]; peaks: [K, ch].
    r128_in.filt_z is NOT advanced here — the caller restores the sharded
    filter's exit state afterwards (loudnorm_set_filt_z)."""

    def step(s, inp):
        src, e, sp = inp
        s = s._replace(r128_in=r128_ingest_frame(s.r128_in, params.r128, e, sp))
        scale_src = s.backlog[:FRAME]
        s = s._replace(backlog=jnp.concatenate([s.backlog[FRAME:], src], axis=0))
        return _inner_frame_after_ingest(s, params, scale_src)

    state, outs = jax.lax.scan(step, state, (srcs, energies, peaks))
    return state, outs


def drain_scan(state: LoudnormState, params: LoudnormParams, padded_src):
    """Whole final-frame drain in one dispatch: append step + 29 zero-input
    steps (30 x 100 ms out; caller trims to 29*FRAME + num real samples)."""
    state, out0 = final_append_step(state, params, padded_src)

    def step(s, _):
        s, o = final_frame_step(s, params)
        return s, o

    state, outs = jax.lax.scan(step, state, None, length=29)
    return state, jnp.concatenate([out0[None], outs], axis=0)


# jitted entry points (module-level shared cache)
first_frame_step_jit = jax.jit(first_frame_step)
inner_frame_step_jit = jax.jit(inner_frame_step)
final_frame_step_jit = jax.jit(final_frame_step)
final_append_step_jit = jax.jit(final_append_step)
inner_frames_scan_jit = jax.jit(inner_frames_scan)
inner_frames_scan_pre_jit = jax.jit(inner_frames_scan_pre)
drain_scan_jit = jax.jit(drain_scan)


__all__ = [
    "FRAME",
    "GAIN_LOOKAHEAD",
    "LIMITER_ATTACK",
    "LIMITER_LOOKAHEAD",
    "LIMITER_RELEASE",
    "RATE",
    "TAIL",
    "BACKLOG",
    "LoudnormParams",
    "LoudnormState",
    "drain_scan",
    "drain_scan_jit",
    "final_append_step",
    "final_append_step_jit",
    "final_frame_step",
    "final_frame_step_jit",
    "inner_frames_scan",
    "inner_frames_scan_jit",
    "inner_frames_scan_pre_jit",
    "first_frame_step",
    "first_frame_step_jit",
    "gaussian_weights",
    "inner_frame_step",
    "inner_frame_step_jit",
    "linear_gain_from_global",
    "loudnorm_init",
    "loudnorm_params",
]
