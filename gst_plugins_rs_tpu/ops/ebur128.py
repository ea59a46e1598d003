"""EBU R-128 / ITU-R BS.1770 loudness measurement engine.

Reimplements the `ebur128` crate (Rust port of libebur128) that the reference
outsources loudness math to (SURVEY.md §2.4; used by audioloudnorm +
ebur128level, audio/audiofx/Cargo.toml:18): K-weighting prefilter (2
biquads), 400 ms gated momentary blocks every 100 ms (first after 400 ms),
3 s short-term blocks every 1 s for LRA, histogram mode (1000 bins x 0.1 LU
from -70 LUFS, O(1) memory over infinite streams), absolute -70 LUFS +
relative -10 LU gating, LRA 10th..95th percentiles, sample peak and 4x/2x
polyphase true peak.

TPU-native design: the engine is PURE FUNCTIONAL device code — state is a
NamedTuple of arrays, every update is jit-able and can ride inside a
lax.scan carry (audioloudnorm runs the whole 100 ms frame loop on device).
The per-sample IIR prefilter runs as an associative scan (O(log N) depth, 2x2
state matrices on the VPU) instead of a scalar loop.
"""
from __future__ import annotations

import math
from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# Modes (bitflags like the crate)
# ---------------------------------------------------------------------------
MODE_M = 1 << 0
MODE_S = 1 << 1
MODE_I = 1 << 2
MODE_LRA = 1 << 3
MODE_SAMPLE_PEAK = 1 << 4
MODE_TRUE_PEAK = 1 << 5
MODE_HISTOGRAM = 1 << 6

HIST_BINS = 1000


# ---------------------------------------------------------------------------
# K-weighting filter design (BS.1770 pre-filter: shelving + RLB high-pass)
# ---------------------------------------------------------------------------
def k_weighting_coeffs(rate: int) -> Tuple[np.ndarray, np.ndarray]:
    """Return (b, a) for the two cascaded biquads, each [3] f64.

    Coefficients derived from the BS.1770 analog prototypes at any sample
    rate (same derivation as libebur128's filter init)."""
    # stage 1: high-shelf
    f0 = 1681.974450955533
    G = 3.999843853973347
    Q = 0.7071752369554196
    K = math.tan(math.pi * f0 / rate)
    Vh = 10.0 ** (G / 20.0)
    Vb = Vh**0.4996667741545416
    a0 = 1.0 + K / Q + K * K
    b1 = np.array(
        [
            (Vh + Vb * K / Q + K * K) / a0,
            2.0 * (K * K - Vh) / a0,
            (Vh - Vb * K / Q + K * K) / a0,
        ]
    )
    a1 = np.array([1.0, 2.0 * (K * K - 1.0) / a0, (1.0 - K / Q + K * K) / a0])

    # stage 2: high-pass (RLB)
    f0 = 38.13547087602444
    Q = 0.5003270373238773
    K = math.tan(math.pi * f0 / rate)
    a0 = 1.0 + K / Q + K * K
    b2 = np.array([1.0, -2.0, 1.0])
    a2 = np.array([1.0, 2.0 * (K * K - 1.0) / a0, (1.0 - K / Q + K * K) / a0])
    return np.stack([b1, b2]), np.stack([a1, a2])


def _pick_block(n: int, target: int = 2048) -> int:
    """Largest divisor of n that is <= target (static, trace-time)."""
    best = 1
    d = 1
    while d * d <= n:
        if n % d == 0:
            if d <= target:
                best = max(best, d)
            q = n // d
            if q <= target:
                best = max(best, q)
        d += 1
    return best


_BLOCK_MATS_CACHE: dict = {}


def _biquad_block_mats(b, a, block: int):
    """Precompute (host, f64) the blocked-IIR operator matrices.

    With state recurrence s[n] = A s[n-1] + Bv x[n], y[n] = C s[n-1] + b0 x[n]
    (A = [[-a1,1],[-a2,0]], Bv = [b1-a1*b0, b2-a2*b0], C = [1,0]):

      y_block = T @ x_block + S0 @ s_in       T: [B,B] lower Toeplitz
      s_out   = AB @ s_in  + G @ x_block      AB = A^B, G: [2,B]

    All powers computed exactly in f64 then cast — the recurrence over blocks
    is contractive (|eig(AB)| = r^B < 1), so f32 error does NOT accumulate,
    unlike a full-axis associative scan (which squares sub-noise tail entries
    of A^n into garbage for near-unit poles)."""
    b = np.asarray(b, np.float64)
    a = np.asarray(a, np.float64)
    key = (b.tobytes(), a.tobytes(), block)
    hit = _BLOCK_MATS_CACHE.get(key)
    if hit is not None:
        return hit
    b0, b1_, b2_ = b
    _, a1_, a2_ = a
    A = np.array([[-a1_, 1.0], [-a2_, 0.0]])
    Bv = np.array([b1_ - a1_ * b0, b2_ - a2_ * b0])
    # powers A^0 .. A^block
    pows = [np.eye(2)]
    for _ in range(block):
        pows.append(A @ pows[-1])
    f = np.array([(p @ Bv)[0] for p in pows])  # f[m] = C A^m Bv
    T = np.zeros((block, block))
    idx = np.arange(block)
    T[idx, idx] = b0
    for n in range(1, block):
        T[n, :n] = f[n - 1 - np.arange(n)]  # row n: [f[n-1], ..., f[0]]
    S0 = np.stack([pows[n][0, :] for n in range(block)])  # [B, 2]
    G = np.stack([pows[block - 1 - k] @ Bv for k in range(block)], axis=1)  # [2, B]
    AB = pows[block]
    out = (T, S0, G, AB)
    _BLOCK_MATS_CACHE[key] = out
    return out


def biquad_apply(x, b, a, zi, block_target: int = 512):
    """Apply one biquad along the leading axis (blocked-IIR matmul form).

    x: [N, ch]; zi: [2, ch] direct-form-II-transposed state.  Per block the
    output is one [B,B]x[B,ch] matmul (MXU) plus tiny state terms; blocks
    advance via lax.scan.  Matmuls run at HIGHEST precision — bf16 MXU passes
    would reintroduce the instability this formulation removes."""
    N = x.shape[0]
    dtype = x.dtype
    block = _pick_block(N, block_target)
    T, S0, G, AB = _biquad_block_mats(np.asarray(b), np.asarray(a), block)
    Tj = jnp.asarray(T, dtype)
    S0j = jnp.asarray(S0, dtype)
    Gj = jnp.asarray(G, dtype)
    ABj = jnp.asarray(AB, dtype)
    hp = jax.lax.Precision.HIGHEST

    nb = N // block
    xb = x.reshape((nb, block) + x.shape[1:])

    def step(s, xi):
        y = jnp.dot(Tj, xi, precision=hp) + jnp.dot(S0j, s, precision=hp)
        s_next = jnp.dot(ABj, s, precision=hp) + jnp.dot(Gj, xi, precision=hp)
        return s_next, y

    zf, yb = jax.lax.scan(step, zi, xb)
    return yb.reshape(x.shape), zf


def _biquad_assoc(x, b, a, zi):
    b0, b1_, b2_ = b[0], b[1], b[2]
    a1_, a2_ = a[1], a[2]
    dtype = x.dtype
    N = x.shape[0]

    # 2x2 matrix elements carried explicitly (VPU elementwise math — MXU
    # bf16 matmul precision makes the near-unit-pole high-pass blow up)
    def bc(v):
        return jnp.broadcast_to(jnp.asarray(v, dtype), (N,) + x.shape[1:])

    m11, m12 = bc(-a1_), bc(1.0)
    m21, m22 = bc(-a2_), bc(0.0)
    v1 = (b1_ - a1_ * b0) * x
    v2 = (b2_ - a2_ * b0) * x

    def combine(left, right):
        l11, l12, l21, l22, lv1, lv2 = left
        r11, r12, r21, r22, rv1, rv2 = right
        # result = right ∘ left : M = R @ L ; v = R @ lv + rv
        n11 = r11 * l11 + r12 * l21
        n12 = r11 * l12 + r12 * l22
        n21 = r21 * l11 + r22 * l21
        n22 = r21 * l12 + r22 * l22
        nv1 = r11 * lv1 + r12 * lv2 + rv1
        nv2 = r21 * lv1 + r22 * lv2 + rv2
        return n11, n12, n21, n22, nv1, nv2

    c11, c12, c21, c22, cv1, cv2 = jax.lax.associative_scan(
        combine, (m11, m12, m21, m22, v1, v2), axis=0
    )
    s0_1, s0_2 = zi[0], zi[1]
    s1 = c11 * s0_1 + c12 * s0_2 + cv1  # [N, ...]
    s2 = c21 * s0_1 + c22 * s0_2 + cv2
    s1_prev = jnp.concatenate([s0_1[None], s1[:-1]], axis=0)
    y = s1_prev + b0 * x
    zf = jnp.stack([s1[-1], s2[-1]])
    return y, zf


def k_filter_apply(x, coeffs_b, coeffs_a, zi):
    """Apply the 2-stage K-weighting cascade. x: [N, ch]; zi: [2, 2, ch]."""
    y1, z1 = biquad_apply(x, coeffs_b[0], coeffs_a[0], zi[0])
    y2, z2 = biquad_apply(y1, coeffs_b[1], coeffs_a[1], zi[1])
    return y2, jnp.stack([z1, z2])


# ---------------------------------------------------------------------------
# Channel weights
# ---------------------------------------------------------------------------
def channel_weights(positions: Sequence[str]) -> np.ndarray:
    """BS.1770 weights: 1.0 front/mono/side, 1.41 rear, 0 for LFE/none."""
    w = []
    for p in positions:
        name = getattr(p, "value", p)
        if name in ("lfe1", "lfe2", "none", "unused"):
            w.append(0.0)
        elif name in ("rear-left", "rear-right", "rear-center", "surround-left", "surround-right"):
            w.append(1.41)
        else:
            w.append(1.0)
    return np.asarray(w, np.float64)


# ---------------------------------------------------------------------------
# Histogram helpers (libebur128 layout: bin i covers [-70 + i/10 LUFS, +0.1))
# ---------------------------------------------------------------------------
def _hist_constants(dtype):
    i = np.arange(HIST_BINS)
    energies = 10.0 ** ((i / 10.0 - 69.95 + 0.691) / 10.0)
    boundaries = 10.0 ** ((np.arange(HIST_BINS + 1) / 10.0 - 70.0 + 0.691) / 10.0)
    return jnp.asarray(energies, dtype), jnp.asarray(boundaries, dtype)


def energy_to_loudness(e):
    return -0.691 + 10.0 * jnp.log10(jnp.maximum(e, 1e-70))


def _hist_index(energy, boundaries):
    """Bin index for an energy above boundaries[0]."""
    # loudness-linear layout permits direct computation
    l = -0.691 + 10.0 * jnp.log10(jnp.maximum(energy, 1e-70))
    idx = jnp.floor((l + 70.0) * 10.0).astype(jnp.int32)
    return jnp.clip(idx, 0, HIST_BINS - 1)


# ---------------------------------------------------------------------------
# State
# ---------------------------------------------------------------------------
class R128State(NamedTuple):
    filt_z: jnp.ndarray  # [2, 2, ch] biquad states
    subblocks: jnp.ndarray  # [30] ring of 100 ms energy sums (w*y^2 summed)
    sb_count: jnp.ndarray  # i32 total 100 ms subblocks seen
    st_counter: jnp.ndarray  # i32 subblocks since last short-term insert
    block_hist: jnp.ndarray  # [1000] momentary 400 ms block counts
    st_hist: jnp.ndarray  # [1000] short-term 3 s block counts
    sample_peak: jnp.ndarray  # [ch] (all-time max)
    prev_sample_peak: jnp.ndarray  # [ch] (last call)
    true_peak: jnp.ndarray  # [ch]
    prev_true_peak: jnp.ndarray  # [ch]
    tp_tail: jnp.ndarray  # [taps-1, ch] true-peak interpolator history


@jax.tree_util.register_pytree_node_class
class R128Params:
    """Engine parameters.  Array fields are pytree leaves (traced); n100 and
    tp_factor ride as static aux data so module-level jits cache across
    engine instances (array shapes are rate-independent)."""

    def __init__(self, coeffs_b, coeffs_a, weights, energies, boundaries, tp_filter, n100, tp_factor):
        # filter coefficients are STATIC (rate-derived): the blocked-IIR
        # operator matrices are precomputed from concrete values at trace time
        self.coeffs_b = tuple(map(tuple, np.asarray(coeffs_b, np.float64)))  # ((3,), (3,))
        self.coeffs_a = tuple(map(tuple, np.asarray(coeffs_a, np.float64)))
        self.weights = weights  # [ch]
        self.energies = energies  # [1000] histogram bin centers
        self.boundaries = boundaries  # [1001]
        self.tp_filter = tp_filter  # [factor, taps] polyphase FIR (or [1,1])
        self.n100 = n100  # samples per 100 ms subblock (static)
        self.tp_factor = tp_factor  # oversample factor (static)

    def tree_flatten(self):
        children = (self.weights, self.energies, self.boundaries, self.tp_filter)
        return children, (self.n100, self.tp_factor, self.coeffs_b, self.coeffs_a)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(aux[2], aux[3], *children, n100=aux[0], tp_factor=aux[1])


TP_TAPS = 49


def _true_peak_filter(factor: int, dtype=np.float64) -> np.ndarray:
    """Windowed-sinc polyphase interpolator (taps=49, Hann), like libebur128."""
    taps = TP_TAPS
    m = np.arange(taps) - (taps - 1) / 2.0
    with np.errstate(invalid="ignore"):
        sinc = np.where(m == 0, 1.0, np.sin(m * np.pi / factor) / (m * np.pi / factor))
    win = 0.5 * (1.0 + np.cos(2.0 * np.pi * m / (taps - 1)))
    h = sinc * win
    # polyphase split: output phase p uses taps h[p], h[p+factor], ...
    ntap_per_phase = int(np.ceil(taps / factor))
    poly = np.zeros((factor, ntap_per_phase), dtype)
    for i in range(taps):
        poly[i % factor, i // factor] = h[i]
    return poly


def r128_params(rate: int, positions: Sequence[str], dtype=jnp.float64) -> R128Params:
    b, a = k_weighting_coeffs(rate)
    energies, boundaries = _hist_constants(dtype)
    if rate < 96000:
        factor = 4
    elif rate < 192000:
        factor = 2
    else:
        factor = 1
    tp = _true_peak_filter(factor) if factor > 1 else np.ones((1, 1))
    return R128Params(
        coeffs_b=b,
        coeffs_a=a,
        weights=jnp.asarray(channel_weights(positions), dtype),
        energies=energies,
        boundaries=boundaries,
        tp_filter=jnp.asarray(tp, dtype),
        n100=rate // 10,
        tp_factor=factor,
    )


def r128_init(params: R128Params, channels: int, dtype=jnp.float64) -> R128State:
    taps_per_phase = params.tp_filter.shape[1]
    return R128State(
        filt_z=jnp.zeros((2, 2, channels), dtype),
        subblocks=jnp.zeros((30,), dtype),
        sb_count=jnp.zeros((), jnp.int32),
        st_counter=jnp.zeros((), jnp.int32),
        block_hist=jnp.zeros((HIST_BINS,), dtype),
        st_hist=jnp.zeros((HIST_BINS,), dtype),
        sample_peak=jnp.zeros((channels,), dtype),
        prev_sample_peak=jnp.zeros((channels,), dtype),
        true_peak=jnp.zeros((channels,), dtype),
        prev_true_peak=jnp.zeros((channels,), dtype),
        tp_tail=jnp.zeros((taps_per_phase - 1, channels), dtype),
    )


# ---------------------------------------------------------------------------
# Processing
# ---------------------------------------------------------------------------
def r128_update_peaks(state: R128State, params: R128Params, x, first=True) -> R128State:
    """Update sample/true peaks with a chunk of input.  `first` (traced bool)
    marks the first chunk of an add_frames call: prev_* peaks reset then and
    accumulate with max over subsequent chunks of the same call."""
    sp = jnp.max(jnp.abs(x), axis=0)
    if params.tp_factor == 1:
        tp = sp
        tail = state.tp_tail
    else:
        hist_len = state.tp_tail.shape[0]
        ext = jnp.concatenate([state.tp_tail, x], axis=0)  # [hist+N, ch]
        # polyphase: each phase p output = conv(x, poly[p]); true peak = max |.|
        windows = jnp.stack(
            [jax.lax.dynamic_slice_in_dim(ext, i, x.shape[0]) for i in range(hist_len + 1)], axis=1
        )  # [N, taps_pp, ch] (windows[n, j] = ext[n + j])
        # phase output at sample n: sum_j poly[p, j] * x[n - j] — use reversed taps
        tapsf = params.tp_filter[:, ::-1]  # [factor, taps_pp]
        ups = jnp.einsum("pj,njc->npc", tapsf, windows)
        tp = jnp.max(jnp.abs(ups), axis=(0, 1))
        tail = ext[ext.shape[0] - hist_len :]
    first = jnp.asarray(first)
    prev_sp = jnp.where(first, sp, jnp.maximum(state.prev_sample_peak, sp))
    prev_tp = jnp.where(first, tp, jnp.maximum(state.prev_true_peak, tp))
    return state._replace(
        sample_peak=jnp.maximum(state.sample_peak, sp),
        prev_sample_peak=prev_sp,
        true_peak=jnp.maximum(state.true_peak, tp),
        prev_true_peak=prev_tp,
        tp_tail=tail,
    )


def _ingest_subblock_energies(state: R128State, params: R128Params, e):
    """Scan over [B] new 100 ms subblock energy sums, updating ring + hists."""

    def step(carry, ei):
        subblocks, sb_count, st_counter, block_hist, st_hist = carry
        subblocks = jnp.roll(subblocks, -1).at[-1].set(ei)
        sb_count = sb_count + 1
        st_counter = st_counter + 1

        # momentary 400 ms gating block (valid once >= 4 subblocks)
        me = jnp.sum(subblocks[-4:]) / (4.0 * params.n100)
        m_valid = (sb_count >= 4) & (me >= params.boundaries[0])
        bi = _hist_index(me, params.boundaries)
        block_hist = block_hist.at[bi].add(jnp.where(m_valid, 1.0, 0.0))

        # short-term 3 s block: first at 30 subblocks, then every 10 (1 s)
        st_fire = st_counter >= 30
        se = jnp.sum(subblocks) / (30.0 * params.n100)
        s_valid = st_fire & (se >= params.boundaries[0])
        si = _hist_index(se, params.boundaries)
        st_hist = st_hist.at[si].add(jnp.where(s_valid, 1.0, 0.0))
        st_counter = jnp.where(st_fire, 20, st_counter)

        return (subblocks, sb_count, st_counter, block_hist, st_hist), None

    carry = (state.subblocks, state.sb_count, state.st_counter, state.block_hist, state.st_hist)
    carry, _ = jax.lax.scan(step, carry, e)
    subblocks, sb_count, st_counter, block_hist, st_hist = carry
    return state._replace(
        subblocks=subblocks,
        sb_count=sb_count,
        st_counter=st_counter,
        block_hist=block_hist,
        st_hist=st_hist,
    )


def r128_ingest_frame(state: R128State, params: R128Params, e, sp) -> R128State:
    """Ingest ONE 100 ms subblock whose K-weighted energy sum `e` (scalar)
    and per-channel sample peak `sp` [ch] were precomputed by the
    time-sharded analysis path (parallel/timeshard.py phase A).

    Equivalent to `r128_add_full_subblocks` on the frame except: filt_z is
    NOT touched (the sharded filter carries it across chunks and hands the
    exit state back at chunk end), and true peak is NOT updated (loudnorm
    never consumes it — the reference's linear mode reads sample peak only,
    audio/audiofx/src/audioloudnorm/imp.rs:333-340)."""
    state = state._replace(
        sample_peak=jnp.maximum(state.sample_peak, sp),
        prev_sample_peak=sp,
    )
    return _ingest_subblock_energies(state, params, e[None])


def r128_add_full_subblocks(state: R128State, params: R128Params, x) -> R128State:
    """Process x: [B * n100, ch] (whole number of 100 ms subblocks).

    K-weights the audio, accumulates per-subblock energies, updates the
    gating histograms and the sample/true peaks."""
    n100 = params.n100
    B = x.shape[0] // n100
    state = r128_update_peaks(state, params, x, first=True)
    y, filt_z = k_filter_apply(x, params.coeffs_b, params.coeffs_a, state.filt_z)
    wsq = jnp.einsum("nc,c->n", y * y, params.weights)
    e = jnp.sum(wsq.reshape(B, n100), axis=1)  # [B] energy sums
    state = state._replace(filt_z=filt_z)
    return _ingest_subblock_energies(state, params, e)


# ---------------------------------------------------------------------------
# Queries (pure, device-side)
# ---------------------------------------------------------------------------
def loudness_momentary(state: R128State, params: R128Params):
    e = jnp.sum(state.subblocks[-4:]) / (4.0 * params.n100)
    return energy_to_loudness(e)


def loudness_shortterm(state: R128State, params: R128Params):
    # full 3 s window, zero-padded before 3 s of input (libebur128 ring
    # semantics: early queries average over the whole window)
    e = jnp.sum(state.subblocks) / (30.0 * params.n100)
    return energy_to_loudness(e)


def relative_threshold_energy(state: R128State, params: R128Params):
    total = jnp.sum(state.block_hist)
    mean_e = jnp.where(
        total > 0, jnp.sum(state.block_hist * params.energies) / jnp.maximum(total, 1.0), 0.0
    )
    return mean_e * 0.1  # -10 LU


def loudness_global(state: R128State, params: R128Params):
    """Integrated loudness with absolute (-70) + relative (-10 LU) gating."""
    rel_e = relative_threshold_energy(state, params)
    start = jnp.searchsorted(params.boundaries[:HIST_BINS], rel_e, side="right") - 1
    start = jnp.clip(start, 0, HIST_BINS - 1)
    mask = jnp.arange(HIST_BINS) >= start
    cnt = jnp.sum(state.block_hist * mask)
    e = jnp.sum(state.block_hist * params.energies * mask) / jnp.maximum(cnt, 1.0)
    return jnp.where(cnt > 0, energy_to_loudness(e), -jnp.inf)


def loudness_range(state: R128State, params: R128Params):
    """LRA: 10th..95th percentile of relative-gated (-20 LU) short-term."""
    hist = state.st_hist
    total = jnp.sum(hist)
    power = jnp.sum(hist * params.energies) / jnp.maximum(total, 1.0)
    rel_e = power * (10.0 ** (-20.0 / 10.0))
    start = jnp.searchsorted(params.boundaries[:HIST_BINS], rel_e, side="right") - 1
    start = jnp.clip(start, 0, HIST_BINS - 1)
    mask = jnp.arange(HIST_BINS) >= start
    gated = hist * mask
    n = jnp.sum(gated)
    cums = jnp.cumsum(gated)
    p_low = (n - 1.0) * 0.10 + 0.5
    p_high = (n - 1.0) * 0.95 + 0.5
    low_bin = jnp.argmax(cums > p_low)
    high_bin = jnp.argmax(cums > p_high)
    lra = energy_to_loudness(params.energies[high_bin]) - energy_to_loudness(
        params.energies[low_bin]
    )
    return jnp.where((total > 0) & (n > 0), lra, 0.0)


def merged_loudness_global(states_batched: R128State, params: R128Params):
    """Integrated loudness of MANY streams measured as ONE logical program.

    states_batched: an R128State whose leaves carry a leading stream axis
    (e.g. a parallel.StreamBank of analyzers).  The gated-block histograms
    are summed over the stream axis — when that axis is sharded over a
    jax.sharding.Mesh, XLA lowers the reduction to a psum over ICI (the
    SURVEY.md §2.3/§5 north-star collective) — and the absolute+relative
    gating then runs once on the merged histogram."""
    merged_hist = jnp.sum(states_batched.block_hist, axis=0)
    merged = states_batched._replace(block_hist=merged_hist)
    return loudness_global(merged, params)


# module-level jits: shared cache across all engine instances
_jit_add_full_subblocks = jax.jit(r128_add_full_subblocks)
_jit_update_peaks = jax.jit(r128_update_peaks)


@jax.jit
def _jit_queries(state, params):
    """All scalar queries in one compiled program (one device round-trip)."""
    return (
        loudness_momentary(state, params),
        loudness_shortterm(state, params),
        loudness_global(state, params),
        energy_to_loudness(relative_threshold_energy(state, params)),
        loudness_range(state, params),
        state.sample_peak,
        jnp.maximum(state.true_peak, state.sample_peak),
        state.prev_sample_peak,
        jnp.maximum(state.prev_true_peak, state.prev_sample_peak),
    )


# ---------------------------------------------------------------------------
# Host-side streaming wrapper (ebur128level uses this; loudnorm composes the
# pure functions directly inside its device scan)
# ---------------------------------------------------------------------------
class EbuR128:
    """Streaming host wrapper holding device state + a frame remainder."""

    def __init__(self, channels: int, rate: int, positions: Optional[Sequence] = None, dtype=None):
        from ..core.audio import default_channel_positions

        if dtype is None:
            dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
        self.channels = channels
        self.rate = rate
        self.dtype = dtype
        positions = positions or default_channel_positions(channels)
        self.params = r128_params(rate, positions, dtype)
        self.state = r128_init(self.params, channels, dtype)
        self._rem = jnp.zeros((0, channels), dtype)
        self._process = _jit_add_full_subblocks
        self._qcache = None
        self._qcache_state = None

    def add_frames(self, x) -> None:
        """Feed frames.  Loudness, histograms AND peaks advance on the 100 ms
        subblock grid (a trailing partial subblock is buffered; peaks can
        therefore lag the raw input by <100 ms until the block completes —
        message intervals that are multiples of 100 ms match libebur128)."""
        x = jnp.asarray(x, self.dtype)
        buf = jnp.concatenate([self._rem, x], axis=0) if self._rem.shape[0] else x
        n100 = self.params.n100
        # fixed-size buckets (10 subblocks, then 1) -> only two compiled shapes
        pos = 0
        avail = buf.shape[0]
        for bucket in (10 * n100, n100):
            while avail - pos >= bucket:
                self.state = self._process(self.state, self.params, buf[pos : pos + bucket])
                pos += bucket
        self._rem = buf[pos:]

    # queries --------------------------------------------------------------
    def _q(self):
        """One compiled program + one host readback for all query scalars."""
        if self._qcache_state is not self.state:
            self._qcache = jax.device_get(_jit_queries(self.state, self.params))
            self._qcache_state = self.state
        return self._qcache

    def loudness_momentary(self) -> float:
        return float(self._q()[0])

    def loudness_shortterm(self) -> float:
        return float(self._q()[1])

    def loudness_global(self) -> float:
        return float(self._q()[2])

    def relative_threshold(self) -> float:
        return float(self._q()[3])

    def loudness_range(self) -> float:
        return float(self._q()[4])

    def sample_peak(self, ch: int) -> float:
        return float(self._q()[5][ch])

    def true_peak(self, ch: int) -> float:
        return float(self._q()[6][ch])

    def prev_sample_peak(self, ch: int) -> float:
        return float(self._q()[7][ch])

    def prev_true_peak(self, ch: int) -> float:
        return float(self._q()[8][ch])

    def reset(self) -> None:
        self.state = r128_init(self.params, self.channels, self.dtype)
        self._rem = jnp.zeros((0, self.channels), self.dtype)
        self._qcache_state = None


__all__ = [
    "MODE_M",
    "MODE_S",
    "MODE_I",
    "MODE_LRA",
    "MODE_SAMPLE_PEAK",
    "MODE_TRUE_PEAK",
    "MODE_HISTOGRAM",
    "EbuR128",
    "R128Params",
    "R128State",
    "biquad_apply",
    "channel_weights",
    "energy_to_loudness",
    "k_filter_apply",
    "k_weighting_coeffs",
    "loudness_global",
    "loudness_momentary",
    "loudness_range",
    "loudness_shortterm",
    "merged_loudness_global",
    "r128_add_full_subblocks",
    "r128_ingest_frame",
    "r128_init",
    "r128_params",
    "r128_update_peaks",
    "relative_threshold_energy",
]
