"""Sequence parallelism: shard a long stream's TIME axis across the mesh.

SURVEY.md §2.3/§5: the reference's "long context" is unbounded streaming
time handled by windowed state; the TPU-native scale-out for one very long
stream is to shard the time axis across chips and exchange halos over ICI
for the window/lookahead overlaps (FIR taps, limiter lookahead).

`sharded_fir` runs an FIR convolution (the hrtf/sofalizer kernel class) over
a time-sharded signal with a ppermute halo exchange: every shard fetches the
previous shard's (taps-1)-sample tail, so the result is bit-identical to the
unsharded convolution while each chip only touches its local slice.
"""
from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:
    from jax import shard_map  # jax >= 0.8
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def sharded_fir(x, h, mesh: Mesh, axis: str = "time"):
    """Causal FIR of a time-sharded signal with ICI halo exchange.

    x: [N] (N divisible by mesh size), h: [T] taps.  Returns y[n] =
    sum_k h[k] * x[n-k] (zeros before the stream start), sharded like x."""
    T = int(h.shape[0])
    n_shards = mesh.shape[axis]

    def kernel(x_local, h_arr):
        # fetch the previous shard's tail as our left halo (zeros for shard 0)
        idx = jax.lax.axis_index(axis)
        tail = x_local[-(T - 1) :] if T > 1 else x_local[:0]
        perm = [(i, (i + 1) % n_shards) for i in range(n_shards)]
        halo = jax.lax.ppermute(tail, axis, perm)
        halo = jnp.where(idx == 0, jnp.zeros_like(halo), halo)
        ext = jnp.concatenate([halo, x_local])  # [(T-1) + local]
        y = jnp.convolve(ext, h_arr, mode="full")[T - 1 : T - 1 + x_local.shape[0]]
        return y

    fn = shard_map(
        kernel,
        mesh=mesh,
        in_specs=(P(axis), P()),
        out_specs=P(axis),
    )
    return fn(x, h)


def _shard_biquad(x_local, b, a, W, axis: str, s0=None, powers=None,
                  return_exit=False):
    """Exact biquad over ONE shard of a time-sharded signal.

    Two local blocked-IIR passes (ops/ebur128.biquad_apply — MXU matmul
    form) bracket one tiny collective: pass 1 computes this shard's exit
    state for a zero entry state, an all_gather shares every shard's exit
    state ([S, 2, ch] — bytes, rides ICI), and the exact entry state is
    reconstructed from the precomputed A^(L*j) powers (W[k, j] =
    A^(L*(k-1-j)) for j < k).  Pass 2 then filters with the true entry
    state.  The recurrence is linear, so this is exact (up to f.p.
    reassociation) — the TPU-native decomposition of an IIR that a
    sample-sequential port could never shard."""
    from ..ops.ebur128 import biquad_apply

    zeros = jnp.zeros((2,) + x_local.shape[1:], x_local.dtype)
    zeros = jax.lax.pvary(zeros, (axis,))  # varying carry for the local scan
    _, zf0 = biquad_apply(x_local, b, a, zeros)
    g = jax.lax.all_gather(zf0, axis)  # [S, 2, ch]
    k = jax.lax.axis_index(axis)
    Wk = jnp.take(jnp.asarray(W, x_local.dtype), k, axis=0)  # [S, 2, 2]
    s_in = jnp.einsum("jab,jbc->ac", Wk, g,
                      precision=jax.lax.Precision.HIGHEST)
    if s0 is not None:
        # continuing a longer stream: the chunk's entry state s0 propagates
        # into shard k as A^(L*k) @ s0 (powers[k]; linearity of the IIR)
        Pk = jnp.take(jnp.asarray(powers, x_local.dtype), k, axis=0)
        s_in = s_in + jnp.einsum("ab,bc->ac", Pk, s0,
                                 precision=jax.lax.Precision.HIGHEST)
    y, zf = biquad_apply(x_local, b, a, s_in)
    if return_exit:
        # per-shard pass-2 final state; the caller takes the LAST shard's
        # as the chunk exit (returned sharded — VMA cannot statically prove
        # an all_gather result replicated)
        return y, zf
    return y


def _entry_state_weights(a, L: int, n_shards: int):
    """Host-precomputed W[k, j] = A^(L*(k-1-j)) for j < k, else 0 (f64)."""
    import numpy as np

    _, a1, a2 = np.asarray(a, np.float64)
    A = np.array([[-a1, 1.0], [-a2, 0.0]])
    AL = np.linalg.matrix_power(A, L)
    pows = [np.eye(2)]
    for _ in range(n_shards - 1):
        pows.append(AL @ pows[-1])
    W = np.zeros((n_shards, n_shards, 2, 2))
    for k in range(n_shards):
        for j in range(k):
            W[k, j] = pows[k - 1 - j]
    return W


def _entry_powers(a, L: int, n_shards: int):
    """Host-precomputed A^(L*k) for k in [0, S) (f64) — the entry-state
    propagation matrices for a chunk that continues a longer stream."""
    import numpy as np

    _, a1, a2 = np.asarray(a, np.float64)
    A = np.array([[-a1, 1.0], [-a2, 0.0]])
    AL = np.linalg.matrix_power(A, L)
    pows = [np.eye(2)]
    for _ in range(n_shards - 1):
        pows.append(AL @ pows[-1])
    return np.stack(pows)


def sharded_kweight_frame_analysis(x, filt_z0, params, mesh: Mesh,
                                   n_frames: int, axis: str = "time"):
    """Phase A of the time-sharded STREAMING loudnorm: the input analysis
    of one chunk of `n_frames` 100 ms frames, parallel across the mesh.

    The streaming gain chain itself cannot be sharded without changing the
    output: frame i's limiter output feeds r128_out, whose global loudness
    feeds frame i+1's delta (imp.rs:526-608 — a feedback loop through
    full-rate sample data).  What IS parallel is everything the chain
    consumes about the INPUT: the K-weighting biquad cascade (exact
    blocked-IIR with all_gather state handoff, continuing the carried
    filter state `filt_z0` via A^(L*k) entry propagation), the per-frame
    K-weighted energy sums, and the per-frame sample peaks.  Phase B
    (ops/loudnorm.inner_frames_scan_pre) then scans the sequential
    remainder bit-comparably to the default path.

    x: [n_frames * FRAME, ch] with n_frames divisible by the mesh size;
    filt_z0: [2, 2, ch] carried K-filter state.  Returns
    (energies [n_frames], peaks [n_frames, ch], filt_z_exit [2, 2, ch]).
    """
    rp = params.r128
    n100 = rp.n100
    S = mesh.shape[axis]
    N = int(x.shape[0])
    if n_frames % S or N != n_frames * n100:
        raise ValueError(f"chunk of {n_frames} frames not shardable over {S}")
    L = N // S
    K_local = n_frames // S
    W1 = _entry_state_weights(rp.coeffs_a[0], L, S)
    W2 = _entry_state_weights(rp.coeffs_a[1], L, S)
    P1 = _entry_powers(rp.coeffs_a[0], L, S)
    P2 = _entry_powers(rp.coeffs_a[1], L, S)

    def kernel(x_local, z0, weights):
        y1, z1x = _shard_biquad(x_local, rp.coeffs_b[0], rp.coeffs_a[0],
                                W1, axis, s0=z0[0], powers=P1,
                                return_exit=True)
        y2, z2x = _shard_biquad(y1, rp.coeffs_b[1], rp.coeffs_a[1],
                                W2, axis, s0=z0[1], powers=P2,
                                return_exit=True)
        wsq = jnp.einsum("nc,c->n", y2 * y2, weights)
        e = jnp.sum(wsq.reshape(K_local, n100), axis=1)        # [K_local]
        sp = jnp.max(jnp.abs(x_local).reshape(K_local, n100, -1), axis=1)
        return e, sp, jnp.stack([z1x, z2x])[None]  # [1, 2, 2, ch] per shard

    fn = jax.jit(shard_map(
        kernel,
        mesh=mesh,
        in_specs=(P(axis), P(), P()),
        out_specs=(P(axis), P(axis), P(axis)),
    ))
    e, sp, zfs = fn(x, filt_z0, rp.weights)
    # zfs: [S, 2, 2, ch] per-shard exit states; the chunk's exit state is
    # the last shard's (its pass 2 ran with the true entry state)
    return e, sp, zfs[-1]


def sharded_loudnorm_linear(x, params, mesh: Mesh, n_valid_sb: int,
                            axis: str = "time"):
    """Whole-stream linear loudness normalization, time-sharded over a mesh.

    SURVEY.md §2.3 SP row / §5 long-context row at the algorithm level:
    ONE long stream's time axis is sharded across chips; every stage maps to
    the TPU-native collective it needs:

      * K-weighting biquad cascade — exact blocked-IIR with an all_gather
        state handoff (_shard_biquad); each chip filters only its slice.
      * 400 ms gating blocks (75 % overlap) — each shard ppermutes its last
        three 100 ms subblock energies to the next shard (the halo-exchange
        pattern of sharded_fir; the limiter's 10 ms lookahead window is the
        same exchange with samples instead of energies).
      * gating histogram — per-shard [1000]-bin histogram psum'd over the
        mesh (the north-star collective: BASELINE.json / SURVEY §2.3).
      * sample peak — masked local max + lax.pmax.
      * gain application — embarrassingly parallel on the sharded axis.

    Semantics: the audioloudnorm LINEAR frame type (reference
    audio/audiofx/src/audioloudnorm/imp.rs:323-366,781-816 — constant gain
    to target unless the scaled peak would exceed max-true-peak; no limiter
    FSM runs because the gain cap guarantees no overshoot).  Parity with
    ops/loudnorm.linear_gain_from_global is test-gated.

    x: [Npad, ch] zero-padded so Npad % (mesh_size * n100) == 0.
    n_valid_sb: number of measured 100 ms subblocks (the single-device path
    measures nfull = (N // n100) * n100 samples; padded subblocks and the
    partial tail are masked out of histogram and peak exactly like the
    reference's internal buffering).  Returns (y, gain, loudness) with y
    sharded like x and gain/loudness replicated.
    """
    from ..ops.ebur128 import HIST_BINS, _hist_index, energy_to_loudness

    rp = params.r128
    n100 = rp.n100
    S = mesh.shape[axis]
    Npad = int(x.shape[0])
    if Npad % (S * n100):
        raise ValueError(f"Npad={Npad} not a multiple of mesh*{n100}")
    L = Npad // S
    B_local = L // n100
    W1 = _entry_state_weights(rp.coeffs_a[0], L, S)
    W2 = _entry_state_weights(rp.coeffs_a[1], L, S)

    def kernel(x_local, weights, energies, boundaries, target_i, target_tp):
        k = jax.lax.axis_index(axis)
        # K-weighting cascade, exact across shard boundaries
        y1 = _shard_biquad(x_local, rp.coeffs_b[0], rp.coeffs_a[0], W1, axis)
        y2 = _shard_biquad(y1, rp.coeffs_b[1], rp.coeffs_a[1], W2, axis)
        wsq = jnp.einsum("nc,c->n", y2 * y2, weights)
        e = jnp.sum(wsq.reshape(B_local, n100), axis=1)  # [B_local]

        g_idx = k * B_local + jnp.arange(B_local)
        if B_local >= 3:
            # halo exchange: previous shard's last 3 subblock energies
            perm = [(i, (i + 1) % S) for i in range(S)]
            halo = jax.lax.ppermute(e[-3:], axis, perm)
            halo = jnp.where(k == 0, jnp.zeros_like(halo), halo)
            ext = jnp.concatenate([halo, e])  # [B_local + 3]
            me = (ext[0:B_local] + ext[1:B_local + 1] + ext[2:B_local + 2]
                  + ext[3:B_local + 3]) / (4.0 * n100)
        else:
            # shards hold < 3 subblocks (tiny stream on a big mesh): a
            # one-neighbor halo cannot span the 400 ms block — gather the
            # whole (10 floats/second) energy sequence instead
            flat = jax.lax.all_gather(e, axis).reshape(-1)  # [S * B_local]
            me = sum(jnp.take(flat, g_idx - d, mode="clip")
                     for d in (3, 2, 1, 0)) / (4.0 * n100)
        valid = (g_idx >= 3) & (g_idx < n_valid_sb) & (me >= boundaries[0])
        bi = _hist_index(me, boundaries)
        hist = jnp.zeros((HIST_BINS,), x_local.dtype).at[bi].add(
            jnp.where(valid, 1.0, 0.0))
        block_hist = jax.lax.psum(hist, axis)  # the gated-histogram psum

        # integrated loudness with absolute + relative gating
        # (ops/ebur128.loudness_global, replicated on every shard)
        total = jnp.sum(block_hist)
        mean_e = jnp.where(
            total > 0,
            jnp.sum(block_hist * energies) / jnp.maximum(total, 1.0), 0.0)
        rel_e = mean_e * 0.1
        start = jnp.searchsorted(boundaries[:HIST_BINS], rel_e,
                                 side="right") - 1
        start = jnp.clip(start, 0, HIST_BINS - 1)
        mask = jnp.arange(HIST_BINS) >= start
        cnt = jnp.sum(block_hist * mask)
        ge = jnp.sum(block_hist * energies * mask) / jnp.maximum(cnt, 1.0)
        global_ = jnp.where(cnt > 0, energy_to_loudness(ge), -jnp.inf)

        # sample peak over measured samples only
        s_idx = k * L + jnp.arange(L)
        sp_local = jnp.max(
            jnp.abs(x_local) * (s_idx < n_valid_sb * n100)[:, None])
        peak = jax.lax.pmax(sp_local, axis)

        # linear gain (ops/loudnorm.linear_gain_from_global)
        offset = 10.0 ** ((target_i - global_) / 20.0)
        offset_tp = peak * offset
        safe_peak = jnp.where(peak > 0, peak, 1.0)
        gain = jnp.where(offset_tp < target_tp, offset,
                         target_tp / safe_peak)
        return x_local * gain, gain, global_

    # ONE jitted program: without jit the shard_map body dispatches op by op,
    # which is latency-bound on relay-attached devices (PERF_NOTES).  The
    # compile caches per (Npad, n_valid_sb, mesh, dtype); Npad is already
    # bucketed to stride multiples by the caller's padding.
    fn = jax.jit(shard_map(
        kernel,
        mesh=mesh,
        in_specs=(P(axis), P(), P(), P(), P(), P()),
        out_specs=(P(axis), P(), P()),
    ))
    return fn(x, rp.weights, rp.energies, rp.boundaries,
              params.target_i, params.target_tp)


def sharded_block_loudness(x, mesh: Mesh, n100: int, axis: str = "time"):
    """Per-100ms-subblock energies of ONE long mono stream, time-sharded.

    Returns [N // n100] energy sums; with the time axis sharded the subblock
    reduction is embarrassingly parallel per shard (shards must hold whole
    subblocks: N/devices divisible by n100)."""

    def kernel(x_local):
        B = x_local.shape[0] // n100
        return jnp.sum((x_local * x_local).reshape(B, n100), axis=1)

    fn = shard_map(kernel, mesh=mesh, in_specs=(P(axis),), out_specs=P(axis))
    return fn(x)


__all__ = ["sharded_fir", "sharded_block_loudness", "sharded_loudnorm_linear",
           "sharded_kweight_frame_analysis"]
