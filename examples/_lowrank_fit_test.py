"""Fit-quality experiment for the low-rank colorlut (CPU only)."""
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")

from gst_plugins_rs_tpu.ops.colorlut_lowrank import fit_lowrank, cp_als, _reconstruct

S = 33
g = np.linspace(0, 1, S)
R, G, B = np.meshgrid(g, g, g, indexing="ij")  # note: axis0=z? build T[z,y,x,c]
# T[z,y,x,c]: x indexed by R-in. So R_in varies along axis 2.
Bz, Gy, Rx = np.meshgrid(g, g, g, indexing="ij")


def make_luts():
    luts = {}
    # identity
    luts["identity"] = np.stack([Rx, Gy, Bz], axis=-1)
    # lift/gamma/gain per channel (classic grade, separable)
    lift = np.array([0.02, 0.01, 0.05]); gain = np.array([1.05, 1.0, 0.92])
    gamma = np.array([0.95, 1.0, 1.1])
    luts["lgg"] = np.stack([
        np.clip(lift[i] + gain[i] * np.power(ch, gamma[i]), 0, 1)
        for i, ch in enumerate([Rx, Gy, Bz])], axis=-1)
    # teal-orange: saturation boost + cross-channel mix + shadow tint
    Y = 0.299 * Rx + 0.587 * Gy + 0.114 * Bz
    sat = 1.3
    r2 = np.clip(Y + sat * (Rx - Y) + 0.04 * (1 - Y) ** 2, 0, 1)
    g2 = np.clip(Y + sat * (Gy - Y) + 0.01, 0, 1)
    b2 = np.clip(Y + sat * (Bz - Y) + 0.06 * (1 - Y) ** 2 - 0.03 * Y, 0, 1)
    luts["teal_orange"] = np.stack([r2, g2, b2], axis=-1)
    # filmic s-curve + hue-dependent (non-separable, hard case)
    def scurve(v):
        return v * v * (3 - 2 * v)
    mx = np.maximum(np.maximum(Rx, Gy), Bz)
    mn = np.minimum(np.minimum(Rx, Gy), Bz)
    chroma = mx - mn
    luts["filmic_hue"] = np.stack([
        np.clip(scurve(Rx) + 0.08 * chroma * np.sin(6.28 * Gy), 0, 1),
        np.clip(scurve(Gy) - 0.05 * chroma * np.cos(6.28 * Bz), 0, 1),
        np.clip(scurve(Bz) + 0.06 * chroma * np.sin(6.28 * Rx), 0, 1)],
        axis=-1)
    # worst case: random smooth-ish (gaussian-filtered noise)
    rng = np.random.default_rng(0)
    noise = rng.standard_normal((S, S, S, 3))
    from scipy.ndimage import gaussian_filter
    sm = np.stack([gaussian_filter(noise[..., i], 3.0) for i in range(3)], -1)
    sm = (sm - sm.min()) / (sm.max() - sm.min())
    luts["smooth_noise"] = 0.7 * luts["identity"] + 0.3 * sm
    return luts


LSB = 1.0 / 255.0
for name, t in make_luts().items():
    flat = t.reshape(-1, 3).astype(np.float32)
    import time
    t0 = time.time()
    fit = fit_lowrank(flat, S, tolerance=2 * LSB)
    dt = time.time() - t0
    if fit is None:
        # show best achievable at max rank
        W, V, U, C = cp_als(t.astype(np.float64), 128, seed=0)
        err = np.abs(_reconstruct(W, V, U, C) - t).max()
        print(f"{name:14s} FAILED  best@128 err={err/LSB:.2f} LSB  ({dt:.1f}s)")
    else:
        print(f"{name:14s} rank={fit.U.shape[1]:3d}  err={fit.max_node_err/LSB:.2f} LSB  ({dt:.1f}s)")
