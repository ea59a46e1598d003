"""Tensor (model) parallelism for the YOLOX zoo: pjit-shard one forward
pass over a device mesh by partitioning every conv's OUTPUT-CHANNEL axis.

SURVEY §2.3 maps the reference's device offload row to "shard model across
TPU mesh with pjit if needed (YOLOX-X)" — the zoo is defined in
/root/reference/analytics/burn/src/yolox_burn/model/yolox.rs:40-222 (nano..x,
width multipliers 0.25..1.25).  The reference (burn/wgpu) never runs one
model across GPUs; here the sharding is a NamedSharding pytree over the flax
variables and XLA/GSPMD inserts the collectives:

- conv kernels [kh, kw, cin, cout]: PartitionSpec(None, None, None, "tp") —
  each device computes cout/n output channels of every conv (the MXU tiles
  stay dense; only the channel axis splits);
- the matching 1-d per-channel arrays (bias, BN scale/bias/mean/var):
  PartitionSpec("tp");
- activations: left unconstrained — GSPMD keeps them channel-sharded
  between back-to-back convs and all-gathers the channel axis exactly where
  a conv needs its full input depth (the cin axis of the next kernel is
  unsharded), which is the classical tensor-parallel conv schedule.

Arrays whose channel count does not divide the mesh axis (e.g. the
85-channel head output at n=8) stay replicated — correctness first, the
big dark3..dark5 convs (up to 1280 channels on X) carry the parallelism.

When to use: TP pays off only when ONE image's latency matters more than
throughput, or when the model's weights don't fit a single chip (YOLOX-X
bf16 weights are ~200 MB — they fit easily, so for this zoo DATA
parallelism over streams/batch is virtually always the better mapping; see
PERF_NOTES "model-parallel YOLOX").  The element surface is
yoloxinference `shard-mode=tensor` (elements/analytics/yoloxinference.py).
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def yolox_tp_shardings(variables: Dict[str, Any], mesh: Mesh,
                       axis: str = "tp"):
    """NamedSharding pytree for a YOLOX variables dict: output-channel
    sharding on every conv kernel + matching per-channel vectors."""
    n = mesh.shape[axis]

    def spec_for(path_leaf: jax.Array):
        shape = np.shape(path_leaf)
        if len(shape) == 4 and shape[3] % n == 0:
            return NamedSharding(mesh, P(None, None, None, axis))
        if len(shape) == 1 and shape[0] % n == 0:
            return NamedSharding(mesh, P(axis))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(spec_for, variables)


def shard_yolox_variables(variables: Dict[str, Any], mesh: Mesh,
                          axis: str = "tp"):
    """device_put the variables with tensor-parallel shardings."""
    shardings = yolox_tp_shardings(variables, mesh, axis)
    return jax.tree_util.tree_map(jax.device_put, variables, shardings)


def apply_tp(model, variables: Dict[str, Any], x, mesh: Mesh,
             axis: str = "tp", *, shard_variables: bool = True):
    """One tensor-parallel forward: weights channel-sharded over `axis`,
    input replicated, output gathered to a replicated array.

    Returns (out, sharded_variables); reuse the sharded variables across
    calls to avoid re-distributing the weights.
    """
    if shard_variables:
        variables = shard_yolox_variables(variables, mesh, axis)

    @jax.jit
    def fwd(v, img):
        out = model.apply(v, img)
        return jax.lax.with_sharding_constraint(out, NamedSharding(mesh, P()))

    with mesh:
        out = fwd(variables, jax.device_put(x, NamedSharding(mesh, P())))
    return out, variables


__all__ = ["yolox_tp_shardings", "shard_yolox_variables", "apply_tp"]
