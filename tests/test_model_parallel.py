"""Tensor-parallel YOLOX forward on the virtual 8-device CPU mesh
(VERDICT r4 #5: the last unexercised SURVEY §2.3 mapping — "shard model
across TPU mesh with pjit if needed (YOLOX-X)",
/root/reference/analytics/burn/src/yolox_burn/model/yolox.rs:40-222)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from gst_plugins_rs_tpu.models.yolox import Yolox
from gst_plugins_rs_tpu.parallel.modelparallel import (
    apply_tp,
    shard_yolox_variables,
    yolox_tp_shardings,
)


def _mesh(n=8):
    devs = jax.devices()
    if len(devs) < n:
        pytest.skip(f"need {n} devices, have {len(devs)}")
    return Mesh(np.array(devs[:n]), ("tp",))


def _model_and_input(variant="s", size=64, classes=8):
    model = Yolox.from_variant(variant, num_classes=classes)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randint(0, 256, (2, size, size, 3), np.uint8))
    variables = model.init(jax.random.PRNGKey(0), x)
    return model, variables, x


def test_tp_shardings_partition_conv_channels():
    mesh = _mesh()
    model, variables, x = _model_and_input()
    sh = yolox_tp_shardings(variables, mesh)
    kernels = [
        (np.shape(leaf), s.spec)
        for leaf, s in zip(jax.tree_util.tree_leaves(variables),
                           jax.tree_util.tree_leaves(sh))
        if np.ndim(leaf) == 4
    ]
    assert kernels
    sharded = [spec for shape, spec in kernels if shape[3] % 8 == 0]
    # every divisible conv kernel is channel-sharded
    assert sharded and all(spec == P(None, None, None, "tp")
                           for spec in sharded)
    # the overwhelming majority of conv output channels divide the mesh
    assert len(sharded) >= 0.9 * len(kernels)


def test_tp_forward_parity_with_single_device():
    """The tensor-parallel forward must equal the single-device forward."""
    mesh = _mesh()
    model, variables, x = _model_and_input()
    ref = model.apply(variables, x)
    out, _ = apply_tp(model, variables, x, mesh)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_tp_weights_are_actually_distributed():
    """Each device holds 1/n of a channel-sharded kernel, not a replica."""
    mesh = _mesh()
    model, variables, x = _model_and_input()
    sharded = shard_yolox_variables(variables, mesh)
    k = sharded["params"]["backbone"]["backbone"]["dark3"]["conv"]["conv"]["kernel"]
    assert k.sharding.spec == P(None, None, None, "tp")
    n = mesh.shape["tp"]
    shard_shapes = {s.data.shape for s in k.addressable_shards}
    assert shard_shapes == {k.shape[:3] + (k.shape[3] // n,)}


def test_tp_element_surface():
    """yoloxinference shard-mode=tensor runs the batched forward TP."""
    from gst_plugins_rs_tpu.core import element_factory_make

    det = element_factory_make("yoloxinference")
    assert det.get_property("shard-mode") == "data"
    det.set_property("shard-mode", "tensor")
    assert det.get_property("shard-mode") == "tensor"
