"""Image backbones (ResNet/SENet/SSDVGG) + FPN: shape contracts vs the
reference architectures, registry round-trip, grad sanity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from det3d_tpu.models.image_backbones import FPN, ResNet, SENet, SSDVGG


@pytest.mark.parametrize("depth,chans", [(18, (64, 128, 256, 512)),
                                         (50, (256, 512, 1024, 2048))])
def test_resnet_stage_shapes(depth, chans):
    m = ResNet(depth=depth, out_indices=(0, 1, 2, 3))
    x = jnp.zeros((1, 64, 64, 3))
    variables = m.init(jax.random.PRNGKey(0), x, train=False)
    outs = m.apply(variables, x, train=False)
    assert len(outs) == 4
    for i, (o, c) in enumerate(zip(outs, chans)):
        assert o.shape == (1, 64 // (4 * 2 ** i), 64 // (4 * 2 ** i), c), \
            (depth, i, o.shape)


def test_resnet_frozen_stage_stops_gradient():
    m = ResNet(depth=18, out_indices=(3,), frozen_stages=1)
    x = jnp.ones((1, 32, 32, 3))
    variables = m.init(jax.random.PRNGKey(0), x, train=False)

    def loss(params):
        out = m.apply({"params": params,
                       "batch_stats": variables["batch_stats"]},
                      x, train=False)
        return jnp.sum(out[0] ** 2)

    g = jax.grad(loss)(variables["params"])
    import flax
    flat = flax.traverse_util.flatten_dict(g)
    # stage-1 (first BasicBlock) grads are exactly zero; stage-4 are not
    s1 = [v for k, v in flat.items() if "BasicBlock_0" in k]
    s4 = [v for k, v in flat.items() if "BasicBlock_6" in k]
    assert s1 and all(float(jnp.abs(v).sum()) == 0.0 for v in s1)
    assert s4 and any(float(jnp.abs(v).sum()) > 0.0 for v in s4)


def test_senet_runs_and_differs_from_plain_resnet():
    x = jnp.asarray(np.random.RandomState(0).randn(1, 32, 32, 3)
                    .astype(np.float32))
    m = SENet(depth=50, reduction=16, out_indices=(0,), num_stages=1,
              strides=(1,), dilations=(1,))
    variables = m.init(jax.random.PRNGKey(0), x, train=False)
    outs = m.apply(variables, x, train=False)
    assert outs[0].shape == (1, 8, 8, 256)
    # SE params exist
    import flax
    names = {"/".join(k) for k in
             flax.traverse_util.flatten_dict(variables["params"])}
    assert any("Dense" in n for n in names)


def test_ssdvgg300_pyramid():
    m = SSDVGG(input_size=300)
    x = jnp.zeros((1, 300, 300, 3))
    variables = m.init(jax.random.PRNGKey(0), x, train=False)
    outs = m.apply(variables, x, train=False)
    # classic SSD300: 6 maps at 38/19/10/5/3/1 with these channels
    shapes = [tuple(o.shape[1:]) for o in outs]
    assert shapes == [(38, 38, 512), (19, 19, 1024), (10, 10, 512),
                      (5, 5, 256), (3, 3, 256), (1, 1, 256)], shapes


def test_fpn_levels_and_extra_convs():
    ins = [jnp.zeros((1, 32, 32, 64)), jnp.zeros((1, 16, 16, 128)),
           jnp.zeros((1, 8, 8, 256))]
    m = FPN(in_channels=[64, 128, 256], out_channels=32, num_outs=5,
            add_extra_convs=True, extra_convs_on_inputs=True)
    variables = m.init(jax.random.PRNGKey(0), ins, train=False)
    outs = m.apply(variables, ins, train=False)
    assert [tuple(o.shape[1:]) for o in outs] == [
        (32, 32, 32), (16, 16, 32), (8, 8, 32), (4, 4, 32), (2, 2, 32)]

    m2 = FPN(in_channels=[64, 128, 256], out_channels=32, num_outs=4)
    v2 = m2.init(jax.random.PRNGKey(0), ins, train=False)
    outs2 = m2.apply(v2, ins, train=False)
    assert tuple(outs2[-1].shape[1:]) == (4, 4, 32)   # maxpool extra


def test_backbones_registered():
    import det3d_tpu.models.image_backbones  # noqa: F401 (registration)
    from det3d_tpu.models.registry import BACKBONES, NECKS
    for name in ("ResNet", "SENet", "SSDVGG"):
        assert BACKBONES.get(name) is not None
    assert NECKS.get("FPN") is not None
