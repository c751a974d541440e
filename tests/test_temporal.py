"""Temporal correlation / align_feature against shift oracles."""

import jax
import jax.numpy as jnp
import numpy as np

from det3d_tpu.models.temporal import (AlignFeatureAndAggregation,
                                       align_feature, correlation)


def _corr_oracle(a, b, patch):
    bsz, h, w, c = a.shape
    half = patch // 2
    bp = np.pad(b, ((0, 0), (half, half), (half, half), (0, 0)))
    out = np.zeros((bsz, h, w, patch * patch), np.float32)
    k = 0
    for dy in range(patch):
        for dx in range(patch):
            shifted = bp[:, dy:dy + h, dx:dx + w]
            out[..., k] = np.sum(a * shifted, axis=-1)
            k += 1
    return out


def test_correlation_matches_shift_oracle(rng):
    a = rng.randn(2, 6, 7, 4).astype(np.float32)
    b = rng.randn(2, 6, 7, 4).astype(np.float32)
    got = np.asarray(correlation(jnp.asarray(a), jnp.asarray(b), 3))
    np.testing.assert_allclose(got, _corr_oracle(a, b, 3), rtol=1e-5,
                               atol=1e-5)


def test_align_feature_identity_weights(rng):
    feat = rng.randn(1, 5, 5, 3).astype(np.float32)
    # weight 1 on the center displacement reproduces the input exactly
    w = np.zeros((1, 5, 5, 9), np.float32)
    w[..., 4] = 1.0
    out = np.asarray(align_feature(jnp.asarray(feat), jnp.asarray(w), 3))
    np.testing.assert_allclose(out, feat, rtol=1e-6)


def test_align_feature_shift_weights(rng):
    feat = rng.randn(1, 5, 5, 2).astype(np.float32)
    # weight 1 on displacement (dy=+1, dx=0) reads the pixel BELOW
    w = np.zeros((1, 5, 5, 9), np.float32)
    w[..., 7] = 1.0                      # k = dy*3 + dx with dy=2? see below
    out = np.asarray(align_feature(jnp.asarray(feat), jnp.asarray(w), 3))
    # k=7 -> (dy, dx) = (2, 1) in window coords = displacement (+1, 0)
    want = np.zeros_like(feat)
    want[:, :4] = feat[:, 1:]
    np.testing.assert_allclose(out, want, rtol=1e-6)


def test_align_aggregation_module(rng):
    key = jnp.asarray(rng.randn(1, 8, 8, 16).astype(np.float32))
    cur = jnp.asarray(rng.randn(1, 8, 8, 16).astype(np.float32))
    mod = AlignFeatureAndAggregation(num_channel=16, neighbor=3)
    variables = mod.init(jax.random.PRNGKey(0), key, cur)
    out = mod.apply(variables, key, cur)
    assert out.shape == (1, 8, 8, 16)
    # identical frames: alignment is a no-op in expectation; output finite
    same = mod.apply(variables, cur, cur)
    assert np.isfinite(np.asarray(same)).all()

    def loss(params):
        return jnp.sum(mod.apply({"params": params}, key, cur) ** 2)

    g = jax.grad(loss)(variables["params"])
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree_util.tree_leaves(g))
