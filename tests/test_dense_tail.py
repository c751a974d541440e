"""Dense-tail equivalence: res3-onward conv3d path == pure sparse path.

Same weights (the first 10 SparseConvBN modules line up 1:1; the 4 tail
convs map SparseConvBN_{10+j} -> DenseConvBN_j with identical (kvol, cin,
cout) kernel layout), same inputs, no stage-cap overflow -> identical BEV
output up to conv-reassociation tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np

from det3d_tpu.models.backbones import SpMiddleFHD, SpMiddleResNetFHD

GRID = (16, 16, 40)


def _coords(rng, v=64):
    lin = rng.choice(41 * 16 * 16, 48, replace=False)
    co = np.stack([lin // (16 * 16), (lin // 16) % 16, lin % 16],
                  -1).astype(np.int32)
    out = np.full((v, 3), -1, np.int32)
    out[:48] = co
    return jnp.asarray(out[None])


def _map_params(sparse_params, dense_params):
    mapped = dict(dense_params)
    n_scb = sum(1 for k in dense_params if k.startswith("SparseConvBN"))
    n_sbb = sum(1 for k in dense_params
                if k.startswith("SparseBasicBlock"))
    for k in dense_params:
        if k.startswith("SparseConvBN") or k.startswith("SparseBasicBlock"):
            mapped[k] = sparse_params[k]
        elif k.startswith("DenseConvBN"):
            j = int(k.split("_")[1])
            mapped[k] = sparse_params[f"SparseConvBN_{n_scb + j}"]
        elif k.startswith("DenseBasicBlock"):
            j = int(k.split("_")[1])
            src = sparse_params[f"SparseBasicBlock_{n_sbb + j}"]
            mapped[k] = {"DenseConvBN_0": src["SparseConvBN_0"],
                         "DenseConvBN_1": src["SparseConvBN_1"]}
    return mapped


def test_fhd_dense_tail_equivalence(rng):
    coords = _coords(rng)
    feats = jnp.asarray(rng.randn(1, 64, 4).astype(np.float32))

    m_sparse = SpMiddleFHD(num_input_features=4, dense_tail=False)
    m_dense = SpMiddleFHD(num_input_features=4, dense_tail=True)
    vs = m_sparse.init(jax.random.PRNGKey(0), feats, coords, GRID,
                       train=False)
    vd = m_dense.init(jax.random.PRNGKey(0), feats, coords, GRID,
                      train=False)
    params = _map_params(vs["params"], vd["params"])

    out_s = m_sparse.apply(vs, feats, coords, GRID, train=False)
    out_d = m_dense.apply({"params": params,
                           "batch_stats": vd["batch_stats"]},
                          feats, coords, GRID, train=False)
    assert out_s.shape == out_d.shape
    np.testing.assert_allclose(np.asarray(out_d), np.asarray(out_s),
                               rtol=1e-4, atol=1e-5)

    # train mode: batch-stat updates agree too (masked BN over the same
    # active sets)
    (_, bs_s) = m_sparse.apply(vs, feats, coords, GRID, train=True,
                               mutable=["batch_stats"])
    (_, bs_d) = m_dense.apply({"params": params,
                               "batch_stats": vd["batch_stats"]},
                              feats, coords, GRID, train=True,
                              mutable=["batch_stats"])
    tail_means_s = [np.asarray(v) for k, v in sorted(
        bs_s["batch_stats"].items()) if "SparseConvBN_1" in k]
    assert tail_means_s  # sanity: stats exist

    def last_mean(tree):
        flat = jax.tree_util.tree_leaves(tree)
        return np.sort(np.concatenate([np.ravel(x) for x in flat]))

    np.testing.assert_allclose(last_mean(bs_d["batch_stats"]),
                               last_mean(bs_s["batch_stats"]),
                               rtol=1e-3, atol=1e-5)


def test_resnet_dense_tail_equivalence(rng):
    coords = _coords(rng)
    feats = jnp.asarray(rng.randn(1, 64, 4).astype(np.float32))

    m_sparse = SpMiddleResNetFHD(num_input_features=4, dense_tail=False)
    m_dense = SpMiddleResNetFHD(num_input_features=4, dense_tail=True)
    vs = m_sparse.init(jax.random.PRNGKey(0), feats, coords, GRID,
                       train=False)
    vd = m_dense.init(jax.random.PRNGKey(0), feats, coords, GRID,
                      train=False)
    params = _map_params(vs["params"], vd["params"])

    out_s = m_sparse.apply(vs, feats, coords, GRID, train=False)
    out_d = m_dense.apply({"params": params,
                           "batch_stats": vd["batch_stats"]},
                          feats, coords, GRID, train=False)
    np.testing.assert_allclose(np.asarray(out_d), np.asarray(out_s),
                               rtol=1e-4, atol=1e-5)


def test_dense_tail_gradients_finite(rng):
    coords = _coords(rng)
    feats = jnp.asarray(rng.randn(1, 64, 4).astype(np.float32))
    m = SpMiddleFHD(num_input_features=4, dense_tail=True)
    variables = m.init(jax.random.PRNGKey(0), feats, coords, GRID,
                       train=False)

    def loss(params):
        out = m.apply({"params": params,
                       "batch_stats": variables["batch_stats"]},
                      feats, coords, GRID, train=False)
        return jnp.sum(out ** 2)

    g = jax.grad(loss)(variables["params"])
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree_util.tree_leaves(g))


def test_resnet_dense_from2_equivalence(rng):
    """dense_from=2 (res2 onward dense — the CBGS serving point) must
    match the pure sparse path like dense_from=3 does."""
    coords = _coords(rng)
    feats = jnp.asarray(rng.randn(1, 64, 4).astype(np.float32))

    m_sparse = SpMiddleResNetFHD(num_input_features=4, dense_tail=False)
    m_d2 = SpMiddleResNetFHD(num_input_features=4, dense_from=2)
    vs = m_sparse.init(jax.random.PRNGKey(0), feats, coords, GRID,
                       train=False)
    vd = m_d2.init(jax.random.PRNGKey(0), feats, coords, GRID, train=False)
    params = _map_params(vs["params"], vd["params"])

    out_s = m_sparse.apply(vs, feats, coords, GRID, train=False)
    out_d = m_d2.apply({"params": params,
                        "batch_stats": vd["batch_stats"]},
                       feats, coords, GRID, train=False)
    assert out_s.shape == out_d.shape
    np.testing.assert_allclose(np.asarray(out_d), np.asarray(out_s),
                               rtol=1e-4, atol=1e-5)


def test_fhd_dense_from2_equivalence(rng):
    coords = _coords(rng)
    feats = jnp.asarray(rng.randn(1, 64, 4).astype(np.float32))

    m_sparse = SpMiddleFHD(num_input_features=4, dense_tail=False)
    m_d2 = SpMiddleFHD(num_input_features=4, dense_from=2)
    vs = m_sparse.init(jax.random.PRNGKey(0), feats, coords, GRID,
                       train=False)
    vd = m_d2.init(jax.random.PRNGKey(0), feats, coords, GRID, train=False)
    params = _map_params(vs["params"], vd["params"])

    out_s = m_sparse.apply(vs, feats, coords, GRID, train=False)
    out_d = m_d2.apply({"params": params,
                        "batch_stats": vd["batch_stats"]},
                       feats, coords, GRID, train=False)
    assert out_s.shape == out_d.shape
    np.testing.assert_allclose(np.asarray(out_d), np.asarray(out_s),
                               rtol=1e-4, atol=1e-5)
