"""PointNet++ ops against brute-force numpy oracles + module smoke/grad.

Oracle parity targets: det3d/ops/pointnet2/pointnet2_utils.py (CUDA
kernels) — FPS max-min recursion, ball query first-found scan semantics,
3-NN inverse-distance interpolation.
"""

import jax
import jax.numpy as jnp
import numpy as np

from det3d_tpu.ops import pointnet2 as p2


def _fps_oracle(xyz, npoint):
    n = xyz.shape[0]
    sel = [0]
    dist = np.full(n, np.inf)
    for _ in range(1, npoint):
        d = np.sum((xyz - xyz[sel[-1]]) ** 2, axis=1)
        dist = np.minimum(dist, d)
        sel.append(int(np.argmax(dist)))
    return np.asarray(sel)


def _ball_oracle(xyz, centers, radius, nsample):
    m = centers.shape[0]
    idx = np.zeros((m, nsample), np.int32)
    for i in range(m):
        hits = np.nonzero(
            np.sum((xyz - centers[i]) ** 2, axis=1) < radius ** 2)[0]
        if len(hits) == 0:
            continue
        take = hits[:nsample]
        idx[i, :len(take)] = take
        idx[i, len(take):] = take[0]
    return idx


def test_fps_matches_oracle(rng):
    xyz = rng.randn(2, 64, 3).astype(np.float32)
    got = np.asarray(p2.furthest_point_sample(jnp.asarray(xyz), 16))
    for b in range(2):
        np.testing.assert_array_equal(got[b], _fps_oracle(xyz[b], 16))


def test_fps_respects_valid_mask(rng):
    xyz = rng.randn(1, 32, 3).astype(np.float32)
    valid = np.ones((1, 32), bool)
    valid[0, 20:] = False
    got = np.asarray(
        p2.furthest_point_sample(jnp.asarray(xyz), 8, jnp.asarray(valid)))
    assert got.max() < 20


def test_ball_query_matches_oracle(rng):
    xyz = rng.uniform(-1, 1, (2, 128, 3)).astype(np.float32)
    centers = xyz[:, :16] + 0.01
    idx, found = p2.ball_query(jnp.asarray(xyz), jnp.asarray(centers),
                               radius=0.4, nsample=8)
    idx, found = np.asarray(idx), np.asarray(found)
    for b in range(2):
        np.testing.assert_array_equal(idx[b],
                                      _ball_oracle(xyz[b], centers[b],
                                                   0.4, 8))
    assert found.any() and not found.all()


def test_ball_query_chunked_equals_unchunked(rng):
    xyz = rng.uniform(-1, 1, (1, 96, 3)).astype(np.float32)
    centers = rng.uniform(-1, 1, (1, 40, 3)).astype(np.float32)
    a = p2.ball_query(jnp.asarray(xyz), jnp.asarray(centers), 0.5, 4,
                      chunk=16)
    b = p2.ball_query(jnp.asarray(xyz), jnp.asarray(centers), 0.5, 4,
                      chunk=4096)
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
    np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))


def test_three_nn_and_interpolate(rng):
    unknown = rng.randn(1, 24, 3).astype(np.float32)
    known = rng.randn(1, 10, 3).astype(np.float32)
    feats = rng.randn(1, 10, 5).astype(np.float32)
    dist, idx = p2.three_nn(jnp.asarray(unknown), jnp.asarray(known))
    dist, idx = np.asarray(dist), np.asarray(idx)
    d_full = np.linalg.norm(unknown[0][:, None] - known[0][None], axis=-1)
    order = np.argsort(d_full, axis=1)[:, :3]
    np.testing.assert_array_equal(np.sort(idx[0], axis=1),
                                  np.sort(order, axis=1))
    np.testing.assert_allclose(dist[0], np.sort(d_full, axis=1)[:, :3],
                               rtol=1e-5, atol=1e-5)
    w = p2.interpolation_weights(jnp.asarray(dist))
    out = p2.three_interpolate(jnp.asarray(feats), jnp.asarray(idx), w)
    assert out.shape == (1, 24, 5)
    np.testing.assert_allclose(np.asarray(w).sum(-1), 1.0, rtol=1e-5)


def test_group_and_gather(rng):
    feats = rng.randn(2, 12, 4).astype(np.float32)
    idx = rng.randint(0, 12, (2, 5, 3)).astype(np.int32)
    out = np.asarray(p2.group_points(jnp.asarray(feats), jnp.asarray(idx)))
    for b in range(2):
        np.testing.assert_array_equal(out[b], feats[b][idx[b]])
    g = np.asarray(p2.gather_points(jnp.asarray(feats),
                                    jnp.asarray(idx[:, :, 0])))
    np.testing.assert_array_equal(g[0], feats[0][idx[0, :, 0]])


def test_sa_fp_modules_end_to_end(rng):
    from det3d_tpu.models.point_modules import (PointnetFPModule,
                                                PointnetSAModuleMSG)
    xyz = jnp.asarray(rng.uniform(-1, 1, (2, 64, 3)).astype(np.float32))
    feats = jnp.asarray(rng.randn(2, 64, 6).astype(np.float32))

    sa = PointnetSAModuleMSG(npoint=16, radii=[0.5, 1.0], nsamples=[8, 16],
                             mlps=[[9, 16], [9, 32]])
    vars_sa = sa.init(jax.random.PRNGKey(0), xyz, feats, train=False)
    (new_xyz, new_feats, _), _ = sa.apply(
        vars_sa, xyz, feats, train=True, mutable=["batch_stats"])
    assert new_xyz.shape == (2, 16, 3)
    assert new_feats.shape == (2, 16, 48)

    fp = PointnetFPModule(mlp=[54, 24])
    vars_fp = fp.init(jax.random.PRNGKey(1), xyz, new_xyz, feats, new_feats,
                      train=False)
    up, _ = fp.apply(vars_fp, xyz, new_xyz, feats, new_feats, train=True,
                     mutable=["batch_stats"])
    assert up.shape == (2, 64, 24)

    def loss(params):
        out = fp.apply({"params": params,
                        "batch_stats": vars_fp["batch_stats"]},
                       xyz, new_xyz, feats, new_feats, train=False)
        return jnp.sum(out ** 2)

    g = jax.grad(loss)(vars_fp["params"])
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree_util.tree_leaves(g))


def test_sa_group_all_path(rng):
    from det3d_tpu.models.point_modules import PointnetSAModule
    xyz = jnp.asarray(rng.uniform(-1, 1, (1, 32, 3)).astype(np.float32))
    feats = jnp.asarray(rng.randn(1, 32, 4).astype(np.float32))
    sa = PointnetSAModule(mlp=[7, 16], npoint=None)
    variables = sa.init(jax.random.PRNGKey(0), xyz, feats, train=False)
    _, out, _ = sa.apply(variables, xyz, feats, train=False)
    assert out.shape == (1, 1, 16)
