"""fp64 oracles for the k-means / Gaussian family, completing oracle
coverage of every method in the framework."""

import numpy as np

import jax.numpy as jnp

from transductive_clip_tpu.methods.zero_shot.em_gaussian import em_gaussian_infer
from transductive_clip_tpu.methods.zero_shot.em_gaussian_cov import (
    em_gaussian_cov_infer,
)
from transductive_clip_tpu.methods.zero_shot.hard_kmeans import hard_kmeans_infer
from transductive_clip_tpu.methods.zero_shot.kl_kmeans import kl_kmeans_infer
from transductive_clip_tpu.methods.zero_shot.soft_kmeans import soft_kmeans_infer

from conftest import make_simplex_tasks

EPS = 1e-15


def softmax(z, axis=-1):
    z = z - z.max(axis=axis, keepdims=True)
    e = np.exp(z)
    return e / e.sum(axis=axis, keepdims=True)


def d2(x, w):
    return ((x[:, :, None, :] - w[:, None, :, :]) ** 2).sum(-1)


def centroids(u, x, w_prev=None, eps=EPS):
    counts = u.sum(1)
    w = np.einsum("tnk,tnd->tkd", u, x) / np.maximum(counts, eps)[..., None]
    nz = (counts > eps)[..., None]
    return np.where(nz, w, 0.0 if w_prev is None else w_prev)


def one_hot_argm(idx, k):
    return (idx[..., None] == np.arange(k)).astype(np.float64)


def setup(rng):
    x, y = make_simplex_tasks(rng, n_task=2, n_query=15, n_class=6, k_eff=3)
    return x.astype(np.float64), y


def test_soft_kmeans_oracle(rng):
    x, _ = setup(rng)
    T, n_iter = 30.0, 5
    u = x.copy()
    w = centroids(u, x)
    for _ in range(n_iter):
        w = centroids(u, x, w_prev=w)
        u = softmax(T * (-0.5 * d2(x, w)))
    u_ours, _ = soft_kmeans_infer(
        jnp.asarray(x, jnp.float32), jnp.asarray(x, jnp.float32),
        jnp.float32(T), n_iter=n_iter,
    )
    np.testing.assert_allclose(np.asarray(u_ours, np.float64), u, atol=5e-3)


def test_hard_kmeans_oracle(rng):
    x, _ = setup(rng)
    n_iter, K = 5, x.shape[-1]
    u = x.copy()
    for _ in range(n_iter):
        counts = u.sum(1)
        w = np.einsum("tnk,tnd->tkd", u, x) / np.maximum(counts, EPS)[..., None]
        w = np.where((counts > EPS)[..., None], w, 0.0)
        u = one_hot_argm(d2(x, w).argmin(-1), K)
    u_ours, _ = hard_kmeans_infer(
        jnp.asarray(x, jnp.float32), jnp.asarray(x, jnp.float32), n_iter=n_iter
    )
    np.testing.assert_array_equal(
        np.asarray(u_ours).argmax(-1), u.argmax(-1)
    )


def test_kl_kmeans_oracle(rng):
    x, _ = setup(rng)
    n_iter, K = 5, x.shape[-1]
    u = x.copy()
    for _ in range(n_iter):
        counts = u.sum(1)
        w = np.einsum("tnk,tnd->tkd", u, x) / np.maximum(counts, 1.0)[..., None]
        w = np.where((counts > 0)[..., None], w, 0.0)
        xs, ws = x + EPS, w + EPS
        divs = (xs[:, :, None, :] * np.log(
            xs[:, :, None, :] / ws[:, None, :, :]
        )).sum(-1)
        u = one_hot_argm(divs.argmin(-1), K)
    u_ours, _ = kl_kmeans_infer(
        jnp.asarray(x, jnp.float32), jnp.asarray(x, jnp.float32), n_iter=n_iter
    )
    np.testing.assert_array_equal(
        np.asarray(u_ours).argmax(-1), u.argmax(-1)
    )


def test_em_gaussian_oracle(rng):
    x, _ = setup(rng)
    n_task, n_query, K = x.shape
    T, lambd, n_iter = 30.0, float(int(K / 5) * n_query), 5
    u = x.copy()
    v = np.zeros((n_task, K))
    w = centroids(u, x)
    for _ in range(n_iter):
        w = centroids(u, x, w_prev=w)
        u = softmax(T * (-0.5 * d2(x, w)) + lambd * v[:, None, :] / n_query)
        v = np.log(u.mean(1) + EPS) + 1.0
    u_ours, _ = em_gaussian_infer(
        jnp.asarray(x, jnp.float32), jnp.asarray(x, jnp.float32),
        jnp.float32(T), jnp.float32(lambd), n_iter=n_iter,
    )
    np.testing.assert_allclose(np.asarray(u_ours, np.float64), u, atol=5e-3)


def test_em_gaussian_cov_oracle(rng):
    x, _ = setup(rng)
    n_task, n_query, K = x.shape
    lambd, n_iter = float(int(K / 5) * n_query), 4
    u = x.copy()
    v = np.zeros((n_task, K))
    w = centroids(u, x)

    def dev2(u, w):
        return np.einsum(
            "tnk,tnkd->tkd", u, (w[:, None, :, :] - x[:, :, None, :]) ** 2
        )

    s = u.sum(1)[..., None] / np.maximum(dev2(u, w), EPS)
    for _ in range(n_iter):
        w = centroids(u, x, w_prev=w)
        counts = u.sum(1)
        s_new = counts[..., None] / np.maximum(dev2(u, w), EPS)
        s = np.where((counts > EPS)[..., None], s_new, s)
        md = np.einsum(
            "tkd,tnkd->tnk", s, (x[:, :, None, :] - w[:, None, :, :]) ** 2
        )
        det = 0.5 * np.log(s + EPS).sum(-1)[:, None, :]
        u = softmax(-0.5 * md + det + lambd * v[:, None, :] / n_query)
        v = np.log(u.mean(1) + EPS) + 1.0
    u_ours, _ = em_gaussian_cov_infer(
        jnp.asarray(x, jnp.float32), jnp.asarray(x, jnp.float32),
        jnp.float32(lambd), n_iter=n_iter,
    )
    np.testing.assert_allclose(np.asarray(u_ours, np.float64), u, atol=1e-2)


def test_em_gaussian_cov_direct_on_flat_features(rng):
    """Regression: on flat Dirichlet(0.8) features, near-empty clusters
    drive s toward 1/EPS and the matmul expansion of the distances
    catastrophically cancels (flipping ~2% of assignments); the 'direct'
    (x-w)^2 implementation — the default — must match an fp64 oracle."""
    n_task, n_query, K = 2, 25, 10
    x = rng.dirichlet(np.full(K, 0.8), size=(n_task, n_query)).astype(np.float32)
    lambd, n_iter = float(int(K / 5) * n_query), 6

    # fp64 oracle, reference-shaped
    u = x.astype(np.float64)
    v = np.zeros((n_task, K))
    w = centroids(u, x.astype(np.float64))

    def dev2(u, w):
        return np.einsum(
            "tnk,tnkd->tkd", u, (w[:, None, :, :] - x[:, :, None, :]) ** 2
        )

    s = u.sum(1)[..., None] / np.maximum(dev2(u, w), EPS)
    for _ in range(n_iter):
        w = centroids(u, x.astype(np.float64), w_prev=w)
        counts = u.sum(1)
        s_new = counts[..., None] / np.maximum(dev2(u, w), EPS)
        s = np.where((counts > EPS)[..., None], s_new, s)
        md = np.einsum(
            "tkd,tnkd->tnk", s, (x[:, :, None, :] - w[:, None, :, :]) ** 2
        )
        det = 0.5 * np.log(s + EPS).sum(-1)[:, None, :]
        u = softmax(-0.5 * md + det + lambd * v[:, None, :] / n_query)
        v = np.log(u.mean(1) + EPS) + 1.0

    u_direct, _ = em_gaussian_cov_infer(
        jnp.asarray(x), jnp.asarray(x), jnp.float32(lambd), n_iter=n_iter,
        dist_impl="direct",
    )
    np.testing.assert_array_equal(
        np.asarray(u_direct).argmax(-1), u.argmax(-1)
    )


def test_em_gaussian_cov_impls_agree_when_well_conditioned(rng):
    x, _ = setup(rng)
    K, n_query = x.shape[2], x.shape[1]
    lambd = float(int(K / 5) * n_query)
    u_d, _ = em_gaussian_cov_infer(
        jnp.asarray(x), jnp.asarray(x), jnp.float32(lambd), n_iter=4,
        dist_impl="direct",
    )
    u_m, _ = em_gaussian_cov_infer(
        jnp.asarray(x), jnp.asarray(x), jnp.float32(lambd), n_iter=4,
        dist_impl="matmul",
    )
    np.testing.assert_array_equal(
        np.asarray(u_d).argmax(-1), np.asarray(u_m).argmax(-1)
    )
    np.testing.assert_allclose(np.asarray(u_d), np.asarray(u_m), atol=5e-3)


def test_clustering_accuracy_oracle(rng):
    """The zero-shot accuracy path (prototypes -> Hungarian matching ->
    accuracy) against a direct scipy computation."""
    from scipy.optimize import linear_sum_assignment

    from transductive_clip_tpu.core.config import CfgNode
    from transductive_clip_tpu.methods.base import clustering_accuracy

    x, y = make_simplex_tasks(rng, n_task=3, n_query=20, n_class=6, k_eff=3)
    K = 6
    # u: peaked on a permuted cluster of the true class
    perm = rng.permutation(K)
    u = np.zeros((3, 20, K), np.float32)
    u[np.arange(3)[:, None], np.arange(20)[None, :], perm[y]] = 1.0

    cfg = CfgNode(dict(n_class=K, use_softmax_feature=True, graph_matching=True, T=30))
    acc, new_preds = clustering_accuracy(u, x, y, cfg)

    # oracle per task
    for t in range(3):
        preds = u[t].argmax(-1)
        clusters, first = np.unique(preds, return_index=True)
        clusters = clusters[np.argsort(first)]
        protos = np.stack([
            x[t][preds == c].mean(0) if (preds == c).any() else np.zeros(K)
            for c in clusters
        ])
        _, cols = linear_sum_assignment(-protos)
        lut = dict(zip(clusters, cols))
        want = np.array([lut[p] for p in preds])
        np.testing.assert_array_equal(new_preds[t], want)
        assert acc[t, 0] == (want == y[t]).mean()
