import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment
from scipy.special import digamma as sp_digamma
from scipy.stats import dirichlet as sp_dirichlet

import jax.numpy as jnp

from transductive_clip_tpu.native import lap_solve
from transductive_clip_tpu.ops import (
    basic_matching,
    dirichlet_log_pdf,
    get_one_hot,
    hungarian_matching,
    kl_divergence_to_centroids,
    mm_update_alpha,
    sq_euclidean,
)
from transductive_clip_tpu.ops.dirichlet import weighted_log_means


def test_one_hot(rng):
    y = jnp.asarray(rng.integers(0, 5, size=(3, 7)))
    oh = np.asarray(get_one_hot(y, 5))
    assert oh.shape == (3, 7, 5)
    assert (oh.argmax(-1) == np.asarray(y)).all()
    assert (oh.sum(-1) == 1).all()


def test_sq_euclidean_matches_broadcast(rng):
    x = rng.normal(size=(2, 9, 6)).astype(np.float32)
    w = rng.normal(size=(2, 4, 6)).astype(np.float32)
    got = np.asarray(sq_euclidean(jnp.asarray(x), jnp.asarray(w)))
    want = ((x[:, :, None, :] - w[:, None, :, :]) ** 2).sum(-1)
    # the matmul expansion trades a little fp32 accuracy for MXU throughput
    np.testing.assert_allclose(got, want, rtol=1e-2, atol=1e-3)


def test_kl_divergence(rng):
    x = rng.dirichlet(np.ones(5), size=(2, 8)).astype(np.float32)
    w = rng.dirichlet(np.ones(5), size=(2, 3)).astype(np.float32)
    got = np.asarray(kl_divergence_to_centroids(jnp.asarray(x), jnp.asarray(w)))
    eps = 1e-15
    want = np.einsum(
        "tnd,tnkd->tnk",
        x + eps,
        np.log((x + eps)[:, :, None, :] / (w + eps)[:, None, :, :]),
    )
    np.testing.assert_allclose(got, want, rtol=1e-2, atol=1e-2)


def test_dirichlet_log_pdf_vs_scipy(rng):
    alpha = rng.uniform(0.5, 4.0, size=(1, 2, 4))
    x = rng.dirichlet(np.ones(4), size=(1, 3)).astype(np.float64)
    got = np.asarray(
        dirichlet_log_pdf(jnp.log(jnp.asarray(x)), jnp.asarray(alpha, jnp.float32))
    )
    for n in range(3):
        for k in range(2):
            want = sp_dirichlet(alpha[0, k]).logpdf(x[0, n] / x[0, n].sum())
            assert got[0, n, k] == pytest.approx(want, rel=1e-3, abs=5e-2)


def test_mm_solver_satisfies_mle_stationarity(rng):
    """The MM fixed point solves digamma(a_k) - digamma(sum a) = mean log x."""
    true_alpha = np.array([2.0, 5.0, 1.0, 0.7])
    x = rng.dirichlet(true_alpha, size=20000)
    y_cst = np.log(x + 1e-15).mean(0)[None, None, :]              # [1, 1, 4]
    alpha0 = jnp.ones((1, 1, 4), jnp.float32)
    alpha = np.asarray(mm_update_alpha(alpha0, jnp.asarray(y_cst, jnp.float32)))
    resid = sp_digamma(alpha) - sp_digamma(alpha.sum(-1, keepdims=True)) - y_cst
    assert np.abs(resid).max() < 5e-4
    # and the estimate should be near the generating parameters
    assert np.abs(alpha[0, 0] - true_alpha).max() < 0.25


def test_weighted_log_means_empty_cluster_fill(rng):
    u = np.zeros((1, 6, 3), np.float32)
    u[:, :, 0] = 1.0                                              # cluster 1, 2 empty
    logq = np.log(rng.dirichlet(np.ones(3), size=(1, 6)).astype(np.float32))
    y, nonzero = weighted_log_means(jnp.asarray(u), jnp.asarray(logq))
    y = np.asarray(y)
    np.testing.assert_allclose(y[0, 1], -10.0)
    np.testing.assert_allclose(y[0, 2], -10.0)
    np.testing.assert_allclose(y[0, 0], np.asarray(logq)[0].mean(0), rtol=1e-3)


def test_lap_solve_matches_scipy(rng):
    for shape in [(5, 5), (7, 12), (1, 4), (60, 100)]:
        cost = rng.normal(size=shape)
        r1, c1 = lap_solve(cost)
        r2, c2 = linear_sum_assignment(cost)
        assert cost[r1, c1].sum() == pytest.approx(cost[r2, c2].sum(), abs=1e-9)
        assert len(set(c1.tolist())) == shape[0]                  # valid injection


def test_hungarian_matching_recovers_permutation(rng):
    n_task, n, K = 3, 30, 6
    perm = np.stack([rng.permutation(K) for _ in range(n_task)])
    preds = rng.integers(0, K, size=(n_task, n))
    # probs: cluster k strongly favors class perm[k]
    probs = np.full((n_task, K, K), 0.01)
    for t in range(n_task):
        probs[t, np.arange(K), perm[t]] = 0.9
    new_preds = hungarian_matching(preds, probs)
    want = np.take_along_axis(perm, preds, axis=1)
    np.testing.assert_array_equal(new_preds, want)


def test_basic_matching(rng):
    preds = np.array([[0, 1, 1, 2]])
    probs = np.zeros((1, 3, 5))
    probs[0, 0, 4] = 1
    probs[0, 1, 2] = 1
    probs[0, 2, 0] = 1
    np.testing.assert_array_equal(basic_matching(preds, probs), [[4, 2, 2, 0]])


class TestClusteringAccuracyDevicePath:
    """The device prototype path (compressed to present-cluster rows) must
    reproduce the host reference-shaped path exactly, for every matching
    backend and both feature types."""

    def _make(self, rng, use_softmax, n_task=6, n_query=20, n_class=30, d=12):
        from transductive_clip_tpu.utils.synthetic import make_zero_shot_tasks

        if use_softmax:
            x, y = make_zero_shot_tasks(rng, n_task, n_query, n_class,
                                        k_eff=5, concentration=20.0)
            u = x + 0.01 * rng.normal(size=x.shape).astype(np.float32)
            return x, y, np.abs(u), None
        text = rng.normal(size=(n_class, d)).astype(np.float32)
        text /= np.linalg.norm(text, axis=-1, keepdims=True)
        y = rng.integers(0, n_class, (n_task, n_query))
        x = text[y] + 0.1 * rng.normal(size=(n_task, n_query, d)).astype(np.float32)
        u = np.exp(rng.normal(size=(n_task, n_query, n_class))).astype(np.float32)
        # make u informative so clusters align with classes
        u[np.arange(n_task)[:, None], np.arange(n_query)[None], y] += 50.0
        return x.astype(np.float32), y, u, text

    @pytest.mark.parametrize("use_softmax", [True, False])
    @pytest.mark.parametrize("backend,gm", [("host", True), ("device", True),
                                            ("host", False)])
    def test_device_matches_host(self, rng, use_softmax, backend, gm):
        from transductive_clip_tpu.core.config import CfgNode
        from transductive_clip_tpu.methods.base import clustering_accuracy

        x, y, u, text = self._make(rng, use_softmax)
        base = dict(n_class=u.shape[2], T=30.0, use_softmax_feature=use_softmax,
                    graph_matching=gm, matching_backend=backend)
        acc_dev, preds_dev = clustering_accuracy(
            u, x, y, CfgNode(dict(**base, proto_device=True)), text)
        acc_host, preds_host = clustering_accuracy(
            u, x, y, CfgNode(dict(**base, proto_device=False)), text)
        np.testing.assert_array_equal(preds_dev, preds_host)
        np.testing.assert_allclose(acc_dev, acc_host)


def test_rank_select_rows_matches_topk_semantics(rng):
    """The sort-free row selection must pick exactly the populated-cluster
    set with DISTINCT indices (the top_k invariant downstream code relies
    on), including the adversarial layout where cluster 0 is populated and
    absent rows exist."""
    import jax.numpy as jnp

    from transductive_clip_tpu.methods.base import _rank_select_rows

    N, K, R = 5, 40, 12
    counts = np.zeros((N, K), np.float32)
    for t in range(N):
        k = rng.integers(1, R + 1)
        cl = rng.choice(K, k, replace=False)
        if t == 0:
            cl[0] = 0              # cluster 0 populated + absent rows
        counts[t, cl] = rng.integers(1, 20, k)
    cnt, idx, present = map(
        np.asarray, _rank_select_rows(jnp.asarray(counts), R)
    )
    for t in range(N):
        assert len(set(idx[t])) == R                   # distinct indices
        populated = set(np.flatnonzero(counts[t] > 0))
        assert set(idx[t][present[t]]) == populated
        np.testing.assert_array_equal(cnt[t], counts[t, idx[t]])
        assert (cnt[t][present[t]] > 0).all()
        assert (cnt[t][~present[t]] == 0).all()


@pytest.mark.parametrize("backend,gm", [("host", True), ("device", True),
                                        ("host", False)])
def test_proto_select_rank_matches_topk(rng, backend, gm):
    """clustering_accuracy with proto_select='rank' must reproduce the
    'topk' selection exactly on every matching backend."""
    from transductive_clip_tpu.core.config import CfgNode
    from transductive_clip_tpu.methods.base import clustering_accuracy
    from transductive_clip_tpu.utils.synthetic import make_zero_shot_tasks

    x, y = make_zero_shot_tasks(rng, 6, 20, 30, k_eff=5, concentration=20.0)
    u = np.abs(x + 0.01 * rng.normal(size=x.shape).astype(np.float32))
    base = dict(n_class=30, T=30.0, use_softmax_feature=True,
                graph_matching=gm, matching_backend=backend,
                proto_device=True)
    acc_tk, preds_tk = clustering_accuracy(
        u, x, y, CfgNode(dict(**base, proto_select="topk")))
    acc_rk, preds_rk = clustering_accuracy(
        u, x, y, CfgNode(dict(**base, proto_select="rank")))
    np.testing.assert_array_equal(preds_tk, preds_rk)
    np.testing.assert_allclose(acc_tk, acc_rk)


def test_device_rename_matches_scatter_matching_rows(rng):
    """_accuracy_device's dense match-select rename must reproduce the
    host LUT semantics (scatter_matching_rows), including unmatched
    predictions mapping to class 0."""
    import jax.numpy as jnp

    from transductive_clip_tpu.methods.base import _accuracy_device
    from transductive_clip_tpu.ops.matching import scatter_matching_rows

    N, n, K = 3, 12, 20
    u = rng.dirichlet(np.ones(K), size=(N, n)).astype(np.float32)
    x = rng.dirichlet(np.ones(K), size=(N, n)).astype(np.float32)
    y = rng.integers(0, K, (N, n))
    R = min(K, n)
    _, new_preds, _, preds, idx, probs = _accuracy_device(
        jnp.asarray(u), jnp.asarray(x), jnp.asarray(y, jnp.int32),
        jnp.float32(30.0), jnp.zeros((1, K), jnp.float32), True, R, False,
    )
    cols = np.asarray(jnp.argmax(probs, axis=-1))
    want = scatter_matching_rows(np.asarray(preds), np.asarray(idx), cols, K)
    np.testing.assert_array_equal(np.asarray(new_preds), want)


def test_select_rows_covering_dense_guard(rng):
    """select_rows_covering('rank') must fall back to top_k's selection
    whenever some task has MORE than R populated rows (e.g. an early soft-EM
    iteration whose softmax has not underflowed): unguarded rank selection
    would keep the lowest-INDEXED rows and silently discard the heaviest
    clusters. In the sparse regime the selected SET must match rank's exact
    covering."""
    import jax
    import jax.numpy as jnp

    from transductive_clip_tpu.ops.common import select_rows_covering

    N, K, R = 4, 40, 12
    # dense regime: every row carries mass, heaviest rows at HIGH indices
    dense = rng.random((N, K)).astype(np.float32) + 0.1
    dense[:, -R:] += 10.0
    cnt, idx = map(np.asarray,
                   select_rows_covering(jnp.asarray(dense), R, 0.0, "rank"))
    tk_cnt, tk_idx = map(np.asarray, jax.lax.top_k(jnp.asarray(dense), R))
    np.testing.assert_array_equal(idx, tk_idx)
    np.testing.assert_array_equal(cnt, tk_cnt)

    # sparse regime: <= R populated -> covering set, no sort
    sparse = np.zeros((N, K), np.float32)
    for t in range(N):
        cl = rng.choice(K, rng.integers(1, R + 1), replace=False)
        sparse[t, cl] = rng.integers(1, 9, cl.size)
    cnt, idx = map(np.asarray,
                   select_rows_covering(jnp.asarray(sparse), R, 0.0, "rank"))
    for t in range(N):
        assert len(set(idx[t])) == R
        assert set(np.flatnonzero(sparse[t] > 0)) <= set(idx[t])
        np.testing.assert_array_equal(cnt[t], sparse[t, idx[t]])

    # 'topk' impl is exactly lax.top_k
    cnt, idx = map(np.asarray,
                   select_rows_covering(jnp.asarray(dense), R, 0.0, "topk"))
    np.testing.assert_array_equal(idx, tk_idx)
