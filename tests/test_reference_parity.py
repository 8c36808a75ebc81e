"""Golden-trajectory parity: the jitted EM-Dirichlet must track an
independent float64 numpy/scipy oracle of the algorithm's equations
(block-coordinate EM with the MM quadratic-surrogate alpha solve, dual
v = log class proportions + 1, softmax assignments with the lambda*v/n
term). This locks numerical behavior without importing reference code."""

import numpy as np
import pytest
from scipy.special import digamma, gammaln

import jax.numpy as jnp

from transductive_clip_tpu.methods.zero_shot.em_dirichlet import em_dirichlet_infer

from conftest import make_simplex_tasks

EPS = 1e-15
TRIGAMMA_1 = np.pi ** 2 / 6.0


def oracle_mm_alpha(alpha, y, iter_mm=1000, tol=1e-11):
    """Quadratic-surrogate MM iteration in float64."""
    for l in range(iter_mm):
        digam = digamma(alpha + 1.0)
        curv = np.where(
            alpha > 1e-11,
            np.abs(2.0 * (digam * alpha - gammaln(alpha + 1.0)) / alpha ** 2),
            TRIGAMMA_1,
        )
        b = digam - digamma(alpha.sum(-1, keepdims=True)) - curv * alpha - y
        new = (-b + np.sqrt(b * b + 4.0 * curv)) / (2.0 * curv)
        if l > 0 and l % 50 == 0:
            crit = ((new - alpha) ** 2).sum() / (alpha ** 2).sum()
            if crit < tol:
                return new
        alpha = new
    return alpha


def oracle_em_dirichlet(query, lambd, n_iter):
    """Float64 EM-Dirichlet (soft) on a batch of tasks."""
    n_task, n_query, K = query.shape
    logq = np.log(query + EPS)
    u = query.copy()
    alpha = np.ones((n_task, K, K))
    for _ in range(n_iter):
        u_sum = u.sum(1)
        y = np.einsum("tnk,tnd->tkd", u, logq) / np.maximum(u_sum, EPS)[..., None]
        nonzero = (u_sum > EPS)[..., None]
        y = np.where(nonzero, y, -10.0)
        new_alpha = oracle_mm_alpha(alpha, y)
        alpha = np.where(nonzero, new_alpha, alpha)
        v = np.log(u.mean(1) + EPS) + 1.0
        l1 = gammaln(alpha.sum(-1))[:, None, :]
        l2 = -gammaln(alpha).sum(-1)[:, None, :]
        l3 = np.einsum("tnd,tkd->tnk", logq, alpha - 1.0)
        logits = l1 + l2 + l3 + lambd * v[:, None, :] / n_query
        logits -= logits.max(-1, keepdims=True)
        e = np.exp(logits)
        u = e / e.sum(-1, keepdims=True)
    return u, alpha


@pytest.mark.parametrize("solver", ["mm", "minka"])
def test_em_dirichlet_tracks_fp64_oracle(rng, solver):
    x, _ = make_simplex_tasks(
        rng, n_task=2, n_query=15, n_class=6, k_eff=3, concentration=40.0
    )
    lambd = float(int(6 / 5) * 15)
    n_iter = 3

    u_oracle, _ = oracle_em_dirichlet(x.astype(np.float64), lambd, n_iter)
    u_ours, _ = em_dirichlet_infer(
        jnp.asarray(x), jnp.float32(lambd), n_iter=n_iter, iter_mm=1000,
        hard=False, solver=solver, compact=False, early_stop=False,
    )
    u_ours = np.asarray(u_ours, np.float64)
    # same hard decisions everywhere, posteriors close in fp32 terms
    np.testing.assert_array_equal(u_ours.argmax(-1), u_oracle.argmax(-1))
    np.testing.assert_allclose(u_ours, u_oracle, atol=5e-3)
